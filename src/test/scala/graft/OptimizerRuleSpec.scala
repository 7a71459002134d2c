package graft

import graft.plans.LevenshteinPrefilter
import org.apache.spark.sql.functions._

/** The custom Catalyst optimizer rule (SparkSessionExtensions tier):
  * `levenshtein(a,b) <= k` filters gain a short-circuit length-delta
  * guard. Checks: the guard lands in the optimized plan, results are
  * unchanged on a corpus where the guard actually prunes, the rule is
  * idempotent under re-application (Catalyst runs rule batches to a fixed
  * point — a non-idempotent rewrite would stack guards forever), and an
  * OR-nested comparison is left alone (a top-level guard there would
  * wrongly veto rows the other branch accepts).
  */
class OptimizerRuleSpec extends SparkSpec {

  private def withRule[A](body: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ LevenshteinPrefilter
    try body
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ eq LevenshteinPrefilter)
  }

  // parquet-backed fixture: a literal LocalRelation would be folded away
  // by ConvertToLocalRelation before the plan shape can be inspected
  private lazy val fixturePath: String = {
    import spark.implicits._
    val p = java.nio.file.Files.createTempDirectory("graft_lev").toString + "/t"
    Seq(("kitten", "sitten"), ("kitten", "kitten exploded into a paragraph"),
        ("abcdef", "uvwxyz"), ("same", "same"))
      .toDF("a", "b").write.parquet(p)
    p
  }
  private def fixture = spark.read.parquet(fixturePath)

  test("levenshtein<=k filter gains a length-delta short-circuit guard") {
    withRule {
      val df = fixture.filter(levenshtein(col("a"), col("b")) <= 2)
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("abs((length("), "guard missing:\n" + plan)
      // guard must sit LEFT of the levenshtein compare (And short-circuit)
      assert(plan.indexOf("abs(") < plan.indexOf("levenshtein"), plan)
    }
  }

  test("rule preserves results exactly (guard is implied, never filtering extra rows)") {
    val expect = fixture.filter(levenshtein(col("a"), col("b")) <= 2)
      .collect().map(_.getString(0)).sorted
    val got = withRule {
      fixture.filter(levenshtein(col("a"), col("b")) <= 2)
        .collect().map(_.getString(0)).sorted
    }
    assert(got === expect)
    assert(got === Array("kitten", "same"))
  }

  test("comparison is sharpened to the banded thresholded levenshtein (lev(a,b,k) >= 0)") {
    withRule {
      val df = fixture.filter(levenshtein(col("a"), col("b")) <= 2)
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("Some(2)) >= 0"),
        "thresholded rewrite missing:\n" + plan)
      // and the strict variant lowers the threshold by one
      val lt = fixture.filter(levenshtein(col("a"), col("b")) < 2)
        .queryExecution.optimizedPlan.toString
      assert(lt.contains("Some(1)) >= 0"), "strict-compare threshold wrong:\n" + lt)
      assert(fixture.filter(levenshtein(col("a"), col("b")) < 2).count() === 2)
    }
  }

  test("idempotent: re-applying the rule changes nothing (no guard stacking)") {
    withRule {
      val once = fixture.filter(levenshtein(col("a"), col("b")) <= 2)
        .queryExecution.optimizedPlan
      val twice = LevenshteinPrefilter(once)
      assert(twice.fastEquals(once),
        s"rule not idempotent:\nonce: $once\ntwice: $twice")
    }
  }

  test("OR-nested levenshtein is NOT guarded (guard only valid as a conjunct)") {
    withRule {
      val df = fixture.filter(
        levenshtein(col("a"), col("b")) <= 2 || col("a") === col("b"))
      val plan = df.queryExecution.optimizedPlan.toString
      assert(!plan.contains("abs((length("),
        "guard wrongly added under OR:\n" + plan)
      // the short-long pair is rejected by both branches; equal pair passes
      assert(df.count() === 2)
    }
  }

  test("pre-thresholded levenshtein(a,b,t) is NEVER guarded (returns -1 past t, guard would flip semantics)") {
    withRule {
      // lev(a,b,1) <= 2 is TRUE for every row: distance <= 1 gives 0/1,
      // distance > 1 gives -1 — all satisfy <= 2. A length-delta guard
      // would wrongly drop the long-paragraph pair.
      val df = fixture.filter(expr("levenshtein(a, b, 1) <= 2"))
      val plan = df.queryExecution.optimizedPlan.toString
      assert(!plan.contains("abs((length("),
        "guard wrongly added to pre-thresholded levenshtein:\n" + plan)
      assert(df.count() === 4)
    }
  }

  test("k > levenshtein form gets the mirrored guard and Some(k-1) threshold") {
    withRule {
      val df = fixture.filter(lit(2) > levenshtein(col("a"), col("b")))
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("abs((length("), "guard missing for k > lev:\n" + plan)
      assert(plan.contains("Some(1)) >= 0"), "threshold wrong for k > lev:\n" + plan)
      assert(df.count() === 2) // kitten~sitten (1), same~same (0)
    }
  }

  test("j8 shape: the fuzzy-match plan carries the guard with the rule on, result unchanged") {
    withRule {
      val df = SparkEntry.queries("j8_fuzzy_match")(spark, "/root/testdata/sf0.001")
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("abs((length("), "guard missing in j8 plan:\n" + plan)
      assert(df.collect().head.getLong(0) > 0)
    }
  }
}
