package graft

/** The driver's oracle gate hash-compares rows IN ORDER, so every oracled
  * query must be fully deterministic across runs — total ORDER BY, no
  * partition-order leakage, no unstable tie-breaks. This spec executes the
  * whole oracled surface twice at sf0.001 and diffs the ordered results.
  */
class DeterminismSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("driver contract: entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("query registry integrity: names unique, every oracle maps to a query") {
    val names = SparkEntry.all.map(_.name)
    val dups = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dups.isEmpty, s"duplicate query names (toMap would drop one): $dups")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  // Per-query exceptions become named UNRUNNABLE rows (SweepHarness), so
  // one dead query costs one failure line, not the whole sweep.
  test("every oracled query is run-to-run deterministic (ordered rows equal)") {
    val oracled = SparkEntry.oracleSql.keySet
    val bad = SweepHarness.sweep(oracled.toSeq.sorted) { name =>
      val fn = SparkEntry.queries(name)
      val a = fn(spark, dir).collect().map(_.toSeq).toSeq
      val b = fn(spark, dir).collect().map(_.toSeq).toSeq
      if (a == b) Nil else Seq(s"$name: nondeterministic")
    }
    assert(bad.isEmpty, "determinism sweep failures:\n" + bad.mkString("\n"))
  }

  test("rows-only queries are deterministic too (seeded hashes, fixed probes)") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val bad = SweepHarness.sweep(rowsOnly.toSeq.sorted) { name =>
      val fn = SparkEntry.queries(name)
      val a = fn(spark, dir).collect().map(_.toSeq).toSeq
      val b = fn(spark, dir).collect().map(_.toSeq).toSeq
      if (a == b) Nil else Seq(s"$name: nondeterministic")
    }
    assert(bad.isEmpty, "determinism sweep failures:\n" + bad.mkString("\n"))
  }
}
