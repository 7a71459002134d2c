package graft

import graft.Tables.t
import graft.sources.Bucketed
import org.apache.spark.sql.functions._

/** K9 bucketed layout: the persisted co-location contract — the join on
  * the bucket key must run WITHOUT exchanging either side (write-once
  * shuffle, join-forever free), and the layout round-trip must be
  * content-lossless. At 100 TB this plan shape is the whole point of
  * bucketing: a regression that silently re-introduces the fact-table
  * shuffle (bucket-count mismatch, a lost sortBy, a catalog rewrite that
  * drops the spec) fails here even though results stay correct.
  */
class BucketedJoinSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("k9: bucketed join matches the unbucketed join bit-for-bit") {
    val bucketed = rows(Bucketed.bucketedOrderRevenue(spark, dir))
    val plain = rows(
      t(spark, dir, "lineitem")
        .join(t(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"),
          Tables.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
            .as("revenue")))
    assert(bucketed === plain)
  }

  test("k9: join subtree has zero Exchange (co-located bucketed scan)") {
    val df = Bucketed.bucketedOrderRevenue(spark, dir)
    df.queryExecution.toRdd.count() // let AQE finalize the plan
    // take the FINAL adaptive plan only ("== Initial Plan ==" repeats the
    // tree below it and would alias the subtree split)
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==", 2)(0)
    assert(p.contains("SortMergeJoin"), p)
    // the tree prints top-down, so everything below the SMJ line is its
    // subtree (the aggregation's own exchange sits above the join): the
    // co-located scan feeds the join with no exchange on either side.
    // (A local per-partition Sort remains by design — Spark honors
    // sorted-bucket metadata only under
    // spark.sql.legacy.bucketedTableScan.outputOrdering.)
    val below = p.split("SortMergeJoin", 2)(1)
    assert(!below.contains("Exchange"), "bucketed join re-shuffled:\n" + p)
    assert(below.contains("Bucketed: true"), "scan did not read buckets:\n" + p)
  }

  test("k9: runtime footprint — the join submits no shuffle-map stage at all") {
    // warm the layout first (the one-time write cost is the layout's
    // price and is NOT what this pin measures)
    Bucketed.ensureOrderTables(spark, dir)
    val fp = ShuffleCount.of(spark) {
      Bucketed.bucketedOrderRevenue(spark, dir).queryExecution.toRdd.count()
    }
    // the only exchanges left are the aggregation's (partial→final) and
    // the oracle sort's range sampling; the JOIN contributes zero
    assert(fp.shuffleStages <= 2,
      s"bucketed join gained a shuffle: ${fp.shuffleStages} > 2")
    // 6 measured (catalog listing + AQE stage materializations); +1 headroom
    assert(fp.jobs <= 7, s"bucketed join gained jobs: ${fp.jobs} > 7")
  }

  test("k9: aggregation on the bucket key is also exchange-free") {
    // the layout pays off twice: a groupBy on the bucket key satisfies
    // the aggregate's required distribution straight off the scan, so
    // the partial/final two-phase collapses to one single-pass hash
    // aggregate with NO exchange anywhere in the plan
    val (li, _) = Bucketed.ensureOrderTables(spark, dir)
    val df = spark.table(li)
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
    df.queryExecution.toRdd.count()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==", 2)(0)
    assert(!p.contains("Exchange"), "bucketed aggregation re-shuffled:\n" + p)
    // and it is content-identical to the unbucketed plan's result
    val plain = rows(t(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty")))
    assert(rows(df) === plain)
  }

  test("k9×k10: changeset over bucketed snapshots runs with zero exchanges") {
    // the layout composes with the snapshot-diff operator: both
    // latest-wins snapshots persisted bucketed on the key, the
    // changeset's full-outer join satisfies its distribution straight
    // off the scans — the nightly diff of a 100 TB table never
    // re-shuffles it. Content is pinned against the unbucketed diff.
    import graft.sources.Upsert
    val tmp = System.getProperty("java.io.tmpdir")
    def snap(residue: Int) =
      t(spark, dir, "events").filter(col("event_id") % 5 =!= residue)
        .groupBy(col("user_id"))
        .agg(max(struct(col("ts"), col("event_id"), col("value"))).as("m"))
        .select(col("user_id"), col("m.ts").as("ts"),
          col("m.event_id").as("event_id"), col("m.value").as("value"))
    def snapTable(name: String, residue: Int): String =
      Bucketed.ensureBucketed(snap(residue), name, s"$tmp/$name", "user_id", 8)
    val a = snapTable("graft_k10_snap_a", 4)
    val b = snapTable("graft_k10_snap_b", 0)
    val cs = Upsert.changeset(spark.table(a), spark.table(b), "user_id")
    cs.queryExecution.toRdd.count()
    val p = cs.queryExecution.executedPlan.toString
      .split("== Initial Plan ==", 2)(0)
    assert(!p.contains("Exchange"), "bucketed changeset re-shuffled:\n" + p)
    assert(rows(cs) === rows(Upsert.changeset(snap(4), snap(0), "user_id")))
  }

  test("k9: a fresh catalog ADOPTS an existing complete layout without rewriting it") {
    // second-JVM scenario (Verify and Bench share java.io.tmpdir): the
    // files exist with _SUCCESS but the catalog is empty. ensureBucketed
    // must register an external bucketed table over them via DDL — no
    // delete, no rewrite — and the exchange-elision contract must hold
    // on the adopted table exactly as on the originally-written one.
    val (li, ord) = Bucketed.ensureOrderTables(spark, dir)
    def loc(tbl: String): String = spark.sql(s"DESCRIBE TABLE EXTENDED $tbl")
      .filter(col("col_name") === "Location").select("data_type")
      .collect().head.getString(0).stripPrefix("file:")
    val liPath = loc(li)
    def mtimes(p: String): Map[String, Long] =
      new java.io.File(p).listFiles().map(f => f.getName -> f.lastModified).toMap
    val before = mtimes(liPath)
    spark.sql(s"DROP TABLE $li")
    spark.sql(s"DROP TABLE $ord") // external drop keeps files, clears catalog
    val joined = Bucketed.bucketedOrderRevenue(spark, dir) // re-ensures via adopt
    joined.queryExecution.toRdd.count()
    assert(mtimes(liPath) === before, "adoption rewrote the layout files")
    val p = joined.queryExecution.executedPlan.toString
      .split("== Initial Plan ==", 2)(0)
    val below = p.split("SortMergeJoin", 2)(1)
    assert(!below.contains("Exchange"), "adopted layout re-shuffled:\n" + p)
    assert(below.contains("Bucketed: true"), "adopted scan did not read buckets:\n" + p)
  }

  test("k9: bucket placement agrees with repartition placement (one file per bucket)") {
    val (li, _) = Bucketed.ensureOrderTables(spark, dir)
    // every parquet part file carries its bucket id in the name
    // (…_NNNNN.c000…); one file per bucket means the pre-write
    // repartition used the same Murmur3-pmod placement as the bucket spec
    val path = spark.sql(s"DESCRIBE TABLE EXTENDED $li")
      .filter(col("col_name") === "Location").select("data_type")
      .collect().head.getString(0).stripPrefix("file:")
    val parts = new java.io.File(path).listFiles()
      .filter(f => f.getName.startsWith("part-")).map(_.getName)
    val bucketIds = parts.flatMap("_(\\d{5})\\.".r.findFirstMatchIn(_))
      .map(_.group(1).toInt)
    assert(parts.length === 8, parts.mkString(", "))
    assert(bucketIds.toSet === (0 until 8).toSet, parts.mkString(", "))
  }
}
