package graft

import graft.ext.Similarity
import graft.functions.VectorFunctions
import graft.Tables.t
import org.apache.spark.sql.functions._

/** The native FloatVectorDot expression: bit-identical to the HOF fold it
  * replaces, registered as a SQL function, and inside whole-stage codegen.
  */
class VectorExprSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("native dot == HOF fold, bit-exact, on real embeddings") {
    val e = t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"),
        reverse(col("embedding")).as("other"))
    val both = e.select(col("vec_id"),
      VectorFunctions.vecDot(col("embedding"), col("other")).as("native"),
      Similarity.dotHof("embedding", "other").as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() === 0)
    // sanity: non-trivial values
    assert(both.filter(col("native") =!= 0.0).count() > 0)
  }

  test("null and empty arrays behave like the built-ins") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Array(1.0f, 2.0f)), Some(Array(3.0f, 4.0f))),
      (2L, None, Some(Array(1.0f))),
      (3L, Some(Array.empty[Float]), Some(Array.empty[Float])))
      .toDF("id", "a", "b")
    val got = df.select(col("id"), VectorFunctions.vecDot(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(1L) === Some(11.0))
    assert(got(2L) === None)   // null-intolerant like built-in binary exprs
    assert(got(3L) === Some(0.0))
  }

  test("vec_dot is callable from SQL after registration") {
    VectorFunctions.ensureRegistered(spark)
    t(spark, dir, "embeddings").limit(5).createOrReplaceTempView("emb_v")
    val r = spark.sql(
      "SELECT vec_id, vec_dot(embedding, embedding) AS n2 FROM emb_v ORDER BY vec_id")
      .collect()
    assert(r.length === 5)
    assert(r.forall(_.getDouble(1) > 0.0))
  }

  test("the full native family is SQL-callable and matches the Column API exactly") {
    import spark.implicits._
    VectorFunctions.ensureRegistered(spark)
    // text signatures over real documents
    val docs = t(spark, dir, "documents").limit(50)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
    docs.createOrReplaceTempView("docs_v")
    val mhSql = spark.sql(
      "SELECT doc_id, minhash_sig(toks, 5, 16) AS s FROM docs_v ORDER BY doc_id").collect()
    val mhCol = docs.select(col("doc_id"),
      VectorFunctions.minhashSig(col("toks"), 5, 16).as("s"))
      .orderBy(col("doc_id")).collect()
    assert(mhSql.map(_.toSeq.toList).toSeq === mhCol.map(_.toSeq.toList).toSeq)
    val shSql = spark.sql(
      "SELECT doc_id, simhash_sig(toks, 5, 8, 8) AS s FROM docs_v ORDER BY doc_id").collect()
    val shCol = docs.select(col("doc_id"),
      VectorFunctions.simhashSig(col("toks"), 5, 8, 8).as("s"))
      .orderBy(col("doc_id")).collect()
    assert(shSql.map(_.toSeq.toList).toSeq === shCol.map(_.toSeq.toList).toSeq)
    // vector signatures over real embeddings
    val emb = t(spark, dir, "embeddings").limit(50)
    emb.createOrReplaceTempView("emb_fam_v")
    val lshSql = spark.sql(
      "SELECT vec_id, vec_lsh_sig(embedding, 8, 16) AS b FROM emb_fam_v ORDER BY vec_id").collect()
    val lshCol = emb.select(col("vec_id"),
      VectorFunctions.vecLshSig(col("embedding"), 8, 16).as("b"))
      .orderBy(col("vec_id")).collect()
    assert(lshSql.map(_.toSeq.toList).toSeq === lshCol.map(_.toSeq.toList).toSeq)
    // non-literal tuning argument is a plan-time usage error, not codegen
    val err = intercept[Exception] {
      spark.sql("SELECT minhash_sig(toks, CAST(doc_id AS INT), 16) FROM docs_v").collect()
    }
    assert(err.getMessage.contains("integer literal"),
      s"unexpected error: ${err.getMessage}")
  }

  test("expression participates in whole-stage codegen (not CodegenFallback)") {
    val e = t(spark, dir, "embeddings")
    val df = e.select(VectorFunctions.vecDot(col("embedding"), col("embedding")).as("n2"))
    df.queryExecution.toRdd.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), "vec_dot fell out of codegen:\n" + plan)
  }

  test("native LSH signature == HOF fold form, bit-exact, on real embeddings") {
    import graft.ext.Similarity
    val e = t(spark, dir, "embeddings")
    val diff = e.select(
        Similarity.lshBucket("embedding").as("native"),
        Similarity.lshBucketHof("embedding").as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(diff.count() === 0)
    // and the signature is a sane planes-bit int
    val range = e.select(Similarity.lshBucket("embedding").as("b"))
      .agg(min(col("b")), max(col("b"))).collect()(0)
    assert(range.getInt(0) >= 0 && range.getInt(1) < 256)
  }

  test("native LSH signature matches HOF on malformed vectors (bucket 0)") {
    import graft.ext.Similarity
    import spark.implicits._
    // short, long, and null-element vectors: the HOF's zip_with pads with
    // null, the fold null-propagates, when().otherwise(0) collapses every
    // plane to an unset bit — the native expression must agree exactly
    val good = Array.tabulate(64)(i => (i + 1).toFloat)
    val rows = Seq(
      (1L, good),
      (2L, good.take(10)),                       // shorter than dim
      (3L, good ++ Array(9.9f)),                 // longer than dim
      (4L, good.updated(7, null.asInstanceOf[Float])))
      .toDF("id", "embedding")
    // null element needs a real null slot, not 0.0f — build via SQL
    val withNull = rows.withColumn("embedding",
      when(col("id") === 4L,
        expr("transform(embedding, (x, i) -> CASE WHEN i = 7 THEN CAST(NULL AS FLOAT) ELSE x END)"))
        .otherwise(col("embedding")))
    val got = withNull.select(col("id"),
        Similarity.lshBucket("embedding").as("native"),
        Similarity.lshBucketHof("embedding").as("hof"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    got.foreach { case (id, (native, hof)) =>
      assert(native === hof, s"id $id: native $native != hof $hof")
    }
    assert(got(2L)._1 === 0 && got(3L)._1 === 0 && got(4L)._1 === 0)
    assert(got(1L)._1 !== 0) // the well-formed vector still buckets
  }

  test("native LSH signature stays in whole-stage codegen") {
    import graft.ext.Similarity
    val df = t(spark, dir, "embeddings")
      .select(Similarity.lshBucket("embedding").as("b"))
    df.queryExecution.toRdd.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), "vec_lsh_sig fell out of codegen:\n" + plan)
  }

  test("native e9-cosine argmax == HOF argmax, row-for-row, on real embeddings") {
    // the IVF assignment hot loop: same score quantization, same
    // lower-centroid-id tie-break as the transform+array_max form
    val embs = t(spark, dir, "embeddings")
    val cents = Similarity.ivfCentroids(embs, 16).localCheckpoint()
    val nat = Similarity.ivfAssign(embs, cents)
      .select("vec_id", "centroid_id")
    val hof = Similarity.ivfAssignHof(embs, cents)
      .select(col("vec_id"), col("centroid_id").as("hof_id"))
    val joined = nat.join(hof, "vec_id")
    // null-safe inequality: a native NULL vs a HOF id must COUNT as a
    // mismatch (=!= would return NULL and slip through the filter)
    assert(joined.filter(!(col("centroid_id") <=> col("hof_id"))).count() === 0)
    assert(joined.count() === embs.count())
    assert(nat.filter(col("centroid_id").isNull).count() === 0)
    // non-degenerate: assignment actually spreads across lists
    assert(nat.select("centroid_id").distinct().count() > 1)
  }

  test("native integer-dot argmax == HOF argmax through the full training loop") {
    // run the WHOLE Lloyd training (which assigns with the native
    // expression internally) and the HOF-assigned single round; the
    // centroid tables after round 1 must be identical, proving the
    // training-path argmax parity end-to-end
    val embs = t(spark, dir, "embeddings")
    def e6 = Similarity.ivfTrainedCentroids(embs, 16, 1)
    val viaNative = e6.collect().map(r => r.getLong(0) -> r.getSeq[Long](1))
      .toSeq.sortBy(_._1)
    // HOF twin of round 1: stride init, HOF assignment, same recenter
    import org.apache.spark.sql.functions.{posexplode, sum => fsum, count => fcount, lit, expr}
    val base = embs.select(col("vec_id"),
      expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT))").as("ve6"))
    val cent0 = Similarity.ivfCentroids(embs, 16)
      .select(col("centroid_id"),
        expr("transform(centroid, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT))").as("ce6"))
    val viaHof = Similarity.assignByDotHof(base, cent0)
      .select(col("centroid_id"), posexplode(col("ve6")).as(Seq("d", "v")))
      .groupBy(col("centroid_id"), col("d"))
      .agg(fsum(col("v")).as("s"), fcount(lit(1)).as("cnt"))
      .withColumn("m", expr("(s - pmod(s, cnt)) div cnt"))
      .groupBy(col("centroid_id"))
      .agg(expr("transform(array_sort(collect_list(struct(d, m))), p -> p.m)").as("ce6"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toSeq.sortBy(_._1)
    assert(viaNative === viaHof)
  }

  test("argmax expressions stay in whole-stage codegen") {
    // assert on the SPECIFIC plan line carrying the expression — a bare
    // plan.contains("*(") would be satisfied by the broadcast-side
    // aggregate stage even if the argmax Project fell back to interpreted
    def exprLineCodegend(df: org.apache.spark.sql.DataFrame, fn: String): Unit = {
      df.queryExecution.toRdd.count()
      val plan = df.queryExecution.executedPlan.toString
      val lines = plan.linesIterator.filter(_.contains(fn)).toSeq
      assert(lines.nonEmpty, s"$fn not found in plan:\n" + plan)
      // the tree prefix ("+- ") precedes the codegen marker, so match the
      // "*(" WITHIN the expression's own line, not at its start
      assert(lines.exists(_.contains("*(")),
        s"$fn's stage fell out of codegen:\n" + plan)
    }
    val embs = t(spark, dir, "embeddings")
    val cents = Similarity.ivfCentroids(embs, 16).localCheckpoint()
    exprLineCodegend(Similarity.ivfAssign(embs, cents), "vec_argmax_cos_e9")
    // the integer-dot variant through a packed-cents projection
    val base = embs.select(col("vec_id"),
      expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT))").as("ve6"))
    val packed = cents
      .select(col("centroid_id"),
        expr("transform(centroid, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT))").as("ce6"))
      .agg(collect_list(struct(col("centroid_id"), col("ce6"))).as("cents"))
    exprLineCodegend(
      base.crossJoin(broadcast(packed))
        .select(col("vec_id"),
          VectorFunctions.vecArgmaxDotI64(col("ve6"), col("cents")).as("cid")),
      "vec_argmax_dot_i64")
  }

  test("native PQ encode == HOF nested-argmin, row-for-row, on real embeddings") {
    val e = t(spark, dir, "embeddings")
    val cb = Similarity.pqCodebooks(e).localCheckpoint()
    val native = Similarity.pqEncode(e, cb)
      .select(col("vec_id"), col("codes").cast("array<int>").as("codes"))
    val hof = Similarity.pqEncodeHof(e, cb)
      .select(col("vec_id"), col("codes").cast("array<int>").as("codes"))
    assert(native.exceptAll(hof).count() === 0 &&
      hof.exceptAll(native).count() === 0,
      "native PQ codes diverged from the HOF argmin")
    // sanity: non-degenerate codes (more than one distinct code word used)
    assert(Similarity.pqEncode(e, cb)
      .select(explode(col("codes")).as("c")).distinct().count() > 1)
  }

  test("native ADC sum == HOF+map scoring: identical ordered candidate sets") {
    val e = t(spark, dir, "embeddings")
    val cb = Similarity.pqCodebooks(e).localCheckpoint()
    val codes = Similarity.pqEncode(e, cb).localCheckpoint()
    for (q <- Seq(0L, 7L, 42L)) {
      val nat = Similarity.pqAdcCandidates(codes, cb, e, q,
        Similarity.pqM, Similarity.pqKsub, 80).collect().map(_.getLong(0)).toSeq
      val hof = Similarity.pqAdcCandidatesHof(codes, cb, e, q,
        Similarity.pqM, Similarity.pqKsub, 80).collect().map(_.getLong(0)).toSeq
      assert(nat === hof, s"ADC candidate order diverged for query $q")
      assert(nat.size === 80)
    }
  }

  test("ADC sum: a code outside its OWN subspace range yields NULL, never a neighbor's entry") {
    // ksub=4, m=2, dt = 8 entries. code=5 in subspace 0 gives flat index
    // 5 — in range for the TABLE, but it belongs to subspace 1: a
    // flat-index-only check would silently score with a neighboring
    // subspace's distance. Encode never emits such codes; this pins the
    // corrupt-persisted-input contract from the scaladoc.
    import graft.functions.VectorFunctions.pqAdcSum
    import spark.implicits._
    val dt = typedLit((0 until 8).map(i => 100L + i))
    val cases = Seq(
      (Seq(1, 2), false), // valid: 101 + 106
      (Seq(5, 2), true),  // subspace-0 code 5 >= ksub → NULL
      (Seq(-1, 2), true), // negative code → NULL
      (Seq(1, 4), true))  // subspace-1 code 4 >= ksub → NULL
    val df = cases.map(_._1).toDF("codes")
      .select(col("codes"), pqAdcSum(col("codes"), dt, 4).as("s"))
    val expect = Seq(Some(207L), None, None, None)
    def results(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => if (r.isNullAt(1)) None else Some(r.getLong(1))).toSeq
    assert(results(df) === expect,
      s"per-subspace range check drifted (codegen path)")
    // the INTERPRETED path (nullSafeEval) must enforce the same contract —
    // run with whole-stage codegen off so eval, not doGenCode, executes
    val saved = spark.conf.get("spark.sql.codegen.wholeStage")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      assert(results(df) === expect,
        s"per-subspace range check drifted (interpreted path)")
    } finally spark.conf.set("spark.sql.codegen.wholeStage", saved)
  }

  test("PQ expressions stay in whole-stage codegen") {
    def exprLineCodegend(df: org.apache.spark.sql.DataFrame, fn: String): Unit = {
      df.queryExecution.toRdd.count()
      val plan = df.queryExecution.executedPlan.toString
      val lines = plan.linesIterator.filter(_.contains(fn)).toSeq
      assert(lines.nonEmpty, s"$fn not found in plan:\n" + plan)
      assert(lines.exists(_.contains("*(")),
        s"$fn's stage fell out of codegen:\n" + plan)
    }
    val e = t(spark, dir, "embeddings")
    val cb = Similarity.pqCodebooks(e).localCheckpoint()
    exprLineCodegend(Similarity.pqEncode(e, cb), "pq_nearest_codes")
    val codes = Similarity.pqEncode(e, cb).localCheckpoint()
    exprLineCodegend(Similarity.pqAdcCandidates(codes, cb, e, 0L,
      Similarity.pqM, Similarity.pqKsub, 80), "pq_adc_sum")
  }
}
