package graft.ext

import graft.{Q, QModule}
import graft.Tables.t
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (extension tier;
  * Array[Float] 64-dim vectors, FIXTURES.md §B).
  *
  * Cosine is computed by an in-order higher-order-function fold with every
  * element cast to double *before* multiplying — the fold order is the list
  * order in both Spark and DuckDB, so results are bit-identical and
  * hash-comparable (no UDF, stays in the optimized expression path).
  *
  * Scale posture: brute-force top-k is one map stage + TakeOrderedAndProject
  * (no shuffle of the vectors); exact all-pairs is grid-sharded into
  * independent tiles (`cosinePairs` — O(n·blocks) shuffle, no nested-loop
  * broadcast); top-k ANN probes LSH buckets (multi-probe) or IVF inverted
  * lists, both with exact re-rank inside the probed candidates.
  */
object Similarity {

  /** In-order fold sum of a double-array SQL expression (reference
    * semantics for the native expression below; kept for documentation
    * and spec cross-checks). */
  private def foldSum(arrExpr: String): String =
    s"aggregate($arrExpr, CAST(0 AS DOUBLE), (acc, v) -> acc + v)"

  /** HOF-fold dot product as SQL text (the single definition of the
    * in-order double fold — VectorExprSpec pins its bit-equality with the
    * native vecDot; ivfAssignHof's per-centroid lambda reuses this exact
    * string, and the production ivfAssign path is covered through the
    * separate native-vs-HOF argmax parity spec). */
  private[ext] def dotHofStr(a: String, b: String): String = foldSum(
    s"zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE))")

  /** HOF-fold dot product — semantically identical to vecDot but
    * CodegenFallback (interpreted per element); used only as the
    * cross-check baseline in SimilarityExprSpec. */
  def dotHof(a: String, b: String): Column = expr(dotHofStr(a, b))

  /** dot(a, b): native codegen'd expression, double accumulation in
    * element order (graft.functions.FloatVectorDot). */
  def dot(a: String, b: String): Column =
    graft.functions.VectorFunctions.vecDot(col(a), col(b))

  def norm(a: String): Column = sqrt(dot(a, a))

  def cosine(a: String, b: String): Column = dot(a, b) / norm(a) / norm(b)

  /** Cosine in integer nano-units: the two engines' fold sums can differ in
    * the last ulp (~1e-16), so hash-compared outputs carry
    * floor(cosine·1e9 + 0.5) instead of the raw double. */
  def cosineE9(c: Column): Column = floor(c * 1e9 + 0.5).cast("long")

  /** Brute-force cosine top-k against one query vector. Ranking (not just
    * the output column) uses the e9-quantized cosine with a vec_id
    * tie-break, so the rows selected at the LIMIT-k boundary are immune to
    * cross-engine fold-order ulp drift. */
  def topK(embeddings: DataFrame, queryVecId: Long, k: Int): DataFrame =
    embeddings.as("e")
      .crossJoin(broadcast(embeddings.filter(col("vec_id") === queryVecId)
        .select(col("embedding").as("q"))))
      .filter(col("vec_id") =!= queryVecId)
      .select(col("vec_id"), cosineE9(cosine("embedding", "q")).as("cosine_e9"))
      .orderBy(col("cosine_e9").desc, col("vec_id").asc)
      .limit(k)

  // --- LSH-bucketed ANN (the 100 TB path) --------------------------------

  /** Deterministic ±1 hyperplane weights: the low bit of the first byte of
    * md5("p:d"). md5 is computable identically in any engine (and in the
    * DuckDB oracle as ('0x'||substr(md5(p||':'||d),1,2))::INT & 1), so the
    * bucketing is replayable outside Spark. */
  def planeWeights(planes: Int, dim: Int): Array[Array[Int]] =
    org.apache.spark.sql.graftshim.LshWeights.planeWeights(planes, dim)

  /** Random-hyperplane signature bucket (int of `planes` sign bits). The
    * projection quantizes each element to integer micro-units BEFORE the
    * signed sum — integer addition is fold-order-independent, so the sign
    * (unlike a float fold) is bit-identical across engines.
    *
    * Native codegen expression (VectorLshSignature): all plane
    * projections in ONE whole-stage-codegen pass per vector, vs `planes`
    * interpreted HOF folds — the index-build hot loop at 100 TB.
    * `lshBucketHof` keeps the built-in form as the spec cross-check
    * baseline (VectorExprSpec proves bit-equality on real vectors). */
  def lshBucket(embCol: String, planes: Int = 8, dim: Int = 64): Column =
    graft.functions.VectorFunctions.vecLshSig(col(embCol), planes, dim)

  /** HOF reference form of lshBucket — semantically identical,
    * CodegenFallback; used only as the spec cross-check baseline. */
  def lshBucketHof(embCol: String, planes: Int = 8, dim: Int = 64): Column = {
    val ws = planeWeights(planes, dim)
    val bits = (0 until planes).map { p =>
      val arr = ws(p).mkString("array(", ",", ")")
      val proj = expr(
        s"""aggregate(
           |  zip_with($embCol, $arr,
           |    (x, w) -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT) * w),
           |  CAST(0 AS BIGINT), (acc, v) -> acc + v)""".stripMargin)
      when(proj >= 0, lit(1 << p)).otherwise(lit(0))
    }
    bits.reduce(_ + _)
  }

  // --- IVF-style ANN (coarse quantizer + probed lists) -------------------

  /** Train-time index sizing: `nlist ≈ √n`, clamped to [16, 4096] — the
    * classic IVF balance point (≈√n lists of ≈√n vectors keeps both the
    * centroid scan and the probed-list scan O(√n) per query). The floor
    * keeps tiny corpora from degenerating to a handful of lists; the cap
    * bounds the broadcast centroid table (4096 × dim e6-longs ≈ 2 MB at
    * dim 64) so assignment stays a cheap map-side broadcast at any corpus
    * size — at 100 TB you'd raise the cap with executor memory, not the
    * formula. Derived once per training from one COUNT; the oracled
    * queries replay the same formula in SQL, so the derived index stays
    * hash-checkable. */
  def autoNlist(n: Long): Int =
    math.max(16, math.min(4096, math.floor(math.sqrt(n.toDouble)).toInt))

  /** Probe width scales WITH the list count (fixed 3/8 of the lists,
    * floored at the legacy 6): a fixed absolute nprobe would silently
    * shrink the probed corpus fraction as √n grows and recall would decay
    * with scale; a fixed fraction keeps recall roughly flat while per-
    * query cost stays O(fraction · n). Callers trade recall for speed by
    * passing nprobe explicitly.
    *
    * The measured nprobe→recall trade for the COMPOSED IVF×PQ index
    * (PERF.md §ivfpq-curve, sf0.1, nlist=42 derived): nprobe 4 → 0.55,
    * 8 → 0.66, 16 (derived 3/8) → 0.765, 42 (probe-all) → 0.79 recall@10,
    * at ~flat 0.3–0.44 s/query — probing buys recall almost linearly up
    * to the derived point, then saturates at the PQ quantization ceiling
    * (the residual 0.21 is ADC ranking error, recoverable only by raising
    * `refine` or `m`, not nprobe). AnnRecallFloorSpec pins recall@10 ≥ 0.7
    * at derived settings on the sf0.01 fixture so a centroid-training or
    * encoding refactor that silently degrades recall fails CI rather than
    * shipping hash-green. */
  def autoNprobe(nlist: Int): Int = math.max(6, nlist * 3 / 8)

  /** Deterministic coarse centroids: every (n/nlist)-th vector by vec_id —
    * a seedless, reproducible stand-in for k-means (at 100 TB you train
    * centroids once offline; assignment below is the scale path).
    *
    * Selection is a pure stride PREDICATE on vec_id (`vec_id % stride = 0
    * and vec_id < stride*nlist`, stride from a broadcast scalar count) —
    * no global single-partition row_number window, so the pass over the
    * vectors stays map-shaped at any scale. Assumes the table's dense
    * 0..n-1 id contract (TESTDATA.md); with sparse ids you'd train real
    * centroids offline anyway. */
  def ivfCentroids(embeddings: DataFrame, nlist: Int): DataFrame = {
    val n = embeddings.agg(count(lit(1)).as("n"))
    embeddings.crossJoin(broadcast(n))
      .withColumn("stride", greatest(floor(col("n") / nlist), lit(1)).cast("long"))
      .filter(col("vec_id") % col("stride") === 0 &&
              col("vec_id") < col("stride") * nlist)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid"))
  }

  // --- k-means-trained IVF: integer Lloyd iteration ----------------------

  /** e6-quantized integer copy of a float-vector column: every training
    * step downstream is then EXACT BIGINT arithmetic — a k-means loop on
    * raw doubles would let a 1-ulp fold-order divergence at one
    * assignment boundary cascade through the centroid means into a
    * different index on each engine; the integer loop cannot diverge. */
  private def e6Vec(colName: String): Column = expr(
    s"transform($colName, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT))")

  private def intDot(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v)"

  /** Map-side argmax assignment by exact integer dot: the centroid table
    * is packed into ONE broadcast array-of-structs row and the argmax is a
    * single native codegen expression per vector (VectorArgmaxDotLong) —
    * no ×nlist row fan-out and NO shuffle (the r5 form expanded
    * crossJoin(cent) then took argmax through a row_number window
    * partitioned by vec_id, i.e. a full shuffle of n×nlist rows; at
    * 100 TB of embeddings that is a 16×-corpus exchange for what is
    * logically a map). Ties go to the lower centroid id — exactly the
    * (dotv, -id) struct max of the HOF baseline `assignByDotHof`, which
    * ExtensionSpec pins row-for-row against this. PlanHygieneSpec pins
    * the no-Exchange / no-Window shape. */
  private def assignByDot(base: DataFrame, cent: DataFrame): DataFrame =
    base.crossJoin(broadcast(
        cent.agg(collect_list(struct(col("centroid_id"), col("ce6"))).as("cents"))))
      .withColumn("centroid_id",
        graft.functions.VectorFunctions.vecArgmaxDotI64(col("ve6"), col("cents")))
      .drop("cents")

  /** HOF baseline of assignByDot — semantically identical argmax via
    * transform + array_max (CodegenFallback, nlist×dim interpreted lambda
    * dispatches per vector); kept ONLY as the spec cross-check proving
    * the native expression's tie-break and score parity. */
  private[graft] def assignByDotHof(base: DataFrame, cent: DataFrame): DataFrame =
    base.crossJoin(broadcast(
        cent.agg(collect_list(struct(col("centroid_id"), col("ce6"))).as("cents"))))
      .withColumn("centroid_id", expr(
        s"""-array_max(transform(cents, c -> named_struct(
           |  'dotv', ${intDot("ve6", "c.ce6")},
           |  'ncid', -c.centroid_id))).ncid""".stripMargin))
      .drop("cents")

  /** Lloyd rounds for the trained IVF index — single source of truth for
    * the Spark trainer AND the generated oracle CTE rounds
    * (SimilarityQueries.duckLloydRounds). */
  val ivfKmeansIters = 3

  /** Lloyd iterations over the stride-initialized centroids: assign every
    * vector by integer dot (map-only, broadcast centroids), recenter each
    * list at the per-dimension FLOOR mean (floor-div via the pmod
    * identity, so both engines agree on negative sums where trunc-div and
    * floor-div differ). Mergeable aggregates only: each update is
    * posexplode → hash-agg on (centroid, dim) → re-pack — at 100 TB one
    * shuffle of (nlist × dim) partial sums per round. Centroids that lose
    * every member drop out, same in the oracle replay.
    *
    * Runs up to `iters` rounds with a fixed-point early stop: integer
    * Lloyd is a deterministic map on the centroid table, so once a round
    * reproduces its input table every later round is a no-op — which is
    * exactly why the early stop stays oracle-replayable (the oracle just
    * unrolls all `iters` rounds; converged rounds rewrite the same table).
    * The convergence probe collects the ≤ nlist-row centroid table —
    * driver-side by nature (nlist is small by design), never the vectors. */
  def ivfTrainedCentroids(embeddings: DataFrame, nlist: Int = 0,
                          iters: Int = ivfKmeansIters): DataFrame = {
    val nl = if (nlist > 0) nlist else autoNlist(embeddings.count())
    val base = spread(embeddings).select(col("vec_id"), e6Vec("embedding").as("ve6"))
    def recenter(cent: DataFrame): DataFrame =
      assignByDot(base, cent)
        .select(col("centroid_id"), posexplode(col("ve6")).as(Seq("d", "v")))
        .groupBy(col("centroid_id"), col("d"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("cnt"))
        .withColumn("m", expr("(s - pmod(s, cnt)) div cnt"))
        .groupBy(col("centroid_id"))
        .agg(expr("transform(array_sort(collect_list(struct(d, m))), p -> p.m)")
          .as("ce6"))
    def snapshot(cent: DataFrame): Seq[(Long, Seq[Long])] =
      cent.collect().map(r =>
        r.getLong(0) -> r.getSeq[Long](1)).toSeq.sortBy(_._1)
    var cent = ivfCentroids(embeddings, nl)
      .select(col("centroid_id"), e6Vec("centroid").as("ce6"))
      .localCheckpoint()
    var prev = snapshot(cent)
    var converged = false
    var i = 0
    while (i < iters && !converged) {
      cent = recenter(cent).localCheckpoint()
      val cur = snapshot(cent)
      converged = cur == prev
      prev = cur
      i += 1
    }
    cent
  }

  /** IVF ANN over the k-means-trained index: probe the `nprobe` lists
    * whose trained centroid has the highest integer dot with the query,
    * exact e9-cosine re-rank inside them. Training, assignment and probe
    * selection are all-integer (engine-exact); only the final ranking
    * touches floats, with the established e9 guard.
    *
    * PRECONDITION on a caller-supplied `centroids`: it must already be
    * materialized (localCheckpoint'd / cached / read from storage). The
    * table feeds BOTH the assignment broadcast and the probe cross-join,
    * so a lazy DataFrame would re-execute its full lineage twice per
    * query. `ivfTrainedCentroids` returns it checkpointed; train once
    * and pass that handle (the production posture — Recall.scala,
    * ExtensionSpec). */
  def ivfTrainedTopK(embeddings: DataFrame, queryVecId: Long, k: Int,
                     nlist: Int = 0, nprobe: Int = 0,
                     neighborProbes: Int = 0,
                     centroids: Option[DataFrame] = None,
                     assigned: Option[DataFrame] = None): DataFrame = {
    // 0 = derive from the corpus (autoNlist/autoNprobe); explicit values win
    val nl = if (nlist > 0) nlist else autoNlist(embeddings.count())
    val np = if (nprobe > 0) nprobe else autoNprobe(nl)
    // the trained table feeds BOTH the assignment broadcast and the
    // probe cross-join; ivfTrainedCentroids returns it already
    // localCheckpoint'd (its training loop materializes per round), so no
    // re-checkpoint here — in particular a caller-passed precomputed
    // `centroids` (train once, the production posture; Recall.scala,
    // ExtensionSpec) is used as-is instead of being re-materialized per
    // query as it was in r5.
    val cent = centroids.getOrElse(ivfTrainedCentroids(embeddings, nl))
    // `assigned` is the second train-once handle (the INDEX itself): at
    // serving time the per-vector list assignment is a materialized table,
    // not a per-query recompute over the whole corpus — callers serving
    // many queries pass ivfTrainedAssign(...) once (ScaleBench ann mode
    // measures the difference: per-query assignment dwarfs the probe scan
    // as the corpus grows). Like `centroids`, it must be materialized.
    val assignedDf = assigned.getOrElse(
      ivfTrainedAssign(embeddings, cent))
    val qv = embeddings.filter(col("vec_id") === queryVecId)
      .select(e6Vec("embedding").as("qe6"), col("embedding").as("q"))
    val scored = cent.crossJoin(broadcast(qv))
      .withColumn("dotv", expr(intDot("ce6", "qe6")))
    val topProbed = scored
      .orderBy(col("dotv").desc, col("centroid_id").asc)
      .limit(np)
      .select(col("centroid_id"))
    // Multi-probe (opt-in, off in the oracled query): widen the probe set
    // with the `neighborProbes` centroids closest (by the same exact
    // integer dot) to the BEST query centroid, excluding lists already
    // probed. Selection stays all-integer with centroid-id tie-breaks —
    // deterministic and oracle-replayable like the base path. Everything
    // here touches only the ≤nlist-row centroid table; the corpus-side
    // cost is identical to plain nprobe+neighborProbes lists.
    val probed =
      if (neighborProbes <= 0) topProbed
      else {
        val best = scored
          .orderBy(col("dotv").desc, col("centroid_id").asc)
          .limit(1).select(col("ce6").as("be6"))
        val extra = cent.crossJoin(broadcast(best))
          .withColumn("ndot", expr(intDot("ce6", "be6")))
          .join(topProbed, Seq("centroid_id"), "left_anti")
          .orderBy(col("ndot").desc, col("centroid_id").asc)
          .limit(neighborProbes)
          .select(col("centroid_id"))
        topProbed.union(extra)
      }
    assignedDf.join(broadcast(probed), Seq("centroid_id"))
      .crossJoin(broadcast(qv))
      .filter(col("vec_id") =!= queryVecId)
      .select(col("vec_id"), cosineE9(cosine("embedding", "q")).as("cosine_e9"))
      .orderBy(col("cosine_e9").desc, col("vec_id").asc)
      .limit(k)
  }

  /** The trained-IVF index table: every vector with its assigned list id
    * (embedding + its e6 copy carried for the probe-scan re-rank). Build
    * ONCE per corpus after training and pass to ivfTrainedTopK /
    * ivfProbedCount — at 100 TB this is the partitioned index on storage
    * (partitionBy centroid_id, so a probe reads only its lists), never a
    * per-query recompute. Assignment itself is the map-only broadcast
    * argmax of `assignByDot`. */
  def ivfTrainedAssign(embeddings: DataFrame, centroids: DataFrame): DataFrame =
    assignByDot(spread(embeddings).select(col("vec_id"), col("embedding"),
      e6Vec("embedding").as("ve6")), centroids)

  /** Coarse GROUPS over a trained centroid table — the second level of
    * the two-level quantizer ([[ivfTrainedAssignPruned]]): the nlist
    * centroids are themselves Lloyd-clustered into g ≈ √nlist groups
    * (their ce6 vectors re-floated as a tiny (vec_id, embedding) corpus
    * and densely re-id'd, since surviving centroid ids are sparse — the
    * same density contract the trainers' stride seeders assume), then
    * each centroid is assigned to its group by the EXACT integer dot.
    * Returns (gid, gce6, members:[(id, ce6)]); one row per group. Cost:
    * Lloyd over nlist rows + one nlist×g assignment — index-parameter
    * sized, never corpus sized. */
  def ivfSuperGroups(centroids: DataFrame, groups: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nl = centroids.count()
    val g = if (groups > 0) groups
      else math.max(1, math.floor(math.sqrt(nl.toDouble)).toInt)
    val asEmb = denseReId(centroids.select(col("centroid_id").as("vec_id"),
      expr("transform(ce6, x -> CAST(x / 1000000.0D AS FLOAT))")
        .as("embedding")))
    val supers = ivfTrainedCentroids(asEmb, g)
      .select(col("centroid_id").as("gid0"), col("ce6").as("ce6"))
      .localCheckpoint()
    // Lloyd supers alone give geometric coherence but WILDLY unequal
    // sizes on clustered data (measured: top 3/8 of the groups held ~94%
    // of the members, so pruning saved nothing — §assignment-budget).
    // BALANCE by re-chunking: order centroids by (assigned super, id) so
    // same-super members stay adjacent, then cut equal chunks of
    // ceil(nlist/g); the per-vector pruned cost becomes STRICTLY
    // (g + probe·nlist/g)·dim. The window is a single-partition sort
    // over the ≤nlist-row centroid table (index parameters, same bounded
    // class as the trainer's convergence snapshots). Each chunk's group
    // centroid is the per-dimension floor-mean of its members.
    val cap = (nl + g - 1) / g
    val chunked = assignByDot(
        centroids.select(col("centroid_id").as("cid"), col("ce6").as("ve6")),
        supers.select(col("gid0").as("centroid_id"), col("ce6")))
      .select(col("centroid_id").as("gid0"), col("cid"), col("ve6"))
      .withColumn("gid", ((row_number().over(
        Window.orderBy(col("gid0"), col("cid"))) - 1) / cap).cast("long"))
    val gce = chunked
      .select(col("gid"), posexplode(col("ve6")).as(Seq("d", "v")))
      .groupBy(col("gid"), col("d"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("cnt"))
      .withColumn("m", expr("(s - pmod(s, cnt)) div cnt"))
      .groupBy(col("gid"))
      .agg(expr("transform(array_sort(collect_list(struct(d, m))), p -> p.m)")
        .as("gce6"))
    chunked.groupBy(col("gid"))
      .agg(collect_list(struct(col("cid").as("id"), col("ve6").as("ce6")))
        .as("members"))
      .join(gce, Seq("gid"))
      .select(col("gid"), col("gce6"), col("members"))
  }

  /** Two-level (coarse-pruned) assignment — the large-nlist epoch-build
    * knob. Flat assignment ([[ivfTrainedAssign]]) is O(nlist·dim)
    * multiplies per vector: at 100M vectors × 10k lists that term IS the
    * epoch budget (§assignment-budget measures the curve). This path
    * scores g ≈ √nlist group centroids exactly, keeps the top
    * `probeGroups`, and runs the exact argmax only over those groups'
    * members — (g + probeGroups·nlist/g)·dim per vector, one native
    * codegen expression (`VectorArgmaxTwoLevelDot`), same map-only
    * no-Exchange plan shape as the flat path.
    *
    * APPROXIMATE by design at probeGroups < g (the true nearest list is
    * missed iff its group ranks below the probe cut — agreement measured
    * in TwoLevelAssignSpec and §assignment-budget; a missed assignment
    * puts the vector in a near-best list, the standard two-level
    * quantizer trade that costs probe recall only marginally). With
    * probeGroups >= g it is EXACTLY the flat argmax (spec-pinned row for
    * row), so the knob degrades to exact. Opt-in: every oracled path
    * keeps the flat exact assignment. */
  def ivfTrainedAssignPruned(embeddings: DataFrame, centroids: DataFrame,
                             groups: Int = 0, probeGroups: Int = 0,
                             grouped: Option[DataFrame] = None): DataFrame = {
    val nl = centroids.count()
    val g = if (groups > 0) groups
      else math.max(1, math.floor(math.sqrt(nl.toDouble)).toInt)
    // default probe width g/8: the two-level savings ceiling is
    // ~(g/probe)× on the member term (probing 3/8 of the groups caps the
    // whole path at 2.7× — measured, §assignment-budget), so the default
    // sits at the aggressive-but-standard 12.5% with agreement measured;
    // callers trade assignment fidelity for build cost through this knob
    val c = if (probeGroups > 0) probeGroups else math.max(2, g / 8)
    // `grouped` is the train-once handle (ivfSuperGroups output,
    // materialized) — the group build is index-parameter-sized but pays
    // Lloyd rounds; a serving/build loop computes it once per epoch, not
    // per assignment pass (AssignBench sweep measures the difference)
    val packed = grouped.getOrElse(ivfSuperGroups(centroids, g))
      .agg(collect_list(struct(col("gid"), col("gce6"), col("members")))
        .as("grps"))
    spread(embeddings)
      .select(col("vec_id"), col("embedding"), e6Vec("embedding").as("ve6"))
      .crossJoin(broadcast(packed))
      .withColumn("centroid_id",
        graft.functions.VectorFunctions.vecArgmaxTwoLevelI64(
          col("ve6"), col("grps"), c))
      .drop("grps")
  }

  /** Assign each vector to its nearest centroid — genuinely map-only AND
    * codegen'd: the centroid table (with its norm precomputed once per
    * centroid) is packed into ONE broadcast array row and the e9-cosine
    * argmax is a single native expression per vector
    * (VectorArgmaxE9Cosine), so there is no ×nlist fan-out, no Exchange
    * on vec_id (the r5 form shuffled n×nlist rows through a row_number
    * window — a 16×-corpus shuffle at 100 TB), and no interpreted lambda
    * dispatch (the intermediate HOF form, kept below as `ivfAssignHof`,
    * was map-only but 4.7× the CPU — AssignBench). Ranking uses the
    * e9-quantized cosine so the argmax is engine-independent; ties to
    * the lower centroid id. */
  def ivfAssign(embeddings: DataFrame, centroids: DataFrame): DataFrame =
    spread(embeddings).crossJoin(broadcast(packedCents(centroids)))
      .select(col("vec_id"), col("embedding"),
        graft.functions.VectorFunctions.vecArgmaxCosE9(col("embedding"),
          col("cents")).as("centroid_id"))

  private def packedCents(centroids: DataFrame): DataFrame =
    centroids.select(col("centroid_id"), col("centroid"),
        norm("centroid").as("cnorm"))
      .agg(collect_list(struct(col("centroid_id"), col("centroid"),
        col("cnorm"))).as("cents"))

  /** HOF baseline of ivfAssign — same broadcast-array argmax via
    * transform + array_max with the spec-pinned in-order fold dot
    * (dotHofStr); kept ONLY as the spec cross-check for the native
    * expression. */
  private[graft] def ivfAssignHof(embeddings: DataFrame, centroids: DataFrame): DataFrame = {
    val hofDot = dotHofStr("embedding", "c.centroid")
    embeddings.crossJoin(broadcast(packedCents(centroids)))
      .withColumn("enorm", norm("embedding"))
      .withColumn("centroid_id", expr(
        s"""-array_max(transform(cents, c -> named_struct(
           |  'sim_e9', CAST(floor($hofDot / enorm / c.cnorm * 1e9 + 0.5) AS BIGINT),
           |  'ncid', -c.centroid_id))).ncid""".stripMargin))
      .select(col("vec_id"), col("embedding"), col("centroid_id"))
  }

  /** IVF ANN: rank centroids against the query, probe the top `nprobe`
    * inverted lists, exact re-rank inside them. */
  def ivfTopK(embeddings: DataFrame, queryVecId: Long, k: Int,
              nlist: Int = 0, nprobe: Int = 0): DataFrame = {
    val nl = if (nlist > 0) nlist else autoNlist(embeddings.count())
    val np = if (nprobe > 0) nprobe else autoNprobe(nl)
    val centroids = ivfCentroids(embeddings, nl)
    val assigned = ivfAssign(embeddings, centroids)
    val q = embeddings.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("q"))
    val probed = centroids.crossJoin(broadcast(q))
      .withColumn("sim_e9", cosineE9(cosine("centroid", "q")))
      .orderBy(col("sim_e9").desc, col("centroid_id").asc)
      .limit(np)
      .select(col("centroid_id"))
    assigned.join(broadcast(probed), Seq("centroid_id"))
      .crossJoin(broadcast(q))
      .filter(col("vec_id") =!= queryVecId)
      .select(col("vec_id"), cosineE9(cosine("embedding", "q")).as("cosine_e9"))
      .orderBy(col("cosine_e9").desc, col("vec_id").asc)
      .limit(k)
  }

  /** ANN via multi-probe random-hyperplane LSH: probe every bucket within
    * Hamming distance `hamming` of the query's signature, exact re-rank
    * inside the probed buckets.
    *
    * Parameter choice is measured, not guessed (PERF.md §ANN): the test
    * corpus's true top-10 neighbors sit at cosine ≈ 0.4–0.6 (per-plane
    * agreement ≈ 0.63), so with 8 planes their signatures differ from the
    * query's in 1–4 bits. A single-bucket probe (the r2 wiring, 12 planes)
    * found ~nothing; 8 planes + Hamming≤3 multi-probe reaches recall@10 =
    * 0.7/0.8/0.8 at sf0.001/0.01/0.1 while scanning ~36 % of the corpus.
    * The probe is an enumerated equi-join — the query side explodes its
    * ≤ C(planes,≤hamming) probe bucket ids and broadcast-hash-joins the
    * bucketed index, so at scale only the probed buckets are read. */
  def annTopK(embeddings: DataFrame, queryVecId: Long, k: Int,
              planes: Int = 8, hamming: Int = 3): DataFrame = {
    val bucketed = embeddings.withColumn("bucket", lshBucket("embedding", planes))
    val qb = bucketed.filter(col("vec_id") === queryVecId)
      .select(col("bucket").as("qbucket"), col("embedding").as("q"))
      .select(explode(expr(
        s"filter(sequence(0, ${(1 << planes) - 1}), r -> bit_count(r ^ qbucket) <= $hamming)"))
        .as("bucket"), col("q"))
    bucketed.join(broadcast(qb), Seq("bucket"))
      .filter(col("vec_id") =!= queryVecId)
      .select(col("vec_id"), cosineE9(cosine("embedding", "q")).as("cosine_e9"))
      .orderBy(col("cosine_e9").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Batch ANN JOIN — the production retrieval shape: EVERY query vector
    * gets its approximate top-k neighbors in ONE job through the same
    * stride-IVF index as `ivfTopK` (which answers one query at a time).
    * Query set = the `vec_id % queryMod == 0` slice (a held-out panel);
    * corpus = the whole table, self-match excluded. This is the engine
    * under semantic dedup, retrieval-based decontamination, and
    * train/eval leakage scans — all "for each of N queries, its
    * neighbors" jobs, where a per-query driver loop would be N round
    * trips.
    *
    * Never queries × corpus. Three bounded stages:
    * 1. corpus assignment: the map-only codegen argmax (`ivfAssign`) —
    *    no shuffle, no fan-out;
    * 2. probe selection: queries fan out only against the ≤nlist-row
    *    broadcast centroid table, and a per-query rank<=nprobe keeps
    *    `queries × nprobe` probe rows (WindowGroupLimit bounds the
    *    window's input before any exchange);
    * 3. candidate join: probes ⋈ index on centroid_id — an equi-join
    *    whose output is ≈ queries · nprobe · n/nlist candidate rows (the
    *    IVF contract), exact e9-cosine re-rank, per-query rank<=k
    *    (WindowGroupLimit again). AQE picks broadcast vs shuffle for the
    *    probe side by size; at 100 TB the index is partitioned by
    *    centroid_id on storage (see `ivfTrainedAssign`) so each probed
    *    list is a pruned read.
    *
    * All ranking compares e9-quantized cosines with id tie-breaks, so
    * the result is deterministic and oracle-replayable like the
    * single-query path. */
  def ivfAnnJoin(embeddings: DataFrame, queryMod: Long, k: Int,
                 nlist: Int = 0, nprobe: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nl = if (nlist > 0) nlist else autoNlist(embeddings.count())
    val np = if (nprobe > 0) nprobe else autoNprobe(nl)
    val centroids = ivfCentroids(embeddings, nl)
    val assigned = ivfAssign(embeddings, centroids)
    val queries = embeddings.filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("q"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("sim_e9").desc, col("centroid_id").asc)
    val probes = queries.crossJoin(broadcast(centroids))
      .withColumn("sim_e9", cosineE9(cosine("centroid", "q")))
      .withColumn("prk", row_number().over(wProbe))
      .filter(col("prk") <= np)
      .select(col("query_id"), col("q"), col("centroid_id"))
    val wK = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_e9").desc, col("vec_id").asc)
    assigned.join(probes, Seq("centroid_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosineE9(cosine("embedding", "q")).as("cosine_e9"))
      .withColumn("rk", row_number().over(wK).cast("long"))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("vec_id"), col("cosine_e9"))
      .orderBy(col("query_id"), col("rk"))
  }

  /** Scanned-set size of a trained-IVF probe (measurement harness only —
    * graft.ScaleBench `ann` mode): how many corpus vectors fall inside the
    * `nprobe` probed lists for this query. This is the number the index
    * trades against brute force's n — the recall/scan frontier PERF.md
    * §ann quotes is (recall, scanned/n) pairs per corpus factor. Probe
    * selection is the exact integer-dot ranking of ivfTrainedTopK. */
  def ivfProbedCount(embeddings: DataFrame, queryVecId: Long, nprobe: Int,
                     centroids: DataFrame,
                     assigned: Option[DataFrame] = None): Long = {
    val qv = embeddings.filter(col("vec_id") === queryVecId)
      .select(e6Vec("embedding").as("qe6"))
    val probed = centroids.crossJoin(broadcast(qv))
      .withColumn("dotv", expr(intDot("ce6", "qe6")))
      .orderBy(col("dotv").desc, col("centroid_id").asc)
      .limit(nprobe)
      .select(col("centroid_id"))
    assigned.getOrElse(ivfTrainedAssign(embeddings, centroids))
      .join(broadcast(probed), Seq("centroid_id"))
      .count()
  }

  /** EXACT all-pairs cosine ≥ thresh over dense vectors, grid-distributed.
    *
    * Dense high-dim exact all-pairs is intrinsically O(n²) COMPUTE — no
    * bucketing scheme can keep 100 % recall at thresh 0.4 (≈ 66°; per-plane
    * LSH agreement 0.63 vs 0.5 random — measured: the 59 true pairs at
    * sf0.01 span Hamming 0–6 of 8 bits, so any pruning bucket join drops
    * some). What CAN be fixed is the execution shape: instead of the r2
    * BroadcastNestedLoopJoin (single-node, driver-broadcast n²), the self
    * join is sharded over a `blocks`×`blocks` grid: row side replicates to
    * its row-block crossed with every column block, column side vice versa,
    * equi-join on the (bi, bj) cell. Shuffle is O(n·blocks) and each of the
    * blocks² cells is an independent (n/blocks)² tile — the standard
    * distributed theta-join, linear speedup in executors. At production
    * dedup thresholds (≥ 0.9) use MinHash/SimHash instead (Dedup.scala);
    * for top-k shapes use annTopK/ivfTopK, which accept recall < 1.
    *
    * The ≥-thresh predicate compares e9-quantized cosines, so the boundary
    * is immune to cross-engine fold ulp drift. */
  def cosinePairs(embeddings: DataFrame, thresh: Double, blocks: Int = 8): DataFrame = {
    val threshE9 = math.floor(thresh * 1e9 + 0.5).toLong
    val left = embeddings
      .select(col("vec_id").as("vec_i"), col("embedding").as("ei"),
        pmod(col("vec_id"), lit(blocks)).cast("int").as("bi"))
      .withColumn("bj", explode(expr(s"sequence(0, ${blocks - 1})")))
    val right = embeddings
      .select(col("vec_id").as("vec_j"), col("embedding").as("ej"),
        pmod(col("vec_id"), lit(blocks)).cast("int").as("bj"))
      .withColumn("bi", explode(expr(s"sequence(0, ${blocks - 1})")))
    left.join(right, Seq("bi", "bj"))
      .filter(col("vec_i") < col("vec_j"))
      .select(col("vec_i"), col("vec_j"),
        cosineE9(cosine("ei", "ej")).as("cosine_e9"))
      .filter(col("cosine_e9") >= threshE9)
  }

  // --- Product quantization (PQ): compressed codes + ADC scan ------------

  /** PQ geometry: `pqM` subspaces of `pqDim/pqM` dims, `pqKsub` codes per
    * subspace. 64 floats (256 B) compress to 16 one-byte codes + one shared
    * 512-entry codebook — a 16× corpus shrink. THIS is the piece that makes
    * 100 TB of embeddings scannable: IVF prunes WHICH vectors a query
    * reads, PQ shrinks WHAT a read costs; at scale you run both (the codes
    * table replaces the vector table in the probe scan and only the
    * re-rank candidates fetch full vectors). Geometry is MEASURED, not
    * guessed (graft.PqSweep, sf0.1): (m=8,k=16) 0.54, (m=8,k=32) 0.64,
    * (m=16,k=16) 0.73, (m=16,k=32) 0.90 recall@10 at refine=8 — finer
    * subspaces beat more codes per subspace at equal code bytes. */
  val pqDim = 64
  val pqM = 16
  val pqKsub = 32
  val pqKmeansIters = 2

  /** (vec_id, ne6): e6 copy of the UNIT-normalIZED vector, engine-exact.
    * The norm² is an exact BIGINT (sum of e6 squares), so both engines feed
    * the SAME integer into one correctly-rounded IEEE sqrt and one divide
    * per element — no cross-engine fold-order ulp can exist. Normalizing
    * matters because on the unit sphere squared-L2 order ≡ cosine order
    * (L2² = 2 − 2·cos), which is what lets the PQ ADC scan rank by an
    * integer L2 table and still approximate the cosine truth (unnormalized
    * ADC measured recall@10 0.40–0.54; normalized 0.7+ — Recall.scala).
    * The 1e-12 floor only guards an all-zero vector against NaN codes. */
  /** Dev-harness view of pqNormed (graft.EncodeProbe stage timing). */
  private[graft] def pqNormedProbe(embeddings: DataFrame): DataFrame =
    pqNormed(embeddings)

  /** Vector-tier alias of the shared under-partitioned-source guard
    * (see Tables.spread — the EncodeProbe measurement lives there). */
  private def spread(df: DataFrame): DataFrame = graft.Tables.spread(df)

  private def pqNormed(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"), e6Vec("embedding").as("ve6"))
      .withColumn("nrm", expr(
        """greatest(sqrt(CAST(aggregate(ve6, CAST(0 AS BIGINT),
          |  (a, x) -> a + x * x) AS DOUBLE)), CAST(1e-12 AS DOUBLE))""".stripMargin))
      .select(col("vec_id"), expr(
        "transform(ve6, v -> CAST(floor(CAST(v AS DOUBLE) / nrm * 1000000 + 0.5) AS BIGINT))")
        .as("ne6"))

  /** Per-vector subspace slices of the normalized-integer copy:
    * (vec_id, m, sub). A transform+posexplode — the training-side fan-out
    * is ×pqM rows, never ×codes. */
  private def pqSubs(embeddings: DataFrame, m: Int): DataFrame = {
    val ds = pqDim / m
    pqNormed(embeddings)
      .select(col("vec_id"), posexplode(expr(
        s"transform(sequence(0, ${m - 1}), mi -> slice(ne6, mi * $ds + 1, $ds))"))
        .as(Seq("m", "sub")))
  }

  /** HOF baseline of the per-slice nearest-code assignment: exact integer
    * squared-L2 argmin against the broadcast per-subspace codebook, ties
    * to the lower code. Kept ONLY as the spec cross-check proving the
    * native `PqNearestCodes` expression's distance and tie-break parity
    * (the shipped training/encode paths below use the native form — the
    * HOF is CodegenFallback, measured 195 s to encode 128k vectors,
    * PERF.md §ANN). */
  private[graft] def pqAssignHof(subs: DataFrame, cb: DataFrame): DataFrame = {
    val packed = cb.groupBy(col("m"))
      .agg(collect_list(struct(col("code"), col("ce6"))).as("cbs"))
    subs.join(broadcast(packed), Seq("m"))
      .withColumn("code", expr(
        """-array_max(transform(cbs, c -> named_struct(
          |  'negd', -aggregate(zip_with(sub, c.ce6, (x, y) -> (x - y) * (x - y)),
          |                     CAST(0 AS BIGINT), (acc, v) -> acc + v),
          |  'ncode', -c.code))).ncode""".stripMargin))
      .drop("cbs")
  }

  /** One packed broadcast row of the whole codebook — the build side of
    * every native-assignment stage (training, encode). */
  private def pqPacked(cb: DataFrame): DataFrame =
    cb.agg(collect_list(struct(col("m"), col("code"), col("ce6"))).as("cbs"))

  /** Per-(m, code, sub) assigned slices of the whole corpus via ONE
    * native-codegen argmin per vector (`PqNearestCodes` — no per-subspace
    * row fan-out during the argmin, no interpreted lambda dispatch), then
    * an m-way explode of the already-assigned codes for the recenter
    * aggregate. Same output contract as `pqAssignHof(pqSubs(...), cb)`
    * minus vec_id (the recenter never needs it). */
  private def pqAssignedSubs(normed: DataFrame, cb: DataFrame, m: Int): DataFrame = {
    val ds = pqDim / m
    normed.crossJoin(broadcast(pqPacked(cb)))
      .withColumn("codes",
        graft.functions.VectorFunctions.pqCodes(col("ne6"), col("cbs"), m))
      .select(posexplode(expr(
        s"""transform(sequence(0, ${m - 1}), mi -> named_struct(
           |  'code', element_at(codes, mi + 1),
           |  'sub', slice(ne6, mi * $ds + 1, $ds)))""".stripMargin))
        .as(Seq("m", "cs")))
      .select(col("m"), col("cs.code").as("code"), col("cs.sub").as("sub"))
  }

  /** Train the PQ codebooks: stride-initialized codes per subspace, then
    * `iters` integer Lloyd rounds (squared-L2 assignment, per-dimension
    * floor-mean recenter via the pmod identity) — the `ivfTrainedCentroids`
    * recipe applied independently to each of the `m` subspaces in ONE
    * DataFrame keyed by (m, code), so both engines replay training exactly
    * (SimilarityQueries.duckPqRounds generates the oracle rounds from the
    * same iteration count). Codes that lose every member drop out, same in
    * the replay. Fixed-point early stop as in the IVF trainer: the probe
    * collects only the ≤ m·ksub-row codebook, never the vectors. Returns
    * (m, code, ce6) localCheckpoint'd — train once, pass the handle. */
  def pqCodebooks(embeddings: DataFrame, m: Int = pqM, ksub: Int = pqKsub,
                  iters: Int = pqKmeansIters): DataFrame = {
    val wide = spread(embeddings)
    val subs = pqSubs(wide, m)
    val normed = pqNormed(wide)
    val nDf = embeddings.agg(count(lit(1)).as("n"))
    def recenter(cb: DataFrame): DataFrame =
      pqAssignedSubs(normed, cb, m)
        .select(col("m"), col("code"), posexplode(col("sub")).as(Seq("d", "v")))
        .groupBy(col("m"), col("code"), col("d"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("cnt"))
        .withColumn("mm", expr("(s - pmod(s, cnt)) div cnt"))
        .groupBy(col("m"), col("code"))
        .agg(expr("transform(array_sort(collect_list(struct(d, mm))), p -> p.mm)")
          .as("ce6"))
    def snapshot(cb: DataFrame): Seq[(Int, Int, Seq[Long])] =
      cb.collect().map(r =>
        (r.getInt(0), r.getInt(1), r.getSeq[Long](2))).toSeq.sortBy(t => (t._1, t._2))
    var cb = subs.crossJoin(broadcast(nDf))
      .withColumn("stride", greatest(floor(col("n") / ksub), lit(1)).cast("long"))
      .filter(col("vec_id") % col("stride") === 0 &&
              col("vec_id") < col("stride") * ksub)
      .select(col("m"), expr("CAST(vec_id div stride AS INT)").as("code"),
        col("sub").as("ce6"))
      .localCheckpoint()
    var prev = snapshot(cb)
    var converged = false
    var i = 0
    while (i < iters && !converged) {
      cb = recenter(cb).localCheckpoint()
      val cur = snapshot(cb)
      converged = cur == prev
      prev = cur
      i += 1
    }
    cb
  }

  /** Encode the corpus against trained codebooks: (vec_id, codes[pqM]) in
    * ONE map-only pass — all codebooks ride a single broadcast row and
    * each vector's m codes come from ONE native-codegen argmin
    * (`PqNearestCodes`: m·ksub·ds compiled integer ops per vector; no
    * per-subspace fan-out, no shuffle, no interpreted lambda dispatch —
    * the HOF form below was measured at 195 s for 128k vectors, PERF.md
    * §ANN). At 100 TB this pass streams the vector table once and writes
    * the 16×-smaller codes table; it is the production index build
    * (`pqTopK` takes it as the train-once handle). */
  def pqEncode(embeddings: DataFrame, codebooks: DataFrame,
               m: Int = pqM): DataFrame =
    pqNormed(spread(embeddings))
      .crossJoin(broadcast(pqPacked(codebooks)))
      .select(col("vec_id"),
        graft.functions.VectorFunctions.pqCodes(col("ne6"), col("cbs"), m)
          .as("codes"))

  /** HOF baseline of pqEncode — semantically identical nested-HOF argmin
    * (CodegenFallback); kept ONLY as the spec cross-check pinning the
    * native expression's distance and tie-break parity row-for-row. */
  private[graft] def pqEncodeHof(embeddings: DataFrame, codebooks: DataFrame,
                                 m: Int = pqM): DataFrame = {
    val ds = pqDim / m
    val all = codebooks
      .agg(collect_list(struct(col("m"), col("code"), col("ce6"))).as("cb"))
    pqNormed(embeddings)
      .crossJoin(broadcast(all))
      .withColumn("codes", expr(
        s"""transform(sequence(0, ${m - 1}), mi ->
           |  -array_max(transform(filter(cb, c -> c.m = mi), c -> named_struct(
           |    'negd', -aggregate(zip_with(slice(ne6, mi * $ds + 1, $ds), c.ce6,
           |                               (x, y) -> (x - y) * (x - y)),
           |                       CAST(0 AS BIGINT), (acc, v) -> acc + v),
           |    'ncode', -c.code))).ncode)""".stripMargin))
      .select(col("vec_id"), col("codes"))
  }

  /** PQ-ADC approximate top-k with exact re-rank: build the query's
    * (m, code) → squared-L2 distance table (≤ m·ksub longs, broadcast as a
    * map), score every ENCODED vector by the asymmetric-distance sum — a
    * map-only scan of the codes table that never touches full vectors —
    * keep the `k·refine` best ADC candidates (TakeOrderedAndProject), then
    * fetch only those vectors for the exact e9-cosine re-rank. All-integer
    * up to the re-rank, so the candidate set (and hence the result) is
    * engine-exact and oracle-replayable. Codes live on the unit sphere
    * (pqNormed), so ADC's L2 order tracks the cosine truth; the refine
    * margin absorbs the residual quantization error (recall measured in
    * PERF.md §ann; the spec pins the floor). */
  def pqTopK(embeddings: DataFrame, queryVecId: Long, k: Int,
             m: Int = pqM, ksub: Int = pqKsub, refine: Int = 8,
             codebooks: Option[DataFrame] = None,
             codes: Option[DataFrame] = None): DataFrame = {
    val cb = codebooks.getOrElse(pqCodebooks(embeddings, m, ksub))
    val enc = codes.getOrElse(pqEncode(embeddings, cb, m))
    val cand = pqAdcCandidates(enc, cb, embeddings, queryVecId,
      m, ksub, k * refine)
    pqExactRerank(embeddings, cand, queryVecId, k)
  }

  /** The query's (m, code) → squared-L2 table as ONE broadcastable row:
    * a DENSE array of m·ksub longs laid out as index = m·ksub + code (the
    * native `PqAdcSum` reads it by position — no hash probe). Codes
    * dropped during training leave holes that encode can never reference;
    * they're filled with a large-but-overflow-safe sentinel so that even
    * a hypothetical stray reference ranks WORST, never best. */
  private def pqDistTable(cb: DataFrame, embeddings: DataFrame,
                          queryVecId: Long, m: Int, ksub: Int): DataFrame = {
    val ds = pqDim / m
    val qv = pqNormed(embeddings.filter(col("vec_id") === queryVecId))
      .select(col("ne6").as("qe6"))
    cb.crossJoin(broadcast(qv))
      .withColumn("dist", expr(
        s"""aggregate(zip_with(slice(qe6, m * $ds + 1, $ds), ce6,
           |                   (x, y) -> (x - y) * (x - y)),
           |          CAST(0 AS BIGINT), (acc, v) -> acc + v)""".stripMargin))
      .agg(map_from_entries(collect_list(
        struct(col("m") * ksub + col("code"), col("dist")))).as("dtm"))
      .select(expr(
        s"""transform(sequence(0, ${m * ksub - 1}),
           |          i -> coalesce(dtm[i], CAST(1000000000000000 AS BIGINT)))"""
          .stripMargin).as("dt"))
  }

  /** The ADC scan stage shared by pqTopK (full-corpus scan) and ivfPqTopK
    * (probed-lists scan): broadcast the query's dense distance table as
    * ONE row, score each encoded vector by the native m-term lookup sum
    * (`PqAdcSum` — m array reads + m adds in whole-stage codegen; the
    * HOF+map form was measured at 5.9 s/query over 128k codes, PERF.md
    * §ANN), keep the `nCand` best (integer ADC asc, vec_id asc — fully
    * deterministic, so both callers stay oracle-replayable). */
  private[graft] def pqAdcCandidates(enc: DataFrame, cb: DataFrame,
                                     embeddings: DataFrame, queryVecId: Long,
                                     m: Int, ksub: Int, nCand: Int): DataFrame =
    enc.crossJoin(broadcast(pqDistTable(cb, embeddings, queryVecId, m, ksub)))
      .withColumn("adc",
        graft.functions.VectorFunctions.pqAdcSum(col("codes"), col("dt"), ksub))
      .filter(col("vec_id") =!= queryVecId)
      .orderBy(col("adc").asc, col("vec_id").asc)
      .limit(nCand)
      .select(col("vec_id"))

  /** HOF+map baseline of pqAdcCandidates (CodegenFallback lambda + hash
    * probe per subspace); kept ONLY as the spec cross-check pinning the
    * native ADC sum's scores and candidate order. */
  private[graft] def pqAdcCandidatesHof(enc: DataFrame, cb: DataFrame,
                                        embeddings: DataFrame, queryVecId: Long,
                                        m: Int, ksub: Int, nCand: Int): DataFrame = {
    val ds = pqDim / m
    val qv = pqNormed(embeddings.filter(col("vec_id") === queryVecId))
      .select(col("ne6").as("qe6"))
    val dtab = cb.crossJoin(broadcast(qv))
      .withColumn("dist", expr(
        s"""aggregate(zip_with(slice(qe6, m * $ds + 1, $ds), ce6,
           |                   (x, y) -> (x - y) * (x - y)),
           |          CAST(0 AS BIGINT), (acc, v) -> acc + v)""".stripMargin))
      .agg(map_from_entries(collect_list(
        struct(col("m") * ksub + col("code"), col("dist")))).as("dt"))
    enc.crossJoin(broadcast(dtab))
      .withColumn("adc", expr(
        s"""aggregate(transform(sequence(0, ${m - 1}), mi ->
           |            dt[mi * $ksub + element_at(codes, mi + 1)]),
           |          CAST(0 AS BIGINT), (acc, v) -> acc + v)""".stripMargin))
      .filter(col("vec_id") =!= queryVecId)
      .orderBy(col("adc").asc, col("vec_id").asc)
      .limit(nCand)
      .select(col("vec_id"))
  }

  /** Exact e9-cosine re-rank of a (small, broadcast) candidate-id set —
    * the only stage of the PQ family that touches full float vectors. */
  private def pqExactRerank(embeddings: DataFrame, cand: DataFrame,
                            queryVecId: Long, k: Int): DataFrame =
    embeddings.join(broadcast(cand), Seq("vec_id"))
      .crossJoin(broadcast(embeddings.filter(col("vec_id") === queryVecId)
        .select(col("embedding").as("q"))))
      .select(col("vec_id"), cosineE9(cosine("embedding", "q")).as("cosine_e9"))
      .orderBy(col("cosine_e9").desc, col("vec_id").asc)
      .limit(k)

  /** Composed IVF × PQ — the production serving shape the two indexes
    * promise individually (and the scaladoc contract at `pqM`): the
    * trained IVF coarse quantizer prunes WHICH inverted lists a query
    * reads (≈ nprobe/nlist of the corpus), the PQ codes table shrinks
    * WHAT each read costs (pqM bytes of codes instead of 256 B of
    * floats), and only the k·refine ADC survivors fetch full vectors for
    * the exact re-rank. At 100 TB the codes⋈assignment join below is ONE
    * materialized index table partitioned by centroid_id on storage — a
    * query reads nprobe partitions of a 16×-compressed table, plus
    * k·refine full rows. The two remaining CORPUS-shaped probe terms and
    * their at-scale answers (measured breakdown in PERF.md
    * §ann-crossover): the query-vector fetch is a point filter that
    * row-group-prunes iff the corpus is CLUSTERED by vec_id on write
    * (qfetch measured flat at ~0.05 s/q from 512k to 8M vectors on a
    * sorted corpus), and the candidate fetch runs against a
    * vec_id-BUCKETED vector table where the ≤ k·refine ids prune to
    * their buckets (SelectedBucketsCount plan-pinned in AnnIndexSpec;
    * the in-plan broadcast-join form below is the small-corpus/oracle
    * shape). Probe selection, assignment, encoding and the
    * ADC scan are all exact-integer with id tie-breaks, so the whole
    * candidate set replays verbatim in the oracle; all four index
    * artifacts (centroids, assignment, codebooks, codes) are train-once
    * handles with the same materialization precondition as
    * `ivfTrainedTopK`. */
  /** Probe selection in isolation: the `nprobe` inverted-list ids whose
    * trained centroid has the highest integer dot with the query vector —
    * the sub-step `ivfPqTopK` runs before touching the index, exposed so
    * the bench harness can measure the PRUNED INDEX SCAN as its own
    * component (the term where the flat and partitioned layouts actually
    * differ; the full probe adds layout-independent costs on top). */
  def probedLists(centroids: DataFrame, embeddings: DataFrame,
                  queryVecId: Long, nprobe: Int): DataFrame = {
    val qv = embeddings.filter(col("vec_id") === queryVecId)
      .select(e6Vec("embedding").as("qe6"))
    centroids.crossJoin(broadcast(qv))
      .withColumn("dotv", expr(intDot("ce6", "qe6")))
      .orderBy(col("dotv").desc, col("centroid_id").asc)
      .limit(nprobe)
      .select(col("centroid_id"))
  }

  def ivfPqTopK(embeddings: DataFrame, queryVecId: Long, k: Int,
                nlist: Int = 0, nprobe: Int = 0,
                m: Int = pqM, ksub: Int = pqKsub, refine: Int = 8,
                centroids: Option[DataFrame] = None,
                assigned: Option[DataFrame] = None,
                codebooks: Option[DataFrame] = None,
                codes: Option[DataFrame] = None,
                index: Option[DataFrame] = None): DataFrame =
    pqExactRerank(embeddings,
      ivfPqCandidateIds(embeddings, queryVecId, k, nlist, nprobe, m, ksub,
        refine, centroids, assigned, codebooks, codes, index),
      queryVecId, k)

  /** The candidate stage of [[ivfPqTopK]] in isolation: the query's
    * ≤ k·refine ADC-survivor vec_ids, BEFORE the exact re-rank — the
    * bounded id set a serving layer fetches full vectors for. Exposed so
    * `AnnIndex.probeTopK` can run the fetch against a vec_id-BUCKETED
    * vector table with literal-id bucket pruning (the at-scale re-rank
    * form; AnnIndexSpec pins SelectedBucketsCount on the real ingest
    * root) instead of the in-plan broadcast-join fetch below. Same
    * all-integer determinism contract as the composed probe. */
  def ivfPqCandidateIds(embeddings: DataFrame, queryVecId: Long, k: Int,
                        nlist: Int = 0, nprobe: Int = 0,
                        m: Int = pqM, ksub: Int = pqKsub, refine: Int = 8,
                        centroids: Option[DataFrame] = None,
                        assigned: Option[DataFrame] = None,
                        codebooks: Option[DataFrame] = None,
                        codes: Option[DataFrame] = None,
                        index: Option[DataFrame] = None): DataFrame = {
    val nl = if (nlist > 0) nlist else autoNlist(embeddings.count())
    val np = if (nprobe > 0) nprobe else autoNprobe(nl)
    val cent = centroids.getOrElse(ivfTrainedCentroids(embeddings, nl))
    val cb = codebooks.getOrElse(pqCodebooks(embeddings, m, ksub))
    // `index` is the PERSISTED fused (vec_id, centroid_id, codes) table
    // (AnnIndex.ensureIvfPq) — with it the probe touches no corpus-sized
    // join at all; without it the assignment⋈codes join is built inline
    val joined = index.getOrElse {
      val assignedDf = assigned.getOrElse(ivfTrainedAssign(embeddings, cent))
      val enc = codes.getOrElse(pqEncode(embeddings, cb, m))
      enc.join(assignedDf.select(col("vec_id"), col("centroid_id")), Seq("vec_id"))
    }
    val probed = probedLists(cent, embeddings, queryVecId, np)
    val listed = joined.join(broadcast(probed), Seq("centroid_id"))
    pqAdcCandidates(listed, cb, embeddings, queryVecId, m, ksub, k * refine)
  }

  /** Batch ANN join over the COMPOSED IVF×PQ index: every panel member
    * (vec_id % queryMod == 0) gets its approximate top-k in ONE job — the
    * scalable batch shape of `ivfPqTopK`, and the compressed-corpus
    * counterpart of `ivfAnnJoin` (the semantic-decontamination /
    * leakage-scan shape). Per query the probe keeps nprobe lists (exact
    * integer dot, WindowGroupLimit-bounded per-query window), the ADC
    * stage scores ONLY codes in that query's probed lists (native
    * `PqAdcSum` against the query's broadcast dense distance table —
    * panel × m·ksub longs, a few hundred KB for any real panel), and only
    * the k·refine ADC survivors per query fetch full vectors for the
    * exact re-rank. At 100 TB: one scan of the codes⋈assignment index
    * table joined against a broadcast panel — never query×corpus on full
    * vectors, and the per-query corpus fraction is nprobe/nlist of a
    * 16×-compressed table. All-integer through the candidate set, so the
    * whole panel replays verbatim in the oracle. */
  def ivfPqAnnJoin(embeddings: DataFrame, queryMod: Long, k: Int,
                   nlist: Int = 0, nprobe: Int = 0,
                   m: Int = pqM, ksub: Int = pqKsub, refine: Int = 8,
                   centroids: Option[DataFrame] = None,
                   assigned: Option[DataFrame] = None,
                   codebooks: Option[DataFrame] = None,
                   codes: Option[DataFrame] = None,
                   index: Option[DataFrame] = None,
                   queries: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ds = pqDim / m
    val nl = if (nlist > 0) nlist else autoNlist(embeddings.count())
    val np = if (nprobe > 0) nprobe else autoNprobe(nl)
    val cent = centroids.getOrElse(ivfTrainedCentroids(embeddings, nl))
    val cb = codebooks.getOrElse(pqCodebooks(embeddings, m, ksub))
    val joined = index.getOrElse {
      val assignedDf = assigned.getOrElse(ivfTrainedAssign(embeddings, cent))
      val enc = codes.getOrElse(pqEncode(embeddings, cb, m))
      enc.join(assignedDf.select(col("vec_id"), col("centroid_id")), Seq("vec_id"))
    }
    // the query panel is either a residue class of the corpus itself
    // (the decontamination-scan shape) or an EXTERNAL (vec_id,
    // embedding) frame — e.g. an incoming ingest micro-batch probed
    // against the standing index (semanticDupFlags); candidates still
    // exclude the query's own id, so a batch whose ids overlap the
    // corpus never matches a row to itself
    val panel = queries.getOrElse(
      embeddings.filter(col("vec_id") % queryMod === 0))
    // per-query probed lists — same exact-integer ranking as ivfPqTopK,
    // batched through one per-query window over panel × nlist rows
    val qiv = panel.select(col("vec_id").as("query_id"),
      e6Vec("embedding").as("qe6"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("dotv").desc, col("centroid_id").asc)
    val probes = qiv.crossJoin(broadcast(cent))
      .withColumn("dotv", expr(intDot("ce6", "qe6")))
      .withColumn("prk", row_number().over(wProbe))
      .filter(col("prk") <= np)
      .select(col("query_id"), col("centroid_id"))
    // per-query DENSE ADC distance tables (the pqDistTable layout, one
    // row per panel member)
    val dt = pqNormed(panel)
      .select(col("vec_id").as("query_id"), posexplode(expr(
        s"transform(sequence(0, ${m - 1}), mi -> slice(ne6, mi * $ds + 1, $ds))"))
        .as(Seq("m", "qsub")))
      .join(broadcast(cb), Seq("m"))
      .withColumn("dist", expr(
        """aggregate(zip_with(qsub, ce6, (x, y) -> (x - y) * (x - y)),
          |          CAST(0 AS BIGINT), (acc, v) -> acc + v)""".stripMargin))
      .groupBy(col("query_id"))
      .agg(map_from_entries(collect_list(
        struct(col("m") * ksub + col("code"), col("dist")))).as("dtm"))
      .select(col("query_id"), expr(
        s"""transform(sequence(0, ${m * ksub - 1}),
           |          i -> coalesce(dtm[i], CAST(1000000000000000 AS BIGINT)))"""
          .stripMargin).as("dt"))
    // list-restricted ADC scan + per-query candidate cut
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").asc, col("vec_id").asc)
    val cand = joined
      .join(broadcast(probes), Seq("centroid_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .join(broadcast(dt), Seq("query_id"))
      .withColumn("adc",
        graft.functions.VectorFunctions.pqAdcSum(col("codes"), col("dt"), ksub))
      .withColumn("ark", row_number().over(wAdc))
      .filter(col("ark") <= k * refine)
      .select(col("query_id"), col("vec_id"))
    // exact e9-cosine re-rank of each query's k·refine survivors
    val qemb = panel.select(col("vec_id").as("query_id"),
      col("embedding").as("q"))
    val wK = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_e9").desc, col("vec_id").asc)
    cand.join(embeddings, Seq("vec_id"))
      .join(broadcast(qemb), Seq("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosineE9(cosine("embedding", "q")).as("cosine_e9"))
      .withColumn("rk", row_number().over(wK).cast("long"))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("vec_id"), col("cosine_e9"))
      .orderBy(col("query_id"), col("rk"))
  }

  /** Above this corpus size the quantizers train on a deterministic
    * SAMPLE (the FAISS posture: Lloyd over the full corpus is O(n·nlist)
    * per round — a 10⁸-row corpus would spend hours training what a
    * 65k sample estimates as well, since k-means centroids converge on
    * the sample distribution, not the sample size). Sampling is a
    * deterministic md5-stride over vec_id (the engine-portable 60-bit
    * md5 prefix the dedup tier already hash-proves against DuckDB), so
    * the trained index is replayable; the cap is part of the persisted
    * fingerprint (AnnIndex v4). Everything AFTER training — assignment
    * and PQ encoding — still covers the FULL corpus (map-only codegen
    * passes). Every oracled corpus is far below the cap, so the oracle
    * CTEs' full-corpus Lloyd replay is unchanged where it is checked. */
  val trainSampleCap = 65536L

  /** Deterministic ≈cap-sized training sample: keep vec_ids whose 60-bit
    * md5 prefix lands in a 1/stride residue class. Hash-based (not a
    * vec_id prefix) so generated corpora with structured id ranges don't
    * bias the sample toward one id region. The stride ROUNDS (not
    * truncates) n/cap, so the sample size stays within ~[2/3, 3/2]·cap —
    * the truncated form kept the WHOLE corpus for cap < n < 2·cap, and
    * up to ~2·cap generally, overstating the O(cap) training bound just
    * past the threshold (round-13 advice). */
  private[graft] def trainSample(corpus: DataFrame, n: Long,
                                 cap: Long = trainSampleCap): DataFrame =
    if (n <= cap) corpus
    else corpus.filter(pmod(
      expr("conv(substring(md5(cast(vec_id as string)), 1, 15), 16, 10)")
        .cast("long"), lit(math.max(1L, (n + cap / 2) / cap))) === 0)

  /** Dense re-id of a (bounded) training sample: vec_id → its RANK within
    * the sample. Both seeders below select seeds with a stride PREDICATE
    * on vec_id (`vec_id % stride = 0 AND vec_id < stride·k`, stride =
    * count/k) — correct on a dense 0..n-1 corpus, but on the hash-thinned
    * sample the surviving ids are ~(n/cap)× sparser than the count-derived
    * stride assumes, so only ~k·cap/n seeds pass the predicate: an 8.19 M
    * corpus trained ~23 IVF lists instead of nlist≈2862 and ~2 PQ codes
    * per subspace instead of 256 (round-13 advice, high). Ranking restores
    * the density the predicate needs; the trained artifacts carry no
    * vec_ids (centroids/codebooks only), so the re-id is invisible
    * downstream. The window is a single-partition sort — acceptable ONLY
    * because the sample is ≤ ~1.5·cap rows by construction (never the
    * corpus); SeedDensitySpec pins that trained list/code counts track
    * nlist/ksub through this path. */
  private def denseReId(sample: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    sample.withColumn("vec_id",
      row_number().over(Window.orderBy(col("vec_id"))).cast("long") - 1L)
  }

  /** Train the composed index's three artifacts from one corpus: coarse
    * centroids, PQ codebooks, and the FUSED (vec_id, centroid_id, codes)
    * table. Single source of truth for the build — AnnIndex's persisted
    * layout, the incremental-admission and ingest-dedup oracled queries,
    * and their specs all build through here, so the fused-index shape
    * can never silently diverge between them. Corpora above
    * `sampleCap` (default [[trainSampleCap]]; the parameter exists so
    * SeedDensitySpec can exercise the sampled path on a small fixture)
    * train the quantizers on the deterministic sample, DENSELY RE-ID'd
    * first ([[denseReId]]) so the stride seeders see the id density
    * their predicates assume, and localCheckpointed once so the two
    * Lloyd loops don't rescan the corpus per round; nlist still derives
    * from the FULL corpus size — list granularity is a property of what
    * the index serves, not of what trained it. */
  def trainAndFuse(corpus: DataFrame, nlist: Int = 0,
                   m: Int = pqM, ksub: Int = pqKsub,
                   sampleCap: Long = trainSampleCap)
      : (DataFrame, DataFrame, DataFrame) = {
    val n = corpus.count()
    val nl = if (nlist > 0) nlist else autoNlist(n)
    // the dense re-id is UNCONDITIONAL (not just on the sampled path):
    // a sub-cap corpus with id-filtered rows can starve the stride
    // predicate outright — measured crash shape: standing set
    // `vec_id % 7 <> 0` at n=428 derives stride 21 = 3·7, so every seed
    // candidate is a multiple of 7 and ALL are excluded → empty centroid
    // table → null assignment (found by fuzz seed 202). The window stays
    // bounded because the train set never exceeds ~1.5·sampleCap rows.
    // On dense 0..n-1 corpora the re-id is the identity, so every
    // full-table oracle is unchanged; the trained-quantizer oracle
    // builders seed on the same dense rank (`rid`) for parity on
    // filtered corpora.
    val train =
      denseReId(
        if (n <= sampleCap) corpus else trainSample(corpus, n, sampleCap))
        .localCheckpoint()
    val cent = ivfTrainedCentroids(train, nl)
    val cb = pqCodebooks(train, m, ksub)
    val fused = pqEncode(corpus, cb, m)
      .join(ivfTrainedAssign(corpus, cent)
        .select(col("vec_id"), col("centroid_id")), Seq("vec_id"))
    (cent, cb, fused)
  }

  /** Semantic-dup flags for an incoming batch against a STANDING corpus:
    * each batch member is probed through the composed IVF×PQ index
    * (`ivfPqAnnJoin` with the batch as the external query panel) and
    * flagged `is_dup` when its best exact-re-ranked neighbor clears the
    * e9-cosine threshold. One row per batch member, `false` when the
    * probe surfaces no candidate at all (empty probed lists — LEFT join,
    * never a dropped row). This is the ingest-time membership question a
    * training pipeline asks before admitting new documents — the
    * embedding-space complement of `Dedup.incremental`'s exact
    * fingerprints — and the batch kernel of the streaming ingest twin:
    * a foreachBatch sink runs exactly this per micro-batch against the
    * standing index, and because each member's verdict depends only on
    * the STANDING corpus (never on its batch-mates), any micro-batch
    * split yields the same flags as one wholesale call (StreamingSpec
    * pins the parity). Cost per batch: one probe-pruned
    * scan of the index restricted to the batch's probed lists, never
    * batch × corpus. */
  def semanticDupFlags(batch: DataFrame, corpus: DataFrame,
                       k: Int = 5, thresholdE9: Long = 400000000L,
                       nlist: Int = 0, nprobe: Int = 0,
                       centroids: Option[DataFrame] = None,
                       codebooks: Option[DataFrame] = None,
                       index: Option[DataFrame] = None): DataFrame = {
    val ann = ivfPqAnnJoin(corpus, 1L, k, nlist = nlist, nprobe = nprobe,
      centroids = centroids, codebooks = codebooks, index = index,
      queries = Some(batch))
    val hits = ann.groupBy(col("query_id")).agg(max(col("cosine_e9")).as("best"))
    batch.select(col("vec_id"))
      .join(hits, col("vec_id") === col("query_id"), "left_outer")
      .select(col("vec_id"),
        coalesce(col("best") >= thresholdE9, lit(false)).as("is_dup"))
      .orderBy(col("vec_id"))
  }
}

object SimilarityQueries extends QModule {
  import Similarity._

  /** DuckDB cosine between two list expressions (per-element double casts;
    * e9 rounding at the output edge absorbs the engines' fold-order ulp). */
  private def duckCos(a: String, b: String): String =
    s"""(list_sum(list_transform(list_zip($a, $b),
       |                         p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
       | / sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       | / sqrt(list_sum(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))""".stripMargin

  private val duckCosine = duckCos("a.embedding", "b.embedding")

  /** Ingest-time semantic dedup as DuckDB SQL, parameterized by the
    * standing/batch split (vec_id % mod == res is the batch), the
    * duplicate threshold, k, and an optional nprobe override (0 =
    * the derived 3/8-of-nlist formula). Shared by the
    * dedup_semantic_ingest registry row (10/3/4e8/5/derived) and the
    * Fuzz T38 generator, which randomizes every parameter - so the
    * oracle text and the registry row can never drift apart. */
  private[graft] def duckSemanticIngest(mod: Int, res: Int,
      thresholdE9: Long, k: Int, nprobe: Int): String =
    duckSemanticIngestOver(s"vec_id % $mod <> $res", s"vec_id % $mod = $res",
      thresholdE9, k, nprobe)

  /** [[duckSemanticIngest]] generalized to arbitrary standing/batch
    * predicates over `embeddings` — Fuzz T39 probes a dedup batch against
    * a multi-residue standing set (the residues later admit-all batches
    * will fill), which the single-residue form can't express. */
  private[graft] def duckSemanticIngestOver(standingWhere: String,
      batchWhere: String, thresholdE9: Long, k: Int, nprobe: Int): String = {
    val npSql = if (nprobe > 0) nprobe.toString else "np"
    s"""
      WITH base AS (
        SELECT vec_id, ve6,
               row_number() OVER (ORDER BY vec_id) - 1 AS rid,
               greatest(sqrt(CAST(CAST(list_sum(list_transform(ve6, v -> v * v))
                                  AS BIGINT) AS DOUBLE)),
                        CAST(1e-12 AS DOUBLE)) AS nrm
        FROM (SELECT vec_id,
                     list_transform(embedding,
                       x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS ve6
              FROM embeddings WHERE $standingWhere) t0),
      pbase AS (
        SELECT vec_id, ve6,
               greatest(sqrt(CAST(CAST(list_sum(list_transform(ve6, v -> v * v))
                                  AS BIGINT) AS DOUBLE)),
                        CAST(1e-12 AS DOUBLE)) AS nrm
        FROM (SELECT vec_id,
                     list_transform(embedding,
                       x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS ve6
              FROM embeddings WHERE $batchWhere) t0),
      iprm AS (
        SELECT nl, greatest(6, (nl * 3) // 8) AS np,
               greatest(CAST(floor(n / nl) AS BIGINT), 1) AS stride
        FROM (SELECT greatest(16, least(4096,
                       CAST(floor(sqrt(COUNT(*))) AS BIGINT))) AS nl,
                     COUNT(*) AS n
              FROM embeddings WHERE $standingWhere) t),
      c0 AS (
        SELECT rid AS centroid_id, ve6 AS ce6
        FROM base, iprm s
        WHERE rid % s.stride = 0 AND rid < s.stride * s.nl),
      ${duckLloydRounds(ivfKmeansIters)}
      aF AS (
        SELECT vec_id, centroid_id FROM (
          SELECT b.vec_id, c.centroid_id,
                 row_number() OVER (PARTITION BY b.vec_id ORDER BY
                   list_sum(list_transform(list_zip(b.ve6, c.ce6), p -> p[1] * p[2])) DESC,
                   c.centroid_id ASC) AS rk
          FROM base b CROSS JOIN c$ivfKmeansIters c) t
        WHERE rk = 1),
      probes AS (
        SELECT query_id, centroid_id FROM (
          SELECT q.vec_id AS query_id, c.centroid_id, p.np,
                 row_number() OVER (PARTITION BY q.vec_id ORDER BY
                   list_sum(list_transform(list_zip(c.ce6, q.ve6), p -> p[1] * p[2])) DESC,
                   c.centroid_id ASC) AS rk
          FROM pbase q CROSS JOIN c$ivfKmeansIters c CROSS JOIN iprm p) t
        WHERE rk <= $npSql),
      nbase AS (
        SELECT vec_id, rid,
               list_transform(ve6,
                 v -> CAST(floor(CAST(v AS DOUBLE) / nrm * 1000000 + 0.5) AS BIGINT)) AS ne6
        FROM base),
      subs AS (
        SELECT vec_id, rid, CAST(mi AS INT) AS m,
               list_slice(ne6, mi * ${pqDim / pqM} + 1,
                          mi * ${pqDim / pqM} + ${pqDim / pqM}) AS sub
        FROM nbase, UNNEST(range(0, ${pqM})) t(mi)),
      pnbase AS (
        SELECT vec_id,
               list_transform(ve6,
                 v -> CAST(floor(CAST(v AS DOUBLE) / nrm * 1000000 + 0.5) AS BIGINT)) AS ne6
        FROM pbase),
      psubs AS (
        SELECT vec_id, CAST(mi AS INT) AS m,
               list_slice(ne6, mi * ${pqDim / pqM} + 1,
                          mi * ${pqDim / pqM} + ${pqDim / pqM}) AS sub
        FROM pnbase, UNNEST(range(0, ${pqM})) t(mi)),
      pprm AS (
        SELECT greatest(CAST(floor(COUNT(*) / ${pqKsub}) AS BIGINT), 1) AS stride
        FROM embeddings WHERE $standingWhere),
      p0 AS (
        SELECT m, CAST(rid // stride AS INT) AS code, sub AS ce6
        FROM subs, pprm
        WHERE rid % stride = 0 AND rid < stride * ${pqKsub}),
      ${duckPqRounds(pqKmeansIters)}
      enc AS (
        SELECT vec_id, m, code FROM (
          SELECT s.vec_id, s.m, c.code,
                 row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY
                   list_sum(list_transform(list_zip(s.sub, c.ce6),
                                           p -> (p[1] - p[2]) * (p[1] - p[2]))) ASC,
                   c.code ASC) AS rk
          FROM subs s JOIN p$pqKmeansIters c ON s.m = c.m) t
        WHERE rk = 1),
      qdt AS (
        SELECT s.vec_id AS query_id, c.m, c.code,
               CAST(list_sum(list_transform(list_zip(s.sub, c.ce6),
                    p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT) AS dist
        FROM psubs s JOIN p$pqKmeansIters c ON s.m = c.m),
      adc AS (
        SELECT d.query_id, e.vec_id, CAST(SUM(d.dist) AS BIGINT) AS adc
        FROM enc e
        JOIN qdt d ON e.m = d.m AND e.code = d.code
        JOIN aF a ON a.vec_id = e.vec_id
        JOIN probes pr ON pr.query_id = d.query_id
                      AND pr.centroid_id = a.centroid_id
        WHERE e.vec_id <> d.query_id
        GROUP BY d.query_id, e.vec_id),
      cand AS (
        SELECT query_id, vec_id FROM (
          SELECT query_id, vec_id,
                 row_number() OVER (PARTITION BY query_id ORDER BY
                   adc ASC, vec_id ASC) AS ark
          FROM adc) t
        WHERE ark <= ${k * 8}),
      hits AS (
        SELECT query_id, MAX(cosine_e9) AS best FROM (
          SELECT c.query_id,
                 CAST(floor(${duckCos("b.embedding", "q.embedding")} * 1e9 + 0.5) AS BIGINT)
                   AS cosine_e9,
                 row_number() OVER (PARTITION BY c.query_id ORDER BY
                   CAST(floor(${duckCos("b.embedding", "q.embedding")} * 1e9 + 0.5) AS BIGINT) DESC,
                   b.vec_id ASC) AS rk
          FROM cand c
          JOIN embeddings b ON b.vec_id = c.vec_id
          JOIN embeddings q ON q.vec_id = c.query_id) t
        WHERE rk <= $k GROUP BY query_id)
      SELECT p.vec_id, coalesce(h.best >= $thresholdE9, FALSE) AS is_dup
      FROM (SELECT vec_id FROM embeddings WHERE $batchWhere) p
      LEFT JOIN hits h ON h.query_id = p.vec_id
      ORDER BY p.vec_id
    """
  }

  /** Full-corpus composed IVF×PQ probe as DuckDB SQL, parameterized by
    * the query vector id: replays BOTH trainings (generated Lloyd + PQ
    * rounds over one integerized base), derived nlist/nprobe, probe
    * selection, the list-restricted ADC scan and the exact re-rank.
    * Shared by sim_ann_ivfpq (qid 0, probing the persisted index) and
    * sim_ann_ivfpq_retrain (qid 3, whose Spark side arrives at the SAME
    * full-corpus index through the ingest lifecycle: init on the
    * standing 9/10 -> admit two batches -> epoch retrain) - one SQL
    * verifies that the lifecycle converges to the from-scratch build. */
  private def duckFullIvfPqProbe(qid: Int): String =
    duckFullIvfPqProbeOver("SELECT vec_id, embedding FROM embeddings",
      qid, 10, 8, Similarity.pqM, Similarity.pqKsub)

  /** The from-scratch IVF×PQ build + probe as DuckDB SQL, parameterized
    * by the CORPUS (any `SELECT vec_id, embedding …` text), the query
    * id, k, refine, and the PQ geometry (m, ksub). The fixed registry
    * rows (`sim_ann_ivfpq`, `sim_ann_ivfpq_retrain`) instantiate it at
    * the defaults over the whole table; Fuzz T39 instantiates it over
    * the SURVIVING corpus of a randomized ingest→retrain lifecycle with
    * randomized retrain geometry — so the lifecycle oracle and the
    * fixed rows can never drift apart. */
  private[graft] def duckFullIvfPqProbeOver(corpusSql: String, qid: Long,
      k: Int, refine: Int, m: Int, ksub: Int): String = {
    val ds = Similarity.pqDim / m
    s"""
      WITH corp AS ($corpusSql),
      base AS (
        SELECT vec_id, ve6,
               row_number() OVER (ORDER BY vec_id) - 1 AS rid,
               greatest(sqrt(CAST(CAST(list_sum(list_transform(ve6, v -> v * v))
                                  AS BIGINT) AS DOUBLE)),
                        CAST(1e-12 AS DOUBLE)) AS nrm
        FROM (SELECT vec_id,
                     list_transform(embedding,
                       x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS ve6
              FROM corp) t0),
      iprm AS (
        SELECT nl, greatest(6, (nl * 3) // 8) AS np,
               greatest(CAST(floor(n / nl) AS BIGINT), 1) AS stride
        FROM (SELECT greatest(16, least(4096,
                       CAST(floor(sqrt(COUNT(*))) AS BIGINT))) AS nl,
                     COUNT(*) AS n
              FROM corp) t),
      c0 AS (
        SELECT rid AS centroid_id, ve6 AS ce6
        FROM base, iprm s
        WHERE rid % s.stride = 0 AND rid < s.stride * s.nl),
      ${duckLloydRounds(ivfKmeansIters)}
      aF AS (
        SELECT vec_id, centroid_id FROM (
          SELECT b.vec_id, c.centroid_id,
                 row_number() OVER (PARTITION BY b.vec_id ORDER BY
                   list_sum(list_transform(list_zip(b.ve6, c.ce6), p -> p[1] * p[2])) DESC,
                   c.centroid_id ASC) AS rk
          FROM base b CROSS JOIN c$ivfKmeansIters c) t
        WHERE rk = 1),
      qiv AS (SELECT ve6 AS qe6 FROM base WHERE vec_id = $qid),
      probed AS (
        SELECT centroid_id FROM (
          SELECT centroid_id, p.np,
                 row_number() OVER (ORDER BY
                   list_sum(list_transform(list_zip(ce6, qe6), p -> p[1] * p[2])) DESC,
                   centroid_id ASC) AS rk
          FROM c$ivfKmeansIters CROSS JOIN qiv CROSS JOIN iprm p) t
        WHERE rk <= np),
      nbase AS (
        SELECT vec_id, rid,
               list_transform(ve6,
                 v -> CAST(floor(CAST(v AS DOUBLE) / nrm * 1000000 + 0.5) AS BIGINT)) AS ne6
        FROM base),
      subs AS (
        SELECT vec_id, rid, CAST(mi AS INT) AS m,
               list_slice(ne6, mi * $ds + 1,
                          mi * $ds + $ds) AS sub
        FROM nbase, UNNEST(range(0, $m)) t(mi)),
      pprm AS (
        SELECT greatest(CAST(floor(COUNT(*) / $ksub) AS BIGINT), 1) AS stride
        FROM corp),
      p0 AS (
        SELECT m, CAST(rid // stride AS INT) AS code, sub AS ce6
        FROM subs, pprm
        WHERE rid % stride = 0 AND rid < stride * $ksub),
      ${duckPqRounds(pqKmeansIters, ds)}
      enc AS (
        SELECT vec_id, m, code FROM (
          SELECT s.vec_id, s.m, c.code,
                 row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY
                   list_sum(list_transform(list_zip(s.sub, c.ce6),
                                           p -> (p[1] - p[2]) * (p[1] - p[2]))) ASC,
                   c.code ASC) AS rk
          FROM subs s JOIN p${pqKmeansIters} c ON s.m = c.m) t
        WHERE rk = 1),
      qs AS (SELECT m, sub AS qsub FROM subs WHERE vec_id = $qid),
      dt AS (
        SELECT c.m, c.code,
               CAST(list_sum(list_transform(list_zip(q.qsub, c.ce6),
                    p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT) AS dist
        FROM p${pqKmeansIters} c JOIN qs q ON c.m = q.m),
      adc AS (
        SELECT e.vec_id, CAST(SUM(d.dist) AS BIGINT) AS adc
        FROM enc e
        JOIN dt d ON e.m = d.m AND e.code = d.code
        JOIN aF a ON a.vec_id = e.vec_id
        JOIN probed pr ON a.centroid_id = pr.centroid_id
        WHERE e.vec_id <> $qid
        GROUP BY e.vec_id),
      cand AS (SELECT vec_id FROM adc ORDER BY adc ASC, vec_id ASC LIMIT ${k * refine})
      SELECT vec_id, cosine_e9 FROM (
        SELECT b.vec_id, CAST(floor($duckCosine * 1e9 + 0.5) AS BIGINT) AS cosine_e9
        FROM corp b JOIN cand USING (vec_id)
        CROSS JOIN (SELECT embedding FROM corp WHERE vec_id = $qid) a(embedding)
        ORDER BY cosine_e9 DESC, b.vec_id ASC LIMIT $k) t
    """
  }

  /** One SQL CTE pair (assign + recenter) per Lloyd round — generated
    * from the SAME iteration count the Spark side trains with, so the
    * oracle replays training verbatim at any `iters`. */
  private def duckLloydRounds(iters: Int): String =
    (1 to iters).map { i =>
      s"""a$i AS (
         |  SELECT vec_id, ve6, centroid_id FROM (
         |    SELECT b.vec_id, b.ve6, c.centroid_id,
         |           row_number() OVER (PARTITION BY b.vec_id ORDER BY
         |             list_sum(list_transform(list_zip(b.ve6, c.ce6), p -> p[1] * p[2])) DESC,
         |             c.centroid_id ASC) AS rk
         |    FROM base b CROSS JOIN c${i - 1} c) t
         |  WHERE rk = 1),
         |c$i AS (
         |  SELECT centroid_id, list(m ORDER BY d) AS ce6 FROM (
         |    SELECT centroid_id, d,
         |           (s - (((s % cnt) + cnt) % cnt)) // cnt AS m
         |    FROM (
         |      SELECT centroid_id, d, CAST(SUM(ve6[d]) AS BIGINT) AS s,
         |             COUNT(*) AS cnt
         |      FROM a$i, UNNEST(range(1, 65)) t(d)
         |      GROUP BY centroid_id, d) x) y
         |  GROUP BY centroid_id),""".stripMargin
    }.mkString("\n")

  /** One SQL CTE pair (assign + recenter) per PQ Lloyd round — generated
    * from the SAME iteration count the Spark trainer uses, replaying all
    * `pqM` subspaces' training in one (m, code)-keyed table. `subs`/`p0`
    * are defined by the enclosing query. */
  private def duckPqRounds(iters: Int,
                           ds: Int = Similarity.pqDim / Similarity.pqM)
      : String = {
    (1 to iters).map { i =>
      s"""pa$i AS (
         |  SELECT m, code, sub FROM (
         |    SELECT s.vec_id, s.m, s.sub, c.code,
         |           row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY
         |             list_sum(list_transform(list_zip(s.sub, c.ce6),
         |                                     p -> (p[1] - p[2]) * (p[1] - p[2]))) ASC,
         |             c.code ASC) AS rk
         |    FROM subs s JOIN p${i - 1} c ON s.m = c.m) t
         |  WHERE rk = 1),
         |p$i AS (
         |  SELECT m, code, list(mm ORDER BY d) AS ce6 FROM (
         |    SELECT m, code, d,
         |           (s2 - (((s2 % cnt) + cnt) % cnt)) // cnt AS mm
         |    FROM (
         |      SELECT m, code, d, CAST(SUM(sub[d]) AS BIGINT) AS s2,
         |             COUNT(*) AS cnt
         |      FROM pa$i, UNNEST(range(1, ${ds + 1})) t(d)
         |      GROUP BY m, code, d) x) y
         |  GROUP BY m, code),""".stripMargin
    }.mkString("\n")
  }

  def qs: Seq[Q] = Seq(
    // Brute-force cosine top-10 for query vector 0 (the exact baseline).
    // Ranking happens on the e9-quantized cosine in BOTH engines, so the
    // LIMIT-k boundary never depends on last-ulp fold agreement.
    Q("sim_topk_cosine", (s, dir) =>
      topK(t(s, dir, "embeddings"), 0L, 10),
      sql = Some(s"""
      SELECT vec_id, cosine_e9 FROM (
        SELECT b.vec_id, CAST(floor($duckCosine * 1e9 + 0.5) AS BIGINT) AS cosine_e9
        FROM embeddings b
        CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) a(embedding)
        WHERE b.vec_id <> 0
        ORDER BY cosine_e9 DESC, b.vec_id ASC LIMIT 10) t
    """), headline = true),

    // Range search: ALL vectors within a cosine radius of the query (the
    // threshold sibling of top-k — "give me every candidate above 0.25",
    // the retrieval-filter shape). Map + filter over the broadcast query
    // vector; the e9-quantized cosine keeps the radius boundary
    // bit-identical across engines.
    Q("sim_range_search", (s, dir) => {
      val e = t(s, dir, "embeddings")
      e.crossJoin(broadcast(e.filter(col("vec_id") === 0L)
          .select(col("embedding").as("q"))))
        .filter(col("vec_id") =!= 0L)
        .select(col("vec_id"), cosineE9(cosine("embedding", "q")).as("cosine_e9"))
        .filter(col("cosine_e9") >= 250000000L)
        .orderBy(col("cosine_e9").desc, col("vec_id").asc)
    }, sql = Some(s"""
      SELECT vec_id, cosine_e9 FROM (
        SELECT b.vec_id, CAST(floor($duckCosine * 1e9 + 0.5) AS BIGINT) AS cosine_e9
        FROM embeddings b
        CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) a(embedding)
        WHERE b.vec_id <> 0) t
      WHERE cosine_e9 >= 250000000
      ORDER BY cosine_e9 DESC, vec_id ASC
    """)),

    // Pairwise near-dup by cosine threshold (embedding-cosine dedup).
    // EXACT semantics (the oracle is the plain pairwise join); the Spark
    // side executes it as a grid-blocked equi-join — never a
    // BroadcastNestedLoopJoin (plan-asserted in PlanHygieneSpec).
    Q("dedup_embedding_cosine", (s, dir) =>
      cosinePairs(t(s, dir, "embeddings"), 0.4)
        .orderBy(col("vec_i"), col("vec_j")),
      sql = Some(s"""
      SELECT vec_i, vec_j, cosine_e9 FROM (
        SELECT a.vec_id AS vec_i, b.vec_id AS vec_j,
               CAST(floor($duckCosine * 1e9 + 0.5) AS BIGINT) AS cosine_e9
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id) t
      WHERE cosine_e9 >= 400000000
      ORDER BY vec_i, vec_j
    """)),

    // SemDeDup-style semantic cluster collapse: the SAME connected-
    // components engine that serves shingle-Jaccard dedup, fed by the
    // embedding-cosine pair generator — cluster collapse is similarity-
    // backend-agnostic (one more reason it must not be welded to one
    // pair source). Every vector maps to its semantic cluster's min-id
    // representative; a curation pipeline keeps one exemplar per cluster.
    Q("dedup_semantic_clusters", (s, dir) =>
      Dedup.dupClusters(
        cosinePairs(t(s, dir, "embeddings"), 0.4)
          .select(col("vec_i").as("doc_i"), col("vec_j").as("doc_j")))
        .withColumnRenamed("doc_id", "vec_id")
        .orderBy(col("vec_id")),
      sql = Some(s"""
      WITH RECURSIVE jp AS (
        SELECT vec_i, vec_j FROM (
          SELECT a.vec_id AS vec_i, b.vec_id AS vec_j,
                 CAST(floor($duckCosine * 1e9 + 0.5) AS BIGINT) AS cosine_e9
          FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id) t
        WHERE cosine_e9 >= 400000000),
      edges AS (SELECT vec_i AS a, vec_j AS b FROM jp
                UNION ALL SELECT vec_j, vec_i FROM jp),
      reach(a, b) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
      rep AS (SELECT a AS vec_id, LEAST(a, MIN(b)) AS rep_id FROM reach GROUP BY a),
      sz AS (SELECT rep_id, COUNT(*) AS cluster_size FROM rep GROUP BY 1)
      SELECT vec_id, rep_id, cluster_size
      FROM rep JOIN sz USING (rep_id) ORDER BY vec_id
    """)),

    // ANN via multi-probe random-hyperplane LSH (8 planes, Hamming ≤ 3
    // probe — parameters measured against the corpus, PERF.md §ANN). The
    // md5-derived ±1 hyperplanes and integer-quantized projections make
    // the bucketing engine-portable, so the oracle replays the full
    // index + probe enumeration.
    Q("sim_ann_lsh", (s, dir) =>
      annTopK(t(s, dir, "embeddings"), 0L, 10), sql = Some(s"""
      WITH planes AS (
        SELECT p, list_transform(range(0, 64), d ->
          CASE WHEN (('0x' || substr(md5(CAST(p AS VARCHAR) || ':' || CAST(d AS VARCHAR)), 1, 2))::INT & 1) = 1
               THEN 1 ELSE -1 END) AS w
        FROM UNNEST(range(0, 8)) t(p)),
      proj AS (
        SELECT e.vec_id, pl.p,
               list_sum(list_transform(range(1, 65), d ->
                 CAST(floor(CAST(e.embedding[d] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) * pl.w[d])) AS s
        FROM embeddings e CROSS JOIN planes pl),
      buckets AS (
        SELECT vec_id, CAST(SUM(CASE WHEN s >= 0 THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
        FROM proj GROUP BY vec_id),
      probe AS (
        SELECT r AS bucket FROM buckets qb, UNNEST(range(0, 256)) t(r)
        WHERE qb.vec_id = 0 AND bit_count(xor(r, qb.bucket)) <= 3)
      SELECT vec_id, cosine_e9 FROM (
        SELECT b.vec_id, CAST(floor($duckCosine * 1e9 + 0.5) AS BIGINT) AS cosine_e9
        FROM embeddings b
        JOIN buckets bb ON bb.vec_id = b.vec_id
        JOIN probe p ON bb.bucket = p.bucket
        CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) a(embedding)
        WHERE b.vec_id <> 0
        ORDER BY cosine_e9 DESC, b.vec_id ASC LIMIT 10) t
    """)),

    // ANN via IVF coarse quantizer. Index size is DERIVED, not hardcoded:
    // nlist = clamp(√n, 16, 4096) lists, nprobe = max(6, 3·nlist/8) probed
    // (autoNlist/autoNprobe) — the oracle replays the same formulas, so
    // the derived index stays hash-checkable at every SF. Stride centroids
    // + e9-quantized assignment are deterministic, so the oracle rebuilds
    // the same index and probes the same lists.
    Q("sim_ann_ivf", (s, dir) =>
      ivfTopK(t(s, dir, "embeddings"), 0L, 10), sql = Some(s"""
      WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
      prm AS (
        SELECT nl, greatest(6, (nl * 3) // 8) AS np,
               greatest(CAST(floor(n / nl) AS BIGINT), 1) AS stride
        FROM (SELECT greatest(16, least(4096,
                       CAST(floor(sqrt(COUNT(*))) AS BIGINT))) AS nl,
                     COUNT(*) AS n
              FROM embeddings) t),
      cent AS (
        SELECT vec_id AS centroid_id, embedding AS centroid
        FROM embeddings, prm s
        WHERE vec_id % s.stride = 0 AND vec_id < s.stride * s.nl),
      assign AS (
        SELECT vec_id, embedding, centroid_id FROM (
          SELECT e.vec_id, e.embedding, c.centroid_id,
                 row_number() OVER (PARTITION BY e.vec_id ORDER BY
                   CAST(floor(${duckCos("e.embedding", "c.centroid")} * 1e9 + 0.5) AS BIGINT) DESC,
                   c.centroid_id ASC) AS rk
          FROM embeddings e CROSS JOIN cent c) t
        WHERE rk = 1),
      probe AS (
        SELECT centroid_id FROM (
          SELECT c.centroid_id, p.np,
                 row_number() OVER (ORDER BY
                   CAST(floor(${duckCos("c.centroid", "q.qe")} * 1e9 + 0.5) AS BIGINT) DESC,
                   c.centroid_id ASC) AS rk
          FROM cent c CROSS JOIN q CROSS JOIN prm p) t
        WHERE rk <= np)
      SELECT vec_id, cosine_e9 FROM (
        SELECT a.vec_id,
               CAST(floor(${duckCos("a.embedding", "q.qe")} * 1e9 + 0.5) AS BIGINT) AS cosine_e9
        FROM assign a JOIN probe USING (centroid_id) CROSS JOIN q
        WHERE a.vec_id <> 0
        ORDER BY cosine_e9 DESC, a.vec_id ASC LIMIT 10) t
    """)),

    // Batch ANN join: every 20th vector is a held-out query; each gets
    // its approximate top-5 through the same DERIVED stride-IVF index as
    // sim_ann_ivf. The oracle replays the identical integer assignment
    // and probe formulas — per query instead of for vec 0 only.
    Q("sim_ann_join", (s, dir) =>
      ivfAnnJoin(t(s, dir, "embeddings"), 20L, 5), sql = Some(s"""
      WITH prm AS (
        SELECT nl, greatest(6, (nl * 3) // 8) AS np,
               greatest(CAST(floor(n / nl) AS BIGINT), 1) AS stride
        FROM (SELECT greatest(16, least(4096,
                       CAST(floor(sqrt(COUNT(*))) AS BIGINT))) AS nl,
                     COUNT(*) AS n
              FROM embeddings) t),
      cent AS (
        SELECT vec_id AS centroid_id, embedding AS centroid
        FROM embeddings, prm s
        WHERE vec_id % s.stride = 0 AND vec_id < s.stride * s.nl),
      assign AS (
        SELECT vec_id, embedding, centroid_id FROM (
          SELECT e.vec_id, e.embedding, c.centroid_id,
                 row_number() OVER (PARTITION BY e.vec_id ORDER BY
                   CAST(floor(${duckCos("e.embedding", "c.centroid")} * 1e9 + 0.5) AS BIGINT) DESC,
                   c.centroid_id ASC) AS rk
          FROM embeddings e CROSS JOIN cent c) t
        WHERE rk = 1),
      q AS (
        SELECT vec_id AS query_id, embedding AS qe
        FROM embeddings WHERE vec_id % 20 = 0),
      probe AS (
        SELECT query_id, qe, centroid_id FROM (
          SELECT q.query_id, q.qe, c.centroid_id, p.np,
                 row_number() OVER (PARTITION BY q.query_id ORDER BY
                   CAST(floor(${duckCos("c.centroid", "q.qe")} * 1e9 + 0.5) AS BIGINT) DESC,
                   c.centroid_id ASC) AS rk
          FROM cent c CROSS JOIN q CROSS JOIN prm p) t
        WHERE rk <= np)
      SELECT query_id, rk, vec_id, cosine_e9 FROM (
        SELECT p.query_id, a.vec_id,
               CAST(floor(${duckCos("a.embedding", "p.qe")} * 1e9 + 0.5) AS BIGINT) AS cosine_e9,
               CAST(row_number() OVER (PARTITION BY p.query_id ORDER BY
                 CAST(floor(${duckCos("a.embedding", "p.qe")} * 1e9 + 0.5) AS BIGINT) DESC,
                 a.vec_id ASC) AS BIGINT) AS rk
        FROM assign a JOIN probe p USING (centroid_id)
        WHERE a.vec_id <> p.query_id) t
      WHERE rk <= 5
      ORDER BY query_id, rk
    """)),

    // IVF with a TRAINED coarse quantizer: `ivfKmeansIters` integer Lloyd
    // iterations (e6-quantized vectors, exact BIGINT dot assignment,
    // per-dimension floor-mean recentering) over the stride init — k-means
    // training as mergeable-aggregate Spark, replayed verbatim by the
    // oracle (the rounds below are GENERATED from the same iteration
    // count; Spark's fixed-point early stop is oracle-neutral because a
    // converged Lloyd round rewrites the same centroid table). The
    // all-integer training loop is what makes a TRAINED index
    // hash-checkable at all: a raw-double loop would let one 1-ulp
    // assignment flip cascade through the means into a different index
    // per engine. Only the final re-rank touches floats (e9-guarded).
    Q("sim_ann_ivf_kmeans", (s, dir) =>
      ivfTrainedTopK(t(s, dir, "embeddings"), 0L, 10), sql = Some(s"""
      WITH base AS (
        SELECT vec_id,
               list_transform(embedding,
                 x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS ve6
        FROM embeddings),
      prm AS (
        SELECT nl, greatest(6, (nl * 3) // 8) AS np,
               greatest(CAST(floor(n / nl) AS BIGINT), 1) AS stride
        FROM (SELECT greatest(16, least(4096,
                       CAST(floor(sqrt(COUNT(*))) AS BIGINT))) AS nl,
                     COUNT(*) AS n
              FROM embeddings) t),
      c0 AS (
        SELECT vec_id AS centroid_id, ve6 AS ce6
        FROM base, prm s
        WHERE vec_id % s.stride = 0 AND vec_id < s.stride * s.nl),
      ${duckLloydRounds(ivfKmeansIters)}
      aF AS (
        SELECT vec_id, centroid_id FROM (
          SELECT b.vec_id, c.centroid_id,
                 row_number() OVER (PARTITION BY b.vec_id ORDER BY
                   list_sum(list_transform(list_zip(b.ve6, c.ce6), p -> p[1] * p[2])) DESC,
                   c.centroid_id ASC) AS rk
          FROM base b CROSS JOIN c$ivfKmeansIters c) t
        WHERE rk = 1),
      qv AS (SELECT ve6 AS qe6 FROM base WHERE vec_id = 0),
      probed AS (
        SELECT centroid_id FROM (
          SELECT centroid_id, p.np,
                 row_number() OVER (ORDER BY
                   list_sum(list_transform(list_zip(ce6, qe6), p -> p[1] * p[2])) DESC,
                   centroid_id ASC) AS rk
          FROM c$ivfKmeansIters CROSS JOIN qv CROSS JOIN prm p) t
        WHERE rk <= np)
      SELECT vec_id, cosine_e9 FROM (
        SELECT b.vec_id,
               CAST(floor($duckCosine * 1e9 + 0.5) AS BIGINT) AS cosine_e9
        FROM embeddings b
        JOIN aF ON aF.vec_id = b.vec_id
        JOIN probed p ON aF.centroid_id = p.centroid_id
        CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) a(embedding)
        WHERE b.vec_id <> 0
        ORDER BY cosine_e9 DESC, b.vec_id ASC LIMIT 10) t
    """)),

    // ANN via PRODUCT QUANTIZATION: train pqKsub sub-centroids per pqM
    // subspace (integer Lloyd, generated-round oracle like the IVF
    // trainer), encode 64 floats → pqM byte codes (16× corpus shrink at
    // the shipped m=16 geometry — the piece
    // that makes 100 TB of embeddings scannable at all), ADC-scan the
    // CODES table against the query's broadcast distance table, exact
    // e9-cosine re-rank of the k·refine survivors only. All-integer up to
    // the re-rank, so the candidate set is engine-exact and the oracle
    // replays training + encode + ADC verbatim.
    Q("sim_ann_pq", (s, dir) =>
      pqTopK(t(s, dir, "embeddings"), 0L, 10), sql = Some(s"""
      WITH base AS (
        SELECT vec_id, ve6,
               greatest(sqrt(CAST(CAST(list_sum(list_transform(ve6, v -> v * v))
                                  AS BIGINT) AS DOUBLE)),
                        CAST(1e-12 AS DOUBLE)) AS nrm
        FROM (SELECT vec_id,
                     list_transform(embedding,
                       x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS ve6
              FROM embeddings) t0),
      nbase AS (
        SELECT vec_id,
               list_transform(ve6,
                 v -> CAST(floor(CAST(v AS DOUBLE) / nrm * 1000000 + 0.5) AS BIGINT)) AS ne6
        FROM base),
      subs AS (
        SELECT vec_id, CAST(mi AS INT) AS m,
               list_slice(ne6, mi * ${pqDim / pqM} + 1,
                          mi * ${pqDim / pqM} + ${pqDim / pqM}) AS sub
        FROM nbase, UNNEST(range(0, ${pqM})) t(mi)),
      prm AS (
        SELECT greatest(CAST(floor(COUNT(*) / ${pqKsub}) AS BIGINT), 1) AS stride
        FROM embeddings),
      p0 AS (
        SELECT m, CAST(vec_id // stride AS INT) AS code, sub AS ce6
        FROM subs, prm
        WHERE vec_id % stride = 0 AND vec_id < stride * ${pqKsub}),
      ${duckPqRounds(pqKmeansIters)}
      enc AS (
        SELECT vec_id, m, code FROM (
          SELECT s.vec_id, s.m, c.code,
                 row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY
                   list_sum(list_transform(list_zip(s.sub, c.ce6),
                                           p -> (p[1] - p[2]) * (p[1] - p[2]))) ASC,
                   c.code ASC) AS rk
          FROM subs s JOIN p${pqKmeansIters} c ON s.m = c.m) t
        WHERE rk = 1),
      qs AS (SELECT m, sub AS qsub FROM subs WHERE vec_id = 0),
      dt AS (
        SELECT c.m, c.code,
               CAST(list_sum(list_transform(list_zip(q.qsub, c.ce6),
                    p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT) AS dist
        FROM p${pqKmeansIters} c JOIN qs q ON c.m = q.m),
      adc AS (
        SELECT e.vec_id, CAST(SUM(d.dist) AS BIGINT) AS adc
        FROM enc e JOIN dt d ON e.m = d.m AND e.code = d.code
        WHERE e.vec_id <> 0
        GROUP BY e.vec_id),
      cand AS (SELECT vec_id FROM adc ORDER BY adc ASC, vec_id ASC LIMIT ${10 * 8})
      SELECT vec_id, cosine_e9 FROM (
        SELECT b.vec_id, CAST(floor($duckCosine * 1e9 + 0.5) AS BIGINT) AS cosine_e9
        FROM embeddings b JOIN cand USING (vec_id)
        CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) a(embedding)
        ORDER BY cosine_e9 DESC, b.vec_id ASC LIMIT 10) t
    """)),

    // COMPOSED IVF × PQ — the full production serving shape: the trained
    // IVF coarse quantizer prunes WHICH lists a query reads, PQ codes
    // shrink WHAT each read costs, exact re-rank only on the k·refine ADC
    // survivors. The oracle replays BOTH trainings (the generated IVF
    // Lloyd rounds and the generated PQ rounds share one integerized
    // `base`), the derived nlist/nprobe formulas, the probe selection,
    // and the list-restricted ADC scan — every stage before the re-rank
    // is exact integer with id tie-breaks, so the composition stays
    // hash-checkable end to end.
    // Headline measures PROBE cost over the PERSISTED index (first use
    // trains and writes it — Bench's warm-up pass absorbs that build, as
    // a deployment amortizes training offline; ScaleBench annbuild mode
    // measures the build side). The oracle replays the FULL training —
    // integer k-means is deterministic, so the persisted index is
    // bit-identical to an in-query build and one SQL verifies the whole
    // round trip: train → write → read → probe. The inline-build code
    // path stays oracled through sim_ann_ivfpq_join below.
    Q("sim_ann_ivfpq", (s, dir) => {
      val idx = graft.sources.AnnIndex.ensureIvfPq(s, dir)
      ivfPqTopK(t(s, dir, "embeddings"), 0L, 10,
        centroids = Some(idx.centroids), codebooks = Some(idx.codebooks),
        index = Some(idx.index))
    }, sql = Some(duckFullIvfPqProbe(0)), headline = true),

    // Batch ANN join over the composed IVF×PQ index: every 20th vector is
    // a held-out query; each gets its approximate top-5 through the SAME
    // trained coarse quantizer + trained codebooks as sim_ann_ivfpq — the
    // compressed-corpus counterpart of sim_ann_join, and the one-job
    // batch shape a semantic decontamination scan runs at 100 TB. The
    // oracle replays both trainings once and then every per-query probe,
    // list-restricted ADC scan and re-rank through partitioned windows.
    Q("sim_ann_ivfpq_join", (s, dir) =>
      ivfPqAnnJoin(t(s, dir, "embeddings"), 20L, 5), sql = Some(s"""
      WITH base AS (
        SELECT vec_id, ve6,
               greatest(sqrt(CAST(CAST(list_sum(list_transform(ve6, v -> v * v))
                                  AS BIGINT) AS DOUBLE)),
                        CAST(1e-12 AS DOUBLE)) AS nrm
        FROM (SELECT vec_id,
                     list_transform(embedding,
                       x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS ve6
              FROM embeddings) t0),
      iprm AS (
        SELECT nl, greatest(6, (nl * 3) // 8) AS np,
               greatest(CAST(floor(n / nl) AS BIGINT), 1) AS stride
        FROM (SELECT greatest(16, least(4096,
                       CAST(floor(sqrt(COUNT(*))) AS BIGINT))) AS nl,
                     COUNT(*) AS n
              FROM embeddings) t),
      c0 AS (
        SELECT vec_id AS centroid_id, ve6 AS ce6
        FROM base, iprm s
        WHERE vec_id % s.stride = 0 AND vec_id < s.stride * s.nl),
      ${duckLloydRounds(ivfKmeansIters)}
      aF AS (
        SELECT vec_id, centroid_id FROM (
          SELECT b.vec_id, c.centroid_id,
                 row_number() OVER (PARTITION BY b.vec_id ORDER BY
                   list_sum(list_transform(list_zip(b.ve6, c.ce6), p -> p[1] * p[2])) DESC,
                   c.centroid_id ASC) AS rk
          FROM base b CROSS JOIN c$ivfKmeansIters c) t
        WHERE rk = 1),
      probes AS (
        SELECT query_id, centroid_id FROM (
          SELECT q.vec_id AS query_id, c.centroid_id, p.np,
                 row_number() OVER (PARTITION BY q.vec_id ORDER BY
                   list_sum(list_transform(list_zip(c.ce6, q.ve6), p -> p[1] * p[2])) DESC,
                   c.centroid_id ASC) AS rk
          FROM base q CROSS JOIN c$ivfKmeansIters c CROSS JOIN iprm p
          WHERE q.vec_id % 20 = 0) t
        WHERE rk <= np),
      nbase AS (
        SELECT vec_id,
               list_transform(ve6,
                 v -> CAST(floor(CAST(v AS DOUBLE) / nrm * 1000000 + 0.5) AS BIGINT)) AS ne6
        FROM base),
      subs AS (
        SELECT vec_id, CAST(mi AS INT) AS m,
               list_slice(ne6, mi * ${pqDim / pqM} + 1,
                          mi * ${pqDim / pqM} + ${pqDim / pqM}) AS sub
        FROM nbase, UNNEST(range(0, ${pqM})) t(mi)),
      pprm AS (
        SELECT greatest(CAST(floor(COUNT(*) / ${pqKsub}) AS BIGINT), 1) AS stride
        FROM embeddings),
      p0 AS (
        SELECT m, CAST(vec_id // stride AS INT) AS code, sub AS ce6
        FROM subs, pprm
        WHERE vec_id % stride = 0 AND vec_id < stride * ${pqKsub}),
      ${duckPqRounds(pqKmeansIters)}
      enc AS (
        SELECT vec_id, m, code FROM (
          SELECT s.vec_id, s.m, c.code,
                 row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY
                   list_sum(list_transform(list_zip(s.sub, c.ce6),
                                           p -> (p[1] - p[2]) * (p[1] - p[2]))) ASC,
                   c.code ASC) AS rk
          FROM subs s JOIN p${pqKmeansIters} c ON s.m = c.m) t
        WHERE rk = 1),
      qdt AS (
        SELECT s.vec_id AS query_id, c.m, c.code,
               CAST(list_sum(list_transform(list_zip(s.sub, c.ce6),
                    p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT) AS dist
        FROM subs s JOIN p${pqKmeansIters} c ON s.m = c.m
        WHERE s.vec_id % 20 = 0),
      adc AS (
        SELECT d.query_id, e.vec_id, CAST(SUM(d.dist) AS BIGINT) AS adc
        FROM enc e
        JOIN qdt d ON e.m = d.m AND e.code = d.code
        JOIN aF a ON a.vec_id = e.vec_id
        JOIN probes pr ON pr.query_id = d.query_id
                      AND pr.centroid_id = a.centroid_id
        WHERE e.vec_id <> d.query_id
        GROUP BY d.query_id, e.vec_id),
      cand AS (
        SELECT query_id, vec_id FROM (
          SELECT query_id, vec_id,
                 row_number() OVER (PARTITION BY query_id ORDER BY
                   adc ASC, vec_id ASC) AS ark
          FROM adc) t
        WHERE ark <= ${5 * 8})
      SELECT query_id, rk, vec_id, cosine_e9 FROM (
        SELECT c.query_id, b.vec_id,
               CAST(floor(${duckCos("b.embedding", "q.embedding")} * 1e9 + 0.5) AS BIGINT)
                 AS cosine_e9,
               CAST(row_number() OVER (PARTITION BY c.query_id ORDER BY
                 CAST(floor(${duckCos("b.embedding", "q.embedding")} * 1e9 + 0.5) AS BIGINT) DESC,
                 b.vec_id ASC) AS BIGINT) AS rk
        FROM cand c
        JOIN embeddings b ON b.vec_id = c.vec_id
        JOIN embeddings q ON q.vec_id = c.query_id) t
      WHERE rk <= 5
      ORDER BY query_id, rk
    """)),

    // Incremental index admission — the ANN analogue of
    // dedup_incremental's fingerprint admission: the standing corpus
    // (9/10 of the vectors) trains the coarse quantizer and PQ codebooks
    // and is fused into the index; the held-out batch (vec_id % 10 == 3 —
    // a residue the deterministic stride samplers can never fully land
    // on, so training always keeps its centroid/codebook seeds) is then
    // ADMITTED with no
    // retraining — one map-shaped assignment+encoding pass
    // (AnnIndex.admit) whose rows union onto the standing index — and
    // the probe runs over the union. At 100 TB this is the daily-ingest
    // path: training amortizes over the corpus epoch, each batch costs
    // one scan of itself and a parquet append. The oracle replays the
    // asymmetry exactly: every training CTE (Lloyd rounds, codebook
    // rounds, strides, nlist) reads ONLY the standing subset, while
    // assignment, encoding, probe and re-rank read the full corpus — a
    // Spark-side leak of batch rows into training (or vice versa)
    // hash-diverges immediately.
    Q("sim_ann_ivfpq_incr", (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val standing = emb.filter(col("vec_id") % 10 =!= 3)
      val batch = emb.filter(col("vec_id") % 10 === 3)
      val nl = autoNlist(standing.count())
      val np = autoNprobe(nl)
      val (cent, cb, standingIdx) = trainAndFuse(standing, nl)
      val admitted = graft.sources.AnnIndex.admit(
        graft.sources.AnnIndex.IvfPq(cent, cb, standingIdx), batch)
      ivfPqTopK(emb, 0L, 10, nlist = nl, nprobe = np,
        centroids = Some(cent), codebooks = Some(cb),
        index = Some(standingIdx.unionByName(admitted)))
    }, sql = Some(s"""
      WITH base AS (
        SELECT vec_id, ve6,
               row_number() OVER (ORDER BY vec_id) - 1 AS rid,
               greatest(sqrt(CAST(CAST(list_sum(list_transform(ve6, v -> v * v))
                                  AS BIGINT) AS DOUBLE)),
                        CAST(1e-12 AS DOUBLE)) AS nrm
        FROM (SELECT vec_id,
                     list_transform(embedding,
                       x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS ve6
              FROM embeddings WHERE vec_id % 10 <> 3) t0),
      abase AS (
        SELECT vec_id, ve6,
               greatest(sqrt(CAST(CAST(list_sum(list_transform(ve6, v -> v * v))
                                  AS BIGINT) AS DOUBLE)),
                        CAST(1e-12 AS DOUBLE)) AS nrm
        FROM (SELECT vec_id,
                     list_transform(embedding,
                       x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS ve6
              FROM embeddings) t0),
      iprm AS (
        SELECT nl, greatest(6, (nl * 3) // 8) AS np,
               greatest(CAST(floor(n / nl) AS BIGINT), 1) AS stride
        FROM (SELECT greatest(16, least(4096,
                       CAST(floor(sqrt(COUNT(*))) AS BIGINT))) AS nl,
                     COUNT(*) AS n
              FROM embeddings WHERE vec_id % 10 <> 3) t),
      c0 AS (
        SELECT rid AS centroid_id, ve6 AS ce6
        FROM base, iprm s
        WHERE rid % s.stride = 0 AND rid < s.stride * s.nl),
      ${duckLloydRounds(ivfKmeansIters)}
      aF AS (
        SELECT vec_id, centroid_id FROM (
          SELECT b.vec_id, c.centroid_id,
                 row_number() OVER (PARTITION BY b.vec_id ORDER BY
                   list_sum(list_transform(list_zip(b.ve6, c.ce6), p -> p[1] * p[2])) DESC,
                   c.centroid_id ASC) AS rk
          FROM abase b CROSS JOIN c$ivfKmeansIters c) t
        WHERE rk = 1),
      qiv AS (SELECT ve6 AS qe6 FROM abase WHERE vec_id = 0),
      probed AS (
        SELECT centroid_id FROM (
          SELECT centroid_id, p.np,
                 row_number() OVER (ORDER BY
                   list_sum(list_transform(list_zip(ce6, qe6), p -> p[1] * p[2])) DESC,
                   centroid_id ASC) AS rk
          FROM c$ivfKmeansIters CROSS JOIN qiv CROSS JOIN iprm p) t
        WHERE rk <= np),
      nbase AS (
        SELECT vec_id, rid,
               list_transform(ve6,
                 v -> CAST(floor(CAST(v AS DOUBLE) / nrm * 1000000 + 0.5) AS BIGINT)) AS ne6
        FROM base),
      subs AS (
        SELECT vec_id, rid, CAST(mi AS INT) AS m,
               list_slice(ne6, mi * ${pqDim / pqM} + 1,
                          mi * ${pqDim / pqM} + ${pqDim / pqM}) AS sub
        FROM nbase, UNNEST(range(0, ${pqM})) t(mi)),
      anbase AS (
        SELECT vec_id,
               list_transform(ve6,
                 v -> CAST(floor(CAST(v AS DOUBLE) / nrm * 1000000 + 0.5) AS BIGINT)) AS ne6
        FROM abase),
      asubs AS (
        SELECT vec_id, CAST(mi AS INT) AS m,
               list_slice(ne6, mi * ${pqDim / pqM} + 1,
                          mi * ${pqDim / pqM} + ${pqDim / pqM}) AS sub
        FROM anbase, UNNEST(range(0, ${pqM})) t(mi)),
      pprm AS (
        SELECT greatest(CAST(floor(COUNT(*) / ${pqKsub}) AS BIGINT), 1) AS stride
        FROM embeddings WHERE vec_id % 10 <> 3),
      p0 AS (
        SELECT m, CAST(rid // stride AS INT) AS code, sub AS ce6
        FROM subs, pprm
        WHERE rid % stride = 0 AND rid < stride * ${pqKsub}),
      ${duckPqRounds(pqKmeansIters)}
      enc AS (
        SELECT vec_id, m, code FROM (
          SELECT s.vec_id, s.m, c.code,
                 row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY
                   list_sum(list_transform(list_zip(s.sub, c.ce6),
                                           p -> (p[1] - p[2]) * (p[1] - p[2]))) ASC,
                   c.code ASC) AS rk
          FROM asubs s JOIN p$pqKmeansIters c ON s.m = c.m) t
        WHERE rk = 1),
      qs AS (SELECT m, sub AS qsub FROM asubs WHERE vec_id = 0),
      dt AS (
        SELECT c.m, c.code,
               CAST(list_sum(list_transform(list_zip(q.qsub, c.ce6),
                    p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT) AS dist
        FROM p$pqKmeansIters c JOIN qs q ON c.m = q.m),
      adc AS (
        SELECT e.vec_id, CAST(SUM(d.dist) AS BIGINT) AS adc
        FROM enc e
        JOIN dt d ON e.m = d.m AND e.code = d.code
        JOIN aF a ON a.vec_id = e.vec_id
        JOIN probed pr ON a.centroid_id = pr.centroid_id
        WHERE e.vec_id <> 0
        GROUP BY e.vec_id),
      cand AS (SELECT vec_id FROM adc ORDER BY adc ASC, vec_id ASC LIMIT ${10 * 8})
      SELECT vec_id, cosine_e9 FROM (
        SELECT b.vec_id, CAST(floor($duckCosine * 1e9 + 0.5) AS BIGINT) AS cosine_e9
        FROM embeddings b JOIN cand USING (vec_id)
        CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) a(embedding)
        ORDER BY cosine_e9 DESC, b.vec_id ASC LIMIT 10) t
    """)),

    // Ingest-time semantic dedup: the incoming batch (vec_id % 10 == 3)
    // probed as an EXTERNAL query panel against the index of the
    // standing corpus — every batch member flagged is_dup iff its best
    // exact-re-ranked ANN neighbor in the STANDING set clears cosine
    // 0.4. The membership question a pipeline asks before admitting new
    // documents; batch kernel of the streaming twin (StreamingSpec pins
    // foreachBatch parity). Oracle: training/index CTEs read only the
    // standing subset, the panel CTEs only the batch, and the final
    // LEFT join keeps candidate-less members as is_dup = FALSE.
    Q("dedup_semantic_ingest", (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val standing = emb.filter(col("vec_id") % 10 =!= 3)
      val batch = emb.filter(col("vec_id") % 10 === 3)
      val nl = autoNlist(standing.count())
      val np = autoNprobe(nl)
      val (cent, cb, idx) = trainAndFuse(standing, nl)
      semanticDupFlags(batch, standing, k = 5, thresholdE9 = 400000000L,
        nlist = nl, nprobe = np,
        centroids = Some(cent), codebooks = Some(cb), index = Some(idx))
    }, sql = Some(duckSemanticIngest(10, 3, 400000000L, 5, 0))),

    // Epoch-retrain lifecycle, oracled END TO END: init the ingest root
    // on the standing 9/10 of the corpus, ingest the held-out tenth as
    // two batches (threshold above max cosine_e9, so every member is
    // admitted — dup DETECTION is dedup_semantic_ingest's row; this row
    // pins the index lifecycle), epoch-retrain from the grown vector
    // table, probe the retrained persisted index. The oracle is the
    // FROM-SCRATCH full-corpus build + probe (duckFullIvfPqProbe at
    // query vec 3): retrain's contract is exactly that the lifecycle
    // converges to the from-scratch index — a stale quantizer left
    // behind, a batch row missing from the vector table, or a retrain
    // that re-reads anything narrower than the grown corpus all
    // hash-diverge here. The root is rebuilt from scratch each run so
    // the replay is deterministic.
    Q("sim_ann_ivfpq_retrain", (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val standing = emb.filter(col("vec_id") % 10 =!= 3)
      val batch1 = emb.filter(col("vec_id") % 20 === 3)
      val batch2 = emb.filter(col("vec_id") % 10 === 3 &&
        col("vec_id") % 20 =!= 3)
      val root = new java.io.File(System.getProperty("java.io.tmpdir"),
        "graft_annretrain_" + dir.replaceAll("[^A-Za-z0-9._-]", "_"))
      org.apache.commons.io.FileUtils.deleteQuietly(root)
      graft.sources.AnnIndex.initIngest(standing, root.getPath)
      graft.sources.AnnIndex.ingest(root.getPath, batch1,
        thresholdE9 = 1000000001L, batchId = Some(1L))
      graft.sources.AnnIndex.ingest(root.getPath, batch2,
        thresholdE9 = 1000000001L, batchId = Some(2L))
      val idx = graft.sources.AnnIndex.retrain(s, root.getPath)
      val nl = autoNlist(emb.count())
      ivfPqTopK(emb, 3L, 10, nlist = nl, nprobe = autoNprobe(nl),
        centroids = Some(idx.centroids), codebooks = Some(idx.codebooks),
        index = Some(idx.index))
    }, sql = Some(duckFullIvfPqProbe(3))),

    // The SERVED point-query path, oracled end to end: initIngest builds
    // a real ingest root (Hadoop-FS protocol, vec_id-BUCKETED vector
    // base), then AnnIndex.probeTopK answers through the persisted
    // artifacts with the bucket-pruned exact-re-rank fetch
    // (SelectedBucketsCount plan-pinned in AnnIndexSpec) — the same
    // from-scratch oracle as sim_ann_ivfpq, so a divergence anywhere in
    // the serving chain (root protocol, bucketed base round-trip,
    // candidate-id collect, pruned fetch, delta union) hash-fails here
    // rather than hiding behind the spec-level ivfPqTopK parity pin.
    // The root is rebuilt from scratch each run so the replay is
    // deterministic.
    Q("sim_ann_probe_serving", (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val root = new java.io.File(System.getProperty("java.io.tmpdir"),
        "graft_annprobe_" + dir.replaceAll("[^A-Za-z0-9._-]", "_"))
      org.apache.commons.io.FileUtils.deleteQuietly(root)
      graft.sources.AnnIndex.initIngest(emb, root.getPath)
      graft.sources.AnnIndex.probeTopK(s, root.getPath, 0L, k = 10)
    }, sql = Some(duckFullIvfPqProbe(0))),

    // Per-language embedding centroid (mean pooling — the "cluster/domain
    // prototype" step of a training-mix pipeline). Elements are e6-quantized
    // PER ROW before the cross-row sum, so the aggregation is integer and
    // order-independent; the mean is one IEEE divide + floor at the end.
    // Shape at 100 TB: join on the id, posexplode, ONE hash agg keyed by
    // (lang, dim) — 5×64 cells, partials map-side; no window, no collect.
    Q("m2_lang_centroid", (s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .join(t(s, dir, "embeddings"), $"doc_id" === $"vec_id")
        .select($"lang", posexplode($"embedding").as(Seq("d", "x")))
        .groupBy($"lang", $"d")
        .agg(count(lit(1)).as("n"),
          sum(floor($"x".cast("double") * 1e6 + 0.5).cast("long")).as("sum_e6"))
        .select($"lang", $"d", $"n", $"sum_e6",
          floor($"sum_e6".cast("double") / $"n" + 0.5).cast("long").as("mean_e6"))
        .orderBy($"lang", $"d")
    }, sql = Some("""
      SELECT lang, d - 1 AS d, COUNT(*) AS n,
             CAST(SUM(CAST(floor(CAST(embedding[d] AS DOUBLE) * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
               AS sum_e6,
             CAST(floor(CAST(SUM(CAST(floor(CAST(embedding[d] AS DOUBLE) * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
                        / COUNT(*) + 0.5) AS BIGINT) AS mean_e6
      FROM documents JOIN embeddings ON doc_id = vec_id
      CROSS JOIN UNNEST(range(1, 65)) t(d)
      GROUP BY lang, d ORDER BY lang, d
    """)),

    // Int8 symmetric quantization round-trip (the embedding-compression
    // step before ANN serving): per vector, scale = max|x|/127,
    // qᵢ = floor(xᵢ/scale + 0.5) clamped to [-127,127], and the
    // dequantization error maxᵢ|xᵢ - qᵢ·scale|. Every step is either an
    // exact comparison (max) or the same IEEE op sequence per element in
    // both engines; errors are e9-quantized per element before the
    // (integer) cross-element sum. Map-only — no shuffle at any scale.
    // Invariant spec'd: max_err <= scale/2 (half-ulp of the int8 grid).
    Q("sim_quantize_error", (s, dir) => {
      import s.implicits._
      t(s, dir, "embeddings")
        .withColumn("scale", expr(
          "array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127"))
        .withColumn("errs", expr(
          """transform(embedding, x ->
             abs(CAST(x AS DOUBLE) -
                 greatest(CAST(-127 AS DOUBLE), least(CAST(127 AS DOUBLE),
                   floor(CAST(x AS DOUBLE) / scale + 0.5))) * scale))"""))
        .select($"vec_id",
          floor($"scale" * 1e9 + 0.5).cast("long").as("scale_e9"),
          expr("CAST(floor(array_max(errs) * 1e9 + 0.5) AS BIGINT)").as("max_err_e9"),
          expr("""aggregate(errs, CAST(0 AS BIGINT),
                  (acc, e) -> acc + CAST(floor(e * 1e9 + 0.5) AS BIGINT))""")
            .as("sum_err_e9"))
        .orderBy($"vec_id")
    }, sql = Some("""
      WITH q AS (
        SELECT vec_id,
               list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127 AS scale,
               embedding
        FROM embeddings),
      e AS (
        SELECT vec_id, scale,
               list_transform(embedding, x ->
                 abs(CAST(x AS DOUBLE) -
                     greatest(CAST(-127 AS DOUBLE), least(CAST(127 AS DOUBLE),
                       floor(CAST(x AS DOUBLE) / scale + 0.5))) * scale)) AS errs
        FROM q)
      SELECT vec_id,
             CAST(floor(scale * 1e9 + 0.5) AS BIGINT) AS scale_e9,
             CAST(floor(list_max(errs) * 1e9 + 0.5) AS BIGINT) AS max_err_e9,
             CAST(list_sum(list_transform(errs,
                    e -> CAST(floor(e * 1e9 + 0.5) AS BIGINT))) AS BIGINT) AS sum_err_e9
      FROM e ORDER BY vec_id
    """)),

    // Modality-mix catalog stats: documents ⋈ synthesized media table ⋈
    // embeddings (left join — not every doc has a vector at sf0.1), per
    // (lang, media format): docs, total fake frames, how many carry an
    // embedding. The media metadata derives deterministically from doc
    // properties (Multimodal.mediaTable), so the oracle rebuilds it
    // column-for-column without touching the binary payload.
    Q("m3_modality_mix", (s, dir) => {
      import s.implicits._
      val media = graft.ext.Multimodal.mediaTable(t(s, dir, "documents"))
        .select($"doc_id", $"meta.format".as("format"),
          $"meta.n_frames".as("n_frames"))
      t(s, dir, "documents").select($"doc_id", $"lang")
        .join(media, Seq("doc_id"))
        .join(t(s, dir, "embeddings").select($"vec_id"),
          $"doc_id" === $"vec_id", "left")
        .groupBy($"lang", $"format")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_frames".cast("long")).as("total_frames"),
          count($"vec_id").as("n_with_embedding"))
        .orderBy($"lang", $"format")
    }, sql = Some("""
      WITH media AS (
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'wav' END AS format,
               doc_id % 8 + 1 AS n_frames
        FROM documents)
      SELECT d.lang, m.format, COUNT(*) AS n_docs,
             CAST(SUM(m.n_frames) AS BIGINT) AS total_frames,
             COUNT(e.vec_id) AS n_with_embedding
      FROM documents d
      JOIN media m USING (doc_id)
      LEFT JOIN embeddings e ON d.doc_id = e.vec_id
      GROUP BY d.lang, m.format ORDER BY d.lang, m.format
    """)),

    // M4: frame sampling through the driver gate — Multimodal.sampleFrames
    // (posexplode of byte slices, every-k stride) rendered as hex so both
    // engines compare strings. The media payload is the deterministic
    // md5-digest stand-in, so the oracle reconstructs each 4-byte frame as
    // 8 hex chars of DuckDB's md5() (upper-cased to Spark's hex()
    // convention); frames past the 16-byte digest are empty in BOTH
    // engines (substring-beyond-length parity). Scale: slicing + explode
    // is map-only; blobs are sliced at the source, never duplicated whole
    // or shuffled.
    Q("m4_frame_sample", (s, dir) => {
      import s.implicits._
      val media = graft.ext.Multimodal.mediaTable(t(s, dir, "documents"))
      graft.ext.Multimodal.sampleFrames(media, everyK = 2)
        .select($"doc_id", $"frame_idx".cast("long").as("frame_idx"),
          hex($"frame_bytes").as("frame_hex"))
        .orderBy($"doc_id", $"frame_idx")
    }, sql = Some("""
      SELECT doc_id, k AS frame_idx,
             upper(substr(md5(text), CAST(k * 8 + 1 AS INT), 8)) AS frame_hex
      FROM documents
      CROSS JOIN UNNEST(range(0, 8)) t(k)
      WHERE k < doc_id % 8 + 1 AND k % 2 = 0
      ORDER BY doc_id, frame_idx
    """)),

    // Semantic (embedding-based) decontamination: the retrieval
    // counterpart of p3's 8-gram decontamination. The held-out panel
    // (every 20th id) stands in for the eval set; any TRAIN doc whose
    // embedding lands in a panel member's approximate top-5 at cosine
    // >= 0.4 is flagged and removed; per-language corpus accounting
    // comes back out. At 100 TB: the whole flag set is ONE batch ANN
    // join (never eval × corpus — the ivfAnnJoin contract), the flagged
    // ids are <= panel*k rows (broadcast anti-join against the corpus),
    // and the per-language tally is a mergeable agg. The oracle replays
    // the identical integer index formulas, then the threshold + set
    // difference.
    Q("p5_semantic_decontam", (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val flagged = ivfAnnJoin(emb, 20L, 5)
        .filter(col("cosine_e9") >= 400000000L && col("vec_id") % 20 =!= 0)
        .select(col("vec_id")).distinct()
      val train = t(s, dir, "documents").filter(col("doc_id") % 20 =!= 0)
      train.join(flagged, train("doc_id") === flagged("vec_id"), "left_outer")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          count(col("vec_id")).as("n_removed"),
          (count(lit(1)) - count(col("vec_id"))).as("n_kept"),
          sum(when(col("vec_id").isNull, col("n_chars")).otherwise(0))
            .as("kept_chars"))
        .orderBy(col("lang"))
    }, sql = Some(s"""
      WITH prm AS (
        SELECT nl, greatest(6, (nl * 3) // 8) AS np,
               greatest(CAST(floor(n / nl) AS BIGINT), 1) AS stride
        FROM (SELECT greatest(16, least(4096,
                       CAST(floor(sqrt(COUNT(*))) AS BIGINT))) AS nl,
                     COUNT(*) AS n
              FROM embeddings) t),
      cent AS (
        SELECT vec_id AS centroid_id, embedding AS centroid
        FROM embeddings, prm s
        WHERE vec_id % s.stride = 0 AND vec_id < s.stride * s.nl),
      assign AS (
        SELECT vec_id, embedding, centroid_id FROM (
          SELECT e.vec_id, e.embedding, c.centroid_id,
                 row_number() OVER (PARTITION BY e.vec_id ORDER BY
                   CAST(floor(${duckCos("e.embedding", "c.centroid")} * 1e9 + 0.5) AS BIGINT) DESC,
                   c.centroid_id ASC) AS rk
          FROM embeddings e CROSS JOIN cent c) t
        WHERE rk = 1),
      q AS (
        SELECT vec_id AS query_id, embedding AS qe
        FROM embeddings WHERE vec_id % 20 = 0),
      probe AS (
        SELECT query_id, qe, centroid_id FROM (
          SELECT q.query_id, q.qe, c.centroid_id, p.np,
                 row_number() OVER (PARTITION BY q.query_id ORDER BY
                   CAST(floor(${duckCos("c.centroid", "q.qe")} * 1e9 + 0.5) AS BIGINT) DESC,
                   c.centroid_id ASC) AS rk
          FROM cent c CROSS JOIN q CROSS JOIN prm p) t
        WHERE rk <= np),
      ranked AS (
        SELECT p.query_id, a.vec_id,
               CAST(floor(${duckCos("a.embedding", "p.qe")} * 1e9 + 0.5) AS BIGINT) AS cosine_e9,
               row_number() OVER (PARTITION BY p.query_id ORDER BY
                 CAST(floor(${duckCos("a.embedding", "p.qe")} * 1e9 + 0.5) AS BIGINT) DESC,
                 a.vec_id ASC) AS rk
        FROM assign a JOIN probe p USING (centroid_id)
        WHERE a.vec_id <> p.query_id),
      flagged AS (
        SELECT DISTINCT vec_id FROM ranked
        WHERE rk <= 5 AND cosine_e9 >= 400000000 AND vec_id % 20 <> 0),
      train AS (SELECT * FROM documents WHERE doc_id % 20 <> 0)
      SELECT t.lang, COUNT(*) AS n_docs,
             COUNT(f.vec_id) AS n_removed,
             COUNT(*) - COUNT(f.vec_id) AS n_kept,
             CAST(SUM(CASE WHEN f.vec_id IS NULL THEN t.n_chars ELSE 0 END) AS BIGINT) AS kept_chars
      FROM train t LEFT JOIN flagged f ON t.doc_id = f.vec_id
      GROUP BY t.lang ORDER BY t.lang
    """), headline = true),

    // Cross-modal join: text table ⋈ vector table on the shared id, per
    // language: doc count, total chars, Σ‖v‖² in micro-units (per-row fold
    // rounded to ints BEFORE summing → order-independent, drift-immune).
    Q("m1_crossmodal_join", (s, dir) => {
      import s.implicits._
      val norm2e6 = floor(dot("embedding", "embedding") * 1e6 + 0.5).cast("long")
      t(s, dir, "documents")
        .join(t(s, dir, "embeddings"), $"doc_id" === $"vec_id")
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("total_chars"),
             sum(norm2e6).as("sum_norm2_e6"))
        .orderBy($"lang")
    }, sql = Some("""
      SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
             CAST(SUM(CAST(floor(list_sum(list_transform(embedding,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
               AS sum_norm2_e6
      FROM documents JOIN embeddings ON doc_id = vec_id
      GROUP BY lang ORDER BY lang
    """))
  )
}
