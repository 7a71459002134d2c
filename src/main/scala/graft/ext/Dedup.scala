package graft.ext

import graft.{Q, QModule}
import graft.Tables.t
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline over `documents`
  * (extension tier; the reference's only dedup is the key-set anti-join
  * A1-A3, covered in Joins/Upsert).
  *
  * Scale posture: everything routes through an *inverted index* (explode →
  * shuffle on shingle/bucket → pair counting), never an O(n²) cross join.
  * At 100 TB the shingle explode is the dominant shuffle; band-bucketing
  * (MinHash/SimHash) exists precisely to keep candidate pairs ~linear.
  * Exact-frequency hot shingles (stopword runs) would skew the shuffle —
  * `jaccardPairs` drops shingles appearing in > maxDf docs from the
  * inverted index before pair generation, the standard guard.
  */
object Dedup {

  /** Distinct k-word shingles per doc: (doc_id, shingle).
    *
    * The input is repartitioned to the session's parallelism first:
    * shingling is the CPU-heavy per-row stage, and when the source has
    * fewer splits than cores (small files / single parquet row group —
    * exactly the testdata shape) it would otherwise serialize on one task.
    * The repartition shuffles only the raw docs (cheap) and is what you'd
    * do at 100 TB too for an under-split input. */
  /** `spread = false` skips the repartition for callers whose input is
    * ALREADY a spread materialized stage (p1/p3's gated checkpoint) —
    * the exchange there re-shuffled the full text for nothing. A runtime
    * partition-count probe (`df.rdd.getNumPartitions`, the Tables.spread
    * idiom) is deliberately NOT used here: the probe plans the whole
    * subtree on every query construction, which the bench times (r15:
    * +~50 ms/pass on raw-scan callers). Static caller knowledge is free. */
  /** Distinct k-shingle array expression over a `toks` column. Callers
    * MUST guard with `size(toks) >= k` first (sequence(1, n-k+1) descends
    * through 0 otherwise and `slice` rejects start 0) — and must keep the
    * expression INLINE in its consumer rather than projecting it to an
    * alias that a Generate explodes: exploding a bare attribute lets
    * InferFiltersFromGenerate infer `size(shs) > 0`, inline the alias,
    * and push the inferred predicate BELOW the guard filter (filters
    * reorder freely), evaluating slice(…, 0, k) on unguarded rows — the
    * exact crash EdgeCasesSpec's eval-only p3 case caught when r15 first
    * factored this through a projected column. Inline generator
    * expressions are exempt from that inference (SPARK-36715 limits it
    * to cheap extractions). */
  private def shingleArrExpr(k: Int): Column = expr(
    s"array_distinct(transform(sequence(1, size(toks) - ${k - 1}), i -> concat_ws(' ', slice(toks, i, $k))))")

  /** (doc_id, toks) of docs with at least k tokens — the guarded base
    * both the explode and the map-side size projection build on (r15). */
  private def tokBase(docs: DataFrame, k: Int, spread: Boolean): DataFrame =
    (if (spread)
      docs.repartition(docs.sparkSession.sparkContext.defaultParallelism,
        col("doc_id"))
     else docs)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
      .filter(size(col("toks")) >= k)

  def shingles(docs: DataFrame, k: Int = 5, spread: Boolean = true): DataFrame =
    tokBase(docs, k, spread)
      .select(col("doc_id"), explode(shingleArrExpr(k)).as("shingle"))

  /** Exact n-gram Jaccard over an inverted shingle index: pairs with
    * 10·|∩| >= threshNum·|∪| (integer predicate — no float boundary).
    *
    * `maxDf` is the hot-shingle skew guard: a shingle occurring in d
    * documents contributes d² candidate pairs to the self-join, so one
    * boilerplate phrase shared by 1 % of a 100 TB corpus would pin a
    * single shuffle key. Shingles with document frequency > maxDf are
    * dropped from the INDEX before pair generation (the per-doc sizes —
    * the Jaccard denominator — still count them, so capped similarity
    * only ever under-estimates; the standard conservative semantics).
    *
    * Execution shape: ONE shuffle on shingle builds posting lists
    * (collect_list); the cap is then just the list-length filter, and
    * candidate pairs expand map-side from each surviving list — bounded at
    * maxDf·(maxDf−1)/2 pairs per shingle BY CONSTRUCTION, so no shuffle
    * key can run hot. (The r2 self-join formulation re-shuffled the index
    * twice and, with a df side-aggregate bolted on, benched 1.5× slower —
    * the regression guard caught it; this shape restored the r2 time with
    * the cap active.) On the test corpus max df is 4, so the default cap
    * of 10 changes nothing — DedupSkewSpec plants a 50-doc hot phrase to
    * prove the guard works. */
  def jaccardPairs(docs: DataFrame, k: Int = 5, threshNum: Int = 3,
                   maxDf: Int = 10, spread: Boolean = true): DataFrame = {
    val sh = shingles(docs, k, spread)
    // sizes via explode→groupBy(doc_id), NOT a map-side size(arr)
    // projection: r15 measured the "cheaper" map-side form 3.4-3.8×
    // SLOWER end-to-end — the aggregate's exchange is what makes the
    // sizes table (a) tiny and broadcastable to BOTH sizes joins below
    // (the map-side form's size estimate is the raw text scan's, so AQE
    // stops broadcasting it), and (b) ReuseExchange-shared between those
    // joins (the map-side form re-ran the whole split+shingle transform
    // once PER join). The extra shuffle is 5 k rows; the thing it buys
    // is one-shot computation + broadcast of the heavy map.
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    // size >= 2: singleton posting lists (the vast majority — most
    // shingles are unique) contribute zero pairs, so drop them BEFORE
    // the pair-expansion stage ever sees them; size <= maxDf is the
    // hot-shingle skew cap (scaladoc above)
    val posting = sh.groupBy(col("shingle"))
      .agg(collect_list(col("doc_id")).as("ds"))
      .filter(size(col("ds")).between(2, maxDf))
    val pairs = postingPairs(posting)
      .groupBy(col("doc_i"), col("doc_j"))
      .agg(count(lit(1)).as("shared"))
    pairs
      .join(sizes.withColumnRenamed("doc_id", "doc_i")
                 .withColumnRenamed("n_sh", "n_i"), Seq("doc_i"))
      .join(sizes.withColumnRenamed("doc_id", "doc_j")
                 .withColumnRenamed("n_sh", "n_j"), Seq("doc_j"))
      .withColumn("union_n", col("n_i") + col("n_j") - col("shared"))
      .filter(col("shared") * 10 >= col("union_n") * threshNum)
      .select(col("doc_i"), col("doc_j"), col("shared"), col("union_n"),
        (col("shared").cast("double") / col("union_n")).as("jaccard"))
  }

  /** Map-side pair expansion of posting lists: input has an array column
    * `ds` of doc ids (one row per inverted-index key — shingle, LSH
    * bucket, SimHash chunk); output is one row per ordered pair
    * (doc_i < doc_j) drawn from the same list.
    *
    * This is THE skew-proof candidate-generation shape: the only shuffle
    * is the groupBy that built the lists, and because every caller caps
    * list length (maxDf / maxBucket) BEFORE this expansion, no task ever
    * materializes more than cap·(cap−1)/2 pairs per key — an all-pairs
    * blow-up is impossible by construction, not by hoping the data is
    * nice. (Contrast the bucket self-join it replaced: one degenerate
    * bucket — empty/boilerplate docs all hashing identically, which a
    * 100 TB crawl always contains — put d² pairs on a single shuffle key.) */
  private[ext] def postingPairs(posting: DataFrame): DataFrame =
    posting
      .select(explode(expr(
        "filter(flatten(transform(ds, x -> transform(ds, y -> struct(x AS i, y AS j)))), p -> p.i < p.j)"))
        .as("p"))
      .select(col("p.i").as("doc_i"), col("p.j").as("doc_j"))

  /** Connected components over near-dup pairs: every doc in a dup cluster
    * mapped to the cluster's canonical representative (min doc_id) — the
    * "keep one copy per cluster" step a training pipeline runs after pair
    * generation (pairs alone under-delete: A~B and B~C with A≁C must
    * still collapse to one keeper).
    *
    * Algorithm: min-label propagation — each round every node takes the
    * min of its own label and its neighbors' labels; fixpoint = each
    * component labeled by its min id. The min label moves one hop per
    * round, so rounds = component diameter (DedupClusterSpec proves a
    * 20-edge chain converges in exactly 20 rounds); near-dup clusters
    * are dense (LSH candidates approximate cliques), so 2-3 rounds in
    * practice. Each round is one shuffle (edges ⋈ labels + groupBy). At
    * 100 TB with adversarial long-chain graphs, pass `jump = true`:
    * each round then ALSO pointer-doubles (`rep <- min(rep, rep(rep))`,
    * one extra label-table self-join), halving the label's
    * distance-to-root per round — O(log d) rounds total, the same
    * regime as star contraction (Kiveris et al., "Connected Components
    * in MapReduce"). Labels still only decrease and stay within the
    * component, and the loop exits only when the NEIGHBOR step is
    * stable, so the fixpoint — and hence the oracle — is identical
    * (DedupClusterSpec: a 40-edge chain lands on the same fixpoint
    * within 12 rounds). Default off: near-dup clusters are dense (LSH
    * candidates approximate cliques, 2-3 rounds), where the extra
    * self-join per round costs more than it saves.
    *
    * `maxRounds` is the runaway guard: a loop that has not converged by
    * the bound fails loudly (IllegalStateException) instead of burning
    * the cluster — at 100 TB an unexpected topology should page, not
    * spin.
    *
    * Checkpointing: every round's label table is checkpointed so round N
    * doesn't replay rounds 1..N-1 (and the whole upstream shingle
    * pipeline). `reliable = false` (default) uses `localCheckpoint` —
    * executor-local blocks, fastest, fine for local mode and short jobs,
    * but truncated lineage means an executor loss mid-loop fails the job
    * UNRECOVERABLY. On a multi-executor cluster pass `reliable = true`:
    * rounds persist as parquet under the SparkContext checkpoint dir
    * (set it to durable storage — HDFS/object store — first; a local
    * temp dir is the single-JVM fallback), so lost executors recompute
    * from the last durable round instead of dying; superseded rounds are
    * deleted as the loop advances, so disk is O(1) in the round count
    * (see [[graft.operators.LoopCkpt]]).
    *
    * The result is the UNIQUE fixpoint, so it is algorithm-independent
    * and replayable in the oracle as a recursive transitive closure. */
  def dupClusters(pairs: DataFrame, reliable: Boolean = false,
                  jump: Boolean = false,
                  maxRounds: Int = 1000): DataFrame = {
    val lc = new graft.operators.LoopCkpt(pairs.sparkSession, reliable)
    val fwd = pairs.select(col("doc_i").as("a"), col("doc_j").as("b"))
    val edges = lc.pin(fwd.union(fwd.select(col("b").as("a"), col("a").as("b"))))
    var lab = lc.round(edges.groupBy(col("a")).agg(min(col("b")).as("nb"))
      .select(col("a").as("doc_id"), least(col("a"), col("nb")).as("rep")))
    var changed = 1L
    var rounds = 0
    while (changed > 0) {
      rounds += 1
      if (rounds > maxRounds) throw new IllegalStateException(
        s"dupClusters: no convergence after $maxRounds rounds")
      // ONE fused pass per round (r15): neighbor-label contributions and
      // the node's own previous label go through the SAME union+groupBy,
      // so the former [join edges⋈lab → groupBy → join lab] three-stage
      // round is now [join edges⋈lab → union → groupBy] — one join and
      // one broadcast build fewer per round (guide §2.4). `prev` is
      // unique per doc_id (exactly one self row), so min-over-self
      // recovers it exactly; rep1 = min(prev, all neighbor labels) is
      // the identical fixpoint step. The convergence flag still rides
      // the same pass.
      val nbr = edges
        .join(lab.select(col("doc_id").as("b"), col("rep").as("v")), Seq("b"))
        .select(col("a").as("doc_id"), col("v"), lit(false).as("self"))
      val stepped0 = nbr
        .unionAll(lab.select(col("doc_id"), col("rep").as("v"),
          lit(true).as("self")))
        .groupBy(col("doc_id"))
        .agg(min(col("v")).as("rep1"),
          min(when(col("self"), col("v"))).as("prev"))
        .select(col("doc_id"), col("prev"), col("rep1"))
      // in jump mode stepped feeds BOTH sides of the pointer self-join —
      // checkpoint it so the neighbor join+agg computes once per round,
      // not twice (the jump's budget is one extra self-join, nothing more)
      val stepped = if (jump) lc.round(stepped0) else stepped0
      val next = lc.round(
        if (!jump) stepped.select(col("doc_id"), col("rep1").as("rep"),
          (col("rep1") < col("prev")).as("chg"))
        else {
          // pointer doubling: rep <- min(rep, rep(rep)). Every rep value
          // is a node id of the same component (it is a min over member
          // ids), so the self-join resolves it; left + coalesce guards
          // the root, whose rep is itself.
          val ptr = stepped.select(col("doc_id").as("rep1"),
            col("rep1").as("rrep"))
          stepped.join(ptr, Seq("rep1"), "left")
            .select(col("doc_id"),
              least(col("rep1"), coalesce(col("rrep"), col("rep1"))).as("rep"),
              (least(col("rep1"), coalesce(col("rrep"), col("rep1")))
                < col("prev")).as("chg"))
        })
      changed = next.filter(col("chg")).count()
      lab = next.drop("chg")
    }
    val sizes = lab.groupBy(col("rep")).agg(count(lit(1)).as("cluster_size"))
    lab.join(sizes, Seq("rep"))
      .select(col("doc_id"), col("rep").as("rep_id"), col("cluster_size"))
  }

  /** Asymmetric containment pairs: C = |A∩B| / min(|A|,|B|) — "most of the
    * smaller document's shingles appear in the other", the
    * quote/boilerplate-inclusion detector that symmetric Jaccard misses (a
    * 50-word notice pasted into a 5000-word page has Jaccard ≈ 0.01 but
    * containment ≈ 1). Same inverted-index + maxDf-cap execution shape as
    * [[jaccardPairs]] (one shuffle to posting lists, map-side pair
    * expansion, capped per shingle); the predicate is integer
    * (10·shared >= threshNum·min) so the boundary is engine-exact. */
  def containmentPairs(docs: DataFrame, k: Int = 5, threshNum: Int = 8,
                       maxDf: Int = 10): DataFrame = {
    val sh = shingles(docs, k)
    // aggregate-shaped sizes — same r15 rationale as in jaccardPairs
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val posting = sh.groupBy(col("shingle"))
      .agg(collect_list(col("doc_id")).as("ds"))
      .filter(size(col("ds")).between(2, maxDf))
    val pairs = postingPairs(posting)
      .groupBy(col("doc_i"), col("doc_j"))
      .agg(count(lit(1)).as("shared"))
    pairs
      .join(sizes.withColumnRenamed("doc_id", "doc_i")
                 .withColumnRenamed("n_sh", "n_i"), Seq("doc_i"))
      .join(sizes.withColumnRenamed("doc_id", "doc_j")
                 .withColumnRenamed("n_sh", "n_j"), Seq("doc_j"))
      .withColumn("n_small", least(col("n_i"), col("n_j")))
      .filter(col("shared") * 10 >= col("n_small") * threshNum)
      .select(col("doc_i"), col("doc_j"), col("shared"), col("n_small"),
        (col("shared").cast("double") / col("n_small")).as("containment"))
  }

  /** Engine-portable 60-bit shingle hash: the first 15 hex chars of
    * md5(shingle) parsed as an integer. md5 over UTF-8 bytes is identical
    * in Spark and DuckDB (proven by `dedup_exact`'s hash match), so every
    * hash-derived operator built on this is oracle-checkable bit-for-bit —
    * unlike xxhash64, which no other engine reproduces. Still a single
    * codegen'd expression per row. */
  private def shingleHash60: Column =
    conv(substring(md5(col("shingle").cast("binary")), 1, 15), 16, 10)
      .cast("long")

  private val M = 2147483647L // 2^31 - 1; keeps a*x below 2^62 (no overflow)

  /** i-th affine "permutation" of the base hash: (a_i·x + b_i) mod M with
    * deterministic a_i, b_i derived from i (same formula inlined in the
    * DuckDB oracle SQL). */
  private def perm(i: Int, x: Column): Column = {
    val a = (1103515245L * (i + 1) + 12345L) % M
    val b = (362436069L * (i + 1) + 521288629L) % M
    (lit(a) * x + lit(b)) % lit(M)
  }

  /** MinHash signatures: numHashes affine-permutation mins per doc over the
    * md5-based 60-bit shingle hash (mod M). Fully deterministic and
    * reproducible in any engine with md5 — and thus oracle-checkable.
    *
    * MAP-ONLY: the whole signature comes from one native expression pass
    * per document (graftshim.MinHashSignature) — no shingle explode, no
    * shuffle, no 32-way min aggregation. At 100 TB the aggregated form
    * shuffles the entire shingled corpus just to reduce it to per-doc
    * minima; this form's first (and only) shuffle in the LSH pipeline is
    * the tiny (band, bucket) index. `minhashAgg` below keeps the
    * composable explode+groupBy form as the bit-equality spec baseline
    * (MinHashExprSpec). */
  def minhash(docs: DataFrame, k: Int = 5, numHashes: Int = 32): DataFrame = {
    val sig = graft.functions.VectorFunctions.minhashSig(
      split(trim(col("text")), "\\s+"), k, numHashes)
    docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), sig.as("sig"))
      .filter(col("sig").isNotNull)
      .select(col("doc_id") +:
        (0 until numHashes).map(i => element_at(col("sig"), i + 1).as(s"h$i")): _*)
  }

  /** Reference form of [[minhash]] (explode → shuffle → min aggregates);
    * bit-identical output, kept as the spec cross-check baseline. */
  private[graft] def minhashAgg(docs: DataFrame, k: Int = 5, numHashes: Int = 32): DataFrame = {
    val sh = shingles(docs, k).withColumn("x", shingleHash60 % lit(M))
    val mins = (0 until numHashes).map(i => min(perm(i, col("x"))).as(s"h$i"))
    sh.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
  }

  /** MinHash+LSH candidate pairs: band the signature (bands×rowsPerBand =
    * numHashes), bucket per band via one groupBy into posting lists,
    * expand pairs map-side, distinct. With 16 bands × 2 rows the s-curve
    * threshold is (1/16)^(1/2) ≈ 0.25 Jaccard. The bucket key is the
    * exact struct of the band's min values (no re-hash → no false bucket
    * collisions, and engines agree on the grouping).
    *
    * `maxBucket` is the hot-bucket skew guard (same role as `maxDf` in
    * [[jaccardPairs]]): a degenerate bucket of d docs — near-empty or
    * boilerplate documents whose signatures coincide — would otherwise
    * yield d² candidates on one key. Buckets larger than the cap are
    * dropped from candidate generation; their members are exact/near
    * duplicates of each other at such density that the exact-fingerprint
    * pass ([[DedupQueries]] `dedup_exact`) already collapses them, so the
    * conservative drop loses nothing a real pipeline needs. */
  def minhashLshPairs(docs: DataFrame, k: Int = 5, bands: Int = 16,
                      rowsPerBand: Int = 2, maxBucket: Int = 100): DataFrame = {
    val sig = minhash(docs, k, bands * rowsPerBand)
    val bandCols = (0 until bands).map { b =>
      val cols = (0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), array(cols: _*).as("bucket"))
    }
    val buckets = sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val posting = buckets.groupBy(col("band"), col("bucket"))
      .agg(collect_list(col("doc_id")).as("ds"))
      .filter(size(col("ds")).between(2, maxBucket))
    postingPairs(posting).distinct()
  }

  /** SimHash: 56-bit signature as 8×7-bit chunks over the 60-bit md5
    * shingle hash. Bit j of the signature is the sign of Σ_shingles
    * (±1 by bit j of the shingle hash). Features are k-word SHINGLES, not
    * unigrams: over a corpus with a small shared vocabulary, unigram
    * signatures cluster and chunk collisions approach O(n²) (measured 42%
    * of all pairs on the word-soup testdata); shingles are doc-specific
    * and keep candidates ~linear. Candidates = pairs sharing ≥1 of the 8
    * chunks (pigeonhole: catches every pair within Hamming distance 7). */
  def simhashChunks(docs: DataFrame, chunks: Int = 8, bitsPerChunk: Int = 7,
                    shingleK: Int = 3): DataFrame = {
    // MAP-ONLY (same shape and rationale as minhash above): one native
    // expression pass per doc — no shingle explode, no 56-bit vote
    // aggregation shuffle; simhashChunksAgg keeps the composable form as
    // the bit-equality spec baseline (SimHashExprSpec)
    val sig = graft.functions.VectorFunctions.simhashSig(
      split(trim(col("text")), "\\s+"), shingleK, chunks, bitsPerChunk)
    docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), sig.as("sig"))
      .filter(col("sig").isNotNull)
      .select(col("doc_id") +:
        (0 until chunks).map(c => element_at(col("sig"), c + 1).as(s"c$c")): _*)
  }

  /** Reference form of [[simhashChunks]] (explode → shuffle → vote
    * aggregates); bit-identical output, kept as the spec baseline. */
  private[graft] def simhashChunksAgg(docs: DataFrame, chunks: Int = 8,
                                      bitsPerChunk: Int = 7,
                                      shingleK: Int = 3): DataFrame = {
    val toks = shingles(docs, shingleK).withColumn("h", shingleHash60)
    val chunkCols: Seq[Column] = (0 until chunks).map { c =>
      val bitSum = (0 until bitsPerChunk).map { b =>
        val j = c * bitsPerChunk + b
        val bit = shiftright(col("h"), j).bitwiseAND(1)
        val signed = sum(when(bit === 1, lit(1)).otherwise(lit(-1)))
        when(signed >= 0, lit(1L << b)).otherwise(lit(0L))
      }.reduce(_ + _)
      bitSum.as(s"c$c")
    }
    toks.groupBy(col("doc_id")).agg(chunkCols.head, chunkCols.tail: _*)
  }

  /** Chunk-collision candidates over the SimHash signature, in the same
    * posting-list + `maxBucket` cap shape as [[minhashLshPairs]] (see the
    * skew rationale there — a 7-bit chunk has only 128 values, so at
    * corpus scale EVERY chunk value is a potentially-hot bucket; the cap
    * is what keeps candidates ~linear when signatures cluster). */
  /** Incremental admission of a (doc_id, fp) batch against a fingerprint
    * store: keep batch rows whose fp is absent from the store, deduped
    * within the batch to min doc_id. The production entry point behind
    * dedup_incremental's oracled shape.
    *
    * `bloomPrune = true` (default) interposes the measured store-size
    * answer (PERF §incr-scaling): a bloom built over the BATCH keys —
    * the small side, a few MB regardless of store size — prunes the
    * store map-side BEFORE the exact anti-join, so the store's exchange
    * carries ≈ batch + fpp·store rows instead of the whole store (30×
    * fewer shuffled records at a 320k store, gap ∝ store). False
    * positives are absorbed by the exact anti-join — results are
    * IDENTICAL either way (spec-pinned). With a store under the
    * broadcast threshold AQE's broadcast join already wins and the bloom
    * build is overhead: pass `bloomPrune = false` there, or always, for
    * semantics — the flag only moves shuffle volume. */
  def admitIncremental(batch: DataFrame, store: DataFrame,
                       bloomPrune: Boolean = true,
                       expectedBatch: Long = 0L): DataFrame = {
    val pruned =
      if (!bloomPrune) store
      else {
        val exp = if (expectedBatch > 0) expectedBatch else batch.count()
        val bloom = graft.operators.BloomPrune.bloomOf(
          batch.select(xxhash64(col("fp")).as("h")), "h", exp)
        graft.operators.BloomPrune.prune(store, xxhash64(col("fp")), bloom)
      }
    batch.join(pruned.select(col("fp")), Seq("fp"), "left_anti")
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("admitted_doc_id"),
        count(lit(1)).as("n_batch_copies"))
  }

  /** Leakage-safe split assignment (the `t_leakage_split` rule as a
    * per-doc API): each doc gets train/val/test by the md5 slot of its
    * near-dup CLUSTER representative (min-id rep from [[dupClusters]]
    * over [[jaccardPairs]]; singletons are their own rep), so by
    * construction no near-dup pair straddles a split — the silent
    * eval-contamination path a doc-keyed hash allows (measured: 12/28
    * planted pairs straddle under the naive rule on the test corpus).
    * Input needs (doc_id, text); output is the input plus
    * (rep, split) — map-shaped and sort-free, ready for a partitioned
    * write. Thresholds are percent cut points (train < t1 <= val < t2
    * <= test). */
  def leakageSafeSplit(docs: DataFrame, trainPct: Int = 80,
                       valPct: Int = 90): DataFrame = {
    val reps = dupClusters(jaccardPairs(docs.select(col("doc_id"), col("text"))))
      .select(col("doc_id"), col("rep_id"))
    docs.join(reps, Seq("doc_id"), "left")
      .withColumn("rep", coalesce(col("rep_id"), col("doc_id")))
      .withColumn("slot", conv(substring(md5(col("rep").cast("string")
        .cast("binary")), 1, 8), 16, 10).cast("long") % 100)
      .withColumn("split",
        when(col("slot") < trainPct, "train")
          .when(col("slot") < valPct, "val").otherwise("test"))
      .drop("rep_id", "slot")
  }

  def simhashCandidates(docs: DataFrame, chunks: Int = 8,
                        maxBucket: Int = 100): DataFrame = {
    val sig = simhashChunks(docs, chunks)
    val chunkIdx = (0 until chunks).map(c => struct(lit(c).as("ci"), col(s"c$c").as("cv")))
    val idx = sig.select(col("doc_id"), explode(array(chunkIdx: _*)).as("ch"))
      .select(col("doc_id"), col("ch.ci").as("ci"), col("ch.cv").as("cv"))
    val posting = idx.groupBy(col("ci"), col("cv"))
      .agg(collect_list(col("doc_id")).as("ds"))
      .filter(size(col("ds")).between(2, maxBucket))
    postingPairs(posting).distinct()
  }

  // --- greedy ingest-time near-dup ----------------------------------------

  /** (doc_id, bucket) LSH band hits as a MAP-ONLY transform — the one
    * native-expression signature pass of [[minhash]] followed by a 16-way
    * explode, with no repartition and no aggregation, so the SAME plan
    * runs over a batch frame and a STREAMING one (the ingest-dedup twin
    * below). The bucket key is the band index concatenated with the
    * band's raw min values — the same partition of documents as
    * [[minhashLshPairs]]'s struct bucket and the oracle's packed BIGINT. */
  def nearDupBuckets(docs: DataFrame, k: Int = 5, bands: Int = 16,
                     rowsPerBand: Int = 2): DataFrame = {
    val sig = graft.functions.VectorFunctions.minhashSig(
      split(trim(col("text")), "\\s+"), k, bands * rowsPerBand)
    val bandKeys = (0 until bands).map { b =>
      val parts = lit(b) +: (0 until rowsPerBand)
        .map(r => element_at(col("sig"), b * rowsPerBand + r + 1))
      concat_ws(":", parts.map(_.cast("string")): _*)
    }
    docs.select(col("doc_id"), sig.as("sig"))
      .filter(col("sig").isNotNull)
      .select(col("doc_id"), explode(array(bandKeys: _*)).as("bucket"))
  }

  /** Greedy first-wins near-dup: a document is DROPPED iff an earlier
    * document (arrival order = doc_id) already claimed any of its LSH
    * band buckets. This is the INGEST-TIME dedup discipline — decide per
    * document as it arrives, never revisit — versus the batch pipeline's
    * pair-expand → cluster → keep-min ([[minhashLshPairs]] →
    * [[dupClusters]]).
    *
    * The scale profile is BETTER than the pair form: per bucket the only
    * state is its first occupant, so a degenerate boilerplate bucket of d
    * documents costs d verdict rows, never d² candidate pairs — no
    * `maxBucket` cap needed, no skew guard. One shuffle on the bucket
    * key; verdicts are order-free (min over each bucket). Returns the
    * dropped doc_ids; the kept set is the anti-join. Streaming twin:
    * [[streamingNearDupFlags]] (same buckets, first-wins ValueState). */
  def neardupDropped(docs: DataFrame, k: Int = 5, bands: Int = 16,
                     rowsPerBand: Int = 2): DataFrame = {
    // Two batch-side choices the streaming twin doesn't need: the
    // signature pass is CPU-heavy, so spread an under-split source
    // across the session's cores first (the same repartition [[minhash]]
    // applies — nearDupBuckets itself stays map-only for streaming); and
    // the verdict is a posting-list groupBy(bucket) hash-aggregate
    // (min + collect_list in one pass, non-first occupants exploded back
    // out), not a window — no per-partition sort. A hot bucket of d docs
    // costs d list entries — still linear, same as the streaming twin's
    // d verdict rows.
    val spread = docs.repartition(
      docs.sparkSession.sparkContext.defaultParallelism, col("doc_id"))
    nearDupBuckets(spread, k, bands, rowsPerBand)
      .groupBy(col("bucket"))
      .agg(min(col("doc_id")).as("first_doc"),
        collect_list(col("doc_id")).as("ds"))
      .select(explode(col("ds")).as("doc_id"), col("first_doc"))
      .filter(col("doc_id") =!= col("first_doc"))
      .select(col("doc_id")).distinct()
  }

  /** Streaming twin of [[neardupDropped]]: per-bucket first-wins verdicts
    * over a stream of [[BucketHit]]s (build them with [[nearDupBuckets]]
    * on the streaming frame — it is map-only by construction). Emits one
    * (doc_id, kept-in-this-bucket) row per hit; a document is a near-dup
    * iff ANY of its 16 verdicts is false, which the consumer reduces
    * stateless-ly (the flags for one document all travel in its own
    * micro-batch).
    *
    * State is ONE long per live bucket — the first occupant — so the
    * store grows with distinct-bucket cardinality, not corpus size, and a
    * hot boilerplate bucket still costs 8 bytes. Within a micro-batch the
    * smallest doc_id wins the bucket (order-free determinism: shuffle
    * arrival order is not a contract); across batches the incumbent
    * always wins, so feeding batches in ascending doc_id ranges
    * reproduces the batch greedy exactly (StreamingSpec differential).
    * At-least-once re-delivery of the winner re-emits `true`, never
    * flips a verdict. `ttlMs > 0` bounds the store by hit recency for
    * months-long ingest over an unbounded bucket domain (see
    * [[BucketFirstWinsProcessor]] for the recall trade; spec-pinned
    * against the keep-forever arm). */
  def streamingNearDupFlags(hits: org.apache.spark.sql.Dataset[BucketHit],
                            ttlMs: Long = 0L)
      : org.apache.spark.sql.Dataset[(Long, Boolean)] = {
    import hits.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val timeMode = if (ttlMs > 0) TimeMode.ProcessingTime() else TimeMode.None()
    hits.groupByKey(_.bucket)
      .transformWithState(new BucketFirstWinsProcessor(ttlMs), timeMode,
        OutputMode.Update())
  }
}

/** One LSH band-bucket hit of a document (input row of
  * [[Dedup.streamingNearDupFlags]]). */
final case class BucketHit(doc_id: Long, bucket: String)

/** First-wins bucket occupancy for streaming ingest dedup: ValueState =
  * the bucket's first (smallest-seen) doc_id. See
  * [[Dedup.streamingNearDupFlags]] for semantics and scale posture.
  *
  * `ttlMs > 0` bounds the store by RECENCY (the TtlCountProcessor
  * discipline): a bucket nobody has hit for the TTL expires, and the
  * next doc to hit it claims it fresh — the deliberate trade for
  * months-long ingest over an unbounded bucket domain (an expired
  * bucket can re-admit a near-dup of a document older than the TTL;
  * dedup recall degrades to the TTL horizon, state stays bounded by
  * hit recency). `ttlMs <= 0` keeps state forever. Requires
  * TimeMode.ProcessingTime when TTL is on — set by the caller. */
final class BucketFirstWinsProcessor(ttlMs: Long = 0L)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      String, BucketHit, (Long, Boolean)] {
  import org.apache.spark.sql.{Encoders => E}
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues,
    TTLConfig, ValueState}

  @transient private var first: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    val ttl = if (ttlMs > 0) TTLConfig(java.time.Duration.ofMillis(ttlMs))
              else TTLConfig.NONE
    first = getHandle.getValueState("first", E.scalaLong, ttl)
  }

  override def handleInputRows(key: String, rows: Iterator[BucketHit],
      timerValues: TimerValues): Iterator[(Long, Boolean)] = {
    val batch = rows.toSeq
    // an empty bucket is claimed by the batch's smallest doc_id (order-
    // free within the batch); an occupied bucket NEVER changes hands —
    // verdicts already emitted are never invalidated by later arrivals
    if (!first.exists()) first.update(batch.map(_.doc_id).min)
    val winner = first.get()
    batch.iterator.map(r => (r.doc_id, r.doc_id == winner))
  }
}

object DedupQueries extends QModule {

  /** Oracle CTE prefix replaying the MinHash banding exactly (md5-derived
    * base hash, 32 affine permutations, 16 bands × 2 rows, packed band
    * bucket); terminal CTE `bands(doc_id, band, bucket)` — the packed
    * BIGINT bucket partitions documents identically to the engine's
    * struct/string band keys (h < 2^31, so `h_even * 2^31 + h_odd` is
    * collision-free). */
  private val minhashBandsCtes = """
      WITH docs AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
      sh AS (
        SELECT DISTINCT doc_id, array_to_string(toks[i:i+4], ' ') AS shingle
        FROM docs, UNNEST(range(1, CASE WHEN len(toks) >= 5 THEN len(toks) - 3 ELSE 1 END)) t(i)),
      hx AS (
        SELECT doc_id, (('0x' || substr(md5(shingle), 1, 15))::BIGINT) % 2147483647 AS x
        FROM sh),
      mins AS (
        SELECT doc_id, i,
               MIN((((1103515245 * (i + 1) + 12345) % 2147483647) * x
                    + (362436069 * (i + 1) + 521288629) % 2147483647) % 2147483647) AS h
        FROM hx CROSS JOIN UNNEST(range(0, 32)) t(i)
        GROUP BY doc_id, i),
      bands AS (
        SELECT doc_id, i // 2 AS band,
               CAST(SUM(CASE WHEN i % 2 = 0 THEN h * 2147483648 ELSE h END) AS BIGINT) AS bucket
        FROM mins GROUP BY doc_id, i // 2)"""

  /** [[minhashBandsCtes]] extended to `minhashLshPairs`' candidate set;
    * terminal CTE `pairs(doc_i, doc_j)`. */
  private val minhashPairsCtes = minhashBandsCtes + """,
      live AS (
        SELECT band, bucket FROM bands
        GROUP BY band, bucket HAVING COUNT(*) BETWEEN 2 AND 100),
      pairs AS (
        SELECT DISTINCT a.doc_id AS doc_i, b.doc_id AS doc_j
        FROM bands a
        JOIN live USING (band, bucket)
        JOIN bands b
          ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id)"""
  import Dedup._

  /** Registry convention: every tail `.orderBy` below is ORACLE
    * PRESENTATION for the driver's hash compare — the library entry
    * points these Qs delegate to ([[jaccardPairs]], [[minhashLshPairs]],
    * [[simhashCandidates]], [[dupClusters]], [[admitIncremental]],
    * [[leakageSafeSplit]]) all return UNORDERED frames; a production
    * write calls them directly and never pays the global sort. */
  def qs: Seq[Q] = Seq(
    // Exact dedup by normalized-content hash (hash-groupBy; at scale this
    // is the one-shuffle `groupBy(fingerprint)` — never a self-join).
    Q("dedup_exact", (s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .groupBy(TextAnalysis.fingerprint($"text").as("fp"))
        .agg(min($"doc_id").as("keeper_doc_id"), count(lit(1)).as("n_copies"))
        .orderBy($"fp")
    }, sql = Some("""
      SELECT md5(regexp_replace(regexp_replace(lower(trim(text)), '[^a-z0-9\s]', '', 'g'),
                 '\s+', ' ', 'g')) AS fp,
             MIN(doc_id) AS keeper_doc_id, COUNT(*) AS n_copies
      FROM documents GROUP BY 1 ORDER BY fp
    """)),

    // Exact 5-gram Jaccard near-dup pairs (inverted-index plan with the
    // maxDf=10 hot-shingle cap replayed: the index drops shingles whose
    // document frequency exceeds the cap before pair generation).
    Q("dedup_ngram_jaccard", (s, dir) => {
      jaccardPairs(t(s, dir, "documents"))
        .orderBy(col("doc_i"), col("doc_j"))
    }, sql = Some("""
      WITH docs AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
      sh AS (
        SELECT DISTINCT doc_id, array_to_string(toks[i:i+4], ' ') AS shingle
        FROM docs, UNNEST(range(1, CASE WHEN len(toks) >= 5 THEN len(toks) - 3 ELSE 1 END)) t(i)),
      sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
      rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 10),
      idx AS (SELECT sh.* FROM sh JOIN rare USING (shingle)),
      pairs AS (
        SELECT a.doc_id AS doc_i, b.doc_id AS doc_j, COUNT(*) AS shared
        FROM idx a JOIN idx b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT doc_i, doc_j, shared, si.n_sh + sj.n_sh - shared AS union_n,
             CAST(shared AS DOUBLE) / (si.n_sh + sj.n_sh - shared) AS jaccard
      FROM pairs
      JOIN sizes si ON si.doc_id = doc_i
      JOIN sizes sj ON sj.doc_id = doc_j
      WHERE shared * 10 >= (si.n_sh + sj.n_sh - shared) * 3
      ORDER BY doc_i, doc_j
    """), headline = true),

    // Dup-cluster collapse: connected components over the Jaccard pairs,
    // each doc mapped to its cluster's min-id representative. The oracle
    // replays the same pairs CTE chain, then closes it transitively with
    // a recursive CTE — the fixpoint is unique, so the iterative Spark
    // algorithm and the recursive SQL agree exactly.
    Q("dedup_clusters", (s, dir) => {
      dupClusters(jaccardPairs(t(s, dir, "documents")))
        .orderBy(col("doc_id"))
    }, sql = Some("""
      WITH RECURSIVE docs AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
      sh AS (
        SELECT DISTINCT doc_id, array_to_string(toks[i:i+4], ' ') AS shingle
        FROM docs, UNNEST(range(1, CASE WHEN len(toks) >= 5 THEN len(toks) - 3 ELSE 1 END)) t(i)),
      sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
      rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 10),
      idx AS (SELECT sh.* FROM sh JOIN rare USING (shingle)),
      cand AS (
        SELECT a.doc_id AS doc_i, b.doc_id AS doc_j, COUNT(*) AS shared
        FROM idx a JOIN idx b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      jp AS (
        SELECT doc_i, doc_j FROM cand
        JOIN sizes si ON si.doc_id = doc_i
        JOIN sizes sj ON sj.doc_id = doc_j
        WHERE shared * 10 >= (si.n_sh + sj.n_sh - shared) * 3),
      edges AS (SELECT doc_i AS a, doc_j AS b FROM jp
                UNION ALL SELECT doc_j, doc_i FROM jp),
      reach(a, b) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
      rep AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS rep_id FROM reach GROUP BY a),
      sz AS (SELECT rep_id, COUNT(*) AS cluster_size FROM rep GROUP BY 1)
      SELECT doc_id, rep_id, cluster_size
      FROM rep JOIN sz USING (rep_id) ORDER BY doc_id
    """), headline = true),

    // Asymmetric containment over the same inverted index — catches the
    // quote/boilerplate-inclusion pairs symmetric Jaccard misses.
    Q("dedup_containment", (s, dir) => {
      containmentPairs(t(s, dir, "documents"))
        .orderBy(col("doc_i"), col("doc_j"))
    }, sql = Some("""
      WITH docs AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
      sh AS (
        SELECT DISTINCT doc_id, array_to_string(toks[i:i+4], ' ') AS shingle
        FROM docs, UNNEST(range(1, CASE WHEN len(toks) >= 5 THEN len(toks) - 3 ELSE 1 END)) t(i)),
      sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
      rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 10),
      idx AS (SELECT sh.* FROM sh JOIN rare USING (shingle)),
      pairs AS (
        SELECT a.doc_id AS doc_i, b.doc_id AS doc_j, COUNT(*) AS shared
        FROM idx a JOIN idx b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT doc_i, doc_j, shared, LEAST(si.n_sh, sj.n_sh) AS n_small,
             CAST(shared AS DOUBLE) / LEAST(si.n_sh, sj.n_sh) AS containment
      FROM pairs
      JOIN sizes si ON si.doc_id = doc_i
      JOIN sizes sj ON sj.doc_id = doc_j
      WHERE shared * 10 >= LEAST(si.n_sh, sj.n_sh) * 8
      ORDER BY doc_i, doc_j
    """)),

    // Incremental ingestion dedup: a new batch (doc_id >= 400 stands in
    // for today's crawl) is admitted only where its normalized fingerprint
    // (a) isn't already in the existing corpus — one ANTI-JOIN on the
    // fingerprint hash, the K3 upsert-if-absent shape at corpus scale —
    // and (b) isn't duplicated WITHIN the batch (keep min doc_id per
    // fingerprint). Both steps shuffle once on the fingerprint; nothing
    // rescans or re-pairs the existing corpus, which is what makes
    // day-over-day dedup affordable when the corpus is 100 TB and the
    // daily batch is 1%.
    Q("dedup_incremental", (s, dir) => {
      val docs = t(s, dir, "documents")
      val fp = TextAnalysis.fingerprint(col("text"))
      val existing = docs.filter(col("doc_id") < 400).select(fp.as("fp")).distinct()
      // goes through the production entry point WITH the bloom prune on,
      // so the pruned path itself is differentially verified every round
      // (false positives must be invisible — the oracle is a plain NOT IN)
      Dedup.admitIncremental(
        docs.filter(col("doc_id") >= 400).select(col("doc_id"), fp.as("fp")),
        existing)
        .orderBy(col("admitted_doc_id"))
    }, sql = Some("""
      WITH fps AS (
        SELECT doc_id,
               md5(regexp_replace(regexp_replace(lower(trim(text)), '[^a-z0-9\s]', '', 'g'),
                   '\s+', ' ', 'g')) AS fp
        FROM documents)
      SELECT fp, MIN(doc_id) AS admitted_doc_id, COUNT(*) AS n_batch_copies
      FROM fps
      WHERE doc_id >= 400
        AND fp NOT IN (SELECT fp FROM fps WHERE doc_id < 400)
      GROUP BY fp ORDER BY admitted_doc_id
    """)),

    // MinHash+LSH candidates. The md5-based hash makes the whole banding
    // pipeline engine-portable, so the oracle replays it exactly: base
    // hash = first 15 md5 hex chars mod 2^31-1, 32 affine permutations,
    // 16 bands × 2 rows, bucket = the band's (h_even, h_odd) min pair.
    Q("dedup_minhash_lsh", (s, dir) =>
      minhashLshPairs(t(s, dir, "documents"))
        .orderBy(col("doc_i"), col("doc_j")), sql = Some(s"""
      $minhashPairsCtes
      SELECT doc_i, doc_j FROM pairs
      ORDER BY doc_i, doc_j
    """), headline = true),

    // Greedy INGEST-TIME near-dup (first-wins per LSH band bucket,
    // arrival order = doc_id): the per-document admit/drop discipline a
    // streaming corpus ingest applies, in its oracled batch form —
    // [[Dedup.streamingNearDupFlags]] is the stateful streaming twin
    // (StreamingSpec differential). Emits the DROPPED ids; note the
    // verdict set differs from the pair→cluster pipeline by design
    // (greedy never revisits, clusters re-partition globally).
    Q("dedup_ingest_greedy", (s, dir) =>
      neardupDropped(t(s, dir, "documents")).orderBy(col("doc_id")),
      sql = Some(s"""
      $minhashBandsCtes,
      firsts AS (
        SELECT band, bucket, MIN(doc_id) AS first_doc
        FROM bands GROUP BY band, bucket)
      SELECT DISTINCT b.doc_id FROM bands b
      JOIN firsts f USING (band, bucket)
      WHERE b.doc_id <> f.first_doc
      ORDER BY doc_id
    """)),

    // The MinHash ACCURACY CONTRACT made exact: for every LSH candidate
    // pair, the signature-estimated Jaccard (matching components / 32)
    // next to the true shingle Jaccard — both in integer e6 units, so
    // the estimator's quality is itself hash-checked (the md5-derived
    // signatures are engine-portable, which is what makes a sketch's
    // ERROR oracle-able, not just its output shape). The exact side is
    // the standard candidate-verification join: shingle intersection
    // restricted to the (banding-bounded, ~linear) pair set — never the
    // corpus.
    Q("dedup_minhash_estimate", (s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      // every fanned-out frame is materialized once: `pairs` is consumed
      // by the shared-count aggregation AND the signature join, `sigs`
      // by both pair sides, `sh` by sizes and both intersection sides —
      // without the barriers the corpus-wide sketch would recompute ~4x
      // (the qualityGate/p1 lesson applied here)
      val pairs = minhashLshPairs(docs).localCheckpoint()
      val sigs = minhash(docs).localCheckpoint()
      val si = sigs.select(col("doc_id").as("doc_i") +:
        (0 until 32).map(i => col(s"h$i").as(s"hi_$i")): _*)
      val sj = sigs.select(col("doc_id").as("doc_j") +:
        (0 until 32).map(i => col(s"h$i").as(s"hj_$i")): _*)
      val nMatch = (0 until 32)
        .map(i => when(col(s"hi_$i") === col(s"hj_$i"), 1).otherwise(0))
        .reduce(_ + _).cast("long")
      val sh = shingles(docs).localCheckpoint()
      val sizes = sh.groupBy($"doc_id").agg(count(lit(1)).as("n_sh"))
      val shared = pairs
        .join(sh.select($"doc_id".as("doc_i"), $"shingle"), Seq("doc_i"))
        .join(sh.select($"doc_id".as("doc_j"), $"shingle"), Seq("doc_j", "shingle"))
        .groupBy($"doc_i", $"doc_j").agg(count(lit(1)).as("shared"))
      pairs
        .join(si, Seq("doc_i")).join(sj, Seq("doc_j"))
        .withColumn("n_match", nMatch)
        .select($"doc_i", $"doc_j", $"n_match")
        .join(shared, Seq("doc_i", "doc_j"), "left")
        .withColumn("shared", coalesce($"shared", lit(0L)))
        .join(sizes.select($"doc_id".as("doc_i"), $"n_sh".as("n_i")), Seq("doc_i"))
        .join(sizes.select($"doc_id".as("doc_j"), $"n_sh".as("n_j")), Seq("doc_j"))
        .withColumn("union_n", $"n_i" + $"n_j" - $"shared")
        .select($"doc_i", $"doc_j", $"n_match",
          expr("(n_match * 1000000) div 32").as("est_e6"),
          expr("(shared * 1000000) div union_n").as("jac_e6"))
        .orderBy($"doc_i", $"doc_j")
    }, sql = Some(s"""
      $minhashPairsCtes,
      sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
      shr AS (
        SELECT p.doc_i, p.doc_j, COUNT(*) AS shared
        FROM pairs p
        JOIN sh a ON a.doc_id = p.doc_i
        JOIN sh b ON b.doc_id = p.doc_j AND b.shingle = a.shingle
        GROUP BY 1, 2),
      mtch AS (
        SELECT p.doc_i, p.doc_j,
               COUNT(CASE WHEN ma.h = mb.h THEN 1 END) AS n_match
        FROM pairs p
        JOIN mins ma ON ma.doc_id = p.doc_i
        JOIN mins mb ON mb.doc_id = p.doc_j AND mb.i = ma.i
        GROUP BY 1, 2)
      SELECT m.doc_i, m.doc_j, m.n_match,
             (m.n_match * 1000000) // 32 AS est_e6,
             (COALESCE(s.shared, 0) * 1000000)
               // (si.n_sh + sj.n_sh - COALESCE(s.shared, 0)) AS jac_e6
      FROM mtch m
      JOIN sizes si ON si.doc_id = m.doc_i
      JOIN sizes sj ON sj.doc_id = m.doc_j
      LEFT JOIN shr s ON s.doc_i = m.doc_i AND s.doc_j = m.doc_j
      ORDER BY m.doc_i, m.doc_j
    """)),

    // Edit-distance re-rank of the LSH candidates — the "cheap candidate
    // generation → expensive exact verification" pipeline in its string
    // form: levenshtein (identical definition both engines, integer
    // output) over the first 120 chars (bounds the O(len²) DP per pair).
    // At 100 TB the pair set stays ~linear via banding, so the quadratic
    // DP only ever runs on candidates, never the corpus.
    Q("dedup_edit_distance", (s, dir) => {
      val docs = t(s, dir, "documents")
      val pa = docs.select(col("doc_id").as("doc_i"),
        substring(col("text"), 1, 120).as("ti"))
      val pb = docs.select(col("doc_id").as("doc_j"),
        substring(col("text"), 1, 120).as("tj"))
      minhashLshPairs(docs).join(pa, "doc_i").join(pb, "doc_j")
        .select(col("doc_i"), col("doc_j"),
          levenshtein(col("ti"), col("tj")).as("edit_dist"))
        .orderBy(col("doc_i"), col("doc_j"))
    }, sql = Some(s"""
      $minhashPairsCtes
      SELECT p.doc_i, p.doc_j,
             levenshtein(substr(a.text, 1, 120), substr(b.text, 1, 120)) AS edit_dist
      FROM pairs p
      JOIN documents a ON p.doc_i = a.doc_id
      JOIN documents b ON p.doc_j = b.doc_id
      ORDER BY p.doc_i, p.doc_j
    """)),

    // SimHash chunk-collision candidates — same portable hash, so the
    // 8×7-bit signature is replayed verbatim by the oracle.
    Q("dedup_simhash", (s, dir) =>
      simhashCandidates(t(s, dir, "documents"))
        .orderBy(col("doc_i"), col("doc_j")), sql = Some("""
      WITH docs AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
      sh AS (
        SELECT DISTINCT doc_id, array_to_string(toks[i:i+2], ' ') AS shingle
        FROM docs, UNNEST(range(1, CASE WHEN len(toks) >= 3 THEN len(toks) - 1 ELSE 1 END)) t(i)),
      hx AS (
        SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h
        FROM sh),
      bits AS (
        SELECT doc_id, j,
               SUM(CASE WHEN (h >> CAST(j AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS s
        FROM hx CROSS JOIN UNNEST(range(0, 56)) t(j)
        GROUP BY doc_id, j),
      sig AS (
        SELECT doc_id, j // 7 AS c,
               CAST(SUM(CASE WHEN s >= 0 THEN 1 << (j % 7) ELSE 0 END) AS BIGINT) AS cv
        FROM bits GROUP BY doc_id, j // 7),
      live AS (
        SELECT c, cv FROM sig GROUP BY c, cv HAVING COUNT(*) BETWEEN 2 AND 100)
      SELECT DISTINCT a.doc_id AS doc_i, b.doc_id AS doc_j
      FROM sig a
      JOIN live USING (c, cv)
      JOIN sig b
        ON a.c = b.c AND a.cv = b.cv AND a.doc_id < b.doc_id
      ORDER BY doc_i, doc_j
    """)),

    // SimHash Hamming re-rank — the "cheap candidates → exact distance"
    // verification stage in its bit form: full 56-bit Hamming distance
    // (bit_count of chunkwise XOR) over the chunk-collision candidates
    // only, keep pairs within 10 bits. At 100 TB the XOR+popcount runs
    // on the ~linear candidate set, never all pairs — and it's integer
    // end-to-end, so the oracle replays it exactly.
    Q("dedup_simhash_rerank", (s, dir) => {
      val docs = t(s, dir, "documents")
      val sig = Dedup.simhashChunks(docs)
      val si = sig.select(col("doc_id").as("doc_i") +:
        (0 until 8).map(c => col(s"c$c").as(s"i_c$c")): _*)
      val sj = sig.select(col("doc_id").as("doc_j") +:
        (0 until 8).map(c => col(s"c$c").as(s"j_c$c")): _*)
      val hamming = (0 until 8)
        .map(c => expr(s"bit_count(i_c$c ^ j_c$c)")).reduce(_ + _)
      Dedup.simhashCandidates(docs)
        .join(si, "doc_i").join(sj, "doc_j")
        .select(col("doc_i"), col("doc_j"), hamming.cast("long").as("hamming"))
        .filter(col("hamming") <= 10)
        .orderBy(col("doc_i"), col("doc_j"))
    }, sql = Some("""
      WITH docs AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
      sh AS (
        SELECT DISTINCT doc_id, array_to_string(toks[i:i+2], ' ') AS shingle
        FROM docs, UNNEST(range(1, CASE WHEN len(toks) >= 3 THEN len(toks) - 1 ELSE 1 END)) t(i)),
      hx AS (
        SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h
        FROM sh),
      bits AS (
        SELECT doc_id, j,
               SUM(CASE WHEN (h >> CAST(j AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS s
        FROM hx CROSS JOIN UNNEST(range(0, 56)) t(j)
        GROUP BY doc_id, j),
      sig AS (
        SELECT doc_id, j // 7 AS c,
               CAST(SUM(CASE WHEN s >= 0 THEN 1 << (j % 7) ELSE 0 END) AS BIGINT) AS cv
        FROM bits GROUP BY doc_id, j // 7),
      live AS (
        SELECT c, cv FROM sig GROUP BY c, cv HAVING COUNT(*) BETWEEN 2 AND 100),
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_i, b.doc_id AS doc_j
        FROM sig a
        JOIN live USING (c, cv)
        JOIN sig b ON a.c = b.c AND a.cv = b.cv AND a.doc_id < b.doc_id),
      ham AS (
        SELECT cand.doc_i, cand.doc_j,
               CAST(SUM(bit_count(xor(si.cv, sj.cv))) AS BIGINT) AS hamming
        FROM cand
        JOIN sig si ON si.doc_id = cand.doc_i
        JOIN sig sj ON sj.doc_id = cand.doc_j AND sj.c = si.c
        GROUP BY 1, 2)
      SELECT doc_i, doc_j, hamming FROM ham
      WHERE hamming <= 10 ORDER BY doc_i, doc_j
    """))
  )
}
