package graft.ext

import graft.{Q, QModule}
import graft.Tables.t
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Text-analysis operators for a training-data pipeline over `documents`
  * (extension tier, BASELINE.json north star; no reference counterpart —
  * the reference's only text handling is trim/equalsIgnoreCase, SURVEY §2.7
  * X12).
  *
  * All pure column compositions (regexp/split built-ins) — codegen'd, no
  * UDFs, embarrassingly parallel: at 100 TB each operator is a map-only
  * stage over the document scan with no shuffle (aggregations below exist
  * only to keep oracle outputs small).
  */
object TextAnalysis extends QModule {

  /** Whitespace tokens of trimmed text. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** BPE-ish lexer tokens: letter runs, digit runs, single symbols. */
  val bpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** Per-language stopword hit counts (word-boundary regex). */
  def hits(c: Column, pat: String): Column =
    size(regexp_extract_all(lower(c), lit(pat), lit(0)))

  val enPat = "\\b(the|of|and|to|is|a)\\b"
  val dePat = "\\b(der|die|das|und|ist|nicht)\\b"
  val esPat = "\\b(el|los|que|y|es|una)\\b"
  val frPat = "\\b(le|les|et|des|est|une)\\b"
  val zhPat = "[\\x{4e00}-\\x{9fff}]"

  /** Language-ID by stopword profile: argmax with fixed priority order
    * en > de > es > fr; any CJK character wins for zh. */
  def langId(text: Column): Column = {
    val (en, de, es, fr, zh) =
      (hits(text, enPat), hits(text, dePat), hits(text, esPat),
       hits(text, frPat), hits(text, zhPat))
    when(zh > 0, "zh")
      .when(en >= de && en >= es && en >= fr, "en")
      .when(de >= es && de >= fr, "de")
      .when(es >= fr, "es")
      .otherwise("fr")
  }

  /** Document fingerprint: md5 of case/whitespace/punctuation-normalized
    * text — the canonical exact-dedup key (same bytes in any engine). */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(regexp_replace(lower(trim(text)), "[^a-z0-9\\s]", ""),
        "\\s+", " "))

  /** Polynomial rolling-hash fingerprint over tokens (north-star "document
    * fingerprinting (rolling hash)"): Rabin-Karp form h = (h*31 + hash(tok))
    * mod 1e9+7, folded in token order — modular so it never overflows under
    * ANSI arithmetic. Engine-specific hash → spec-checked, not oracled. */
  def rollingHash(text: Column): Column = {
    val m = 1000000007L
    aggregate(tokens(text), lit(7L),
      (acc, tok) => pmod(acc * 31 + pmod(xxhash64(tok), lit(m)), lit(m)))
  }

  /** Word-level repetition metrics per document (see t_repetition).
    *
    * SINGLE scan: one generator emits every unigram tagged 'u' and every
    * bigram tagged 'b' (tag is part of the gram-count key, so the two
    * vocabularies never collide), then per-doc stats fall out of ONE
    * conditional aggregation — no second scan, no per-doc self-join.
    * Tail orderBy(doc_id) is ORACLE PRESENTATION — a production write
    * drops it (the stats are map-shaped after the doc-level agg). */
  def repetitionStats(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val grams = docs
      .select(col("doc_id"), split(trim(lower(col("text"))), "\\s+").as("w"))
      .select(col("doc_id"), explode(expr(
        """concat(
             transform(w, t -> struct('u' AS tag, t AS gram)),
             transform(filter(sequence(0, size(w)-2), i -> size(w) >= 2),
                       i -> struct('b' AS tag, concat(w[i], ' ', w[i+1]) AS gram)))"""))
        .as("g"))
      .select(col("doc_id"), col("g.tag").as("tag"), col("g.gram").as("gram"))
    grams.groupBy(col("doc_id"), col("tag"), col("gram")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(
        sum(when(col("tag") === "u", col("c")).otherwise(0L)).as("n_tok"),
        sum(when(col("tag") === "u" && col("c") > 1, col("c")).otherwise(0L)).as("n_dup_tok"),
        sum(when(col("tag") === "b", col("c")).otherwise(0L)).as("n_bigrams"),
        max(when(col("tag") === "b", col("c"))).as("top_bigram_n"))
      .filter(col("n_bigrams") > 0) // single-token docs carry no bigram signal
      .select(col("doc_id"), col("n_tok"), col("n_dup_tok"),
        (col("n_dup_tok").cast("double") / col("n_tok")).as("dup_tok_frac"),
        col("n_bigrams"), col("top_bigram_n"),
        (col("top_bigram_n").cast("double") / col("n_bigrams")).as("top_bigram_frac"))
      .orderBy(col("doc_id"))
  }

  /** Token-budget shard packing in the scale-safe two-level prefix-sum
    * shape. Input: (doc_id, lang, n_tok). Output adds `shard_id` =
    * floor(exclusive-running-token-sum / budget), the running sum taken
    * per lang in doc_id order — the SAME fixpoint as a single
    * `Window.partitionBy(lang).orderBy(doc_id)` running sum, computed
    * without ever sorting a whole language stratum in one task:
    *
    *   1. coarse range buckets: bkt = doc_id / span (contiguous id
    *      ranges, so bucket-order concatenation == doc_id order);
    *   2. per-(lang,bkt) token totals — a tiny aggregate (langs ×
    *      buckets rows), windowed per lang into EXCLUSIVE bucket
    *      offsets (the only per-lang window left runs over the tiny
    *      aggregate, not the corpus);
    *   3. offsets broadcast back; the per-row running sum is windowed
    *      by (lang, bkt) — bounded partitions — and shifted by the
    *      bucket offset.
    *
    * With ~5 langs a naive per-lang window sorts ~1/5 of a 100 TB corpus
    * in ONE task; here the largest sort is one id-span of one language.
    * `span` is the scale knob (ids per bucket; at 100 TB derive it from
    * stats so buckets land in the tens of MB). */
  def packShards(base: org.apache.spark.sql.DataFrame, budget: Int,
                 span: Long = 128L): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = base.withColumn("bkt", floor(col("doc_id") / span).cast("long"))
    // r15 shape: the within-bucket running sum is computed FIRST, and the
    // per-bucket totals are derived from it (total = max of a running sum
    // over non-negative n_tok = its last value), so BOTH levels hang off
    // ONE (lang,bkt) exchange of the grid — the former shape aggregated
    // `b` on one branch and windowed it on another, computing the whole
    // upstream (gate filter + survivor anti-join in p1/p3) twice and
    // shuffling the grid twice (guide §2.4). The windowed frame is
    // already hash-partitioned by (lang,bkt), so the totals aggregate
    // needs no second exchange; only the KB-sized bucket-offset table
    // pays a (tiny) per-lang window.
    val wIn = Window.partitionBy(col("lang"), col("bkt")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rows = b.withColumn("cum_in", sum(col("n_tok")).over(wIn))
    val wOff = Window.partitionBy(col("lang")).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = rows.groupBy(col("lang"), col("bkt"))
      .agg(max(col("cum_in")).as("bkt_tok"))
      .select(col("lang"), col("bkt"),
        coalesce(sum(col("bkt_tok")).over(wOff), lit(0L)).as("off"))
    rows.join(broadcast(offsets), Seq("lang", "bkt"))
      .select(col("doc_id"), col("lang"), col("n_tok"),
        floor((col("off") + col("cum_in") - col("n_tok")) / budget)
          .cast("long").as("shard_id"))
  }

  /** Per-doc segment dedup stats (t_segment_dedup): split each doc into
    * consecutive `segLen`-token segments, count per doc how many are dups
    * of an earlier occurrence (lower doc_id, or earlier in the SAME doc).
    * Agg-only shape — hash-agg per segment with map-side combine, then
    * per-doc keeper counts — so a boilerplate segment in millions of docs
    * never concentrates on one task (no window/self-join on the segment).
    * Tail orderBy(doc_id) is ORACLE PRESENTATION — drop for production. */
  def segmentDedupStats(docs: org.apache.spark.sql.DataFrame,
                        segLen: Int = 10): org.apache.spark.sql.DataFrame = {
    val segs = docs
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, (size(toks)+${segLen - 1}) div $segLen - 1), " +
          s"i -> concat_ws(' ', slice(toks, i*$segLen+1, $segLen)))"))
        .as("seg"))
    val totals = segs.groupBy(col("doc_id")).agg(count(lit(1)).as("n_seg"))
    val kept = segs.groupBy(col("seg")).agg(min(col("doc_id")).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_kept"))
    totals.join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_seg"),
        (col("n_seg") - coalesce(col("n_kept"), lit(0L))).as("n_dup_seg"))
      .orderBy(col("doc_id"))
  }

  /** t_tfidf's engine, composable (the Q below delegates; ScaleBench's
    * text mode reuses it over scaled corpora): one hash agg (term
    * counts), doc frequency as count-over-window riding the SAME
    * token-keyed exchange (r15: the former separate dfreq aggregate +
    * tf⋈dfreq join shuffled tf by token TWICE — once to build dfreq,
    * once to probe it; a whole-partition count window needs the token
    * shuffle exactly once and computes the identical df — guide §2.4:
    * two operations keyed the same way share one exchange), broadcast
    * doc count, per-doc top-3 window keyed by doc_id — no global sort,
    * no self-join. Tail orderBy(doc_id, rk) is ORACLE PRESENTATION —
    * drop for production (rank order is already explicit in the rk
    * column). */
  def tfidfTopK(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(split(trim(lower(col("text"))), "\\s+")).as("token"))
    val tf = toks.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val wDf = org.apache.spark.sql.expressions.Window.partitionBy(col("token"))
    val total = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.withColumn("df", count(lit(1)).over(wDf))
      .crossJoin(broadcast(total))
      .withColumn("tfidf_e6",
        floor(col("tf") * (col("n_docs").cast("double") / col("df")) * 1e6 + 0.5)
          .cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("tfidf_e6").desc, col("token").asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .select(col("doc_id"), col("rk"), col("token"), col("tfidf_e6"))
      .orderBy(col("doc_id"), col("rk"))
  }

  /** t_lm_perplexity's engine, composable (the Q below delegates;
    * ScaleBench's text mode reuses it): add-one-smoothed bigram model,
    * per-doc mean surprisal in exact whole bits — see the Q's scaladoc
    * for the ln-free bit formula. Tail orderBy(doc_id) is ORACLE
    * PRESENTATION — drop for production (per-doc rows, map-shaped
    * after the doc agg). */
  def lmPerplexity(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val bi = docs
      .select(col("doc_id"), split(trim(lower(col("text"))), "\\s+").as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(toks)-1), i -> named_struct(
          |  'w1', element_at(toks, i),
          |  'pair', concat(element_at(toks, i), ' ', element_at(toks, i+1))))"""
          .stripMargin)).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.pair").as("pair"))
    val cb = bi.groupBy(col("pair")).agg(count(lit(1)).as("cb"))
    val c1 = bi.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val v = docs
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
      .agg(countDistinct(col("tok")).as("v"))
    bi.join(cb, "pair").join(c1, "w1").crossJoin(broadcast(v))
      .withColumn("bits",
        length(expr("bin((c1 + v) div (cb + 1))")) - lit(1))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("bits")).as("bits_sum"))
      .withColumn("ppl_bits_e6",
        floor(col("bits_sum") * lit(1e6) / col("n_bigrams")).cast("long"))
      .select(col("doc_id"), col("n_bigrams"), col("ppl_bits_e6"))
      .orderBy(col("doc_id"))
  }

  /** Budget fill, reference form (the `t_budget_fill` shape): per-lang
    * best-score-first cumulative-token window, keep while the running
    * total fits `budget`. Input: (doc_id, lang, n_tok, score_e6). */
  def budgetFill(scored: org.apache.spark.sql.DataFrame,
                 budget: Long): org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("score_e6").desc, col("doc_id").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    scored.withColumn("cum_tok", sum(col("n_tok")).over(w))
      .filter(col("cum_tok") <= budget)
      .select(col("lang"), col("doc_id"), col("n_tok"), col("score_e6"),
        col("cum_tok"))
  }

  /** The 100-TB form of `budgetFill`, same output bit-for-bit: instead of
    * window-sorting EVERY row of every language, find a per-lang score
    * cut from a tiny score HISTOGRAM (≤101 buckets/lang, map-side
    * combinable agg), pre-filter to the survivors (≈`slack`× the
    * budget's token mass plus one bucket of overshoot), then run the
    * exact window only on them. The cut is the highest bucket whose
    * best-first cumulative token mass reaches slack×budget, so survivor
    * mass ≥ budget — or the whole language when it never crosses —
    * BY CONSTRUCTION; a loud-fail assert keeps that invariant checked
    * anyway. Bounded sort ⇒ the full-corpus pass is one hash aggregate
    * over (lang, bucket) and the window touches ~slack·budget tokens
    * per language regardless of corpus size. */
  /** Phase 1 of `budgetFillTwoPhase`: the histogram-cut survivor set
    * (exposed for the equality/pruning spec). */
  private[graft] def budgetSurvivors(scored: org.apache.spark.sql.DataFrame,
                                     budget: Long, slack: Long): org.apache.spark.sql.DataFrame = {
    val target = slack * budget
    val bucketed = scored
      .withColumn("bucket", floor(col("score_e6") / 10000L).cast("long"))
      .groupBy(col("lang"), col("bucket"))
      .agg(sum(col("n_tok")).as("b_tok"))
    val wB = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("bucket").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val cuts = bucketed.withColumn("cum", sum(col("b_tok")).over(wB))
      .groupBy(col("lang"))
      .agg(max(when(col("cum") >= target, col("bucket"))).as("crossing_bucket"),
        min(col("bucket")).as("min_bucket"))
      .select(col("lang"),
        (coalesce(col("crossing_bucket"), col("min_bucket")) * 10000L).as("cut"))
    scored.join(broadcast(cuts), Seq("lang"))
      .filter(col("score_e6") >= col("cut"))
      .select(col("lang"), col("doc_id"), col("n_tok"), col("score_e6"))
  }

  def budgetFillTwoPhase(scored: org.apache.spark.sql.DataFrame,
                         budget: Long, slack: Long = 2L): org.apache.spark.sql.DataFrame = {
    val survivors = budgetSurvivors(scored, budget, slack)
    // loud-fail safety: per lang, survivors cover the budget or are all
    val bad = survivors.groupBy(col("lang"))
      .agg(sum(col("n_tok")).as("surv_tok"))
      .join(scored.groupBy(col("lang")).agg(sum(col("n_tok")).as("lang_tok")),
        Seq("lang"))
      .filter(col("surv_tok") < budget && col("surv_tok") < col("lang_tok"))
      .select(col("lang")).collect()
    require(bad.isEmpty,
      s"budgetFillTwoPhase: survivor mass under budget for ${bad.mkString(",")} — raise slack")
    budgetFill(survivors, budget)
  }

  /** The mixture-sampling admission shared by `t_mixture_sample` and
    * `t_mixture_interleave` (see the former's Q comment for the recipe
    * and exactness argument). Returns the admitted docs with their lang,
    * exact token count, and the per-lang admission threshold — UNORDERED
    * (map-shaped after the threshold join); the Qs' tail orderBys are
    * oracle presentation only, a production write uses this directly. */
  private def mixtureAdmitted(s: org.apache.spark.sql.SparkSession,
                              dir: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val w = when($"lang" === "en", 400).when($"lang" === "zh", 200)
      .when($"lang" === "de", 150).when($"lang" === "fr", 150)
      .otherwise(100)
    val docs = t(s, dir, "documents")
      .select($"doc_id", $"lang", size(tokens($"text")).cast("long").as("n_tok"))
    val perLang = docs.groupBy($"lang")
      .agg(sum($"n_tok").as("t_l"))
      .withColumn("w_l", w.cast("double"))
      .withColumn("ratio", $"t_l".cast("double") / $"w_l")
    val m = perLang.agg(min($"ratio").as("m"))
    val thresh = perLang.crossJoin(broadcast(m))
      .select($"lang",
        floor(lit(1e6) * $"m" * $"w_l" / $"t_l".cast("double"))
          .cast("long").as("tau"))
    docs.join(broadcast(thresh), Seq("lang"))
      .filter(pmod($"doc_id" * lit(2654435761L), lit(1000000L)) < $"tau")
  }

  def qs: Seq[Q] = Seq(
    // Token counting: whitespace tokens + BPE-ish lexer tokens (north-star
    // "token counting" op). Int outputs → exact cross-engine.
    Q("t_token_stats", (s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select($"doc_id",
          size(tokens($"text")).as("n_ws_tokens"),
          size(regexp_extract_all($"text", lit(bpeishPattern), lit(0)))
            .as("n_bpeish_tokens"),
          length($"text").as("n_chars"))
        .orderBy($"doc_id")
    }, sql = Some("""
      SELECT doc_id,
             length(string_split_regex(trim(text), '\s+')) AS n_ws_tokens,
             length(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpeish_tokens,
             length(text) AS n_chars
      FROM documents ORDER BY doc_id
    """)),

    // Quality scoring: structural ratios (length / punctuation / stopword
    // density). One double division per row — deterministic IEEE.
    Q("t_quality_score", (s, dir) => {
      import s.implicits._
      val txt = $"text"
      val nTok = size(tokens(txt))
      val nPunct = size(regexp_extract_all(txt, lit("[^A-Za-z0-9\\s]"), lit(0)))
      val nStop = hits(txt, enPat)
      t(s, dir, "documents")
        .select($"doc_id", nTok.as("n_tokens"), nPunct.as("n_punct"),
          nStop.as("n_stopwords"),
          (nStop.cast("double") / nTok).as("stopword_ratio"))
        .orderBy($"doc_id")
    }, sql = Some("""
      SELECT doc_id,
             length(string_split_regex(trim(text), '\s+')) AS n_tokens,
             length(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS n_punct,
             length(regexp_extract_all(lower(text), '\b(the|of|and|to|is|a)\b')) AS n_stopwords,
             CAST(length(regexp_extract_all(lower(text), '\b(the|of|and|to|is|a)\b')) AS DOUBLE)
               / length(string_split_regex(trim(text), '\s+')) AS stopword_ratio
      FROM documents ORDER BY doc_id
    """)),

    // Language-ID confusion matrix vs the labeled lang column.
    Q("t_langid_confusion", (s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select($"lang".as("actual"), langId($"text").as("predicted"))
        .groupBy($"actual", $"predicted").agg(count(lit(1)).as("n"))
        .orderBy($"actual", $"predicted")
    }, sql = Some("""
      WITH scored AS (
        SELECT lang AS actual,
          length(regexp_extract_all(lower(text), '\b(the|of|and|to|is|a)\b')) AS c_en,
          length(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|nicht)\b')) AS c_de,
          length(regexp_extract_all(lower(text), '\b(el|los|que|y|es|una)\b')) AS c_es,
          length(regexp_extract_all(lower(text), '\b(le|les|et|des|est|une)\b')) AS c_fr,
          length(regexp_extract_all(lower(text), '[\x{4e00}-\x{9fff}]')) AS c_zh
        FROM documents)
      SELECT actual,
             CASE WHEN c_zh > 0 THEN 'zh'
                  WHEN c_en >= c_de AND c_en >= c_es AND c_en >= c_fr THEN 'en'
                  WHEN c_de >= c_es AND c_de >= c_fr THEN 'de'
                  WHEN c_es >= c_fr THEN 'es'
                  ELSE 'fr' END AS predicted,
             COUNT(*) AS n
      FROM scored GROUP BY 1, 2 ORDER BY actual, predicted
    """)),

    // Word count over the corpus: explode + hash agg + top-k — the
    // canonical map-reduce shape (one shuffle of (token, partial-count)
    // pairs thanks to map-side combine, then TakeOrdered).
    Q("t_top_tokens", (s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select(explode(tokens(lower($"text"))).as("token"))
        .groupBy($"token").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"token".asc)
        .limit(20)
    }, sql = Some("""
      SELECT token, COUNT(*) AS n
      FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
            FROM documents) t
      GROUP BY token ORDER BY n DESC, token ASC LIMIT 20
    """)),

    // Document fingerprinting (md5 of normalized text) — one row per doc.
    Q("t_fingerprint", (s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select($"doc_id", fingerprint($"text").as("fp"))
        .orderBy($"doc_id")
    }, sql = Some("""
      SELECT doc_id,
             md5(regexp_replace(regexp_replace(lower(trim(text)), '[^a-z0-9\s]', '', 'g'),
                 '\s+', ' ', 'g')) AS fp
      FROM documents ORDER BY doc_id
    """)),

    // TF-IDF: top-3 terms per document, idf as the raw inverse document
    // frequency N/df. Score stays hash-comparable because every float step
    // is a single IEEE op on exact integers (divide, multiply, floor) —
    // identical in any IEEE-754 engine, unlike ln()-based idf whose libm
    // rounding differs. At 100 TB: two hash aggregations (term counts,
    // doc frequencies) + a broadcast of the tiny df-side join.
    Q("t_tfidf", (s, dir) => tfidfTopK(t(s, dir, "documents")), sql = Some("""
      WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        FROM documents),
      tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
      dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
      total AS (SELECT COUNT(*) AS n_docs FROM documents),
      scored AS (
        SELECT doc_id, token,
               CAST(floor(tf * (CAST(n_docs AS DOUBLE) / df) * 1e6 + 0.5) AS BIGINT)
                 AS tfidf_e6
        FROM tf JOIN dfreq USING (token) CROSS JOIN total)
      SELECT doc_id, rk, token, tfidf_e6 FROM (
        SELECT doc_id, token, tfidf_e6,
               row_number() OVER (PARTITION BY doc_id
                 ORDER BY tfidf_e6 DESC, token ASC) AS rk
        FROM scored) t
      WHERE rk <= 3 ORDER BY doc_id, rk
    """), headline = true),

    // Quality gate, the distributed way: keep documents at or above their
    // LANGUAGE's median stopword ratio (a per-stratum quality floor — the
    // filter step after t_quality_score). The median is percentile_disc
    // per group: an ACTUAL data value (no interpolation), computed by a
    // mergeable aggregate and broadcast back — no global window, one scan
    // + one tiny join at any scale. The ratio itself is one IEEE divide
    // on exact ints (bit-equal cross-engine, proven by t_quality_score),
    // so the >= boundary row never flips. Oracle replays the SQL-standard
    // cume_dist >= p convention explicitly (value at position ceil(p·n)).
    Q("t_quality_filter", (s, dir) => {
      import s.implicits._
      val txt = $"text"
      val ratio = (hits(txt, enPat).cast("double") / size(tokens(txt)))
      val q = t(s, dir, "documents")
        .select($"doc_id", $"lang", ratio.as("r"))
      val med = q.groupBy($"lang")
        .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY r)").as("m"))
      q.join(broadcast(med), Seq("lang"))
        .filter($"r" >= $"m")
        .select($"doc_id", $"lang", $"r".as("stopword_ratio"), $"m".as("lang_median"))
        .orderBy($"doc_id")
    }, sql = Some("""
      WITH q AS (
        SELECT doc_id, lang,
               CAST(length(regexp_extract_all(lower(text), '\b(the|of|and|to|is|a)\b')) AS DOUBLE)
                 / length(string_split_regex(trim(text), '\s+')) AS r
        FROM documents),
      ord AS (
        SELECT lang, r, row_number() OVER (PARTITION BY lang ORDER BY r) AS rn,
               COUNT(*) OVER (PARTITION BY lang) AS n
        FROM q),
      med AS (
        SELECT lang, MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN r END) AS m
        FROM ord GROUP BY lang)
      SELECT doc_id, lang, r AS stopword_ratio, m AS lang_median
      FROM q JOIN med USING (lang)
      WHERE r >= m ORDER BY doc_id
    """)),

    // Repetition quality signals (the Gopher-rule family, word-level —
    // these docs are single-line so line-dup metrics degenerate): per doc,
    // the fraction of tokens belonging to repeated unigrams and the mass
    // of the single most frequent bigram. High values flag boilerplate /
    // degenerate generations for corpus filtering. Shape at 100 TB: two
    // explode → hash-agg chains keyed by (doc_id, gram) — partial aggs
    // map-side, shuffle only (gram, count) pairs, no window, no collect.
    // Fractions are one IEEE divide on exact ints → bit-equal engines.
    Q("t_repetition", (s, dir) =>
      repetitionStats(t(s, dir, "documents")), sql = Some("""
      WITH toks AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
        FROM documents),
      uni AS (
        SELECT doc_id, tk, COUNT(*) AS c
        FROM (SELECT doc_id, unnest(w) AS tk FROM toks) t GROUP BY 1, 2),
      unis AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tok,
               CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS n_dup_tok
        FROM uni GROUP BY 1),
      big AS (
        SELECT doc_id, bg, COUNT(*) AS c
        FROM (SELECT doc_id,
                     unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS bg
              FROM toks WHERE len(w) >= 2) t GROUP BY 1, 2),
      bigs AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
               CAST(MAX(c) AS BIGINT) AS top_bigram_n
        FROM big GROUP BY 1)
      SELECT doc_id, n_tok, n_dup_tok,
             CAST(n_dup_tok AS DOUBLE) / n_tok AS dup_tok_frac,
             n_bigrams, top_bigram_n,
             CAST(top_bigram_n AS DOUBLE) / n_bigrams AS top_bigram_frac
      FROM unis JOIN bigs USING (doc_id)
      ORDER BY doc_id
    """)),

    // PII scrubbing: find + redact email/phone patterns (the compliance
    // pass every training corpus runs). The corpus has no organic PII,
    // so a deterministic planted suffix makes the op testable end-to-end;
    // the count/replace machinery is the real thing — regexp class
    // syntax chosen to mean the same in Spark (Java regex) and DuckDB
    // (RE2). Map-only, codegen'd, no shuffle.
    Q("t_redact_pii", (s, dir) => {
      import s.implicits._
      val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phonePat = "\\+[0-9]{2}-[0-9]{3}-[0-9]{4}"
      val planted = concat($"text",
        when($"doc_id" % 10 === 0, lit(" contact agent007@example.com now"))
          .when($"doc_id" % 10 === 5, lit(" call +49-555-0142 today"))
          .otherwise(lit("")))
      t(s, dir, "documents")
        .filter($"doc_id" < 50)
        .select($"doc_id", planted.as("txt"))
        .select($"doc_id",
          size(regexp_extract_all($"txt", lit(emailPat), lit(0))).as("n_emails"),
          size(regexp_extract_all($"txt", lit(phonePat), lit(0))).as("n_phones"),
          length(regexp_replace(regexp_replace($"txt", emailPat, "<EMAIL>"),
            phonePat, "<PHONE>")).as("n_chars_redacted"))
        .orderBy($"doc_id")
    }, sql = Some("""
      WITH p AS (
        SELECT doc_id,
               text || CASE WHEN doc_id % 10 = 0 THEN ' contact agent007@example.com now'
                            WHEN doc_id % 10 = 5 THEN ' call +49-555-0142 today'
                            ELSE '' END AS txt
        FROM documents WHERE doc_id < 50)
      SELECT doc_id,
             length(regexp_extract_all(txt, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
             length(regexp_extract_all(txt, '\+[0-9]{2}-[0-9]{3}-[0-9]{4}')) AS n_phones,
             length(regexp_replace(regexp_replace(txt,
                      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                      '\+[0-9]{2}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')) AS n_chars_redacted
      FROM p ORDER BY doc_id
    """)),

    // Benchmark-contamination check: corpus documents sharing any 8-gram
    // with the eval set (docs 0-99 stand in for a held-out benchmark) —
    // the decontamination filter run before training. Shape: eval
    // shingles are TINY (a benchmark, not a corpus) → broadcast; corpus
    // side is one explode + semi-ish join + count, no self-join. The
    // planted near-dups make real hits at both SFs.
    Q("t_contamination", (s, dir) => {
      import s.implicits._
      // canonical k-gram definition (Dedup.shingles) — the gram window
      // must never drift from the dedup tier's
      def grams(df: org.apache.spark.sql.DataFrame) =
        Dedup.shingles(df, 8).withColumnRenamed("shingle", "g")
      val docs = t(s, dir, "documents")
      val eval8 = grams(docs.filter($"doc_id" < 100))
        .select($"g", $"doc_id".as("eval_id")).distinct()
      grams(docs.filter($"doc_id" >= 100))
        .join(broadcast(eval8), Seq("g"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_shared_8grams"),
          countDistinct($"eval_id").as("n_eval_docs_hit"))
        .orderBy($"doc_id")
    }, sql = Some("""
      WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
      grams AS (
        SELECT DISTINCT doc_id, array_to_string(toks[i:i+7], ' ') AS g
        FROM toks, UNNEST(range(1, CASE WHEN len(toks) >= 8 THEN len(toks) - 6 ELSE 1 END)) t(i)
        WHERE len(toks) >= 8),
      ev AS (SELECT DISTINCT g, doc_id AS eval_id FROM grams WHERE doc_id < 100),
      corpus AS (SELECT doc_id, g FROM grams WHERE doc_id >= 100)
      SELECT c.doc_id, COUNT(*) AS n_shared_8grams,
             COUNT(DISTINCT e.eval_id) AS n_eval_docs_hit
      FROM corpus c JOIN ev e USING (g)
      GROUP BY c.doc_id ORDER BY c.doc_id
    """)),

    // Deterministic train/val/test split: 80/10/10 by md5 slot of doc_id
    // — the r4_hash_sample predicate generalized to a 3-way CASE. Split
    // membership is a pure function of the key: reproducible across
    // engines, retries, partitionings, and DATA GROWTH (a doc never
    // migrates between splits when the corpus grows — the property
    // rand() or row-position splits lack). Map-side label + one
    // (lang, split) hash agg to keep the oracle output small; the spec
    // is per-stratum counts, which also audits the split balance.
    Q("t_split_assign", (s, dir) => {
      import s.implicits._
      val slot = conv(substring(md5($"doc_id".cast("string")
        .cast("binary")), 1, 8), 16, 10).cast("long") % 100
      t(s, dir, "documents")
        .withColumn("split",
          when(slot < 80, "train").when(slot < 90, "val").otherwise("test"))
        .groupBy($"lang", $"split")
        .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("total_chars"),
          min($"doc_id").as("min_doc_id"))
        .orderBy($"lang", $"split")
    }, sql = Some("""
      SELECT lang,
             CASE WHEN slot < 80 THEN 'train'
                  WHEN slot < 90 THEN 'val' ELSE 'test' END AS split,
             COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
             MIN(doc_id) AS min_doc_id
      FROM (SELECT *, ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS slot
            FROM documents) t
      GROUP BY 1, 2 ORDER BY lang, split
    """)),

    // Outlier winsorization: clamp n_chars to each language's [p5, p95]
    // — the truncate-the-tails normalization before length-sensitive
    // training stats. percentile_disc bounds are an exact mergeable
    // aggregate (langs × 2 rows) broadcast back over the scan; the
    // clamp itself is map-side. The oracle replays percentile_disc's
    // smallest-cume_dist>=p convention via rank = ceil(p·n).
    Q("t_clip_outliers", (s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      // percentile_disc returns double even for integer input; the bounds
      // ARE data values, so the long cast is exact
      val bounds = docs.groupBy($"lang").agg(
        expr("CAST(percentile_disc(0.05) WITHIN GROUP (ORDER BY n_chars) AS BIGINT)").as("lo"),
        expr("CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY n_chars) AS BIGINT)").as("hi"))
      docs.join(broadcast(bounds), Seq("lang"))
        .select($"lang", greatest(least($"n_chars", $"hi"), $"lo").as("clipped"))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"), sum($"clipped").as("sum_clipped"),
          min($"clipped").as("min_clipped"), max($"clipped").as("max_clipped"))
        .orderBy($"lang")
    }, sql = Some("""
      WITH ord AS (
        SELECT lang, n_chars,
               row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
               COUNT(*) OVER (PARTITION BY lang) AS n
        FROM documents),
      b AS (
        SELECT lang,
               MAX(CASE WHEN rn = CAST(ceil(0.05 * n) AS BIGINT) THEN n_chars END) AS lo,
               MAX(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT) THEN n_chars END) AS hi
        FROM ord GROUP BY lang)
      SELECT d.lang, COUNT(*) AS n_docs,
             CAST(SUM(GREATEST(LEAST(n_chars, hi), lo)) AS BIGINT) AS sum_clipped,
             CAST(MIN(GREATEST(LEAST(n_chars, hi), lo)) AS BIGINT) AS min_clipped,
             CAST(MAX(GREATEST(LEAST(n_chars, hi), lo)) AS BIGINT) AS max_clipped
      FROM documents d JOIN b USING (lang)
      GROUP BY d.lang ORDER BY d.lang
    """)),

    // Document chunking: fixed-size overlapping token windows (64-token
    // chunks, stride 48 → 16-token overlap) — the split-for-context-
    // window step of LLM data prep. One generator per doc (map-side
    // explode, no shuffle); a trailing start is emitted only if its
    // chunk adds tokens beyond the previous chunk's coverage
    // (s + overlap < n), so no chunk is a strict suffix-duplicate.
    // Chunk text is verified by md5 so the output stays narrow.
    Q("t_chunk_docs", (s, dir) => {
      import s.implicits._
      val cs = 64; val stride = 48; val ov = cs - stride
      t(s, dir, "documents")
        .select($"doc_id", split(trim($"text"), "\\s+").as("toks"))
        .select($"doc_id", posexplode(expr(
          s"""transform(
             |  filter(sequence(0, size(toks) - 1, $stride),
             |         s -> s = 0 OR s + $ov < size(toks)),
             |  s -> struct(size(slice(toks, s + 1, $cs)) AS n_tok,
             |              md5(concat_ws(' ', slice(toks, s + 1, $cs))) AS chunk_md5))"""
            .stripMargin)).as(Seq("chunk_id", "ch")))
        .select($"doc_id", $"chunk_id", $"ch.n_tok".as("n_tok"),
          $"ch.chunk_md5".as("chunk_md5"))
        .orderBy($"doc_id", $"chunk_id")
    }, sql = Some("""
      WITH d AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
      starts AS (
        SELECT doc_id, toks, s,
               row_number() OVER (PARTITION BY doc_id ORDER BY s) - 1 AS chunk_id
        FROM d, UNNEST(range(0, len(toks), 48)) t(s)
        WHERE s = 0 OR s + 16 < len(toks))
      SELECT doc_id, chunk_id,
             len(toks[s+1:s+64]) AS n_tok,
             md5(array_to_string(toks[s+1:s+64], ' ')) AS chunk_md5
      FROM starts ORDER BY doc_id, chunk_id
    """)),

    // Shard packing: assign docs to fixed token-budget output shards per
    // language — the "write ~N-token training files" step, in the
    // two-level prefix-sum shape (see packShards: per-(lang,bucket)
    // windows + broadcast bucket offsets; no per-lang corpus sort).
    // Integer arithmetic end-to-end → exact cross-engine, and the oracle
    // keeps the straightforward one-window SQL because the fixpoint is
    // identical by construction.
    Q("t_shard_assign", (s, dir) => {
      import s.implicits._
      packShards(
        t(s, dir, "documents")
          .select($"doc_id", $"lang", size(tokens($"text")).as("n_tok")),
        budget = 2000)
        .orderBy($"doc_id")
    }, sql = Some("""
      SELECT doc_id, lang, n_tok,
             CAST(floor((cum - n_tok) / 2000) AS BIGINT) AS shard_id
      FROM (
        SELECT doc_id, lang,
               length(string_split_regex(trim(text), '\s+')) AS n_tok,
               SUM(length(string_split_regex(trim(text), '\s+')))
                 OVER (PARTITION BY lang ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM documents) t
      ORDER BY doc_id
    """)),

    // Deterministic seeded corpus shuffle — the training-order primitive:
    // a keyed md5 over (doc_id, seed) gives every doc a pseudorandom but
    // reproducible sort key; docs land in modulo shards and each shard
    // orders by the hash, so the concatenated shards are a stable
    // permutation of the corpus and a new epoch = a new seed string, no
    // data movement decision left to chance. Scale: NO global sort —
    // per-shard windows only (shards are thousands at 100 TB, each a
    // partition-sized sort); the md5 is map-side. The oracle replays the
    // identical digest (ASCII input → byte-identical lowercase hex in
    // both engines).
    Q("t_corpus_shuffle", (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val h = md5(concat($"doc_id".cast("string"), lit(":seed42")).cast("binary"))
      val w = Window.partitionBy($"shard_id").orderBy($"h", $"doc_id")
      t(s, dir, "documents")
        .select($"doc_id", pmod($"doc_id", lit(16)).as("shard_id"), h.as("h"))
        .withColumn("pos", row_number().over(w).cast("long"))
        .select($"doc_id", $"shard_id", $"h".as("shuffle_key"), $"pos")
        .orderBy($"shard_id", $"pos")
    }, sql = Some("""
      SELECT doc_id, doc_id % 16 AS shard_id,
             md5(CAST(doc_id AS VARCHAR) || ':seed42') AS shuffle_key,
             CAST(row_number() OVER (PARTITION BY doc_id % 16
               ORDER BY md5(CAST(doc_id AS VARCHAR) || ':seed42'), doc_id)
               AS BIGINT) AS pos
      FROM documents
      ORDER BY shard_id, pos
    """)),

    // C4/RefinedWeb-style line-level dedup, with fixed 10-token segments
    // standing in for lines (the corpus is single-line). A segment is a
    // dup if any earlier (doc_id) occurrence of the same segment exists —
    // including within the same document. Execution shape is AGG-ONLY and
    // skew-proof by construction: explode → hash-agg per segment
    // (map-side combine absorbs a boilerplate segment occurring in
    // millions of docs — the exact hot key C4 hits) → hash-agg per doc →
    // doc_id equi-joins. No window over the segment key, no self-join:
    // the per-doc keeper count is enough to derive the dup count.
    Q("t_segment_dedup", (s, dir) =>
      segmentDedupStats(t(s, dir, "documents")), sql = Some("""
      WITH docs AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        FROM documents WHERE length(trim(text)) > 0),
      seg AS (
        SELECT doc_id, array_to_string(toks[i*10+1:i*10+10], ' ') AS seg
        FROM docs, UNNEST(range(0, (len(toks)+9)//10)) t(i)),
      totals AS (SELECT doc_id, COUNT(*) AS n_seg FROM seg GROUP BY 1),
      keep AS (SELECT seg, MIN(doc_id) AS doc_id FROM seg GROUP BY 1),
      kept AS (SELECT doc_id, COUNT(*) AS n_kept FROM keep GROUP BY 1)
      SELECT t.doc_id, t.n_seg,
             t.n_seg - COALESCE(k.n_kept, 0) AS n_dup_seg
      FROM totals t LEFT JOIN kept k USING (doc_id)
      ORDER BY doc_id
    """), headline = true),

    // Tokenizer-training primitive: the first round of BPE-style merge
    // selection is "count every adjacent token pair across the corpus,
    // take the most frequent". Map-side explode of (len-1) bigrams per
    // doc, ONE shuffle of partial counts (map-side combine), TakeOrdered
    // top-k — the same shape at 100 TB, where the pair-count table is
    // vocab², tiny next to the corpus.
    Q("t_bpe_pairs", (s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select(split(trim(lower($"text")), "\\s+").as("toks"))
        .filter(size($"toks") >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(toks)-1), i -> concat(element_at(toks, i), ' ', element_at(toks, i+1)))"))
          .as("pair"))
        .groupBy($"pair").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"pair".asc)
        .limit(20)
    }, sql = Some("""
      WITH docs AS (
        SELECT string_split_regex(trim(lower(text)), '\s+') AS toks FROM documents),
      p AS (
        SELECT toks[i] || ' ' || toks[i+1] AS pair
        FROM docs, UNNEST(range(1, len(toks))) t(i)
        WHERE len(toks) >= 2)
      SELECT pair, COUNT(*) AS n FROM p
      GROUP BY pair ORDER BY n DESC, pair ASC LIMIT 20
    """)),

    // LM-likelihood quality screen (the CCNet-style "score every document
    // under a corpus language model" step): add-one-smoothed bigram model
    // trained on the corpus itself, each document scored by its mean
    // per-bigram surprisal. Surprisal is kept EXACT-INTEGER — whole bits,
    // floor(log2((c(w1)+V)/(c(w1w2)+1))), computed as
    // length(bin(a div b))-1 (floor-log2 of a rational ≥ 1 equals
    // floor-log2 of its integer quotient, and floor-log2 of an integer is
    // its bit length minus one) — because libm ln() rounds differently
    // across engines (the t_tfidf rule); log-space CCNet perplexity would
    // rank almost identically but could never be hash-oracled. At 100 TB:
    // the model is two hash aggs bounded by observed-bigram/vocab
    // cardinality (orders smaller than the corpus), scoring is one
    // equi-join keyed on the bigram (broadcastable while the model fits,
    // shuffle join beyond), and the per-doc reduce is a mergeable agg —
    // no window, no self-join, model cost amortized over every doc.
    Q("t_lm_perplexity", (s, dir) => lmPerplexity(t(s, dir, "documents")),
      sql = Some("""
      WITH docs AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
        FROM documents),
      bi AS (
        SELECT doc_id, toks[i] AS w1, toks[i] || ' ' || toks[i+1] AS pair
        FROM docs, UNNEST(range(1, len(toks))) t(i)
        WHERE len(toks) >= 2),
      cb AS (SELECT pair, COUNT(*) AS cb FROM bi GROUP BY 1),
      c1 AS (SELECT w1, COUNT(*) AS c1 FROM bi GROUP BY 1),
      v AS (SELECT COUNT(DISTINCT tok) AS v FROM (
        SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        FROM documents)),
      terms AS (
        SELECT doc_id, length(bin((c1.c1 + v.v) // (cb.cb + 1))) - 1 AS bits
        FROM bi JOIN cb USING (pair) JOIN c1 USING (w1) CROSS JOIN v)
      SELECT doc_id, COUNT(*) AS n_bigrams,
             CAST(floor(SUM(bits) * 1e6 / COUNT(*)) AS BIGINT) AS ppl_bits_e6
      FROM terms GROUP BY doc_id ORDER BY doc_id
    """)),

    // Vocabulary coverage / OOV rate per language against a frequency-built
    // top-k vocab (k=10 of the corpus's 31 tokens, so the rate is
    // non-trivial): pass 1 builds the vocab (hash agg + TakeOrdered —
    // vocab-sized, broadcastable at any corpus scale), pass 2 left-joins
    // it back (broadcast) and aggregates per language. The rate is one
    // IEEE divide + floor on exact counts — bit-equal cross-engine.
    Q("t_vocab_coverage", (s, dir) => {
      import s.implicits._
      val toks = t(s, dir, "documents")
        .select($"lang", explode(tokens(lower($"text"))).as("token"))
      val vocab = toks.groupBy($"token").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"token".asc).limit(10)
        .select($"token", lit(1).as("in_v"))
      toks.join(broadcast(vocab), Seq("token"), "left")
        .groupBy($"lang").agg(
          count(lit(1)).as("n_tok"),
          count(when($"in_v".isNull, 1)).as("n_oov"))
        .withColumn("oov_e6", floor($"n_oov" * lit(1e6) / $"n_tok").cast("long"))
        .orderBy($"lang")
    }, sql = Some("""
      WITH toks AS (
        SELECT lang, unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        FROM documents),
      vocab AS (
        SELECT token FROM (
          SELECT token, COUNT(*) AS n FROM toks
          GROUP BY token ORDER BY n DESC, token ASC LIMIT 10)),
      sel AS (
        SELECT t.lang, v.token AS vt
        FROM toks t LEFT JOIN vocab v ON t.token = v.token)
      SELECT lang, COUNT(*) AS n_tok,
             COUNT(CASE WHEN vt IS NULL THEN 1 END) AS n_oov,
             CAST(floor(COUNT(CASE WHEN vt IS NULL THEN 1 END) * 1e6 / COUNT(*)) AS BIGINT) AS oov_e6
      FROM sel GROUP BY lang ORDER BY lang
    """)),

    // Per-language 2-sigma length-outlier count, BIT-EXACT: |x - mean| >
    // 2*sigma is rewritten over raw integer moments as
    // (n*x - S)^2 > 4*(n*Q - S^2) — integer arithmetic only, no mean, no
    // sqrt, no float boundary to flip between engines (the g15_corr
    // trick applied to an anomaly gate). The moment products AND the
    // second-moment SUM itself run in DECIMAL(38,0) (Spark) / HUGEINT
    // (DuckDB): with n ≤ 1e9 docs per language and x ≤ 1e5 chars, Q ≤
    // 1e19 (already past BIGINT's 9.2e18 — a BIGINT accumulator would
    // overflow the sum at ~9e8 max-length docs) and dev^2 / n*Q stay ≤
    // ~1e28 — 10 orders inside the 38-digit budget, where raw BIGINT
    // products would overflow at ~1e6 docs.
    // Two passes: mergeable moment aggregates, broadcast back
    // (one row per language), map-side predicate. The float version of
    // this filter is NOT hash-comparable; the moments version is.
    Q("t_outlier_zscore", (s, dir) => {
      import s.implicits._
      val dec = DecimalType(38, 0)
      val d = t(s, dir, "documents").select($"lang", $"n_chars")
      val st = d.groupBy($"lang").agg(
        count(lit(1)).as("n"),
        sum($"n_chars").as("s"),
        sum(($"n_chars" * $"n_chars").cast(dec)).as("q"))
      d.join(broadcast(st), Seq("lang"))
        .withColumn("dev",
          ($"n".cast(dec) * $"n_chars" - $"s").cast(dec))
        .withColumn("is_out",
          $"dev" * $"dev" >
            ($"n".cast(dec) * $"q" - $"s".cast(dec) * $"s").cast(dec) * 4)
        .groupBy($"lang").agg(
          count(lit(1)).as("n_docs"),
          count(when($"is_out", 1)).as("n_outliers"))
        .orderBy($"lang")
    }, sql = Some("""
      WITH st AS (
        SELECT lang, COUNT(*) AS n,
               CAST(SUM(n_chars) AS BIGINT) AS s,
               SUM(n_chars * n_chars) AS q
        FROM documents GROUP BY lang)
      SELECT lang, COUNT(*) AS n_docs,
             COUNT(CASE WHEN (CAST(n AS HUGEINT) * n_chars - s)
                             * (CAST(n AS HUGEINT) * n_chars - s)
                             > 4 * (CAST(n AS HUGEINT) * q - CAST(s AS HUGEINT) * s)
                        THEN 1 END) AS n_outliers
      FROM documents JOIN st USING (lang)
      GROUP BY lang ORDER BY lang
    """)),

    // Vocabulary growth (saturation) curve per language: after ingesting
    // docs in id order, how many distinct tokens has the language seen?
    // Distinct-over-window is not directly expressible in either engine;
    // the portable form is the FIRST-OCCURRENCE FLAG (row_number = 1 per
    // (lang, token) in stream order) summed cumulatively. Both windows
    // are lang-partitioned (bounded strata, the w8 posture); the flag
    // dedup is a hash-shuffle on (lang, token) — scale-safe.
    Q("t_vocab_growth", (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val toks = t(s, dir, "documents")
        .select($"lang", $"doc_id", explode(tokens(lower($"text"))).as("token"))
      val firsts = toks
        .withColumn("rn", row_number().over(
          Window.partitionBy($"lang", $"token").orderBy($"doc_id")))
        .filter($"rn" === 1)
        .groupBy($"lang", $"doc_id").agg(count(lit(1)).as("n_new"))
      val perDoc = toks.select($"lang", $"doc_id").distinct()
        .join(firsts, Seq("lang", "doc_id"), "left")
        .withColumn("n_new", coalesce($"n_new", lit(0L)))
      perDoc
        .withColumn("vocab_seen", sum($"n_new").over(
          Window.partitionBy($"lang").orderBy($"doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select($"lang", $"doc_id", $"n_new", $"vocab_seen")
        .orderBy($"lang", $"doc_id")
    }, sql = Some("""
      WITH toks AS (
        SELECT lang, doc_id,
               unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        FROM documents),
      firsts AS (
        SELECT lang, doc_id, COUNT(*) AS n_new FROM (
          SELECT lang, doc_id, token,
                 row_number() OVER (PARTITION BY lang, token ORDER BY doc_id) AS rn
          FROM toks) t
        WHERE rn = 1 GROUP BY lang, doc_id),
      per_doc AS (
        SELECT d.lang, d.doc_id, COALESCE(f.n_new, 0) AS n_new
        FROM (SELECT DISTINCT lang, doc_id FROM toks) d
        LEFT JOIN firsts f ON d.lang = f.lang AND d.doc_id = f.doc_id)
      SELECT lang, doc_id, n_new,
             CAST(SUM(n_new) OVER (PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS vocab_seen
      FROM per_doc ORDER BY lang, doc_id
    """)),

    // Rare-token density score: rank tokens by global frequency (rank 1
    // = most common; ties broken by token text, so the rank table is
    // deterministic), then score each doc by its mean token rank ×1e6 —
    // a lexical-rarity quality signal with INTEGER sums and one IEEE
    // divide + floor (hash-exact, where a log-prob LM score would not
    // be). The rank table is CAPPED at the top 10k tokens (TakeOrdered,
    // never a global window over the raw vocabulary — a web corpus has
    // ~1e9 distinct "tokens" and an unpartitioned row_number would sort
    // them in one task); everything past the cap scores the flat tail
    // rank 10k+1. The capped table is what makes the broadcast bounded
    // at any corpus size. Covers the full 31-token vocab here, so the
    // cap is semantics-neutral at test scale.
    Q("t_rarity_score", (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val cap = 10000
      val toks = t(s, dir, "documents")
        .select($"doc_id", explode(tokens(lower($"text"))).as("token"))
      val top = toks.groupBy($"token").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"token".asc).limit(cap)
      val ranks = top.withColumn("rk", row_number().over(
          Window.orderBy($"n".desc, $"token".asc)).cast("long"))
        .select($"token", $"rk")
      toks.join(broadcast(ranks), Seq("token"), "left")
        .withColumn("rk", coalesce($"rk", lit(cap + 1L)))
        .groupBy($"doc_id").agg(
          count(lit(1)).as("n_tok"), sum($"rk").as("rank_sum"))
        .withColumn("rarity_e6",
          floor($"rank_sum" * lit(1e6) / $"n_tok").cast("long"))
        .select($"doc_id", $"n_tok", $"rarity_e6")
        .orderBy($"doc_id")
    }, sql = Some("""
      WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        FROM documents),
      ranks AS (
        SELECT token, CAST(row_number() OVER (ORDER BY n DESC, token ASC) AS BIGINT) AS rk
        FROM (SELECT token, COUNT(*) AS n FROM toks GROUP BY token
              ORDER BY n DESC, token ASC LIMIT 10000)),
      scored AS (
        SELECT t.doc_id, COALESCE(r.rk, 10001) AS rk
        FROM toks t LEFT JOIN ranks r ON t.token = r.token)
      SELECT doc_id, COUNT(*) AS n_tok,
             CAST(floor(CAST(SUM(rk) AS BIGINT) * 1e6 / COUNT(*)) AS BIGINT) AS rarity_e6
      FROM scored GROUP BY doc_id ORDER BY doc_id
    """)),

    // Quality-weighted epoch mixing: docs at/above their language's 75th
    // quality percentile are repeated twice in the training mix, the rest
    // once — the deterministic upsampling step of a data-mixture recipe.
    // The percentile is a mergeable percentile_disc broadcast back (one
    // row per language); replication is a map-side explode of
    // sequence(1, n_copies) — no shuffle grows with the copy factor.
    Q("t_upsample_mix", (s, dir) => {
      import s.implicits._
      val q = t(s, dir, "documents").select($"doc_id", $"lang",
        (hits($"text", enPat).cast("double") / size(tokens($"text"))).as("r"))
      val p75 = q.groupBy($"lang")
        .agg(expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY r)").as("p"))
      q.join(broadcast(p75), Seq("lang"))
        .withColumn("n_copies", when($"r" >= $"p", 2).otherwise(1))
        .select($"doc_id", $"lang", $"n_copies",
          explode(sequence(lit(1L), $"n_copies".cast("long"))).as("copy_id"))
        .orderBy($"doc_id", $"copy_id")
    }, sql = Some("""
      WITH q AS (
        SELECT doc_id, lang,
               CAST(length(regexp_extract_all(lower(text), '\b(the|of|and|to|is|a)\b')) AS DOUBLE)
                 / length(string_split_regex(trim(text), '\s+')) AS r
        FROM documents),
      ord AS (
        SELECT lang, r, row_number() OVER (PARTITION BY lang ORDER BY r) AS rn,
               COUNT(*) OVER (PARTITION BY lang) AS n
        FROM q),
      p75 AS (
        SELECT lang, MAX(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT) THEN r END) AS p
        FROM ord GROUP BY lang),
      c AS (
        SELECT q.doc_id, q.lang,
               CASE WHEN q.r >= p75.p THEN 2 ELSE 1 END AS n_copies
        FROM q JOIN p75 USING (lang))
      SELECT doc_id, lang, n_copies, CAST(u.i AS BIGINT) AS copy_id
      FROM c, UNNEST(range(1, n_copies + 1)) u(i)
      ORDER BY doc_id, copy_id
    """)),

    // Target-weight mixture sampling: downsample each language so the
    // kept corpus hits a fixed token-share recipe (en 40 %, zh 20 %,
    // de/fr 15 %, es 10 % — the Pile-style fixed-weight mixing step of a
    // training-data pipeline). The binding language (largest token
    // deficit vs its weight) is kept whole; every other language gets a
    // deterministic per-doc acceptance threshold τ_l = ⌊1e6·m·w_l/T_l⌋
    // where m = min_l(T_l/w_l), admitted by an integer Knuth-hash bucket
    // of doc_id — reproducible run-to-run, no RNG state, membership
    // decidable per row with only the broadcast per-lang thresholds.
    // Scale posture: one tiny per-lang agg (|langs| rows) broadcast back;
    // admission is a map-side filter on the scan — the 100 TB shape.
    // Double math (ratio, min, τ) is division-then-floor on exact integer
    // token counts, expression-identical in both engines → bit-stable.
    Q("t_mixture_sample", (s, dir) =>
      mixtureAdmitted(s, dir)
        .select(col("doc_id"), col("lang"), col("n_tok"), col("tau"))
        .orderBy(col("doc_id")),
    sql = Some("""
      WITH docs AS (
        SELECT doc_id, lang,
               CAST(length(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok
        FROM documents),
      per_lang AS (
        SELECT lang, SUM(n_tok) AS t_l,
               CAST(CASE lang WHEN 'en' THEN 400 WHEN 'zh' THEN 200
                    WHEN 'de' THEN 150 WHEN 'fr' THEN 150 ELSE 100 END AS DOUBLE) AS w_l
        FROM docs GROUP BY lang),
      scaled AS (
        SELECT MIN(CAST(t_l AS DOUBLE) / w_l) AS m FROM per_lang),
      thresh AS (
        SELECT lang,
               CAST(floor(1000000.0 * m * w_l / CAST(t_l AS DOUBLE)) AS BIGINT) AS tau
        FROM per_lang CROSS JOIN scaled)
      SELECT doc_id, docs.lang, n_tok, tau
      FROM docs JOIN thresh ON docs.lang = thresh.lang
      WHERE (doc_id * 2654435761) % 1000000 < tau
      ORDER BY doc_id
    """)),

    // Training-order interleave over the mixed corpus: the admitted docs
    // of each language are ranked (rn, by doc_id) and given the exact
    // integer key rn·(LCM/w_l) — LCM(400,200,150,100)=1200, so en docs
    // land every 3 key units, zh every 6, de/fr every 8, es every 12 —
    // the smooth weight-proportional schedule a training loader wants
    // (never a long monolingual run), deterministic and resumable from
    // any key offset. Scale posture: per-lang window for rn (same
    // shuffle the admission already keys), pure map for the key; the
    // global ORDER BY is oracle presentation — production writes
    // key-sorted WITHIN shards and merge-reads, never a global sort.
    Q("t_mixture_interleave", (s, dir) => {
      import s.implicits._
      val k = when($"lang" === "en", 3L).when($"lang" === "zh", 6L)
        .when($"lang" === "de", 8L).when($"lang" === "fr", 8L)
        .otherwise(12L)
      val rn = row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy($"lang").orderBy($"doc_id")).cast("long")
      mixtureAdmitted(s, dir)
        .withColumn("rn", rn)
        .select($"lang", $"doc_id", $"rn", ($"rn" * k).as("ikey"))
        .orderBy($"ikey", $"lang", $"doc_id")
    }, sql = Some("""
      WITH docs AS (
        SELECT doc_id, lang,
               CAST(length(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok
        FROM documents),
      per_lang AS (
        SELECT lang, SUM(n_tok) AS t_l,
               CAST(CASE lang WHEN 'en' THEN 400 WHEN 'zh' THEN 200
                    WHEN 'de' THEN 150 WHEN 'fr' THEN 150 ELSE 100 END AS DOUBLE) AS w_l
        FROM docs GROUP BY lang),
      scaled AS (
        SELECT MIN(CAST(t_l AS DOUBLE) / w_l) AS m FROM per_lang),
      thresh AS (
        SELECT lang,
               CAST(floor(1000000.0 * m * w_l / CAST(t_l AS DOUBLE)) AS BIGINT) AS tau
        FROM per_lang CROSS JOIN scaled),
      admitted AS (
        SELECT doc_id, docs.lang
        FROM docs JOIN thresh ON docs.lang = thresh.lang
        WHERE (doc_id * 2654435761) % 1000000 < tau),
      ranked AS (
        SELECT lang, doc_id,
               CAST(row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS BIGINT) AS rn
        FROM admitted)
      SELECT lang, doc_id, rn,
             rn * CAST(CASE lang WHEN 'en' THEN 3 WHEN 'zh' THEN 6
                  WHEN 'de' THEN 8 WHEN 'fr' THEN 8 ELSE 12 END AS BIGINT) AS ikey
      FROM ranked
      ORDER BY ikey, lang, doc_id
    """)),

    // Token-budget fill: take documents best-quality-first per language
    // until each language's token budget is spent — the "fill a 10B-token
    // budget from the best of each domain" step of a curation recipe.
    // Quality = exact-integer stopword density (floor-e6); the running
    // token total is an explicit ROWS window so both engines bucket
    // identically. Scale posture: one per-lang window (sort within
    // domain, never global); at 100 TB use `budgetFillTwoPhase` —
    // histogram-cut the score, exact-fill only the ~2×budget survivors —
    // same output bit-for-bit (ExtensionSpec pins the equality), bounded
    // sort.
    Q("t_budget_fill", (s, dir) => {
      import s.implicits._
      val nTok = size(tokens($"text"))
      val d = t(s, dir, "documents").select($"doc_id", $"lang",
        nTok.cast("long").as("n_tok"),
        floor(hits($"text", enPat) * lit(1e6) / nTok).cast("long").as("score_e6"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"lang").orderBy($"score_e6".desc, $"doc_id".asc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      d.withColumn("cum_tok", sum($"n_tok").over(w))
        .filter($"cum_tok" <= 2000)
        .select($"lang", $"doc_id", $"n_tok", $"score_e6", $"cum_tok")
        .orderBy($"lang", $"score_e6".desc, $"doc_id")
    }, sql = Some("""
      WITH d AS (
        SELECT doc_id, lang,
               CAST(length(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok,
               CAST(floor(length(regexp_extract_all(lower(text), '\b(the|of|and|to|is|a)\b')) * 1e6
                    / length(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS score_e6
        FROM documents),
      c AS (
        SELECT lang, doc_id, n_tok, score_e6,
               CAST(SUM(n_tok) OVER (PARTITION BY lang ORDER BY score_e6 DESC, doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tok
        FROM d)
      SELECT lang, doc_id, n_tok, score_e6, cum_tok
      FROM c WHERE cum_tok <= 2000
      ORDER BY lang, score_e6 DESC, doc_id
    """)),

    // 8-gram novelty: what fraction of a doc's distinct 8-grams appear
    // here FIRST (min doc_id in id order)? Low novelty = mostly-copied
    // content — the streaming-ingest complement of pairwise dedup. Same
    // agg-only skew-proof shape as t_segment_dedup: hash-agg per gram
    // with map-side combine, per-doc first-owner counts, doc_id joins —
    // no window or self-join keyed by gram. The rate is one IEEE
    // divide + floor on exact counts.
    Q("t_novelty", (s, dir) => {
      import s.implicits._
      val g = Dedup.shingles(t(s, dir, "documents"), 8)
        .withColumnRenamed("shingle", "g")
      val per = g.groupBy($"doc_id").agg(count(lit(1)).as("n_grams"))
      val novel = g.groupBy($"g").agg(min($"doc_id").as("doc_id"))
        .groupBy($"doc_id").agg(count(lit(1)).as("n_novel"))
      per.join(novel, Seq("doc_id"), "left")
        .withColumn("n_novel", coalesce($"n_novel", lit(0L)))
        .withColumn("novelty_e6",
          floor($"n_novel" * lit(1e6) / $"n_grams").cast("long"))
        .select($"doc_id", $"n_grams", $"n_novel", $"novelty_e6")
        .orderBy($"doc_id")
    }, sql = Some("""
      WITH docs AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
      g AS (
        SELECT DISTINCT doc_id, array_to_string(toks[i:i+7], ' ') AS g
        FROM docs, UNNEST(range(1, CASE WHEN len(toks) >= 8 THEN len(toks) - 6 ELSE 1 END)) t(i)
        WHERE len(toks) >= 8),
      per AS (SELECT doc_id, COUNT(*) AS n_grams FROM g GROUP BY 1),
      novel AS (
        SELECT doc_id, COUNT(*) AS n_novel FROM (
          SELECT g, MIN(doc_id) AS doc_id FROM g GROUP BY g)
        GROUP BY doc_id)
      SELECT p.doc_id, p.n_grams, COALESCE(n.n_novel, 0) AS n_novel,
             CAST(floor(COALESCE(n.n_novel, 0) * 1e6 / p.n_grams) AS BIGINT) AS novelty_e6
      FROM per p LEFT JOIN novel n ON p.doc_id = n.doc_id
      ORDER BY p.doc_id
    """)),

    // Leakage-safe train/val/test split: t_split_assign hashes the DOC id,
    // which lets two near-duplicate documents straddle train and test —
    // the classic silent eval-contamination path (a test doc's near-copy
    // in train inflates every benchmark). Here the split hashes the
    // near-dup CLUSTER representative instead (dedup_clusters' min-id
    // rep; singletons are their own rep), so by construction no Jaccard
    // edge can cross a split boundary: same cluster → same rep → same
    // md5 slot → same split. Scale: the rep table is bounded by docs
    // that appear in some near-dup pair (usually a small corpus
    // fraction), joined back on doc_id — one shuffle join, or broadcast
    // when AQE sees it small; everything upstream rides the capped
    // jaccardPairs inverted index. The oracle replays the full chain,
    // recursive-CTE closure included, then re-derives the same md5 slot.
    Q("t_leakage_split", (s, dir) => {
      import s.implicits._
      Dedup.leakageSafeSplit(t(s, dir, "documents"))
        .groupBy($"lang", $"split")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct($"rep").as("n_clusters"),
          sum($"n_chars").as("total_chars"),
          min($"doc_id").as("min_doc_id"))
        .orderBy($"lang", $"split")
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
      assigned AS (
        SELECT d.lang, d.n_chars, d.doc_id,
               COALESCE(r.rep_id, d.doc_id) AS rep,
               ('0x' || substr(md5(CAST(COALESCE(r.rep_id, d.doc_id) AS VARCHAR)), 1, 8))::BIGINT % 100 AS slot
        FROM documents d LEFT JOIN rep r USING (doc_id))
      SELECT lang,
             CASE WHEN slot < 80 THEN 'train'
                  WHEN slot < 90 THEN 'val' ELSE 'test' END AS split,
             COUNT(*) AS n_docs, COUNT(DISTINCT rep) AS n_clusters,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars,
             MIN(doc_id) AS min_doc_id
      FROM assigned GROUP BY 1, 2 ORDER BY lang, split
    """))
  )
}
