package graft.functions

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftshim.{FloatVectorDot, MinHashSignature, PqAdcSum, PqNearestCodes, Shims, SimHashSignature, VectorArgmaxDotLong, VectorArgmaxE9Cosine, VectorArgmaxTwoLevelDot, VectorLshSignature}

/** Public surface for the native vector expressions (implementations:
  * org.apache.spark.sql.graftshim.FloatVectorDot / VectorLshSignature —
  * see their scaladocs for why they are custom codegen Expressions
  * rather than HOF folds). */
object VectorFunctions {
  /** Column API for the native dot product. */
  def vecDot(a: Column, b: Column): Column =
    Shims.column(FloatVectorDot(Shims.expression(a), Shims.expression(b)))

  /** Column API for the native packed LSH signature. */
  def vecLshSig(a: Column, planes: Int, dim: Int): Column =
    Shims.column(VectorLshSignature(Shims.expression(a), planes, dim))

  /** Column API for the native one-pass MinHash signature (tokens →
    * array of numHashes permutation minima; null for < k tokens). */
  def minhashSig(tokens: Column, k: Int, numHashes: Int): Column =
    Shims.column(MinHashSignature(Shims.expression(tokens), k, numHashes))

  /** Column API for the native one-pass SimHash signature (tokens →
    * array of chunk values; null for < k tokens). */
  def simhashSig(tokens: Column, k: Int, chunks: Int, bitsPerChunk: Int): Column =
    Shims.column(SimHashSignature(Shims.expression(tokens), k, chunks, bitsPerChunk))

  /** Column API for the native e9-cosine centroid argmax (IVF assignment;
    * cents = array of (centroid_id, centroid, cnorm) structs). */
  def vecArgmaxCosE9(vec: Column, cents: Column): Column =
    Shims.column(VectorArgmaxE9Cosine(Shims.expression(vec), Shims.expression(cents)))

  /** Column API for the native integer-dot centroid argmax (k-means
    * training assignment; cents = array of (centroid_id, ce6) structs). */
  def vecArgmaxDotI64(vec: Column, cents: Column): Column =
    Shims.column(VectorArgmaxDotLong(Shims.expression(vec), Shims.expression(cents)))

  /** Column API for the native two-level coarse-pruned integer-dot
    * argmax (large-nlist assignment; groups = packed array of
    * (gid, gce6, members:[(id, ce6)]) structs, probe = groups kept). */
  def vecArgmaxTwoLevelI64(vec: Column, groups: Column, probe: Int): Column =
    Shims.column(VectorArgmaxTwoLevelDot(Shims.expression(vec),
      Shims.expression(groups), probe))

  /** Column API for the native per-subspace PQ code assignment (encode +
    * training; cbs = packed array of (m, code, ce6) structs). */
  def pqCodes(vec: Column, cbs: Column, m: Int): Column =
    Shims.column(PqNearestCodes(Shims.expression(vec), Shims.expression(cbs), m))

  /** Column API for the native ADC score (dt = dense m·ksub distance
    * table indexed mi·ksub + code). */
  def pqAdcSum(codes: Column, dt: Column, ksub: Int): Column =
    Shims.column(PqAdcSum(Shims.expression(codes), Shims.expression(dt), ksub))

  val fnId: FunctionIdentifier = FunctionIdentifier("vec_dot")

  val fnInfo: ExpressionInfo = new ExpressionInfo(
    classOf[FloatVectorDot].getCanonicalName, null, "vec_dot",
    "_FUNC_(a, b) - dot product of two float vectors, accumulated in double in element order.",
    "", "", "", "", "", "", "")

  val fnBuilder: Seq[Expression] => Expression = {
    case Seq(a, b) => FloatVectorDot(a, b)
    case other => throw new IllegalArgumentException(
      s"vec_dot expects 2 arguments, got ${other.size}")
  }

  /** Tuning arguments of the signature functions arrive from SQL as
    * literals; anything non-foldable is a usage error, rejected here at
    * plan time rather than at codegen. */
  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int,
        org.apache.spark.sql.types.IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  private def info(name: String, cls: Class[_], usage: String): ExpressionInfo =
    new ExpressionInfo(cls.getCanonicalName, null, name, usage,
      "", "", "", "", "", "", "")

  /** The whole registerable native-function family (the Bloom probe is
    * excluded: its bound filter object has no SQL literal form). */
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (fnId, fnInfo, fnBuilder),
    (FunctionIdentifier("minhash_sig"),
      info("minhash_sig", classOf[MinHashSignature],
        "_FUNC_(tokens, k, numHashes) - one-pass MinHash signature over k-shingles; null for < k tokens."),
      {
        case Seq(t, k, n) =>
          MinHashSignature(t, intLit(k, "minhash_sig", "k"),
            intLit(n, "minhash_sig", "numHashes"))
        case other => throw new IllegalArgumentException(
          s"minhash_sig expects 3 arguments, got ${other.size}")
      }),
    (FunctionIdentifier("simhash_sig"),
      info("simhash_sig", classOf[SimHashSignature],
        "_FUNC_(tokens, k, chunks, bitsPerChunk) - one-pass SimHash chunk signature over k-shingles."),
      {
        case Seq(t, k, c, b) =>
          SimHashSignature(t, intLit(k, "simhash_sig", "k"),
            intLit(c, "simhash_sig", "chunks"),
            intLit(b, "simhash_sig", "bitsPerChunk"))
        case other => throw new IllegalArgumentException(
          s"simhash_sig expects 4 arguments, got ${other.size}")
      }),
    (FunctionIdentifier("vec_lsh_sig"),
      info("vec_lsh_sig", classOf[VectorLshSignature],
        "_FUNC_(vec, planes, dim) - packed random-hyperplane LSH signature of a float vector."),
      {
        case Seq(v, p, d) =>
          VectorLshSignature(v, intLit(p, "vec_lsh_sig", "planes"),
            intLit(d, "vec_lsh_sig", "dim"))
        case other => throw new IllegalArgumentException(
          s"vec_lsh_sig expects 3 arguments, got ${other.size}")
      }),
    (FunctionIdentifier("vec_argmax_cos_e9"),
      info("vec_argmax_cos_e9", classOf[VectorArgmaxE9Cosine],
        "_FUNC_(vec, cents) - id of the max-e9-cosine centroid in an array of (centroid_id, centroid, cnorm) structs."),
      {
        case Seq(v, c) => VectorArgmaxE9Cosine(v, c)
        case other => throw new IllegalArgumentException(
          s"vec_argmax_cos_e9 expects 2 arguments, got ${other.size}")
      }),
    (FunctionIdentifier("vec_argmax_dot_i64"),
      info("vec_argmax_dot_i64", classOf[VectorArgmaxDotLong],
        "_FUNC_(vec, cents) - id of the max-integer-dot centroid in an array of (centroid_id, ce6) structs."),
      {
        case Seq(v, c) => VectorArgmaxDotLong(v, c)
        case other => throw new IllegalArgumentException(
          s"vec_argmax_dot_i64 expects 2 arguments, got ${other.size}")
      }),
    (FunctionIdentifier("pq_nearest_codes"),
      info("pq_nearest_codes", classOf[PqNearestCodes],
        "_FUNC_(vec, cbs, m) - per-subspace nearest PQ codes of an e6 vector against a packed (m, code, ce6) codebook."),
      {
        case Seq(v, c, m) =>
          PqNearestCodes(v, c, intLit(m, "pq_nearest_codes", "m"))
        case other => throw new IllegalArgumentException(
          s"pq_nearest_codes expects 3 arguments, got ${other.size}")
      }),
    (FunctionIdentifier("pq_adc_sum"),
      info("pq_adc_sum", classOf[PqAdcSum],
        "_FUNC_(codes, dt, ksub) - ADC distance: sum of dt[mi*ksub + codes[mi]] over subspaces."),
      {
        case Seq(c, d, k) =>
          PqAdcSum(c, d, intLit(k, "pq_adc_sum", "ksub"))
        case other => throw new IllegalArgumentException(
          s"pq_adc_sum expects 3 arguments, got ${other.size}")
      }))

  /** Imperative registration (safe under any externally-created session —
    * the round driver builds its own SparkSession without extensions). */
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit =
    all.foreach { case (id, inf, b) => Shims.registerFunction(spark, id, inf, b) }
}

/** SparkSessionExtensions hook: `spark.sql.extensions=graft.functions.GraftExtensions`
  * makes the full native-function family (`vec_dot`, `minhash_sig`,
  * `simhash_sig`, `vec_lsh_sig`, `vec_argmax_cos_e9`,
  * `vec_argmax_dot_i64`, `pq_nearest_codes`, `pq_adc_sum`) available as
  * SQL functions and installs the edit-distance prefilter optimizer rule
  * in any session. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    VectorFunctions.all.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.LevenshteinPrefilter)
  }
}
