package graft.functions

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftshim.{FloatVectorDot, MinHashSignature, Shims, SimHashSignature, VectorArgmaxDotLong, VectorArgmaxE9Cosine, VectorLshSignature}

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

  /** Imperative registration (safe under any externally-created session —
    * the round driver builds its own SparkSession without extensions). */
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit =
    Shims.registerFunction(spark, fnId, fnInfo, fnBuilder)
}

/** SparkSessionExtensions hook: `spark.sql.extensions=graft.functions.GraftExtensions`
  * makes `vec_dot` available as a SQL function and installs the
  * edit-distance prefilter optimizer rule in any session. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((VectorFunctions.fnId, VectorFunctions.fnInfo,
      VectorFunctions.fnBuilder))
    ext.injectOptimizerRule(_ => graft.plans.LevenshteinPrefilter)
  }
}
