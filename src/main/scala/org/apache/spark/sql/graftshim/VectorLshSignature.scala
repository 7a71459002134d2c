package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, FloatType, IntegerType}

/** Deterministic ±1 random-hyperplane weights: the low bit of the first
  * byte of md5("p:d") — computable identically in any engine (DuckDB
  * replays it as ('0x'||substr(md5(p||':'||d),1,2))::INT & 1), which is
  * what keeps LSH bucketing oracle-checkable. Shared by the native
  * expression below and the engine-side plane definitions
  * (graft.ext.Similarity). */
object LshWeights {
  def planeWeights(planes: Int, dim: Int): Array[Array[Int]] =
    Array.tabulate(planes, dim) { (p, d) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val b = md.digest(s"$p:$d".getBytes("UTF-8"))
      if ((b(0) & 1) == 1) 1 else -1
    }
}

/** Native codegen expression for the random-hyperplane LSH signature —
  * the ANN index-build hot loop (one evaluation per vector per index
  * build/probe).
  *
  * Why a second custom Expression (same justification as FloatVectorDot):
  * the built-in form is `planes` separate `aggregate(zip_with(...))`
  * folds — HOFs are CodegenFallback, so each vector pays planes×dim
  * interpreted lambda dispatches. This expression computes ALL plane
  * projections in one whole-stage-codegen pass over the array: a tight
  * primitive loop, the weight matrix hoisted as a reference object.
  *
  * Semantics are IDENTICAL to the HOF form (and the DuckDB oracle):
  * per element, quantize floor(x·1e6 + 0.5) to long (integer addition is
  * fold-order-independent — the reason the sign is bit-stable across
  * engines), multiply by the ±1 weight, accumulate per plane; bit p of
  * the bucket is set iff projection p >= 0.
  *
  * Malformed vectors — length ≠ dim or any null element — evaluate to
  * bucket 0, matching the HOF baseline exactly: there zip_with pads the
  * shorter side with null, the fold null-propagates, and
  * `when(proj >= 0, bit).otherwise(0)` collapses every null projection
  * to an unset bit. (VectorExprSpec pins this equality on malformed
  * inputs too.) */
case class VectorLshSignature(child: Expression, planes: Int, dim: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))

  override def dataType: DataType = IntegerType

  override def prettyName: String = "vec_lsh_sig"

  @transient private lazy val weights: Array[Array[Int]] =
    LshWeights.planeWeights(planes, dim)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    var ok = arr.numElements() == dim
    var d = 0
    while (ok && d < dim) { ok = !arr.isNullAt(d); d += 1 }
    var bucket = 0
    if (ok) {
      var p = 0
      while (p < planes) {
        val w = weights(p)
        var acc = 0L
        var i = 0
        while (i < dim) {
          acc += math.floor(arr.getFloat(i).toDouble * 1000000.0 + 0.5).toLong * w(i)
          i += 1
        }
        if (acc >= 0) bucket |= (1 << p)
        p += 1
      }
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val wRef = ctx.addReferenceObj("lshWeights", weights, "int[][]")
      val ok = ctx.freshName("ok")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val w = ctx.freshName("w")
      val bucket = ctx.freshName("bucket")
      s"""
         |boolean $ok = $a.numElements() == $dim;
         |for (int $d = 0; $ok && $d < $dim; $d++) {
         |  $ok = !$a.isNullAt($d);
         |}
         |int $bucket = 0;
         |if ($ok) {
         |  for (int $p = 0; $p < $planes; $p++) {
         |    int[] $w = $wRef[$p];
         |    long $acc = 0L;
         |    for (int $d = 0; $d < $dim; $d++) {
         |      $acc += ((long) java.lang.Math.floor(((double) $a.getFloat($d)) * 1000000.0 + 0.5)) * $w[$d];
         |    }
         |    if ($acc >= 0L) $bucket |= (1 << $p);
         |  }
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VectorLshSignature =
    copy(child = newChild)
}
