package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StructType}

/** Native codegen expressions for the product-quantization hot loops —
  * the 100 TB embedding-compression tier (`graft.ext.Similarity`
  * pqEncode / pqAdcCandidates / pqCodebooks).
  *
  * Why custom Expressions (same justification as VectorArgmaxCentroid,
  * preference order (b)): the map-only PQ forms are nested higher-order
  * functions — encode is `transform(sequence(0,m-1), mi ->
  * argmin-over-filter(cbs))` (m × ksub × ds interpreted lambda
  * dispatches plus m·ksub struct allocations per vector), the ADC score
  * is `aggregate(transform(...), map lookup)` (m dispatches + m hash
  * probes per vector per query). HOFs are CodegenFallback, so at ×64
  * sf0.1 the measured cost was 195 s to encode 128k vectors and 5.9 s
  * per ADC scan — LOSING to brute force over uncompressed floats
  * (PERF.md §ANN). These expressions keep the identical map-only plan
  * shape and run the loops as compiled code.
  *
  * Semantics are IDENTICAL to the HOF forms on well-formed input
  * (ExtensionSpec pins row-for-row equality, and the sim_ann_pq /
  * sim_ann_ivfpq oracle hashes pin the whole train+encode+scan chain
  * against the DuckDB replay): exact integer arithmetic, argmin ties to
  * the LOWER code. Degenerate inputs (null elements, empty codebook,
  * out-of-range code) yield NULL.
  *
  * Lives in an org.apache.spark.sql subpackage because Expression SPI
  * types are private[sql].
  */

/** Per-subspace nearest-code assignment for a whole vector: `vec` is the
  * e6-quantized (normalized) Array[Long] of `m · ds` elements, `cbs` the
  * packed one-row broadcast codebook array of structs
  * (m: Int, code: Int, ce6: Array[Long]). Returns the Array[Int] of `m`
  * codes — for each subspace mi, the code of the codebook entry with the
  * minimum exact-integer squared L2 against slice mi, ties to the lower
  * code. One pass over the packed codebook per vector; a subspace with
  * no surviving codebook entries (possible when Lloyd training drops an
  * empty code) yields NULL for the whole vector — loud, since encode
  * against such a codebook is undefined. */
case class PqNearestCodes(left: Expression, right: Expression, m: Int)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_nearest_codes"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(st: StructType, _))
          if st.length == 3 && st(0).dataType == IntegerType &&
            st(1).dataType == IntegerType &&
            (st(2).dataType match {
              case ArrayType(LongType, _) => true; case _ => false
            }) =>
        if (m <= 0)
          TypeCheckResult.TypeCheckFailure(s"$prettyName: m must be positive, got $m")
        else TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (array<bigint>, array<struct<m:int,code:int," +
            s"ce6:array<bigint>>>), got " +
            s"(${l.simpleString(10)}, ${r.simpleString(10)})")
    }

  /** Compiled per-row kernel (referenced from codegen — one virtual call
    * per row, all loops compiled; the MinHashSignature pattern). */
  def codesFor(a: Any, b: Any): ArrayData = {
    val vec = a.asInstanceOf[ArrayData]
    val cbs = b.asInstanceOf[ArrayData]
    val dim = vec.numElements()
    if (dim % m != 0) return null
    val ds = dim / m
    var i = 0
    while (i < dim) { if (vec.isNullAt(i)) return null; i += 1 }
    val v = vec.toLongArray()
    val bestD = new Array[Long](m)
    val bestC = new Array[Int](m)
    val found = new Array[Boolean](m)
    val n = cbs.numElements()
    var j = 0
    while (j < n) {
      if (!cbs.isNullAt(j)) {
        val c = cbs.getStruct(j, 3)
        if (!c.isNullAt(0) && !c.isNullAt(1) && !c.isNullAt(2)) {
          val mi = c.getInt(0)
          if (mi >= 0 && mi < m) {
            val ce = c.getArray(2)
            if (ce.numElements() == ds) {
              var ok = true
              var k = 0
              while (ok && k < ds) { ok = !ce.isNullAt(k); k += 1 }
              if (ok) {
                var d = 0L
                val off = mi * ds
                k = 0
                while (k < ds) {
                  val diff = v(off + k) - ce.getLong(k)
                  d += diff * diff
                  k += 1
                }
                val code = c.getInt(1)
                if (!found(mi) || d < bestD(mi) ||
                    (d == bestD(mi) && code < bestC(mi))) {
                  found(mi) = true; bestD(mi) = d; bestC(mi) = code
                }
              }
            }
          }
        }
      }
      j += 1
    }
    var mi = 0
    while (mi < m) { if (!found(mi)) return null; mi += 1 }
    new GenericArrayData(bestC)
  }

  override def nullSafeEval(a: Any, b: Any): Any = codesFor(a, b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqCodesExpr", this, classOf[PqNearestCodes].getName)
    val res = ctx.freshName("codes")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $res = $self.codesFor($a, $b);
         |if ($res == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $res;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqNearestCodes =
    copy(left = newLeft, right = newRight)
}

/** ADC (asymmetric distance) score of one encoded vector: `codes` is the
  * Array[Int] of per-subspace codes, `dt` the DENSE one-row broadcast
  * distance table of `m · ksub` longs laid out as index = mi·ksub + code
  * (holes for training-dropped codes are never referenced — encode only
  * assigns surviving codes). Returns the exact BIGINT sum of the per-
  * subspace table entries — the engine-exact ranking key of the PQ scan.
  * Tight inline codegen: m array reads + m adds per row, no lambda
  * dispatch, no hash probe. Null codes element or an out-of-range code
  * yields NULL — the range check is PER SUBSPACE (0 <= code < ksub), not
  * just the flat table index: a corrupt persisted code >= ksub must not
  * silently read a neighboring subspace's distance entry. */
case class PqAdcSum(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc_sum"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(LongType, _)) =>
        if (ksub <= 0)
          TypeCheckResult.TypeCheckFailure(s"$prettyName: ksub must be positive, got $ksub")
        else TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (array<int>, array<bigint>), got " +
            s"(${l.simpleString(10)}, ${r.simpleString(10)})")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val dt = b.asInstanceOf[ArrayData]
    val mM = codes.numElements()
    val n = dt.numElements()
    var sum = 0L
    var mi = 0
    while (mi < mM) {
      if (codes.isNullAt(mi)) return null
      val code = codes.getInt(mi)
      if (code < 0 || code >= ksub) return null
      val idx = mi * ksub + code
      if (idx >= n || dt.isNullAt(idx)) return null
      sum += dt.getLong(idx)
      mi += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val mM = ctx.freshName("mM"); val n = ctx.freshName("n")
      val sum = ctx.freshName("sum"); val mi = ctx.freshName("mi")
      val idx = ctx.freshName("idx"); val bad = ctx.freshName("bad")
      val code = ctx.freshName("code")
      s"""
         |int $mM = $a.numElements();
         |int $n = $b.numElements();
         |long $sum = 0L;
         |boolean $bad = false;
         |for (int $mi = 0; !$bad && $mi < $mM; $mi++) {
         |  if ($a.isNullAt($mi)) { $bad = true; break; }
         |  int $code = $a.getInt($mi);
         |  if ($code < 0 || $code >= $ksub) { $bad = true; break; }
         |  int $idx = $mi * $ksub + $code;
         |  if ($idx >= $n || $b.isNullAt($idx)) { $bad = true; break; }
         |  $sum += $b.getLong($idx);
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $sum; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcSum =
    copy(left = newLeft, right = newRight)
}
