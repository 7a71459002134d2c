package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructType}

/** Two-level (coarse-pruned) integer-dot centroid argmax — the
  * assignment-cost answer for LARGE list counts.
  *
  * Flat assignment (`VectorArgmaxDotLong`) is O(nlist·dim) multiplies
  * per vector: exact, codegen, map-only — but at 100M vectors × 10k
  * lists × 64 dims that is ~6.4×10¹³ multiplies per epoch build, and
  * the term grows with BOTH corpus and index size (measured curve:
  * PERF.md §assignment-budget). The standard FAISS-style fix is a
  * two-level coarse quantizer: group the nlist centroids into g ≈ √nlist
  * GROUPS (a second k-means over the centroid table), score the g group
  * centroids exactly, keep the top `probe` groups, and run the exact
  * argmax only over those groups' members. Per-vector cost drops from
  * nlist·dim to (g + probe·nlist/g)·dim — ~nlist/(2·√nlist·probe)×
  * fewer multiplies at probe ≪ √nlist — while staying one tight
  * compiled loop in whole-stage codegen (same rationale as the flat
  * expression: a HOF top-c would pay interpreted dispatch per group).
  *
  * Semantics: group ranking is exact integer dot with ties to the lower
  * group id; the final argmax is exact integer dot with ties to the
  * lower centroid id — so with `probe >= g` the result is IDENTICAL to
  * the flat argmax (spec-pinned), and with probe < g it is the standard
  * two-level approximation: the true nearest list is missed only when
  * its group centroid ranks below the top `probe` (agreement measured
  * in the spec and §assignment-budget). Input shape: `vec` is the
  * e6-quantized array<bigint>; `groups` is the packed one-row broadcast
  * array of (gid, gce6, members:[(id, ce6)]). NULL on a vec with null
  * elements or when every group/member is malformed, like the flat
  * forms.
  */
case class VectorArgmaxTwoLevelDot(left: Expression, right: Expression,
                                   probe: Int)
    extends BinaryExpression {

  require(probe >= 1, s"probe groups must be >= 1, got $probe")
  // the codegen allocates fixed top-`probe` arrays per evaluation; a
  // huge probe belongs on the flat path instead
  require(probe <= 4096, s"probe groups $probe out of range (use flat assignment)")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_argmax_two_level_i64"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(gt: StructType, _))
          if gt.length == 3 && gt(0).dataType == LongType &&
            (gt(1).dataType match {
              case ArrayType(LongType, _) => true; case _ => false
            }) &&
            (gt(2).dataType match {
              case ArrayType(mt: StructType, _)
                  if mt.length == 2 && mt(0).dataType == LongType =>
                mt(1).dataType match {
                  case ArrayType(LongType, _) => true; case _ => false
                }
              case _ => false
            }) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (array<bigint>, array<struct<gid:bigint," +
            "gce6:array<bigint>,members:array<struct<id:bigint," +
            s"ce6:array<bigint>>>>>), got " +
            s"(${l.simpleString(10)}, ${r.simpleString(10)})")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val vec = a.asInstanceOf[ArrayData]
    val groups = b.asInstanceOf[ArrayData]
    val dim = vec.numElements()
    var ok = true
    var i = 0
    while (ok && i < dim) { ok = !vec.isNullAt(i); i += 1 }
    if (!ok) return null
    val g = groups.numElements()
    val c = math.min(probe, g)
    // top-c groups by (dot desc, gid asc): fixed-size insertion sort
    val selDot = new Array[Long](c)
    val selGid = new Array[Long](c)
    val selIdx = new Array[Int](c)
    var selN = 0
    var j = 0
    while (j < g) {
      if (!groups.isNullAt(j)) {
        val grp = groups.getStruct(j, 3)
        if (!grp.isNullAt(0) && !grp.isNullAt(1) && !grp.isNullAt(2)) {
          val gce = grp.getArray(1)
          var gok = gce.numElements() == dim
          var k = 0
          while (gok && k < dim) { gok = !gce.isNullAt(k); k += 1 }
          if (gok) {
            var dot = 0L
            k = 0
            while (k < dim) { dot += vec.getLong(k) * gce.getLong(k); k += 1 }
            val gid = grp.getLong(0)
            var pos = selN
            while (pos > 0 && (dot > selDot(pos - 1) ||
              (dot == selDot(pos - 1) && gid < selGid(pos - 1)))) pos -= 1
            if (pos < c) {
              val last = math.min(selN, c - 1)
              var t = last
              while (t > pos) {
                selDot(t) = selDot(t - 1); selGid(t) = selGid(t - 1)
                selIdx(t) = selIdx(t - 1); t -= 1
              }
              selDot(pos) = dot; selGid(pos) = gid; selIdx(pos) = j
              if (selN < c) selN += 1
            }
          }
        }
      }
      j += 1
    }
    // exact argmax over the selected groups' members
    var found = false
    var bestDot = 0L
    var bestId = 0L
    var s = 0
    while (s < selN) {
      val grp = groups.getStruct(selIdx(s), 3)
      val members = grp.getArray(2)
      val nm = members.numElements()
      var mi = 0
      while (mi < nm) {
        if (!members.isNullAt(mi)) {
          val mem = members.getStruct(mi, 2)
          if (!mem.isNullAt(0) && !mem.isNullAt(1)) {
            val ce = mem.getArray(1)
            var cok = ce.numElements() == dim
            var k = 0
            while (cok && k < dim) { cok = !ce.isNullAt(k); k += 1 }
            if (cok) {
              var dot = 0L
              k = 0
              while (k < dim) { dot += vec.getLong(k) * ce.getLong(k); k += 1 }
              val id = mem.getLong(0)
              if (!found || dot > bestDot || (dot == bestDot && id < bestId)) {
                found = true; bestDot = dot; bestId = id
              }
            }
          }
        }
        mi += 1
      }
      s += 1
    }
    if (found) bestId else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dim = ctx.freshName("dim"); val i = ctx.freshName("i")
      val ok = ctx.freshName("ok"); val g = ctx.freshName("g")
      val c = ctx.freshName("c")
      val selDot = ctx.freshName("selDot"); val selGid = ctx.freshName("selGid")
      val selIdx = ctx.freshName("selIdx"); val selN = ctx.freshName("selN")
      val j = ctx.freshName("j"); val grp = ctx.freshName("grp")
      val gce = ctx.freshName("gce"); val gok = ctx.freshName("gok")
      val k = ctx.freshName("k"); val dot = ctx.freshName("dot")
      val gid = ctx.freshName("gid"); val pos = ctx.freshName("pos")
      val last = ctx.freshName("last"); val t = ctx.freshName("t")
      val found = ctx.freshName("found"); val bestDot = ctx.freshName("bestDot")
      val bestId = ctx.freshName("bestId"); val s = ctx.freshName("s")
      val members = ctx.freshName("members"); val nm = ctx.freshName("nm")
      val mi = ctx.freshName("mi"); val mem = ctx.freshName("mem")
      val ce = ctx.freshName("ce"); val cok = ctx.freshName("cok")
      val id = ctx.freshName("id")
      s"""
         |int $dim = $a.numElements();
         |boolean $ok = true;
         |for (int $i = 0; $ok && $i < $dim; $i++) { $ok = !$a.isNullAt($i); }
         |boolean $found = false;
         |long $bestDot = 0L; long $bestId = 0L;
         |if ($ok) {
         |  int $g = $b.numElements();
         |  int $c = java.lang.Math.min($probe, $g);
         |  long[] $selDot = new long[$c];
         |  long[] $selGid = new long[$c];
         |  int[] $selIdx = new int[$c];
         |  int $selN = 0;
         |  for (int $j = 0; $j < $g; $j++) {
         |    if ($b.isNullAt($j)) continue;
         |    org.apache.spark.sql.catalyst.InternalRow $grp = $b.getStruct($j, 3);
         |    if ($grp.isNullAt(0) || $grp.isNullAt(1) || $grp.isNullAt(2)) continue;
         |    org.apache.spark.sql.catalyst.util.ArrayData $gce = $grp.getArray(1);
         |    boolean $gok = $gce.numElements() == $dim;
         |    for (int $k = 0; $gok && $k < $dim; $k++) { $gok = !$gce.isNullAt($k); }
         |    if (!$gok) continue;
         |    long $dot = 0L;
         |    for (int $k = 0; $k < $dim; $k++) {
         |      $dot += $a.getLong($k) * $gce.getLong($k);
         |    }
         |    long $gid = $grp.getLong(0);
         |    int $pos = $selN;
         |    while ($pos > 0 && ($dot > $selDot[$pos - 1] ||
         |        ($dot == $selDot[$pos - 1] && $gid < $selGid[$pos - 1]))) { $pos--; }
         |    if ($pos < $c) {
         |      int $last = java.lang.Math.min($selN, $c - 1);
         |      for (int $t = $last; $t > $pos; $t--) {
         |        $selDot[$t] = $selDot[$t - 1];
         |        $selGid[$t] = $selGid[$t - 1];
         |        $selIdx[$t] = $selIdx[$t - 1];
         |      }
         |      $selDot[$pos] = $dot; $selGid[$pos] = $gid; $selIdx[$pos] = $j;
         |      if ($selN < $c) $selN++;
         |    }
         |  }
         |  for (int $s = 0; $s < $selN; $s++) {
         |    org.apache.spark.sql.catalyst.InternalRow $grp =
         |      $b.getStruct($selIdx[$s], 3);
         |    org.apache.spark.sql.catalyst.util.ArrayData $members = $grp.getArray(2);
         |    int $nm = $members.numElements();
         |    for (int $mi = 0; $mi < $nm; $mi++) {
         |      if ($members.isNullAt($mi)) continue;
         |      org.apache.spark.sql.catalyst.InternalRow $mem = $members.getStruct($mi, 2);
         |      if ($mem.isNullAt(0) || $mem.isNullAt(1)) continue;
         |      org.apache.spark.sql.catalyst.util.ArrayData $ce = $mem.getArray(1);
         |      boolean $cok = $ce.numElements() == $dim;
         |      for (int $k = 0; $cok && $k < $dim; $k++) { $cok = !$ce.isNullAt($k); }
         |      if (!$cok) continue;
         |      long $dot = 0L;
         |      for (int $k = 0; $k < $dim; $k++) {
         |        $dot += $a.getLong($k) * $ce.getLong($k);
         |      }
         |      long $id = $mem.getLong(0);
         |      if (!$found || $dot > $bestDot || ($dot == $bestDot && $id < $bestId)) {
         |        $found = true; $bestDot = $dot; $bestId = $id;
         |      }
         |    }
         |  }
         |}
         |if ($found) { ${ev.value} = $bestId; } else { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorArgmaxTwoLevelDot =
    copy(left = newLeft, right = newRight)
}
