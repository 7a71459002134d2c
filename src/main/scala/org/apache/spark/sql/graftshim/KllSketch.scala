package org.apache.spark.sql.graftshim

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Persistable QUANTILE sketches — the rank/percentile analog of the HLL
  * tier (g27/g28): Apache DataSketches KLL, carried as a BINARY column a
  * caller writes per shard/day and re-merges later without touching raw
  * data. Spark 4.1 ships HLL functions but no storable quantile sketch
  * (`approx_percentile`'s buffer is not a column); these three close that
  * gap using the datasketches-java library Spark itself bundles.
  *
  * Mergeability is the KLL guarantee that matters at 100 TB: sketches of
  * disjoint shards merge into a sketch of the union whose normalized rank
  * error keeps the k-derived bound (~1.33% two-sided at the default
  * k = 200) — unlike HLL the merged bytes need not equal a direct build
  * (compactors sample), so the pinned contract is the RANK BOUND, not
  * byte equality (ExtensionSpec; oracled end-to-end by
  * `g29_kll_quantile_bound`'s g17b-style exact-rank interval check).
  *
  * All three run on the aggregate path (no per-row codegen to fall out
  * of); the scalar reader is CodegenFallback by design — it reads a
  * handful of merged sketch rows, never the fact table.
  */
case class KllSketchAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_sketch_agg"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other); buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(o: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllSketchAgg =
    copy(child = c)
}

/** Merge pre-built KLL sketch bytes (the rollup/requery half: input is the
  * persisted BINARY column, not raw values). Null inputs are skipped —
  * an empty-relation shard contributes nothing, mirroring hll_union_agg. */
case class KllMergeAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_merge_agg"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other); buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllMergeAgg =
    copy(child = c)
}

/** Scalar reader: quantile at rank `q` from sketch bytes (INCLUSIVE search,
  * DataSketches' default). Cold path by construction — it evaluates on
  * merged sketch rows (one per group), never on the fact table, so
  * CodegenFallback costs nothing measurable. NULL sketch or empty sketch
  * (zero updates) → NULL. */
case class KllQuantile(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, DoubleType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "kll_quantile"

  override def nullSafeEval(bytes: Any, q: Any): Any = {
    val sk = KllDoublesSketch.heapify(Memory.wrap(bytes.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) null
    else sk.getQuantile(q.asInstanceOf[Double],
      org.apache.datasketches.quantilescommon.QuantileSearchCriteria.INCLUSIVE)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): KllQuantile =
    copy(left = l, right = r)
}

/** Scalar reader: the sketch's stream length (n updates folded in) —
  * the sanity column a persisted sketch table carries next to its bytes. */
case class KllStreamLength(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "kll_n"

  override def nullSafeEval(bytes: Any): Any =
    KllDoublesSketch.heapify(Memory.wrap(bytes.asInstanceOf[Array[Byte]])).getN

  override protected def withNewChildInternal(c: Expression): KllStreamLength =
    copy(child = c)
}
