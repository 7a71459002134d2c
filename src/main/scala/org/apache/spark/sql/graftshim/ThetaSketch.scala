package org.apache.spark.sql.graftshim

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketches, Union}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Persistable SET sketches — Apache DataSketches Theta, carried as a
  * BINARY column. The capability HLL cannot offer is set ALGEBRA on the
  * sketches themselves: INTERSECTION and DIFFERENCE cardinalities, not
  * just union — "how much of today's crawl overlaps yesterday's corpus",
  * "how many keys are new this shard" — answered from KB-sized persisted
  * sketches with no join over raw keys, the corpus-overlap /
  * contamination-rate question a 100 TB pipeline asks daily.
  *
  * Exactness regime worth knowing: a theta sketch is EXACT below its
  * nominal-entries threshold (default 2^12 = 4096 retained hashes) and a
  * ~1.6%-RSE estimate above it, and set operations preserve that — the
  * ExtensionSpec lifecycle pins exact equality at small cardinality and
  * the oracled `g31_theta_overlap_bound` pins the bound contract at every
  * gated SF.
  */
case class ThetaSketchAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union]
  with UnaryLike[Expression] with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(LongType, IntegerType, DoubleType, StringType))
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_sketch_agg"

  override def createAggregationBuffer(): Union =
    SetOperation.builder().buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) v match {
      case l: Long => buf.update(l)
      case i: Int => buf.update(i.toLong)
      case d: Double => buf.update(d)
      case s: UTF8String => buf.update(s.toString)
      case other => buf.update(other.toString)
    }
    buf
  }

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult); buf
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray

  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().buildUnion()
    u.union(Memory.wrap(bytes)); u
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ThetaSketchAgg =
    copy(child = c)
}

/** Union pre-built theta sketch bytes (rollup/requery over a persisted
  * sketch table). Nulls skipped, mirroring hll_union_agg. */
case class ThetaUnionAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union]
  with UnaryLike[Expression] with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_union_agg"

  override def createAggregationBuffer(): Union =
    SetOperation.builder().buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.union(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult); buf
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray

  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().buildUnion()
    u.union(Memory.wrap(bytes)); u
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ThetaUnionAgg =
    copy(child = c)
}

/** Scalar readers / set algebra over sketch bytes — cold path by
  * construction (merged sketch rows, never the fact table), so
  * CodegenFallback costs nothing measurable. */
case class ThetaEstimate(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "theta_estimate"
  override def nullSafeEval(bytes: Any): Any =
    Sketches.heapifyCompactSketch(
      Memory.wrap(bytes.asInstanceOf[Array[Byte]])).getEstimate
  override protected def withNewChildInternal(c: Expression): ThetaEstimate =
    copy(child = c)
}

/** Intersection of two sketches → sketch bytes. */
case class ThetaIntersect(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "theta_intersect"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(Sketches.heapifyCompactSketch(Memory.wrap(a.asInstanceOf[Array[Byte]])))
    i.intersect(Sketches.heapifyCompactSketch(Memory.wrap(b.asInstanceOf[Array[Byte]])))
    i.getResult.toByteArray
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ThetaIntersect =
    copy(left = l, right = r)
}

/** Set difference A \ B of two sketches → sketch bytes. */
case class ThetaANotB(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "theta_a_not_b"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val op = SetOperation.builder().buildANotB()
    op.aNotB(
      Sketches.heapifyCompactSketch(Memory.wrap(a.asInstanceOf[Array[Byte]])),
      Sketches.heapifyCompactSketch(Memory.wrap(b.asInstanceOf[Array[Byte]])))
      .toByteArray
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ThetaANotB =
    copy(left = l, right = r)
}
