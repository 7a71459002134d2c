package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types.{AbstractDataType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst predicate: does `child` (a long join key) possibly
  * belong to `bloom`?
  *
  * The 100 TB use case is PRE-SHUFFLE JOIN PRUNING: when the dim side of a
  * join is too large to broadcast but its key set still fits a few MB of
  * bloom bits, shipping the filter to every task and dropping non-matching
  * fact rows BEFORE the exchange turns a 100 TB shuffle into a
  * selectivity-sized one. False positives only cost a wasted shuffled row
  * (the join itself stays exact); false negatives are impossible, so the
  * pruned plan is result-identical to the unpruned one — which is what
  * makes the composed query oracle-able.
  *
  * Why a custom Expression (build-brief preference (b)): Spark's own
  * runtime `BloomFilterMightContain` is injected opaquely by the optimizer
  * behind size thresholds and cannot be applied by API to a caller-built
  * filter. This expression is the explicit form: the filter is built once
  * with the distributed `DataFrameStatFunctions.bloomFilter` aggregate
  * (driver holds only the compressed bits, never the keys) and embedded in
  * the plan as a codegen reference object — the generated Java is a single
  * `mightContainLong` probe per row, inside whole-stage codegen.
  */
case class BloomMightContainLong(child: Expression, bloom: BloomFilter)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)

  override def dataType: DataType = BooleanType

  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // one deserialized filter per plan, shared by every generated row probe
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
    copy(child = newChild)
}
