package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.graftshim.{KllMergeAgg, KllQuantile, KllSketchAgg, KllStreamLength, Shims, ThetaANotB, ThetaEstimate, ThetaIntersect, ThetaSketchAgg, ThetaUnionAgg}

/** Column API for the persistable KLL quantile sketches
  * (org.apache.spark.sql.graftshim.KllSketch — see its scaladoc for the
  * mergeability/rank-error contract). The quantile analog of Spark's own
  * hll_sketch_agg/hll_union_agg pair, which Spark 4.1 does not ship for
  * percentiles (`approx_percentile`'s state is not a storable column). */
object SketchFunctions {

  /** Build a KLL doubles sketch over a double column → BINARY. */
  def kllSketchAgg(c: Column, k: Int = 200): Column =
    Shims.column(KllSketchAgg(Shims.expression(c), k).toAggregateExpression())

  /** Merge pre-built sketch bytes (rollup / requery over a persisted
    * sketch table). `k` bounds the RESULT sketch; merging a higher-k
    * input into a lower-k buffer keeps the lower-k (coarser) guarantee,
    * so use the build-time k. */
  def kllMergeAgg(c: Column, k: Int = 200): Column =
    Shims.column(KllMergeAgg(Shims.expression(c), k).toAggregateExpression())

  /** Quantile at rank q from sketch bytes (INCLUSIVE criteria). */
  def kllQuantile(sketch: Column, q: Double): Column =
    Shims.column(KllQuantile(Shims.expression(sketch), Literal(q)))

  /** Stream length folded into the sketch. */
  def kllN(sketch: Column): Column =
    Shims.column(KllStreamLength(Shims.expression(sketch)))

  // --- theta: set sketches with intersection/difference algebra ---------
  // (graftshim.ThetaSketch scaladoc: the overlap/new-keys question HLL
  // cannot answer — exact below 4096 retained hashes, ~1.6%-RSE above.)

  /** Build a theta set sketch over a key column → BINARY. */
  def thetaSketchAgg(c: Column): Column =
    Shims.column(ThetaSketchAgg(Shims.expression(c)).toAggregateExpression())

  /** Union pre-built theta sketch bytes. */
  def thetaUnionAgg(c: Column): Column =
    Shims.column(ThetaUnionAgg(Shims.expression(c)).toAggregateExpression())

  /** Distinct-count estimate from sketch bytes. */
  def thetaEstimate(sketch: Column): Column =
    Shims.column(ThetaEstimate(Shims.expression(sketch)))

  /** Intersection sketch of two sketches. */
  def thetaIntersect(a: Column, b: Column): Column =
    Shims.column(ThetaIntersect(Shims.expression(a), Shims.expression(b)))

  /** Difference sketch A \ B. */
  def thetaANotB(a: Column, b: Column): Column =
    Shims.column(ThetaANotB(Shims.expression(a), Shims.expression(b)))
}
