package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.graftshim.{BloomMightContainLong, Shims}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter join pruning (extension; no reference counterpart — the
  * reference joins via driver-side HashMaps, ETLMain.java:329-339, which is
  * the zero-false-positive degenerate case of this at toy scale).
  *
  * The scale gap this fills: `broadcast(dim)` stops working when the dim is
  * GBs (a 10^8-row customer dim at 100 TB), and the fallback shuffle join
  * then shuffles the ENTIRE fact — even when the dim side is selective and
  * only a few % of fact rows will survive. A bloom filter over the dim keys
  * is a fixed-few-MB object regardless of dim row width, cheap enough to
  * ship to every task, and prunes the fact BEFORE its exchange; the exact
  * join afterwards absorbs the false positives. Survivor volume ≈
  * selectivity × fact + fpp × fact, so the shuffle shrinks by ~the join
  * selectivity — the same effect Spark's runtime
  * `BloomFilterMightContain` injection targets, exposed here as an explicit
  * API usable on any caller-built key set and pinned by plan assertions
  * (BloomJoinSpec) instead of optimizer thresholds.
  */
object BloomPrune {

  /** Distributed bloom build over `dim`'s long key column: a treeAggregate
    * under the hood; the driver receives only the bit array (sized from
    * `expected` items at `fpp`), never the keys. */
  def bloomOf(dim: DataFrame, key: String, expected: Long, fpp: Double = 0.01): BloomFilter =
    dim.stat.bloomFilter(key, math.max(expected, 1L), fpp)

  /** `bloomOf` with an exact count pass for sizing — fine when the dim is
    * the (already much smaller) filtered side; at scale a cardinality
    * estimate or a fixed upper bound avoids the extra pass. */
  def bloomOf(dim: DataFrame, key: String): BloomFilter =
    bloomOf(dim, key, dim.count(), 0.01)

  /** Map-side prune: keep only fact rows whose key might be in `bloom`.
    * Null keys are dropped (they cannot match an equi-join anyway). */
  def prune(fact: DataFrame, key: Column, bloom: BloomFilter): DataFrame =
    fact.filter(Shims.column(BloomMightContainLong(Shims.expression(key), bloom)))
}
