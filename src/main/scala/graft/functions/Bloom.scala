package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter semi-join pruning — Spark's runtime-filter machinery
  * (`BloomFilterAggregate` / `BloomFilterMightContain`, the expressions
  * behind `spark.sql.optimizer.runtimeFilter.bloomFilter`) surfaced as an
  * explicit, caller-controlled operator.
  *
  * Scale rationale: a broadcast HASH join needs ~50+ bytes per build-side
  * entry; a Bloom filter at 1% false-positive needs ~1.2 BYTES per item.
  * When the build side outgrows `autoBroadcastJoinThreshold`, the bloom
  * still broadcasts — pruning the probe side BEFORE its shuffle, which at
  * 100 TB is the difference between shuffling the full corpus and
  * shuffling only candidate rows. The filter is a SUPERSET test (false
  * positives only, never false negatives), so following it with the exact
  * join preserves exact semantics — which is why q77 can share q73's
  * oracle verbatim.
  */
object Bloom {

  /** Aggregate a BIGINT (hash) column into a serialized Bloom filter.
    * Size the bits for the expected distinct count at the desired fpp
    * (~ -1.44 * n * log2(fpp) bits; 10 bits/item ≈ 1% fpp).
    */
  def bloomAgg(hashed: Column, expectedItems: Long, numBits: Long): Column =
    ColumnBridge.column(
      new BloomFilterAggregate(
        ColumnBridge.expression(hashed),
        Literal(expectedItems),
        Literal(numBits)).toAggregateExpression())

  /** Membership probe against a driver-collected serialized filter. The
    * filter rides to executors as a foldable literal inside the predicate
    * (the same shape Spark's injected runtime filters use via scalar
    * subquery). Collecting ONE binary scalar to the driver is the
    * intended usage — it is the build side's aggregate result, not data.
    */
  def mightContain(bloom: Array[Byte], hashed: Column): Column =
    ColumnBridge.column(
      BloomFilterMightContain(
        Literal(bloom, BinaryType),
        ColumnBridge.expression(hashed)))
}
