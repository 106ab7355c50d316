package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Window-function operators from the reference plus the scale-safe variants
  * the reference lacks.
  */
object Windows {

  /** W1+F11: deterministic duplicate-key renaming — number duplicate rows
    * within a key by a total order and suffix the non-first ones
    * (ref: transform.py:253-261 renames dup Sale_IDs to `ID_2`, `ID_3`...).
    * Shuffles once on `keys`; at scale that is a single hash exchange.
    */
  def suffixDuplicates(df: DataFrame, keys: Seq[String], order: Seq[Column],
                       idCol: String, outCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .withColumn(outCol,
        when(col("__rn") > 1, concat_ws("_", col(idCol), col("__rn")))
          .otherwise(col(idCol).cast("string")))
      .drop("__rn")
  }

  /** W2: dense surrogate keys 1..N by a global order — the reference's exact
    * construction (ref: transform.py:341-342). A global window collapses to
    * ONE partition; fine for dimension tables (what the reference uses it
    * for), a hazard for facts. Use [[denseIdsScalable]] for big inputs.
    */
  def denseIdsGlobal(df: DataFrame, order: Seq[Column], outCol: String): DataFrame =
    df.withColumn(outCol, row_number().over(Window.orderBy(order: _*)).cast(LongType))

  /** Scale-safe dense surrogate keys 1..N: range-partition by the order
    * columns, sort within partitions, then assign ids as
    * (per-partition exclusive offset + local index). No single-partition
    * bottleneck — the 100 TB version of W2. Deterministic when `order`
    * is a total order (include a unique tie-break key).
    *
    * Pure DataFrame form, ONE corpus exchange (round 7): the earlier
    * `rdd.zipWithIndex` variant left Catalyst and paid an
    * InternalRow↔Row round trip; the first Dataset rewrite used a
    * per-bucket window for the local rank, but Catalyst cannot know
    * spark_partition_id rows are already co-located, so WindowExec
    * inserted a SECOND corpus-wide hash exchange + sort (seen in the
    * formatted plan). Here the local index comes from
    * `monotonically_increasing_id` — (partitionId << 33 | rowIndex),
    * assigned map-side in the post-sort iteration order, so
    * `mid & (2^33-1)` IS the within-bucket rank with zero extra
    * exchanges. Bucket counts fold to a #partitions-row frame whose
    * exclusive prefix is a trivially-small window, broadcast back. The
    * id expression is order-sensitive but the upstream sort fixes the
    * order, and range-boundary sampling is seeded deterministically, so
    * ids are reproducible (oracle-checked by q41 at both scales).
    */
  def denseIdsScalable(df: DataFrame, order: Seq[Column], outCol: String): DataFrame = {
    val bucketed = df.repartitionByRange(order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__bkt", spark_partition_id())
      .withColumn("__mid", monotonically_increasing_id())
    val offsets = bucketed.groupBy(col("__bkt"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__off",
        coalesce(sum(col("__cnt")).over(Window.orderBy(col("__bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__bkt"), col("__off"))
    bucketed.join(broadcast(offsets), "__bkt")
      .withColumn(outCol,
        (col("__off") + col("__mid").bitwiseAND(lit((1L << 33) - 1)) + 1L).cast(LongType))
      .drop("__bkt", "__mid", "__off")
  }

  /** Scale-safe GLOBAL running sum (inclusive prefix sum) of `value` over
    * the total order `order` — the 100 TB form of
    * `sum(value) OVER (ORDER BY order)`, whose direct window collapses to a
    * single partition. Classic two-phase scan: range-partition by the order
    * columns and sort within partitions; per-partition window cumsum (each
    * partition sorts only its slice); per-partition totals (one row per
    * partition) get an exclusive-prefix offset via a WINDOW OVER THE
    * PARTITION IDS — #partitions rows, trivially single-partition — and a
    * broadcast join adds the offset back. Deterministic when `order` is a
    * total order (include a unique tie-break key); sampling-dependent range
    * boundaries move rows between buckets but never change the result.
    */
  def prefixSum(df: DataFrame, order: Seq[Column], value: Column,
                outCol: String): DataFrame = {
    // NO sortWithinPartitions here: the per-bucket window below must
    // hash-redistribute on __bkt anyway (Catalyst cannot know partition
    // ids are co-located) and sorts its partitions itself — a range-side
    // sort would be a second corpus sort thrown away at the next
    // exchange. The range exchange alone defines the buckets.
    val bucketed = df.repartitionByRange(order: _*)
      .withColumn("__bkt", spark_partition_id())
    val local = bucketed.withColumn("__local",
      sum(value).over(Window.partitionBy(col("__bkt")).orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val offsets = bucketed.groupBy(col("__bkt"))
      .agg(sum(value).as("__tot"))
      .withColumn("__off",
        coalesce(sum(col("__tot")).over(Window.orderBy(col("__bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__bkt"), col("__off"))
    local.join(broadcast(offsets), "__bkt")
      .withColumn(outCol, col("__local") + col("__off"))
      .drop("__bkt", "__local", "__off")
  }

  /** W3: top-k rows per group by rank with a deterministic tie-break
    * (the dashboard "ranking" queries, ref: README.md:47-51). */
  def topKPerGroup(df: DataFrame, partitionCols: Seq[Column], order: Seq[Column],
                   k: Int, rankCol: String = "rnk"): DataFrame =
    df.withColumn(rankCol, rank().over(Window.partitionBy(partitionCols: _*).orderBy(order: _*)))
      .filter(col(rankCol) <= k)

  /** W4: running total over an explicit ROWS frame. */
  def runningSum(df: DataFrame, partitionCols: Seq[Column], order: Seq[Column],
                 value: Column, outCol: String): DataFrame =
    df.withColumn(outCol, sum(value).over(
      Window.partitionBy(partitionCols: _*).orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
}
