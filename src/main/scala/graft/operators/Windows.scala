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
    * (per-partition offset + local index). Two passes over the data, no
    * single-partition bottleneck — the 100 TB version of W2. Deterministic
    * when `order` is a total order (include a unique tie-break key).
    */
  def denseIdsScalable(df: DataFrame, order: Seq[Column], outCol: String): DataFrame = {
    val sorted = df.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
    val schema = StructType(sorted.schema.fields :+ StructField(outCol, LongType, nullable = false))
    val indexed = sorted.rdd.zipWithIndex().map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ (idx + 1L))
    }
    df.sparkSession.createDataFrame(indexed, schema)
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
