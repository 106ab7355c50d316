package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (point-in-time) join — an operator Spark's API lacks natively.
  *
  * For every left row, attach the single right row with the greatest
  * `rightTime <= leftTime` for the same key (inclusive match), or nulls when
  * no such row exists — `ASOF LEFT JOIN` in DuckDB/QuestDB terms.
  *
  * Implementation is the scalable tagged-union form, NOT a range join:
  * union both sides with a side tag, hash-exchange once on the key, sort
  * each partition by (time, side) — right rows sort before left rows at
  * equal time, which is what makes the match inclusive — then carry the
  * most recent right payload forward with a running `last(ignoreNulls)`
  * window and keep only left rows. Cost is one shuffle + per-partition
  * sort, identical to a sort-merge join; there is no per-key
  * cross-product, so a 100 TB left side with a hot key degrades to that
  * key's sort, never to |left| × |right| pairs. (A Catalyst range-join
  * would buffer right rows per key; this needs O(1) running state.)
  *
  * Requirement: `right` must be unique per (key, rightTime) — pre-aggregate
  * otherwise (the caller owns tie semantics, same as DuckDB ASOF, which is
  * nondeterministic on right-side time ties).
  */
object AsOf {

  def joinAsOfLeft(left: DataFrame, right: DataFrame, key: String,
                   leftTime: String, rightTime: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadCols = right.columns.filterNot(_ == key).toSeq
    val payloadType = StructType(payloadCols.map(c => right.schema(c)))

    val lC = left.select(
      leftCols.map(col) ++ Seq(
        col(key).as("__k"), col(leftTime).as("__t"),
        lit(1).as("__side"), lit(null).cast(payloadType).as("__p")): _*)
    val rC = right.select(
      leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++ Seq(
        col(key).as("__k"), col(rightTime).as("__t"),
        lit(0).as("__side"), struct(payloadCols.map(col): _*).as("__p")): _*)

    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lC.unionByName(rC)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payloadCols.map(c => col(s"__m.$c").as(c)): _*)
  }
}
