package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (band) join — `left.value BETWEEN band.lo AND band.hi` — rewritten
  * as a bucketed EQUI-join.
  *
  * A naive theta join `ON v >= lo AND v < hi` has no equi-key, so Spark
  * plans BroadcastNestedLoopJoin: every row is tested against every band —
  * |left| × |bands| comparisons, a scale killer once bands stop being tiny.
  * The rewrite quantizes the value axis into fixed-width buckets: each band
  * is exploded to the buckets it overlaps (`sequence(lo div w, (hi-1) div
  * w)`), the left side computes its single bucket (`v div w`), and the join
  * becomes a hash equi-join on the bucket id with an exact residual range
  * filter after the match. Per-row work drops to the number of bands
  * overlapping ONE bucket (≈1 for width ≤ band span), and the join gets
  * hash-partitioned parallelism / AQE like any equi-join. Pick `width` at
  * or below the typical band span so bucket fan-out stays O(1) per band.
  *
  * Bands must satisfy lo < hi (hi exclusive). Overlapping bands produce one
  * output row per matching band, same as the theta join.
  */
object RangeJoin {

  def bucketedInner(left: DataFrame, valueCol: String,
                    bands: DataFrame, loCol: String, hiCol: String,
                    width: Long): DataFrame = {
    require(width > 0, "bucket width must be positive")
    val expanded = bands.withColumn("__b",
      explode(sequence(expr(s"$loCol div $width"), expr(s"($hiCol - 1) div $width"))))
    left.withColumn("__b", expr(s"$valueCol div $width"))
      .join(Joins.dimBroadcast(expanded), Seq("__b"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__b")
  }
}
