package graft

import org.apache.spark.sql.functions._
import graft.functions.CountMin

/** CountMinLongs contracts: one-sided error (estimate >= exact count,
  * always — the property q78's `overcount` column exposes), and
  * partitioning invariance (counters are order-independent sums, so the
  * sketch must be bit-identical however the data is partitioned — the
  * partial-merge correctness proof).
  */
class CountMinSpec extends SparkTestBase {

  import spark.implicits._

  private val d = 4
  private val w = 64

  // Zipf-ish key stream with duplicates and negative keys (hash-normalize path).
  private def keys: Seq[Long] =
    (0 until 5000).map(i => ((i * i * 2654435761L) % 97) - 20)

  test("estimates are one-sided: every key's estimate >= its exact count") {
    val df = keys.toDF("v")
    val sk = df.agg(CountMin.sketch(col("v"), d, w).as("sk"))
    val got = df.groupBy("v").agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(sk))
      .select(col("v"), col("n"),
        CountMin.estimate(col("sk"), col("v"), d, w).as("est"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"key ${r.getLong(0)}: estimate ${r.getLong(2)} < exact ${r.getLong(1)}")
    }
    // With 77 distinct keys in 4x64 counters, most estimates are exact.
    val exact = got.count(r => r.getLong(2) == r.getLong(1))
    assert(exact * 2 > got.length, s"only $exact of ${got.length} exact")
  }

  test("sketch is partitioning-invariant (partial merge is exact)") {
    def sketchWith(parts: Int): Seq[Long] =
      keys.toDF("v").repartition(parts)
        .agg(CountMin.sketch(col("v"), d, w)).head().getSeq[Long](0)
    val one = sketchWith(1)
    assert(sketchWith(7) == one && sketchWith(32) == one)
    assert(one.sum == keys.size.toLong * d, "every input increments d counters")
  }
}
