package graft

import org.apache.spark.sql.functions._
import graft.functions.Exact

/** Tests for the exact-arithmetic kernels that back every money aggregate
  * and the vector similarity queries.
  */
class ExactSpec extends SparkTestBase {
  import spark.implicits._

  test("cents quantizes money doubles to exact integer cents") {
    val out = Seq(12.34, -3.21, 0.0, 199.99).toDF("v")
      .select(Exact.cents(col("v")).as("c")).as[Long].collect()
    assert(out.toSeq == Seq(1234L, -321L, 0L, 19999L))
  }

  test("micro quantizes to 1e-6 units") {
    val out = Seq(0.5, -0.000001, 1.25).toDF("v")
      .select(Exact.micro(col("v")).as("m")).as[Long].collect()
    assert(out.toSeq == Seq(500000L, -1L, 1250000L))
  }

  test("dotMicro/normSqMicro/cosineMicro: orthogonal and parallel vectors") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),   // orthogonal -> cos 0
      (Array(1.0f, 2.0f), Array(2.0f, 4.0f))    // parallel   -> cos 1
    ).toDF("a", "b")
    val out = df.select(
      Exact.cosineMicro(
        Exact.dotMicro(col("a"), col("b")),
        Exact.normSqMicro(col("a")),
        Exact.normSqMicro(col("b"))).as("cos")).as[Double].collect()
    assert(math.abs(out(0) - 0.0) < 1e-12)
    assert(math.abs(out(1) - 1.0) < 1e-12)
  }

  test("sum of cents is exact and partitioning-independent") {
    val vals = (1 to 10000).map(i => i * 0.01)
    val a = vals.toDF("v").repartition(1)
      .agg(sum(Exact.cents(col("v")))).as[Long].collect()(0)
    val b = vals.toDF("v").repartition(37)
      .agg(sum(Exact.cents(col("v")))).as[Long].collect()(0)
    assert(a == b && a == (1L to 10000L).sum)
  }
}
