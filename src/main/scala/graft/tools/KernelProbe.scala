package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.MultiQueryTopK

/** Isolated MultiQueryTopK kernel probe (the scalebench-variance
  * discipline: never conclude a kernel verdict from the full-suite JSON
  * — section-order JIT/GC effects swamp it). Synthesizes N corpus rows
  * with BOTH a 128-dim micro vector and a 16-code PQ encoding, plus Q
  * query tables for each mode, then times dot vs ADC top-10 scans over
  * the SAME cached frame, interleaved A/B/A/B so JIT and cache state
  * are symmetric. Also reports a third leg with the ADC heap k=1 to
  * split kernel-arithmetic cost from heap/screen cost.
  *
  * Run: SPARK_DRIVER_MEM=48g SPARK_GRAFT_PROBE_N=2000000 \
  *        sbt "runMain graft.tools.KernelProbe"
  */
object KernelProbe {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_PROBE_N", "2000000").toLong
    val q = sys.env.getOrElse("SPARK_GRAFT_PROBE_Q", "200").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = 128; val m = 16; val k = 64
    val base = spark.range(n).toDF("id")
      .withColumn("em", transform(sequence(lit(1), lit(d)), i =>
        pmod(xxhash64(col("id") * 29L + i.cast("long")), lit(2001L)) - 1000L))
      .withColumn("nsq", aggregate(transform(col("em"), x => x * x),
        lit(0L), (a, v) => a + v))
      .withColumn("codes", transform(sequence(lit(1), lit(m)), i =>
        pmod(xxhash64(col("id") * 13L + i.cast("long")), lit(k.toLong))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[probe] corpus: ${base.count()} rows")
    val rng = new scala.util.Random(7)
    val dotTabs = (0 until q).map(qi =>
      (qi.toLong, Seq.fill(d)((rng.nextInt(2001) - 1000).toLong),
        Seq.fill(d)(500L).map(x => x * x).sum))
    val adcTabs = (0 until q).map(qi =>
      (qi.toLong, Seq.fill(m * k)(rng.nextLong() % 1000000L),
        Seq.fill(d)(500L).map(x => x * x).sum))
    def timed(label: String)(body: => Long): Double = {
      val t0 = System.nanoTime()
      val r = body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $label: $s%.2fs (rows=$r)")
      s
    }
    def run(agg: org.apache.spark.sql.Column): Long =
      base.groupBy().agg(agg.as("res"))
        .select(explode(col("res")).as("r"))
        .select(col("r.qid"), explode(col("r.tk")).as("e")).count()
    // interleaved passes: warmup, then 2 timed rounds of each
    run(MultiQueryTopK.dotTopK(col("id"), col("em"), col("nsq"), dotTabs, 10))
    run(MultiQueryTopK.adcTopK(col("id"), col("codes"), col("nsq"), adcTabs, 10, k))
    (1 to 2).foreach { p =>
      timed(s"dot  pass$p")(run(
        MultiQueryTopK.dotTopK(col("id"), col("em"), col("nsq"), dotTabs, 10)))
      timed(s"adc  pass$p")(run(
        MultiQueryTopK.adcTopK(col("id"), col("codes"), col("nsq"), adcTabs, 10, k)))
      timed(s"adc1 pass$p")(run( // k=1: heap work minimized
        MultiQueryTopK.adcTopK(col("id"), col("codes"), col("nsq"), adcTabs, 1, k)))
    }
    spark.stop()
  }
}
