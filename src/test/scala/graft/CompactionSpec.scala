package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.NativeText
import graft.sources.Sinks

/** Small-file compaction (Sinks.compactParquet): bin-packing to a target
  * file size must preserve content exactly (q117's order-independent
  * checksum), preserve partition directory values, keep Z-order pruning
  * alive when asked, and be idempotent.
  */
class CompactionSpec extends SparkTestBase {

  /** Order-independent content checksum (the q117 idea): sum + xor of
    * per-row hashes over all columns, canonically stringified. */
  private def checksum(df: DataFrame): (BigDecimal, Long) = {
    val h = xxhash64(df.columns.sorted.map(c => col(c).cast("string")): _*)
    // decimal sum: a long sum of 64-bit hashes overflows under ANSI
    val row = df.select(h.cast("decimal(38,0)").as("h"))
      .agg(sum(col("h")), count(lit(1))).head()
    (BigDecimal(row.getDecimal(0)), row.getLong(1))
  }

  private def parquetFiles(dir: File): Array[File] =
    Option(dir.listFiles()).getOrElse(Array.empty[File])
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))

  test("unpartitioned: 20 fragments pack to 1 file, content checksum unchanged") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-compact").toString
    val df = (1 to 5000).map(i => (i.toLong, s"row$i")).toDF("id", "v")
    df.repartition(20).write.mode("overwrite").parquet(dir)
    assert(parquetFiles(new File(dir)).length == 20)
    val before = checksum(spark.read.parquet(dir))

    val stats = Sinks.compactParquet(spark, dir, targetFileBytes = 512L * 1024 * 1024)
    assert(stats.filesBefore == 20 && stats.filesAfter == 1,
      s"expected 20 -> 1 files, got $stats")
    assert(checksum(spark.read.parquet(dir)) == before, "compaction changed content")
  }

  test("partitioned: every leaf packs independently, partition values preserved") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-compact-part").toString
    val df = (1 to 3000).map(i => (i.toLong, s"p${i % 3}", s"row$i")).toDF("id", "p", "v")
    df.repartition(8).write.mode("overwrite").partitionBy("p").parquet(dir)
    val leafDirs = new File(dir).listFiles().filter(_.getName.startsWith("p="))
    assert(leafDirs.length == 3)
    leafDirs.foreach(l => assert(parquetFiles(l).length == 8))
    val before = checksum(spark.read.parquet(dir))

    val stats = Sinks.compactParquet(spark, dir, targetFileBytes = 512L * 1024 * 1024)
    assert(stats.filesBefore == 24 && stats.filesAfter == 3)
    val after = new File(dir).listFiles().filter(_.getName.startsWith("p="))
    assert(after.map(_.getName).sorted.toSeq == Seq("p=p0", "p=p1", "p=p2"),
      "partition directories changed")
    after.foreach(l => assert(parquetFiles(l).length == 1))
    assert(checksum(spark.read.parquet(dir)) == before, "compaction changed content")
    // partition column still reads back correctly
    assert(spark.read.parquet(dir).filter(col("p") === "p1").count() == 1000)
  }

  test("z-order compaction: packed files keep disjoint Morton ranges") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-compact-z").toString
    val df = (0 until 4096).map(i => (i.toLong % 64, i.toLong / 64, s"v$i"))
      .toDF("x", "y", "v")
    Sinks.zorderedParquet(df, "x", "y", dir, files = 12)
    assert(parquetFiles(new File(dir)).length == 12)
    val before = checksum(spark.read.parquet(dir))

    val stats = Sinks.compactParquet(spark, dir, targetFileBytes = 512L * 1024 * 1024,
      zorder = Some(("x", "y")))
    assert(stats.filesAfter < stats.filesBefore && stats.filesAfter >= 1)
    assert(checksum(spark.read.parquet(dir)) == before, "compaction changed content")
    // per-file Morton ranges must be non-overlapping — the property that
    // keeps min-max stats pruning effective on BOTH x and y after the
    // rewrite (a naive concat of z-ordered fragments loses it)
    val ranges = parquetFiles(new File(dir)).map { f =>
      val r = spark.read.parquet(f.getPath)
        .select(NativeText.morton2(col("x"), col("y")).as("z"))
        .agg(min(col("z")), max(col("z"))).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"overlapping Morton ranges after compaction: $hi1 > $lo2")
      case _ =>
    }
  }

  test("idempotent: a second run rewrites nothing") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-compact-idem").toString
    (1 to 100).map(i => (i, s"r$i")).toDF("id", "v")
      .repartition(5).write.mode("overwrite").parquet(dir)
    val s1 = Sinks.compactParquet(spark, dir, targetFileBytes = 512L * 1024 * 1024)
    assert(s1.filesAfter == 1)
    val names = parquetFiles(new File(dir)).map(_.getName).toSeq
    val s2 = Sinks.compactParquet(spark, dir, targetFileBytes = 512L * 1024 * 1024)
    assert(s2.filesBefore == 1 && s2.filesAfter == 1)
    assert(parquetFiles(new File(dir)).map(_.getName).toSeq == names,
      "idempotent run must not rewrite files")
  }
}
