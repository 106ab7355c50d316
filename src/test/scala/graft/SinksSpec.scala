package graft

import java.nio.file.Files
import java.util.Properties
import graft.sources.Sinks

/** JDBC sink parity (ref: etl/loader.py:50-83 appends the star schema into
  * MySQL): write-append-read-back against embedded Derby — a real JDBC
  * round trip, not a mock.
  */
class SinksSpec extends SparkTestBase {

  private val Driver = "org.apache.derby.jdbc.EmbeddedDriver"

  test("jdbc sink: append mode accumulates rows across loads") {
    import spark.implicits._
    val df = Seq((1, "Truffle Jam", 12.50), (2, "Goat Cheese", 18.00))
      .toDF("id", "name", "price")
    val url = s"jdbc:derby:${Files.createTempDirectory("graft-derby")}/db;create=true"

    Sinks.jdbc(df, url, "t_sales", user = "app", password = "app", driver = Driver)
    val props = new Properties()
    props.setProperty("driver", Driver)
    assert(spark.read.jdbc(url, "t_sales", props).count() == 2)

    // append semantics (the reference's load mode): a second load adds rows
    Sinks.jdbc(df, url, "t_sales", user = "app", password = "app", driver = Driver)
    val back = spark.read.jdbc(url, "t_sales", props)
    assert(back.count() == 4)
    assert(back.columns.toSeq == Seq("id", "name", "price"))
  }

  test("jdbc sink: batchSize/isolationLevel/truncate options pass through") {
    import spark.implicits._
    val df = (1 to 10).map(i => (i, s"p$i")).toDF("id", "name")
    val url = s"jdbc:derby:${Files.createTempDirectory("graft-derby-opt")}/db;create=true"
    val props = new Properties()
    props.setProperty("driver", Driver)

    // batchSize + no-transaction isolation: the bulk-load profile
    Sinks.jdbc(df, url, "t_opt", user = "app", password = "app", driver = Driver,
      batchSize = Some(2), isolationLevel = Some("NONE"))
    assert(spark.read.jdbc(url, "t_opt", props).count() == 10)

    // truncate overwrite: rows replaced, table (and its DDL) preserved
    val df2 = (1 to 3).map(i => (100 + i, s"q$i")).toDF("id", "name")
    Sinks.jdbc(df2, url, "t_opt", user = "app", password = "app", driver = Driver,
      mode = "overwrite", truncate = true)
    val back = spark.read.jdbc(url, "t_opt", props)
    assert(back.count() == 3)
    assert(back.select("id").collect().map(_.getInt(0)).sorted.toSeq == Seq(101, 102, 103))
  }

  test("console sink renders a bounded number of rows to stdout") {
    import spark.implicits._
    val df = (1 to 50).map(i => (i, s"row$i")).toDF("id", "name")
    val buf = new java.io.ByteArrayOutputStream()
    Console.withOut(buf) { Sinks.console(df, numRows = 5) }
    val out = buf.toString
    assert(out.contains("row1") && out.contains("row5"))
    assert(!out.contains("row6"), "numRows cap not applied")
    assert(out.contains("only showing top 5 rows"))
  }

  test("partitioned parquet write gives partition-pruned scans") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft-pq").toString
    val df = (1 to 100).map(i => (i, if (i % 2 == 0) "even" else "odd"))
      .toDF("id", "par")
    Sinks.parquet(df, dir, partitionCols = Seq("par"), mode = "overwrite")
    val scan = spark.read.parquet(dir).filter(col("par") === "even")
    assert(scan.count() == 50)
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(par"),
      s"partition filter not pushed:\n$plan")
  }

  test("orc sink round-trips with filters pushed to the ORC scan") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft-orc").toString
    val df = (1 to 100).map(i => (i, s"n$i", i % 7)).toDF("id", "name", "grp")
    Sinks.orc(df, dir, partitionCols = Seq("grp"), mode = "overwrite")
    val scan = spark.read.orc(dir).filter(col("id") > 90 && col("grp") === 3)
    assert(scan.count() == (91 to 100).count(_ % 7 == 3))
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,90)"),
      s"predicate not pushed into the ORC scan:\n$plan")
    assert(plan.contains("PartitionFilters: [isnotnull(grp"),
      s"partition pruning lost:\n$plan")
  }

  test("csvWithQuarantine: malformed rows are captured, not dropped or fatal") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft-csvq")
    val f = dir.resolve("data.csv")
    Files.writeString(f,
      "id,qty,label\n1,10,ok\n2,notanumber,bad\n3,30,ok\n")
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("qty", IntegerType),
      StructField("label", StringType)))
    val df = graft.sources.Tables.csvWithQuarantine(spark, schema, f.toString)
      .cache() // corrupt-record contract: one consistent materialization
    val bad = df.filter(col("_corrupt_record").isNotNull)
    val good = df.filter(col("_corrupt_record").isNull)
    assert(good.count() == 2)
    assert(bad.count() == 1)
    assert(bad.select("_corrupt_record").head.getString(0).contains("notanumber"))
    assert(good.select(sum(col("qty"))).head.getLong(0) == 40L)
    df.unpersist()
  }

  test("bucketed tables co-locate the join: no shuffle exchange in the plan") {
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
      val b = (1 to 1000).map(i => (i.toLong, i * 2L)).toDF("k", "vb")
      Sinks.parquetBucketed(a, "bk_a", Seq("k"), buckets = 8)
      Sinks.parquetBucketed(b, "bk_b", Seq("k"), buckets = 8)
      val j = spark.table("bk_a").join(spark.table("bk_b"), "k")
      assert(j.count() == 1000)
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bk_a")
      spark.sql("DROP TABLE IF EXISTS bk_b")
    }
  }

  test("overwritePartitions replaces only the loaded partitions") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("dynpart").toString
    // Initial load: three day-partitions.
    val day1 = Seq(("2024-01-01", 1L, 10L), ("2024-01-01", 2L, 20L),
      ("2024-01-02", 3L, 30L), ("2024-01-03", 4L, 40L)).toDF("day", "id", "v")
    Sinks.overwritePartitions(day1, dir, Seq("day"))
    // Corrected re-run of day 2 ONLY (different rows, fewer of them).
    val fix = Seq(("2024-01-02", 3L, 99L)).toDF("day", "id", "v")
    Sinks.overwritePartitions(fix, dir, Seq("day"))

    // partition-column inference types `day` as DATE on read-back
    val got = spark.read.parquet(dir)
      .select(col("day").cast("string"), col("id"), col("v")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // Days 1 and 3 survive untouched; day 2 is fully replaced.
    assert(got == Set(("2024-01-01", 1L, 10L), ("2024-01-01", 2L, 20L),
      ("2024-01-02", 3L, 99L), ("2024-01-03", 4L, 40L)))
    // A STATIC overwrite of the same frame would have wiped days 1/3.
    assert(spark.read.parquet(dir).where(col("day") =!= "2024-01-02").count() == 3)
  }

  test("zorderedParquet clusters BOTH dimensions; plain write neither") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // Deterministic pseudo-uniform 2D points over [0, 1024)^2, in an
    // order uncorrelated with either coordinate.
    val pts = (0 until 20000).map { i =>
      (((i * 2654435761L) >>> 7) % 1024L, ((i * 40503L + 7) >>> 3) % 1024L)
    }.toDF("x", "y")

    /** Mean per-file (max-min) span of each dimension after a write. */
    def spans(path: String): (Double, Double) = {
      val byFile = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
        .agg(avg("sx"), avg("sy")).head()
      (byFile.getDouble(0), byFile.getDouble(1))
    }

    val dir = Files.createTempDirectory("zorder").toString
    pts.repartition(8).write.mode("overwrite").parquet(s"$dir/plain")
    Sinks.zorderedParquet(pts, "x", "y", s"$dir/z", files = 8)

    val (px, py) = spans(s"$dir/plain")
    val (zx, zy) = spans(s"$dir/z")
    // Round-robin files each cover ~the whole domain; 8 z-range files
    // tile the square, so each file's x and y spans shrink well below it.
    assert(px > 900 && py > 900, s"plain write unexpectedly clustered: $px, $py")
    assert(zx < 700 && zy < 700, s"z-order failed to cluster both dims: $zx, $zy")
    assert(zx + zy < (px + py) * 0.7, s"z-order not better than plain: $zx+$zy vs $px+$py")
  }
}
