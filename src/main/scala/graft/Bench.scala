package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: times every declared query on SPARK_GRAFT_SF_DIR and
  * emits ONE JSON line {"metric":...,"queries":{...}} — to stdout, to
  * stderr (unprefixed by sbt's [info] logger), and to a file
  * (SPARK_GRAFT_BENCH_OUT, default ./bench_out.json) so the driver can
  * parse it regardless of how sbt mangles stdout.
  *
  * Round-1 lessons baked in:
  *  - the action is a noop-format write, not count() — count() lets
  *    Catalyst prune unused projections, so projection-only queries timed a
  *    bare row-count scan;
  *  - per-query state reset (clearCache) + tiny UI/status retention configs:
  *    the long-lived one-JVM loop otherwise accumulates SQL-execution UI
  *    state and GC pressure that dominated the r1 tail (q24 reported 257s
  *    vs 1.5s in isolation);
  *  - median of 3 timed runs after 1 warmup (JIT + codegen + parquet
  *    footer caches), so one GC pause can't skew a query's number.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // Bound per-execution status tracking: the default retains 1000 full
      // SQL-plan graphs in driver memory, which degraded the r1 tail.
      .config("spark.sql.ui.retainedExecutions", "1")
      .config("spark.ui.retainedJobs", "10")
      .config("spark.ui.retainedStages", "10")
      .config("spark.ui.retainedTasks", "100")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(name: String): Either[String, Double] = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        Right((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable => Left(s"$name: ${e.getMessage}") }
    }

    // SPARK_GRAFT_ONLY=q74_ngram_jaccard,q75_chunk_dup limits the run for
    // local iteration; the driver leaves it unset and benches everything.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    var errors = List.empty[String]
    names.foreach { n => // warmup pass (untimed)
      System.err.println(s"[bench] warmup $n: ${runOnce(n).fold(identity, t => f"$t%.1fs")}")
    }
    val results = names.map { name =>
      val runs = (1 to 3).flatMap { _ =>
        runOnce(name) match {
          case Right(t) => Some(t)
          case Left(e)  => errors ::= e; None
        }
      }.sorted
      val t = if (runs.isEmpty) -1.0 else runs(runs.size / 2)
      name -> t
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.distinct.map(e =>
      "\"" + e.replace("\\", "\\\\").replace("\"", "\\\"").takeWhile(_ >= ' ') + "\"")
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}"""
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try Files.writeString(Paths.get(outPath), json + "\n")
    catch { case _: Throwable => () }
    // Stop Spark BEFORE the final print so executor/session teardown logging
    // can't land after the metric line: the driver parses the LAST line of
    // output as JSON (build.sbt silences sbt's own epilogue via
    // showSuccess:=false + StdoutOutput). Shutdown hooks after main() log at
    // INFO, which setLogLevel(WARN) suppresses.
    spark.stop()
    System.err.println(json)
    System.err.flush()
    println(json)
    System.out.flush()
  }
}
