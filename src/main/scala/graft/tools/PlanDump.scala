package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Diagnostic main: print the formatted physical plan of declared queries.
  * Usage: runMain graft.tools.PlanDump <sfDir> <queryName> [more names...]
  * (plan-shape iteration aid; the CI-pinned invariants live in
  * PlanAuditSpec).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
                else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { q =>
      val p = graft.SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.explainString(ExplainMode.fromString("formatted"))
      println(s"===== $q  (Exchange x${"Exchange".r.findAllIn(p).size})")
      println(p)
    }
    spark.stop()
  }
}
