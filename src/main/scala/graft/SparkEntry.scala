package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is declared here as a named
  * query over the harness testdata, paired (where ANSI-SQL-expressible) with
  * a DuckDB oracle. Implementations live under graft.queries.* and lean on
  * the library modules (graft.sources, graft.functions, graft.operators).
  */
object SparkEntry {

  private val declared: Seq[Q] =
    CoreQueries.all ++ RowQueries.all ++ GroupQueries.all ++
      WindowQueries.all ++ JoinSetQueries.all ++
      TextQueries.all ++ VectorQueries.all ++ MiscQueries.all ++
      TypedQueries.all ++ StarQueries.all ++ GraphQueries.all ++
      FormatQueries.all

  private val (qMap, oMap) = registry(declared)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    qMap("q24_sort_limit_topk")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = qMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = oMap
}
