package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {
  /** One declared engine query: the Spark implementation plus (when the
    * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query
    * over the same parquet tables. The driver hash-compares the two at
    * sf0.01, so every query imposes a total row order and uses exact
    * (decimal / integer) arithmetic — see graft.functions.Exact.
    */
  final case class Q(
      name: String,
      oracle: Option[String],
      fn: (SparkSession, String) => DataFrame)

  def registry(qs: Seq[Q]): (Map[String, (SparkSession, String) => DataFrame], Map[String, String]) =
    (qs.map(q => q.name -> q.fn).toMap,
     qs.flatMap(q => q.oracle.map(q.name -> _)).toMap)
}
