package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-key aggregation: two-phase salted sums.
  *
  * A plain `groupBy(key).sum` over a column with a handful of giant keys
  * puts each giant key in ONE reducer — at 100 TB that single task is the
  * stage's wall clock. Salting splits every key into `salts` sub-keys for
  * the first (wide) aggregation, then combines the per-salt partials in a
  * second, tiny aggregation keyed only by the real key. Both phases are
  * associative sums, so the result is exactly the unsalted one.
  *
  * (Spark's AQE skew handling covers joins; skewed AGGREGATION is still the
  * pipeline author's job, hence this operator.)
  */
object Skew {

  /** Exact salted sum over named key columns: `saltBy` must be
    * deterministic per row (e.g. a unique id column) so the salt
    * assignment — and thus every partial — is reproducible run to run.
    */
  def saltedSum(df: DataFrame, keys: Seq[String], value: Column,
                saltBy: Column, salts: Int, outCol: String): DataFrame = {
    val partial = df
      .withColumn("__salt", pmod(saltBy, lit(salts)))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(value).as("__partial"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as(outCol))
  }

  /** Skew-salted inner equi-join: the big (skewed) side gets a
    * deterministic per-row salt, the small side is replicated once per
    * salt value, and the join runs on (key, salt) — a giant key's rows
    * spread over `salts` reducers instead of one. Exact: every big-side
    * row still meets every matching small-side row exactly once.
    *
    * Use when AQE's skew-join splitting can't kick in (e.g. the skewed
    * side is the OUTPUT of an exchange-reusing stage, or partition-size
    * stats mislead) and the small side is modest but above the broadcast
    * threshold — replication costs |small| × salts. `saltBy` must be
    * deterministic per row (a unique id) for reproducible plans.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltBy: Column, salts: Int): DataFrame = {
    val bigS = big.withColumn("__salt", pmod(saltBy, lit(salts)))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }
}
