package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: two-phase salted aggregation and salted joins.
  *
  * Measured (graft.tools.SkewBench; 16M rows, 95% on one key, local[32]):
  * saltedJoin 3.2 s vs 8.9 s plain — 2.8x, and AQE's skew splitting did
  * not rescue the plain join because the giant partition sat under the
  * 256 MB skewedPartitionThresholdInBytes default. Salting needs no
  * threshold to fire. The same benchmark is honest about sums: plain
  * groupBy.sum on the identical skew is NOT slow (0.46 s vs 0.62 s
  * salted) because map-side partial aggregation already collapses each
  * partition to one partial per key before the shuffle. saltedSum's use
  * case is aggregates whose partial state can't compress — collect-like
  * state, exact distincts re-keyed by value, very high group counts that
  * overflow the map-side hash — where the giant key's reduce work really
  * is row-proportional.
  *
  * Salting splits every key into `salts` sub-keys for the first (wide)
  * phase, then combines per-salt partials keyed only by the real key.
  * Both phases are associative, so the result is exactly the unsalted
  * one (EngineProps property-checks both operators against the plain
  * forms; q45/q53 oracle-check them end-to-end).
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
