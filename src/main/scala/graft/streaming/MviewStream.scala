package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Exact.cents

/** Streaming incremental materialized-view maintenance — the streaming
  * face of q108 (graft.queries.StarQueries): a foreachBatch sink folds
  * each micro-batch's partial aggregates into a persisted per-key state,
  * so the view is always O(keys) and no batch ever rescans history.
  *
  * State layout (plain parquet, no table format required):
  * {{{
  *   stateDir/
  *     gen-<k>/   the k-th state generation (parquet partial aggregates)
  *     LATEST     "<k>:<lastBatchId>", written temp-file + ATOMIC_MOVE
  * }}}
  * Readers follow the LATEST pointer, so a crash mid-write leaves the
  * previous generation fully intact — the swap is the pointer flip, never
  * an in-place overwrite (read-your-own-input overwrite corrupts on
  * failure). Exactly-once under foreachBatch's at-least-once replay comes
  * from recording the folded batchId IN the pointer: a replayed batch
  * (id <= recorded) is a no-op, the same delete-before-insert idea as
  * Sinks.jdbcSink but expressed as idempotent skip. Old generations are
  * GC'd after the flip.
  *
  * At 100 TB: the state buckets by key (q81 layout) and the merge is
  * exchange-free; generation dirs live on the object store and the
  * pointer in a metastore — the mechanism is unchanged.
  */
object MviewStream {

  /** q108's partial-aggregate shape over (o_custkey, o_totalprice). */
  def orderPartials(df: DataFrame): DataFrame =
    df.groupBy("o_custkey")
      .agg(count(lit(1)).as("n"), sum(cents(col("o_totalprice"))).as("sum_c"),
        min(cents(col("o_totalprice"))).as("min_c"),
        max(cents(col("o_totalprice"))).as("max_c"))

  /** Merge two partial states (the mergeable-aggregate algebra). */
  def orderMerge(state: DataFrame, batch: DataFrame): DataFrame =
    state.unionByName(batch)
      .groupBy("o_custkey")
      .agg(sum(col("n")).as("n"), sum(col("sum_c")).as("sum_c"),
        min(col("min_c")).as("min_c"), max(col("max_c")).as("max_c"))

  private def pointer(stateDir: String) = new java.io.File(stateDir, "LATEST")

  /** (generation, lastFoldedBatchId) per the LATEST pointer, if any. */
  def latest(stateDir: String): Option[(Long, Long)] = {
    val f = pointer(stateDir)
    if (!f.exists()) None
    else {
      val s = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      val Array(g, b) = s.trim.split(":")
      Some((g.toLong, b.toLong))
    }
  }

  /** The current state frame (follows the generation pointer). */
  def readState(spark: SparkSession, stateDir: String): Option[DataFrame] =
    latest(stateDir).map { case (g, _) => spark.read.parquet(s"$stateDir/gen-$g") }

  /** Fold one micro-batch into the state. Idempotent per batchId —
    * foreachBatch replays (at-least-once) skip cleanly.
    */
  def refresh(spark: SparkSession, stateDir: String, batchId: Long,
              batch: DataFrame,
              partials: DataFrame => DataFrame = orderPartials,
              merge: (DataFrame, DataFrame) => DataFrame = orderMerge): Unit = {
    new java.io.File(stateDir).mkdirs()
    val cur = latest(stateDir)
    if (cur.exists(_._2 >= batchId)) return // replayed batch — already folded
    val p = partials(batch)
    val merged = readState(spark, stateDir).map(st => merge(st, p)).getOrElse(p)
    val next = cur.map(_._1 + 1L).getOrElse(0L)
    merged.write.mode("overwrite").parquet(s"$stateDir/gen-$next")
    val tmp = new java.io.File(stateDir, "LATEST.tmp")
    java.nio.file.Files.write(tmp.toPath, s"$next:$batchId".getBytes("UTF-8"))
    java.nio.file.Files.move(tmp.toPath, pointer(stateDir).toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    cur.foreach { case (g, _) => deleteRec(new java.io.File(s"$stateDir/gen-$g")) }
  }

  private def deleteRec(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(deleteRec)
    f.delete(): Unit
  }
}
