package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.streaming.OutputMode

/** STREAMING write into a graft table — the counterpart of
  * [[GraftStreamSource]], closing the graft→graft streaming loop:
  *
  * {{{
  *   spark.readStream.format("graft").load(src)          // CDC feed
  *     .…transforms…
  *     .writeStream.format("graft")
  *     .option("checkpointLocation", ckpt).start(dst)    // exactly-once
  * }}}
  *
  * Exactly-once is the [[TxnTable]] txnId idempotence the batch API
  * already proves (the Delta `txnAppId`/`txnVersion` shape): every
  * micro-batch commits under `<appId>-<batchId>`, so a crash between
  * the table commit and Spark's checkpoint advance replays the batch
  * into a FOUND txnId and skips — the destination table is
  * byte-identical to a no-crash run. `appId` defaults to a fingerprint
  * of the checkpoint location (the checkpoint IS the batch-numbering
  * authority: same checkpoint ⇒ same batchIds ⇒ same txnIds across
  * restarts; a different checkpoint restarts numbering and must not
  * collide), overridable with `.option("txnAppId", …)` when two queries
  * share a checkpoint path across table copies. Without a checkpoint
  * there is no cross-restart replay to dedup — a per-run id suffices.
  *
  * OutputMode.Append commits each batch as a [[TxnTable.append]];
  * OutputMode.Complete (streaming aggregations) as a full
  * [[TxnTable.overwrite]] — the streaming-materialized-view shape
  * MviewStream hand-rolled over foreachBatch, now behind the public
  * `writeStream.format("graft")` API. OutputMode.Update needs an
  * upsert-key contract the writer API lacks — `.option("mergeKeys",
  * "c1[,c2…]")` supplies it, and each batch lands as ONE
  * [[TxnTable.merge]] (stats-pruned copy-on-write upsert; an
  * update-mode aggregation emits at most one row per group per batch,
  * satisfying merge's key-unique precondition by construction — the
  * INCREMENTAL materialized view, where Complete rewrites the world).
  * The first batch on a fresh location appends (nothing to merge
  * into). Update without mergeKeys is rejected toward foreachBatch +
  * mergeInto. Append + `.option("overwritePartitions", col)` turns
  * each batch into a dynamic-partition overwrite — a re-delivered day
  * atomically swaps that day's partition, other days untouched (the
  * late-data reprocessing shape; the caller owns the "batches carry
  * complete partitions" contract, as with the batch writer).
  *
  * Schema-on-write, CHECK constraints, generated columns and
  * conflict-rebase all apply — the batch and streaming writers share
  * the same `stage`/`tryPublish` gates. Retention caveat: `findTxn`
  * consults RETAINED manifests, so vacuuming the destination past an
  * inactive query's last commit forfeits replay dedup for exactly that
  * window (the Delta VACUUM-vs-txn caveat); keep retention above the
  * longest expected query downtime.
  */
final class GraftStreamSink(tableDir: String, mode: OutputMode, appId: String,
                            mergeKeys: Seq[String],
                            partCol: Option[String] = None,
                            legacyAppId: Option[String] = None)
    extends Sink {

  private val probedLegacy = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Whether any RETAINED commit carries a LEGACY-era txnId ("ckpt" +
    * murmur32's 1-8 hex chars; the SHA-256 form is "ckpt" + 32 hex, so
    * the anchored 1-8 quantifier cannot match it). Scopes the migration
    * probe (ADVICE r14): a post-migration table — every commit written
    * under the new derivation — never probes, so a fresh query whose
    * path murmur-collides with nothing cannot skip its first batch. */
  private def legacyEraCommitExists: Boolean = {
    val legacyShape = "^ckpt[0-9a-f]{1,8}-\\d+$".r
    TxnTable.versions(tableDir).exists(v =>
      TxnTable.snapshot(tableDir, v).txnId
        .exists(t => legacyShape.findFirstIn(t).isDefined))
  }

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // Migration probe: the checkpoint-derived appId changed from
    // murmur32 to SHA-256 — a checkpoint predating that change replays
    // its last committed-but-unacked batch under the NEW appId, so the
    // table-side findTxn would miss and the batch would land twice.
    // Replay only ever re-delivers the FIRST batch after a restart, so
    // one legacy-txnId lookup per sink instance (not per batch) closes
    // the window; any later batch is genuinely new. The probe is
    // DOUBLE-scoped: the table must actually hold a legacy-shaped
    // commit (see above), and `.option("legacyAppIdProbe", "false")`
    // disables it outright for post-migration deployments.
    if (legacyAppId.exists(la => !probedLegacy.getAndSet(true) &&
        legacyEraCommitExists && TxnTable.txnApplied(tableDir, s"$la-$batchId")))
      return // already applied by a pre-upgrade run — skip, don't duplicate
    // Re-wrap the micro-batch output on the executed-RDD boundary (the
    // ForeachBatchSink pattern): the incoming handle is bound to the
    // stream's IncrementalExecution and must not be re-planned through
    // a fresh batch analysis.
    val batch = ColumnBridge.asBatch(data.sparkSession, data)
    val txnId = Some(s"$appId-$batchId")
    if (mode == OutputMode.Complete())
      TxnTable.overwrite(batch, tableDir, txnId): Unit
    else if (mode == OutputMode.Update()) {
      if (TxnTable.latestVersion(tableDir).isEmpty)
        TxnTable.append(batch, tableDir, txnId): Unit // first batch bootstraps
      else
        TxnTable.merge(batch.sparkSession, tableDir, batch, mergeKeys, txnId): Unit
    } else partCol match {
      case Some(c) =>
        // dynamic partition overwrite per micro-batch. An EMPTY batch
        // replaces nothing (skip — the batch API's "no rows" guard is
        // for interactive misuse, not an idle trigger); the persist
        // keeps the emptiness probe from re-running the micro-batch.
        val cached = batch.persist()
        try {
          if (!cached.isEmpty)
            TxnTable.overwritePartitions(cached.sparkSession, tableDir, cached,
              c, txnId): Unit
        } finally { cached.unpersist(); () }
      case None => TxnTable.append(batch, tableDir, txnId): Unit
    }
  }

  override def toString: String = s"GraftStreamSink[$tableDir, $mode]"
}

object GraftStreamSink {

  /** Build the sink from `writeStream` options (the
    * [[org.apache.spark.sql.sources.StreamSinkProvider]] contract). */
  private[sources] def create(parameters: Map[String, String],
                              partitionColumns: Seq[String],
                              outputMode: OutputMode): GraftStreamSink = {
    require(partitionColumns.isEmpty,
      "graft streaming sink takes no partitionBy — partition layout belongs " +
        "to the table (overwritePartitions / foreachBatch); stream commits " +
        "are transaction-granular")
    val dir = GraftDataSource.dirOf(parameters)
    def opt(k: String): Option[String] =
      parameters.collectFirst { case (key, v) if key.equalsIgnoreCase(k) => v }
    // the pre-upgrade checkpoint-derived appId (murmur32 of the same
    // absolute path) — probed once per restart so checkpoints created
    // before the SHA-256 derivation don't double-apply their replayed
    // batch (see addBatch). Only meaningful when the appId is
    // checkpoint-derived: an explicit txnAppId never changed shape.
    val legacy = opt("txnAppId") match {
      case Some(_) => None
      case None if opt("legacyAppIdProbe").exists(_.equalsIgnoreCase("false")) =>
        None // post-migration opt-out: no legacy lookup, ever
      case None => opt("checkpointLocation").map(cp =>
        "ckpt" + Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(
          new java.io.File(cp).getAbsolutePath)))
    }
    val appId = opt("txnAppId").getOrElse(opt("checkpointLocation") match {
      case Some(cp) =>
        // stable across restarts of the same query: the checkpoint path
        // is what makes batchIds comparable in the first place. The
        // derivation must be COLLISION-RESISTANT, not merely stable —
        // two queries with different checkpoints writing the same
        // destination landing on one appId would make TxnTable's
        // idempotence silently SKIP a legitimate batch as a replay
        // (data loss, not an error). A 32-bit hash collides at ~2^16
        // checkpoints birthday-style; SHA-256 (truncated to 64 hex
        // chars' first 16 = 64 bits would still birthday at 2^32, so
        // keep 32 hex chars = 128 bits) does not.
        val abs = new java.io.File(cp).getAbsolutePath
        val sha = java.security.MessageDigest.getInstance("SHA-256")
          .digest(abs.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        "ckpt" + sha.take(16).map(b => f"$b%02x").mkString
      case None => "run" + java.util.UUID.randomUUID().toString
    })
    val keys = opt("mergeKeys").map(_.split(",").map(_.trim).toSeq
      .filter(_.nonEmpty)).getOrElse(Nil)
    // dynamic-partition-overwrite streaming: each Append-mode batch
    // REPLACES exactly the partitions it contains (the late-data /
    // daily-reprocessing shape — a re-delivered day atomically swaps
    // that day's partition, other days untouched). The caller owns the
    // "batches carry complete partitions" contract, same as the batch
    // writer's dynamic overwrite.
    val partCol = opt("overwritePartitions")
    outputMode match {
      case m if m == OutputMode.Append() && partCol.isDefined =>
        new GraftStreamSink(dir, m, appId, Nil, partCol, legacy)
      case m if m == OutputMode.Append() || m == OutputMode.Complete() =>
        new GraftStreamSink(dir, m, appId, Nil, None, legacy)
      case m if m == OutputMode.Update() && keys.nonEmpty =>
        new GraftStreamSink(dir, m, appId, keys, None, legacy)
      case other => throw new UnsupportedOperationException(
        s"graft streaming sink: output mode $other needs upsert keys — " +
          "pass .option(\"mergeKeys\", \"c1[,c2]\") for per-batch MERGE " +
          "semantics, or use foreachBatch with TxnTable.mergeInto for " +
          "conditional clauses")
    }
  }
}
