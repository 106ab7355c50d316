package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.connector.read.streaming.{ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow, Offset => OffsetV2}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.sources.StreamSourceProvider
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** STREAMING read of a graft table — the table-format-as-stream-source
  * bread and butter (Delta's streaming source shape):
  *
  * {{{
  *   spark.readStream.format("graft").load(tableDir)      // CDC feed
  *     .writeStream.option("checkpointLocation", …)…
  * }}}
  *
  * Offsets are COMMIT VERSIONS — the natural exactly-once cursor of a
  * versioned table: `latestOffset` is the head version, each micro-batch
  * is the change feed of the commit window `(startV, endV]` via
  * [[TxnTable.changes]] (insert/delete-tagged rows, the q201 CDC
  * machinery — append windows take the file-level fast path, DML windows
  * the multiset diff), and the FIRST batch bootstraps with the initial
  * snapshot (version 0 as inserts) exactly like [[TxnTable.changesStream]]
  * proved out. Spark's checkpoint persists the version cursor, so a
  * restarted query resumes from its last committed window and a replayed
  * window re-reads the SAME immutable manifests — deterministic batches,
  * the property streaming exactly-once composes from.
  *
  * Built on the stable V1 streaming source API (`StreamSourceProvider` /
  * `Source.getBatch` returning a DataFrame) — the window read IS a batch
  * DataFrame over committed files, re-tagged streaming at the RDD
  * boundary exactly as Spark's own file source does. Retention caveat as
  * in [[TxnTable.changesStream]]: vacuuming past an inactive stream's
  * cursor surfaces as a typed [[TxnTable.RetentionError]] on restart.
  */
final class GraftStreamSource(spark: SparkSession, tableDir: String,
                              maxVersionsPerTrigger: Option[Long] = None,
                              startingVersion: Option[Long] = None)
    extends Source with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  import GraftStreamSource.VersionOffset

  override val schema: StructType = GraftStreamSource.feedSchema(spark, tableDir)

  /** Rate-limit cursor: the newest version this source has HANDED OUT
    * in a batch. Seeded on restart by the engine's recovery `getBatch`
    * call (the V1 contract replays the restored window before asking
    * for new offsets), so a capped source never re-offers versions a
    * checkpoint already covers. Volatile only for the engine's
    * thread-hop; there is one caller at a time. */
  @volatile private var handedOut: Option[Long] = None

  /** ADMISSION CONTROL (the Delta maxFilesPerTrigger analogue): an
    * uncapped source offers the HEAD version, so a restarted stream
    * facing a large commit backlog gets one giant catch-up batch — at
    * scale that means replaying days of commits in a single
    * micro-batch. With `maxVersionsPerTrigger = n`, each trigger
    * admits at most n commit windows; the engine drains the backlog in
    * bounded batches and each checkpoint covers bounded work. */
  /** Rate-limit floor: with `startingVersion = sv` the cursor starts at
    * sv-1, NOT -1 — otherwise a cap smaller than sv makes the first offer
    * land BELOW sv, that empty batch checkpoints its end offset, and every
    * later window feeds `changes(startV, …)` with versions the consumer
    * declared it already holds (duplicate CDC rows under fresh batchIds,
    * which sink-side txnId dedup cannot catch). Both the offer floor here
    * and the window clamp in [[getBatch]] are needed: the floor keeps
    * offers from starting below sv, the clamp protects replayed
    * checkpoints written before a startingVersion change. */
  private def cursorFloor: Long = startingVersion.map(_ - 1L).getOrElse(-1L)

  override def getOffset: Option[Offset] =
    TxnTable.latestVersion(tableDir).map { head =>
      VersionOffset(maxVersionsPerTrigger match {
        case Some(n) => math.min(head, handedOut.getOrElse(cursorFloor) + n)
        case None    => head
      })
    }

  // ---- Trigger.AvailableNow (round 15) — the bounded full-drain run
  // batch backfills want ("process today's backlog in capped batches,
  // then STOP"). The Delta-source shape: a V1 Source that also
  // implements SupportsAdmissionControl + SupportsTriggerAvailableNow,
  // so the engine drives offset discovery through latestOffset() with
  // a drain bound captured ONCE at run start — the run terminates at
  // that head even while writers keep committing, and each batch still
  // honors maxVersionsPerTrigger. Without these interfaces Spark 4
  // degrades AvailableNow to single-batch Trigger.Once semantics (one
  // giant uncapped catch-up batch) with a warning.

  /** The drain bound: the table head when the AvailableNow run started
    * (None outside AvailableNow runs; -1 = empty table, drain nothing).
    * Offers are clamped to it, so `latestOffset == start` — the
    * engine's stop condition — is reached in finitely many batches. */
  @volatile private var availableNowBound: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowBound = Some(TxnTable.latestVersion(tableDir).getOrElse(-1L))

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** Offset discovery for admission-controlled runs: same offer logic
    * as [[getOffset]], additionally clamped to the AvailableNow bound.
    * `startOffset` (the engine's restored cursor) seeds the rate-limit
    * cursor exactly as the V1 recovery `getBatch` does — whichever the
    * engine calls first. The passed ReadLimit is unused by design: the
    * graft admission unit is commit VERSIONS (`maxVersionsPerTrigger`),
    * which the standard row/file limits cannot express. */
  override def latestOffset(startOffset: OffsetV2, limit: ReadLimit): OffsetV2 = {
    Option(startOffset).map(VersionOffset.versionOf).foreach(v =>
      handedOut = Some(math.max(handedOut.getOrElse(-1L), v)))
    val head = availableNowBound match {
      case Some(b) => b // fixed drain bound — ignore later commits
      case None    => TxnTable.latestVersion(tableDir).getOrElse(-1L)
    }
    val offer = maxVersionsPerTrigger match {
      case Some(n) => math.min(head, handedOut.getOrElse(cursorFloor) + n)
      case None    => head
    }
    if (offer < 0L) null else VersionOffset(offer)
  }

  /** V2 offset plumbing the admission-control path needs (the V1
    * defaults throw "should not be called"). */
  override def deserializeOffset(json: String): OffsetV2 =
    VersionOffset(json.trim.toLong)
  override def commit(end: OffsetV2): Unit = ()
  override def initialOffset(): OffsetV2 = VersionOffset(cursorFloor)

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    handedOut = Some(math.max(handedOut.getOrElse(-1L), VersionOffset.versionOf(end)))
    val endV = VersionOffset.versionOf(end)
    val feed = start.map(VersionOffset.versionOf).map(v => math.max(v, cursorFloor))
        .filter(_ >= 0L) match { // a pre-v0 cursor IS the bootstrap case
      case Some(startV) if startV >= endV =>
        // replay edge: an empty window re-plans to zero rows
        TxnTable.read(spark, tableDir, Some(endV)).limit(0)
          .withColumn("_change", lit("insert"))
      case Some(startV) =>
        TxnTable.changes(spark, tableDir, startV, endV)
      case None if startingVersion.isDefined =>
        // `startingVersion = n` (the Delta option): NO snapshot
        // bootstrap — the first batch is the CDC window from commit n
        // onward (the destination already holds the snapshot; only
        // the tail of the log is wanted). n=endV+1 (nothing new yet)
        // reads as an empty window.
        val sv = startingVersion.get
        if (sv > endV) TxnTable.read(spark, tableDir, Some(endV)).limit(0)
          .withColumn("_change", lit("insert"))
        else TxnTable.changes(spark, tableDir, sv - 1L, endV)
      case None =>
        // bootstrap: initial snapshot as inserts, plus any windows that
        // landed before the stream's first batch. The v0 read carries
        // the v0-ERA schema; changes() and the declared source schema
        // are aligned to the HEAD schema — so align the snapshot the
        // same way changes() aligns its FROM side (missing columns
        // null-backfill, extras drop, survivors cast to the head type)
        // or an evolved table would trip unionByName at batch 0.
        val boot0 = TxnTable.read(spark, tableDir, Some(0L))
        val base = schema.fields.dropRight(1) // head schema sans _change
        val boot = (
          if (boot0.columns.sameElements(base.map(_.name))) boot0
          else boot0.select(base.map(f =>
            (if (boot0.columns.contains(f.name)) boot0.col(f.name).cast(f.dataType)
             else lit(null).cast(f.dataType)).as(f.name)).toSeq: _*)
        ).withColumn("_change", lit("insert"))
        if (endV == 0L) boot
        else boot.unionByName(TxnTable.changes(spark, tableDir, 0L, endV))
    }
    ColumnBridge.asStreaming(spark, feed)
  }

  override def stop(): Unit = ()
}

object GraftStreamSource {

  /** Feed schema = table schema (at head) + the `_change` tag. */
  private[sources] def feedSchema(spark: SparkSession, tableDir: String): StructType = {
    val v = TxnTable.latestVersion(tableDir)
      .getOrElse(throw new IllegalStateException(s"no commits at $tableDir"))
    val snap = TxnTable.snapshot(tableDir, v)
    val base = TxnTable.effectiveSchema(tableDir, snap)
      .getOrElse(TxnTable.read(spark, tableDir, Some(v)).schema)
    StructType(base.fields :+ StructField("_change", StringType, nullable = false))
  }

  /** Commit-version offset (json = the version number). */
  final case class VersionOffset(version: Long) extends Offset {
    override def json: String = version.toString
  }

  object VersionOffset {
    /** Accepts the V2 supertype: the admission-control path hands back
      * whatever the offset log round-tripped. */
    def versionOf(o: org.apache.spark.sql.connector.read.streaming.Offset): Long =
      o match {
        case VersionOffset(v) => v
        case other            => other.json.trim.toLong // checkpoint round trip
      }
  }
}
