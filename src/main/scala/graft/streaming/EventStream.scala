package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface: the streaming twins of the batch
  * event-analytics queries (q42 tumbling agg, q43 sessionization). The
  * reference is batch-only (SURVEY §2.8 — no readStream anywhere), so this
  * is engine-native scope: the same logical aggregations, incrementalized.
  *
  * Scale notes: both operators are keyed-state streaming aggregations —
  * state is partitioned by group key across executors, watermarks bound
  * state size (late data beyond 1h is dropped), and output is append/update
  * incremental. A 100 TB/day event firehose shards by user_id/event_type
  * exactly like the batch shuffle does.
  */
object EventStream {

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
                         user_id: Long, event_type: String, value: Double)

  final case class SessionAgg(user_id: Long, session_id: Long,
                              n_events: Long, start_us: Long, end_us: Long)

  /** Per-user open-session state (public: Catalyst's generated encoder code
    * must be able to reach the constructor/accessors). */
  final case class SessionState(sessionId: Long, nEvents: Long,
                                startUs: Long, lastUs: Long)

  /** q42's streaming twin: hourly tumbling-window revenue/volume per event
    * type with a 1-hour watermark. Money in exact BIGINT cents, same as the
    * batch path (graft.functions.Exact.cents).
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("sum_value_c"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("sum_value_c"))

  /** Streaming twin of exact dedup (q08/q28): drop rows whose `event_id`
    * was already seen within the watermark delay. Key state is evicted once
    * the watermark passes its event time — per-key state is bounded by the
    * delay window, not by stream history, which is what keeps a
    * 100 TB/day deduped ingest feasible. (Plain `dropDuplicates` on a
    * stream would grow state forever.)
    */
  def dedupEvents(events: DataFrame, delay: String = "1 hour"): DataFrame =
    events.withWatermark("ts", delay).dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: each purchase event joined to the same
    * user's view events from the preceding hour (streaming attribution).
    * BOTH sides carry watermarks and the join condition bounds event time
    * on both sides, so Spark can evict join state as the watermark
    * advances — state stays proportional to one interval of traffic, the
    * requirement for an unbounded dual-stream join at ingest scale.
    */
  def purchaseAttribution(purchases: DataFrame, views: DataFrame): DataFrame = {
    val p = purchases.withWatermark("ts", "1 hour").alias("p")
    val v = views.withWatermark("ts", "2 hours").alias("v")
    p.join(v, expr(
        "p.user_id = v.user_id AND v.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts"))
      .select(col("p.event_id").as("purchase_id"), col("p.user_id").as("user_id"),
        col("v.event_id").as("view_id"),
        col("p.ts").as("purchase_ts"), col("v.ts").as("view_ts"))
  }

  /** q143's streaming twin — the last stream-stream primitive: a LEFT
    * OUTER watermark-bounded interval join of purchases to the same
    * user's clicks within the trailing attribution window (default the
    * batch query's 7 days). The output is the full (purchase, candidate
    * click) pair set; last-touch is the downstream max-by reduction,
    * exactly as in batch where the window/aggregate sits above the join.
    *
    * Outer semantics need the watermark: a purchase with NO click in its
    * window can only be emitted (with null click columns) once the
    * click-side watermark has passed the end of its interval — before
    * that, a matching click could still arrive. So null emission is
    * delayed by `delay`, and click state retention is bounded by
    * watermark + `window`: state is one attribution window of traffic
    * per shard, never stream history (StreamingAttributionSpec asserts
    * rows are evicted as the watermark advances). Late clicks beyond
    * `delay` are dropped at the input, the q174 lateness-audit budget —
    * size `delay` from that query's observed disorder.
    */
  def lastTouchPairs(clicks: DataFrame, purchases: DataFrame,
                     window: String = "7 days",
                     delay: String = "1 hour"): DataFrame = {
    val c = clicks
      .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", delay)
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("value"))
      .withWatermark("purchase_ts", delay)
    p.join(c, expr(
        s"click_user = user_id AND " +
          s"click_ts BETWEEN purchase_ts - INTERVAL $window AND purchase_ts"),
        "leftOuter")
      .select(col("purchase_id"), col("user_id"), col("purchase_ts"),
        round(col("value") * 100).cast("long").as("value_c"),
        col("click_id"), col("click_ts"))
  }

  /** Streaming ingest into the transactional table: each micro-batch is
    * one atomic [[graft.sources.TxnTable]] commit whose txnId is the
    * batch id — foreachBatch's at-least-once replay becomes exactly-once
    * (a replayed batch finds its txnId in the log and no-ops), and a
    * crash mid-batch leaves the previous snapshot fully readable.
    * Readers see whole batches or nothing; time travel gives the table
    * a replayable ingest history for free.
    */
  def txnTableSink(df: DataFrame, tableDir: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      graft.sources.TxnTable.append(batch, tableDir,
        txnId = Some(s"batch-$batchId")): Unit
    }

  /** q43's streaming twin: gap-based sessionization via per-user state.
    * A >30-minute silence closes the session; closed sessions are emitted
    * and the open one stays in state. Sessions close on gap EVIDENCE (the
    * next event arriving), not on wall-clock timeouts — deterministic under
    * replay; a deployment wanting idle flushes adds
    * GroupStateTimeout.ProcessingTimeTimeout plus a trigger interval.
    */
  def sessionize(events: Dataset[Event], gapUs: Long = 1800L * 1000000L): Dataset[SessionAgg] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionAgg](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          // full microsecond precision: Timestamp.getTime is millis-only,
          // which would drift from the batch q43 micros arithmetic
          def micros(e: Event): Long = {
            val i = e.ts.toInstant
            i.getEpochSecond * 1000000L + i.getNano / 1000L
          }
          val sorted = rows.toSeq.sortBy(e => (micros(e), e.event_id))
          var closed = List.empty[SessionAgg]
          var cur = state.getOption
          sorted.foreach { e =>
            val us = micros(e)
            cur match {
              case Some(s) if us - s.lastUs <= gapUs =>
                cur = Some(s.copy(nEvents = s.nEvents + 1, lastUs = us))
              case Some(s) =>
                closed ::= SessionAgg(userId, s.sessionId, s.nEvents, s.startUs, s.lastUs)
                cur = Some(SessionState(s.sessionId + 1, 1L, us, us))
              case None =>
                cur = Some(SessionState(1L, 1L, us, us))
            }
          }
          cur.foreach(state.update)
          closed.reverseIterator
      }
  }

  /** Per-user token-bucket state carried across micro-batches (public for
    * the generated encoder). */
  final case class LimiterState(lastSec: Long, tokens: Long,
                                rejected: Long, nEvents: Long)

  final case class LimiterAgg(user_id: Long, n_events: Long, n_rejected: Long)

  /** Streaming twin of the q179 token-bucket rate-limiter audit: the
    * SAME deterministic machine (refill 1 token per elapsed `refillSec`
    * on the arrival clock, truncated; cap `cap`; accept −1 token, else
    * reject) run as `flatMapGroupsWithState` — per-user state is 4 longs
    * regardless of stream length, the online form of the batch fold's
    * packed BIGINT. Emits the cumulative (events, rejected) counters per
    * user each micro-batch (Update mode); StreamingSpec proves the final
    * counters equal q179's batch fold on the same events.
    *
    * Determinism caveat shared with every arrival-ordered operator:
    * within a micro-batch rows sort by (epoch second, event_id) — the
    * batch query's total order — so feeding batches in time order
    * replays the identical machine.
    */
  def rateLimit(events: Dataset[Event], refillSec: Long = 36L,
                cap: Long = 100L): Dataset[LimiterAgg] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LimiterState, LimiterAgg](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[LimiterState]) =>
          def sec(e: Event): Long = e.ts.toInstant.getEpochSecond
          val sorted = rows.toSeq.sortBy(e => (sec(e), e.event_id))
          var st = state.getOption.getOrElse(LimiterState(0L, cap, 0L, 0L))
          sorted.foreach { e =>
            val s = sec(e)
            val tok = math.min(st.tokens + (s - st.lastSec) / refillSec, cap)
            st =
              if (tok >= 1L) LimiterState(s, tok - 1L, st.rejected, st.nEvents + 1L)
              else LimiterState(s, tok, st.rejected + 1L, st.nEvents + 1L)
          }
          state.update(st)
          Iterator.single(LimiterAgg(userId, st.nEvents, st.rejected))
      }
  }

  /** Streaming → JDBC through foreachBatch with REPLAY-SAFE appends — the
    * production pattern for sinks without a streaming commit protocol.
    * Each micro-batch lands tagged with its batchId; before inserting, any
    * rows already carrying that batchId (a previous attempt that crashed
    * after partial insert) are deleted in the same target, making the
    * append idempotent under checkpoint recovery: at-least-once execution
    * + delete-before-insert per batch = effectively exactly-once rows.
    * State/ordering notes at scale: the delete is one indexed statement on
    * the driver; the insert is the ordinary parallel per-partition JDBC
    * append (graft.sources.Sinks.jdbc semantics).
    */
  def jdbcSink(df: DataFrame, url: String, table: String,
               user: String, password: String, driver: String,
               checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val conn = {
          Class.forName(driver)
          java.sql.DriverManager.getConnection(url, user, password)
        }
        try {
          val meta = conn.getMetaData.getTables(null, null, table.toUpperCase, null)
          if (meta.next()) { // table exists -> clear any partial replay
            // column named in upper case so the quoted identifier Spark
            // creates and this unquoted reference resolve to the same name
            val st = conn.prepareStatement(s"DELETE FROM $table WHERE BATCH_ID = ?")
            st.setLong(1, batchId); st.executeUpdate(); st.close()
          }
        } finally conn.close()
        graft.sources.Sinks.jdbc(batch.withColumn("BATCH_ID", lit(batchId)),
          url, table, user, password, driver)
      }
      .start()

  /** Wire a parquet-directory stream source -> hourly agg -> parquet sink.
    * (The deployable shape; tests drive the operators with MemoryStream.)
    */
  def runHourlyPipeline(spark: SparkSession, inDir: String, outDir: String,
                        checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val in = spark.readStream.schema(
      "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE")
      .parquet(inDir)
    hourlyAgg(in).writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .format("parquet")
      .option("path", outDir)
      .start()
  }
}
