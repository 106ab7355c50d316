package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}
import graft.functions.NativeText
import graft.operators.SimHashBands

/** Streaming twin of q86's incremental dedup: documents ARRIVE as a
  * stream and are deduped against the persisted corpus fingerprint index
  * (the 24-byte/doc parquet q86 builds) — the ingest-time form of the
  * daily-shard batch job. The reference is batch-only (SURVEY §2.8), so
  * like EventStream this is engine-native scope.
  *
  * Two forms, matching Structured Streaming's state model:
  *  - [[candidatePairs]] — fully STATELESS stream-static inner equi-join
  *    on (band, bval) + Hamming verify: append-mode, no watermark, no
  *    state store; a pair surfaces once per colliding band (at-least-once
  *    per pair), the price of statelessness. The shape that survives any
  *    input rate.
  *  - [[dedupShards]] — exact per-shard form via foreachBatch: each
  *    micro-batch is one "arriving shard" deduped with the SAME
  *    banded+distinct+verified construction as batch q86 (exactly-once
  *    pair emission within a shard under checkpoint recovery, because
  *    foreachBatch replays are keyed by batchId).
  *
  * Scale notes: the static index side is a plain parquet-backed frame —
  * at deployment it is band-partitioned/bucketed (the q81 layout) so the
  * per-micro-batch join broadcast-prunes to the shard's band values;
  * cross-shard duplicates (doc in shard N vs doc in shard M) are caught
  * once the sink appends each shard's fingerprints to the index between
  * micro-batches — the same contract as the batch daily-ingest loop.
  */
object DedupStream {

  final case class Doc(doc_id: Long, text: String)

  /** simhash64 fingerprints (doc_id, lo, hi) of a (doc_id, text) frame.
    * Pure codegen expressions — valid on batch AND streaming frames.
    */
  def fingerprints(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"),
      NativeText.simhash64(NativeText.shingleHashesOfText(col("text"))).as("fp"))
    .select(col("doc_id"),
      element_at(col("fp"), 1).as("lo"), element_at(col("fp"), 2).as("hi"))

  /** Stateless near-dup screen: arriving docs against a static banded
    * index (from [[SimHashBands.bandsOf]] over the persisted
    * fingerprints). Emits (i = stream doc, j = corpus doc, hamming) —
    * possibly once PER COLLIDING BAND (no distinct: deduplication is a
    * streaming aggregation and would need state; consumers needing
    * exactly-once pairs use [[dedupShards]]).
    */
  def candidatePairs(docsStream: DataFrame, indexBands: DataFrame,
                     bandBits: Int): DataFrame = {
    val stream = SimHashBands.bandsOf(fingerprints(docsStream), bandBits)
    val idx = indexBands.select(
      col("doc_id").as("corpus_id"), col("lo").as("ilo"), col("hi").as("ihi"),
      col("band").as("iband"), col("bval").as("ibval"))
    val ham = (bit_count(col("lo").bitwiseXOR(col("ilo"))) +
      bit_count(col("hi").bitwiseXOR(col("ihi")))).cast("long")
    stream.join(idx,
        col("band") === col("iband") && col("bval") === col("ibval"))
      .filter(ham <= 3L)
      .select(col("doc_id").as("i"), col("corpus_id").as("j"), ham.as("hamming"))
  }

  /** Exact per-shard dedup: each micro-batch runs batch q86's cross
    * construction against the static `index` (doc_id, lo, hi) and hands
    * the verified pair frame to `onShard` with its shard id.
    */
  def dedupShards(docsStream: DataFrame, index: DataFrame, bandBits: Int,
                  checkpoint: String)
                 (onShard: (DataFrame, Long) => Unit): StreamingQuery = {
    val indexBands = SimHashBands.bandsOf(index, bandBits)
    docsStream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (shard: DataFrame, shardId: Long) =>
        val shardBands = SimHashBands.bandsOf(fingerprints(shard), bandBits)
        onShard(SimHashBands.verifiedPairs(shardBands, indexBands, lit(true)), shardId)
      }
      .start()
  }
}
