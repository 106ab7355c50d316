package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared band-join machinery for the 64-bit SimHash near-dup family
  * (q82 declared query, q86 incremental dedup, ScaleBench's 2M-doc run —
  * ONE code path, so the scale measurements certify the same code the
  * correctness oracle checks).
  *
  * Fingerprints are the two 32-bit halves [lo, hi] of
  * TextKernels.simhash64. Candidates come from equality on banded slices
  * of the halves; the Hamming-radius-3 verify runs on candidates only.
  * Pigeonhole recall guarantee at radius 3 for BOTH supported widths:
  *  - 8-bit bands → 8 bands, ≤3 dirty → ≥5 clean bands;
  *  - 16-bit bands → 4 bands, ≤3 dirty → ≥1 clean band.
  * So banding loses NO recall at Hamming ≤ 3 either way, and the brute
  *-force oracle stays valid for any width this module emits.
  *
  * Band WIDTH is the corpus-size knob (measured in ScaleBench round 4/5:
  * 8-bit buckets hold ~n/256 docs, so the candidate join goes superlinear
  * past ~10^4 docs; 16-bit buckets hold n/65536 — ~30 docs at 2M).
  * [[bandBitsFor]] picks it from the corpus count so call sites stop
  * hand-tuning per scale. Beyond ~4M docs even 16-bit buckets fatten
  * (n/65536 > 64); the next step is a WIDER fingerprint (128-bit, ≥5
  * bands of 25+ bits keeps the radius-3 pigeonhole), not wider bands of a
  * 64-bit print — 2×32 banding could only guarantee radius 1.
  */
object SimHashBands {

  /** Smallest supported band width whose expected bucket fan-in
    * (n / 2^bits) stays ≤ ~64 docs: 8-bit up to 16384 docs, 16-bit
    * beyond. Deterministic in n, so the oracle needs no mirror — banding
    * affects only the candidate set, never the verified result.
    */
  def bandBitsFor(n: Long): Int = if (n <= 16384L) 8 else 16

  /** Explode a fingerprint frame (doc_id, lo, hi) into one row per band:
    * (doc_id, lo, hi, band, bval). The exploded rows carry bare longs —
    * never arrays — so the band exchange stays skinny (the r4 ScaleBench
    * lesson: wide rows through the candidate shuffle measured 3×
    * superlinear at 2M docs).
    */
  def bandsOf(fp: DataFrame, bandBits: Int): DataFrame = {
    require(bandBits == 8 || bandBits == 16,
      s"simhash64 band width must be 8 or 16 bits, got $bandBits")
    val perHalf = 32 / bandBits
    val mask = (1L << bandBits) - 1L
    fp.select(col("doc_id"), col("lo"), col("hi"), explode(array(
      (0 until 2 * perHalf).map { b =>
        val half = if (b < perHalf) col("lo") else col("hi")
        struct(lit(b).as("band"),
          shiftright(half, bandBits * (b % perHalf)).bitwiseAND(lit(mask)).as("bval"))
      }: _*)).as("bk"))
      .select(col("doc_id"), col("lo"), col("hi"),
        col("bk.band").as("band"), col("bk.bval").as("bval"))
  }

  /** Hamming ≤ 3 pairs between two banded frames: equi-join on
    * (band, bval) under `cond` (e.g. a.doc_id < b.doc_id for a self-join;
    * lit(true) for disjoint sides), distinct on the pair (a pair can
    * collide in several bands), then the exact Hamming verify on
    * candidates only. Returns (i, j, hamming) with i from `bandsA`.
    */
  def verifiedPairs(bandsA: DataFrame, bandsB: DataFrame, cond: Column): DataFrame = {
    val cand = bandsA.as("a").join(bandsB.as("b"),
      col("a.band") === col("b.band") && col("a.bval") === col("b.bval") && cond)
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
        col("a.lo").as("lo_i"), col("a.hi").as("hi_i"),
        col("b.lo").as("lo_j"), col("b.hi").as("hi_j"))
      .distinct()
    val ham = (bit_count(col("lo_i").bitwiseXOR(col("lo_j"))) +
      bit_count(col("hi_i").bitwiseXOR(col("hi_j")))).cast("long")
    cand.filter(ham <= 3L)
      .select(col("i"), col("j"), ham.as("hamming"))
  }
}
