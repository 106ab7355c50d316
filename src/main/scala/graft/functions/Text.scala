package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-pipeline kernels: tokenization, cross-engine deterministic hashing,
  * shingling, MinHash and SimHash — the building blocks of the dedup /
  * near-dup / fingerprinting operators a large-scale training-data pipeline
  * needs (builder brief; extends the reference's string vocabulary,
  * ref: etl/transform.py:53-87).
  *
  * Every kernel is a Catalyst-native higher-order-function expression chain
  * (no UDFs): it stays inside whole-stage codegen and — critically for the
  * oracle — has an exact integer-arithmetic SQL mirror that DuckDB computes
  * bit-identically. Hash design notes:
  *
  *  - token hash = polynomial code(c_1)*31^(len-1)+...+code(c_len) mod
  *    1000003, computed in HORNER form with a mod at every step
  *    ((h*31+code) % m), so it cannot overflow int64 at ANY token length —
  *    the weighted-sum form overflowed at 14+ chars, where DuckDB errors
  *    but a JVM double pow saturates (silent divergence).
  *  - 3-gram shingle hash = th1*1000003^2 + th2*1000003 + th3 — a perfect
  *    (collision-free) packing of three mod-1000003 token hashes, max
  *    ~1.00e18 < 2^63.
  *  - MinHash_k = min over shingles of ((sh mod P)*(2k+3) + 101k+7) mod P
  *    with P = 2^31-1: the classic universal-hash family with fixed,
  *    engine-independent coefficients.
  */
object Text {

  val HashMod: Long = 1000003L
  val Pack1: Long = 1000006000009L // 1000003^2
  val MinhashP: Long = 2147483647L // 2^31 - 1

  /** Evaluate an array expression ONCE and hand it to `f` as a lambda-bound
    * variable. Catalyst's interpreted higher-order functions re-evaluate
    * their array argument on EVERY reference (an `element_at(arr, i)` inside
    * a transform recomputes the whole `arr` subtree per element — measured
    * as an O(n^2) blowup in these kernels), so any array used more than once
    * inside a lambda must be bound through this single-element transform.
    */
  def bound(arr: Column)(f: Column => Column): Column =
    element_at(transform(array(arr), a => f(a)), 1)

  /** Whitespace tokenization (the documents table is single-space text). */
  def tokens(c: Column): Column = split(c, " ")

  /** Cross-engine polynomial token hash, mod 1000003 — Horner fold with a
    * per-step mod (overflow-free at any token length). SQL mirror:
    * {{{
    * list_reduce(list_prepend(CAST(0 AS BIGINT),
    *   list_transform(generate_series(1, length(t)),
    *     i -> CAST(ord(substr(t,i,1)) AS BIGINT))),
    *   (a, b) -> (a * 31 + b) % 1000003)
    * }}}
    * (the prepended 0 is the Horner seed, and makes the empty token fold
    * to 0 instead of erroring on an empty list).
    */
  def tokenHashMod(t: Column): Column = {
    val raw = aggregate(
      sequence(lit(1), length(t)),
      lit(0L),
      (acc, i) => (acc * 31L + ascii(t.substr(i, lit(1))).cast("long")) % HashMod)
    when(length(t) > 0, raw).otherwise(lit(0L))
  }

  /** Hashes of all 3-gram word shingles (empty below 3 tokens). The token
    * hashes are lambda-bound so each is computed once, not once per
    * element_at reference. */
  def shingleHashes(toks: Column): Column =
    bound(transform(toks, t => tokenHashMod(t))) { th =>
      when(size(th) >= 3,
        transform(sequence(lit(1), size(th) - 2),
          i => element_at(th, i) * lit(Pack1) +
               element_at(th, i + 1) * lit(HashMod) +
               element_at(th, i + 2)))
        .otherwise(array().cast("array<bigint>"))
    }

  /** All word n-grams as space-joined strings (empty below n tokens).
    * The token array is lambda-bound so the upstream `split` runs once per
    * row, not once per produced n-gram (see [[bound]]). String n-grams keep
    * the DuckDB oracle engine-independent; the corpus-scale variant would
    * key the downstream joins on `xxhash64(gram)` instead of the string to
    * shrink shuffle keys to 8 bytes — an exchange-width optimization, not a
    * semantic change. SQL mirror:
    * {{{
    * list_transform(generate_series(1, len(t) - (n-1)),
    *   i -> list_aggregate(t[i:i+n-1], 'string_agg', ' '))
    * }}}
    */
  def wordNgrams(toks: Column, n: Int): Column =
    bound(toks) { tk =>
      when(size(tk) >= n,
        transform(sequence(lit(1), size(tk) - (n - 1)),
          i => concat_ws(" ", slice(tk, i, lit(n)))))
        .otherwise(array().cast("array<string>"))
    }

  /** Consecutive NON-overlapping n-token chunks (the tail shorter than n is
    * dropped; empty below n tokens). Chunking is the unit for cross-corpus
    * duplicate-text-fraction stats — positions matter, so callers explode
    * WITHOUT distinct. SQL mirror:
    * {{{
    * list_transform(generate_series(1, len(t) // n),
    *   j -> list_aggregate(t[(j-1)*n+1:j*n], 'string_agg', ' '))
    * }}}
    */
  def wordChunks(toks: Column, n: Int): Column =
    bound(toks) { tk =>
      when(size(tk) >= n,
        transform(sequence(lit(1), floor(size(tk) / lit(n)).cast("int")),
          j => concat_ws(" ", slice(tk, (j - 1) * n + 1, lit(n)))))
        .otherwise(array().cast("array<string>"))
    }

  /** k-th MinHash of a shingle-hash array (null for empty input). */
  def minhash(sh: Column, k: Int): Column =
    array_min(transform(sh,
      x => ((x % MinhashP) * lit(2L * k + 3) + lit(101L * k + 7)) % MinhashP))

  /** 20-bit SimHash over an array of feature hashes: for each bit j, sum
    * +-1 over the features' j-th hash bit; the fingerprint sets bit j iff
    * the sum is positive. Near-dup docs share most features, so their
    * fingerprints are within a small Hamming distance — candidate pairs
    * come from bucketing on fingerprint bands, never from an all-pairs
    * join. Feed it SHINGLE hashes for discriminative fingerprints: on a
    * small shared vocabulary, token-level SimHash saturates.
    * SQL mirror per bit j:
    * `CASE WHEN list_sum(list_transform(th, x -> (x // 2^j) % 2 * 2 - 1)) > 0
    *  THEN 2^j ELSE 0 END`.
    */
  def simhash20(th: Column): Column =
    bound(th) { h =>
      (0 until 20).map { j =>
        val bitSum = aggregate(h, lit(0L),
          (acc, x) => acc + (shiftright(x, j) % 2L) * 2L - 1L)
        when(bitSum > 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
    }

  /** One 32-bit half of the 64-bit SimHash (off = 0 for bits 0..31, 32
    * for bits 32..63). Unlike [[simhash20]], bit j's ±1 vote is the sign
    * of the MinHash universal hash h_j(x) = ((x%P)(2j+3) + 101j+7) % P
    * against P/2 rather than a raw fingerprint bit — shingle hashes only
    * populate ~60 bits, and per-bit hashing keeps every one of the 64
    * bits balanced. Two positive halves instead of one packed long: bit
    * 63 would need the sign bit, which the JVM wraps silently and a
    * DuckDB BIGINT sum refuses — halves keep both engines exact.
    * SQL mirror per bit j (global j = off + local j):
    * `CASE WHEN list_sum(list_transform(sh, x ->
    *    CASE WHEN ((x % 2147483647) * (2j+3) + (101j+7)) % 2147483647
    *         >= 1073741824 THEN 1 ELSE -1 END)) > 0
    *  THEN 2^(j-off) ELSE 0 END`.
    */
  def simhash64Half(sh: Column, off: Int): Column =
    (0 until 32).map { jj =>
      val j = off + jj
      val vote = aggregate(sh, lit(0L), (acc, x) =>
        acc + when(((x % MinhashP) * lit(2L * j + 3) + lit(101L * j + 7)) % MinhashP
          >= lit(1073741824L), lit(1L)).otherwise(lit(-1L)))
      when(vote > 0, lit(1L << jj)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Minimum rolling 8-char window hash of a string — a winnowing-style
    * content fingerprint (robust to edits outside the minimizing window).
    * Null-safe: strings shorter than 8 chars hash their full length via
    * [[tokenHashMod]] directly.
    *
    * Implementation: one char-code array per string, then each window is an
    * UNROLLED 8-term dot with 31^k literal weights — O(8L) flat element_at
    * lookups instead of O(8L) nested substr+aggregate trees (higher-order
    * functions are interpreted, not codegen'd, so constant factors in the
    * per-window expression dominate this kernel's cost).
    */
  def rollingMinHash8(c: Column): Column = {
    val codes = transform(sequence(lit(1), length(c)),
      i => ascii(c.substr(i, lit(1))).cast("long"))
    val minWin = bound(codes) { cs =>
      array_min(transform(sequence(lit(1), size(cs) - 7), i =>
        (0 to 7).map(k => element_at(cs, i + k) * lit(pow31(7 - k)))
          .reduce(_ + _) % HashMod))
    }
    when(length(c) >= 8, minWin).otherwise(tokenHashMod(c))
  }

  private def pow31(k: Int): Long = (0 until k).foldLeft(1L)((a, _) => a * 31L)
}
