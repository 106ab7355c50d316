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
  *  - token hash = polynomial sum_i code(c_i)*31^(len-i) mod 1000003.
  *    Tokens are short words, so 31^(len-1)*code stays well under 2^63 and
  *    pow(31, k) is integer-exact in a double up to k=10.
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

  /** Whitespace tokenization (the documents table is single-space text). */
  def tokens(c: Column): Column = split(c, " ")

  /** Cross-engine polynomial token hash, mod 1000003. SQL mirror:
    * {{{
    * COALESCE(list_sum(list_transform(generate_series(1, length(t)),
    *   i -> ord(substr(t,i,1)) * CAST(pow(31, length(t)-i) AS BIGINT))), 0)
    *   % 1000003
    * }}}
    */
  def tokenHashMod(t: Column): Column = {
    val raw = aggregate(
      sequence(lit(1), length(t)),
      lit(0L),
      (acc, i) => acc + ascii(t.substr(i, lit(1))).cast("long") *
        pow(lit(31.0), (length(t) - i).cast("double")).cast("long"))
    when(length(t) > 0, raw % HashMod).otherwise(lit(0L))
  }

  /** Hashes of all 3-gram word shingles (empty below 3 tokens). */
  def shingleHashes(toks: Column): Column = {
    val th = transform(toks, t => tokenHashMod(t))
    when(size(toks) >= 3,
      transform(sequence(lit(1), size(toks) - 2),
        i => element_at(th, i) * lit(Pack1) +
             element_at(th, i + 1) * lit(HashMod) +
             element_at(th, i + 2)))
      .otherwise(array().cast("array<bigint>"))
  }

  /** k-th MinHash of a shingle-hash array (null for empty input). */
  def minhash(sh: Column, k: Int): Column =
    array_min(transform(sh,
      x => ((x % MinhashP) * lit(2L * k + 3) + lit(101L * k + 7)) % MinhashP))
}
