package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native (JIT-compiled) kernels for the hot text-fingerprint expressions.
  *
  * The declarative versions in [[Text]] are the SPECIFICATION — they mirror
  * the DuckDB oracle SQL term by term — but Catalyst evaluates higher-order
  * functions interpretively (one expression-tree walk per array element), so
  * a ~550-window rolling hash costs thousands of tree walks per row. These
  * kernels compute the identical values in tight JVM loops and plug into
  * whole-stage codegen as single static calls: the generated code stays a
  * one-liner and the JIT compiles the loop. EngineProps property-checks
  * native == declarative on random inputs.
  *
  * Exactness note (token hash): Horner form with a mod at EVERY step —
  * `h = (h*31 + code) % 1000003` — so no intermediate ever exceeds
  * 31*1000002 + 0x10FFFF (~3.2e7) regardless of token length. The earlier
  * weighted-sum form (`code * CAST(pow(31, k) AS BIGINT)`) overflowed
  * int64 at k=13, where DuckDB raises a conversion error but the JVM's
  * double pow saturates — a silent cross-engine divergence for 14+-char
  * tokens. The SQL mirror is the identical Horner fold via list_reduce.
  * The FIXED 8-char rolling window keeps its weighted-sum form (31^7 is
  * integer-exact in a double and the window sum is < 2.5e17 — safe).
  */
object TextKernels {

  private val HashMod = 1000003L

  /** Null-element guard for the array kernels. checkInputDataTypes
    * compares catalogString (the public nullability-INSENSITIVE type
    * check — ExpectsInputTypes is private[sql]), so an array<bigint>
    * column with containsNull=true (any parquet-read array) passes
    * analysis; a null SLOT would then read as garbage via getLong. This
    * turns that into a readable per-row error instead. One bitmap probe
    * per element — negligible next to the arithmetic it guards.
    */
  @inline private[functions] def requireSlot(arr: ArrayData, i: Int, fn: String): Unit =
    if (arr.isNullAt(i))
      throw new IllegalArgumentException(
        s"$fn: null array element at index $i — drop or coalesce null elements first")

  private def pow31(k: Int): Long = Math.pow(31.0, k.toDouble).toLong

  /** Codepoint-polynomial token hash mod 1000003 (Text.tokenHashMod):
    * Horner with per-step mod — overflow-free at any token length. */
  def tokenHash(s: String): Long = {
    var h = 0L
    var idx = 0
    while (idx < s.length) {
      val cp = s.codePointAt(idx)
      idx += Character.charCount(cp)
      h = (h * 31L + cp) % HashMod
    }
    h
  }

  /** UTF8String entry point for [[tokenHash]] (single-token hash). */
  def tokenHashU(s: UTF8String): Long = tokenHash(s.toString)

  /** All 3-gram shingle hashes of a single-space-tokenized string
    * (Text.shingleHashes over Text.tokens). */
  def shingleHashes(s: UTF8String): ArrayData = {
    val toks = s.toString.split(" ", -1)
    if (toks.length < 3) return new GenericArrayData(Array.empty[Long])
    val th = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) { th(i) = tokenHash(toks(i)); i += 1 }
    val out = new Array[Long](toks.length - 2)
    i = 0
    while (i < out.length) {
      out(i) = th(i) * 1000006000009L + th(i + 1) * 1000003L + th(i + 2)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Byte offsets of the single-space token separators of a UTF-8
    * string: starts(t) / ends(t) bound token t, tokens = split(' ', -1).
    * 0x20 never occurs inside a multi-byte UTF-8 sequence, so a byte
    * scan finds exactly the split positions. */
  @inline private def tokenBounds(b: Array[Byte]): (Array[Int], Array[Int]) = {
    var spaces = 0
    var p = 0
    while (p < b.length) { if (b(p) == 0x20) spaces += 1; p += 1 }
    val starts = new Array[Int](spaces + 1)
    val ends = new Array[Int](spaces + 1)
    var t = 0
    starts(0) = 0
    p = 0
    while (p < b.length) {
      if (b(p) == 0x20) { ends(t) = p; t += 1; starts(t) = p + 1 }
      p += 1
    }
    ends(t) = b.length
    (starts, ends)
  }

  /** All word n-grams as space-joined strings (Text.wordNgrams over
    * Text.tokens). r16: because tokens are the single-space split, the
    * n-gram "join with ' '" is the CONTIGUOUS BYTE SPAN from token i's
    * start to token i+n−1's end — each output is a zero-copy slice of
    * the input's UTF-8 buffer (no UTF-16 round trip, no StringBuilder,
    * no re-encode). Value-identical to the assembly form; EngineProps
    * pins native == declarative. */
  def wordNgrams(s: UTF8String, n: Int): ArrayData = {
    val b = s.getBytes
    val (starts, ends) = tokenBounds(b)
    val nt = starts.length
    if (nt < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](nt - n + 1)
    var i = 0
    while (i < out.length) {
      out(i) = UTF8String.fromBytes(b, starts(i), ends(i + n - 1) - starts(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Consecutive non-overlapping n-token chunks, tail dropped
    * (Text.wordChunks over Text.tokens) — same byte-span slicing as
    * [[wordNgrams]]. */
  def wordChunks(s: UTF8String, n: Int): ArrayData = {
    val b = s.getBytes
    val (starts, ends) = tokenBounds(b)
    val m = starts.length / n
    if (m == 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    var c = 0
    while (c < m) {
      out(c) = UTF8String.fromBytes(b, starts(c * n), ends(c * n + n - 1) - starts(c * n))
      c += 1
    }
    new GenericArrayData(out)
  }

  /** All 8 MinHash minima in one pass over a shingle-hash array — value-
    * identical to Text.minhash(sh, k) for k = 0..7 (same universal hash
    * family ((x%P)*(2k+3) + 101k+7) % P), but one array walk instead of 8
    * interpreted HOF walks. EMPTY array for empty input (total function —
    * codegen cannot express a value-level null; callers that need
    * array_min's null-on-empty should filter `size(sh) > 0` first).
    */
  def minhash8(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Long])
    val P = 2147483647L
    val out = Array.fill(8)(Long.MaxValue)
    var i = 0
    while (i < n) {
      requireSlot(arr, i, "graft_minhash8")
      val m = arr.getLong(i) % P
      var k = 0
      while (k < 8) {
        val v = (m * (2 * k + 3) + (101 * k + 7)) % P
        if (v < out(k)) out(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash over a hash array, returned as two 32-bit halves
    * [lo, hi] (each in [0, 2^32)). Bit j (0..63) of the conceptual 64-bit
    * fingerprint is the sign of Σ_x (2·[h_j(x) ≥ 2^30] − 1) with
    * h_j(x) = ((x % P)·(2j+3) + 101j+7) % P, P = 2^31−1 — the same
    * universal family as MinHash used as the per-(feature, bit) random
    * sign (Charikar's hyperplane construction with per-bit hashes instead
    * of fingerprint bits, so the width is arbitrary and every bit is
    * balanced). Returned as two positive halves rather than one packed
    * long because bit 63 would need the sign bit: the JVM would wrap
    * silently, DuckDB's BIGINT sum errors on overflow — split halves keep
    * the construction exactly representable in BOTH engines.
    *
    * 20-bit [[simhash20]] saturates at ~10^5 docs (measured in ScaleBench:
    * 6.4M birthday-collision pairs at 2M docs); this is the corpus-scale
    * replacement. Empty input → [0, 0].
    */
  def simhash64(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val P = 2147483647L
    val half = 1073741824L // (P + 1) / 2
    val sums = new Array[Int](64)
    var i = 0
    while (i < n) {
      requireSlot(arr, i, "graft_simhash64")
      val m = arr.getLong(i) % P // shingle hashes are non-negative (< ~1.0e18)
      var j = 0
      while (j < 64) {
        val h = (m * (2 * j + 3) + (101 * j + 7)) % P
        if (h >= half) sums(j) += 1 else sums(j) -= 1
        j += 1
      }
      i += 1
    }
    var lo = 0L
    var hi = 0L
    var j = 0
    while (j < 32) {
      if (sums(j) > 0) lo |= 1L << j
      if (sums(32 + j) > 0) hi |= 1L << j
      j += 1
    }
    new GenericArrayData(Array(lo, hi))
  }

  def simhash20(arr: ArrayData): Long = {
    val n = arr.numElements()
    var res = 0L
    var j = 0
    while (j < 20) {
      var sum = 0L
      var i = 0
      while (i < n) {
        requireSlot(arr, i, "graft_simhash20")
        sum += ((arr.getLong(i) >> j) & 1L) * 2L - 1L
        i += 1
      }
      if (sum > 0) res |= 1L << j
      j += 1
    }
    res
  }

  /** Self + every single-codepoint-deletion variant, first-occurrence
    * deduped — the FastSS/SymSpell neighborhood (q80). Value-identical to
    * array_distinct(concat(array(s), transform(sequence(1, length(s)),
    * i -> concat(substr(s, 1, i-1), substr(s, i+1, length(s)))))):
    * positions are codepoint-based (substr's semantics), dedup keeps
    * first occurrences (array_distinct's semantics). One tokenize-free
    * loop replaces an interpreted transform/sequence/substr/concat chain
    * re-walked per variant. */
  def deletionVariants(s: UTF8String): ArrayData = {
    val str = s.toString
    val n = str.codePointCount(0, str.length)
    val seen = new java.util.LinkedHashSet[String]()
    seen.add(str)
    var i = 0
    var idx = 0
    while (i < n) {
      val next = str.offsetByCodePoints(idx, 1)
      seen.add(str.substring(0, idx) + str.substring(next))
      idx = next
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  /** |a ∩ b| of two ascending-sorted DISTINCT string arrays — exactly
    * size(array_intersect(a, b)) for such inputs, without materializing
    * the intersection array or hashing every element: one merge walk of
    * binary comparisons (sort_array's string order IS UTF8String binary
    * order). Callers own the sorted+distinct precondition (collect_set ∘
    * sort_array); EngineProps pins value equality on that domain. */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      requireSlot(a, i, "graft_sorted_intersect_count")
      requireSlot(b, j, "graft_sorted_intersect_count")
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  /** Minimum rolling 8-char window hash (Text.rollingMinHash8). */
  def rollingMinHash8(s: UTF8String): Long = {
    val str = s.toString
    val n = str.codePointCount(0, str.length)
    val codes = new Array[Long](n)
    var idx = 0
    var i = 0
    while (i < n) {
      val cp = str.codePointAt(idx)
      idx += Character.charCount(cp)
      codes(i) = cp
      i += 1
    }
    if (n < 8) return tokenHash(str)
    var min = Long.MaxValue
    i = 0
    while (i <= n - 8) {
      var sum = 0L
      var k = 0
      while (k < 8) { sum += codes(i + k) * pow31(7 - k); k += 1 }
      val h = sum % HashMod
      if (h < min) min = h
      i += 1
    }
    min
  }
}

/** Native vector kernels (the hot loops of the similarity queries — a
  * 64-term interpreted zip_with dot per candidate pair dominates the
  * LSH-blocked near-dup join otherwise).
  */
object VecKernels {

  /** Exact integer dot product of two BIGINT arrays (Exact.dotMicro over
    * pre-quantized vectors). */
  def dotLong(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    var sum = 0L
    var i = 0
    while (i < n) {
      TextKernels.requireSlot(a, i, "graft_dot_long")
      TextKernels.requireSlot(b, i, "graft_dot_long")
      sum += a.getLong(i) * b.getLong(i)
      i += 1
    }
    sum
  }

  /** Asymmetric-distance (ADC) lookup-sum: Σ_m table[m·k + codes[m]] —
    * the product-quantization scoring kernel. One generated loop of M
    * primitive array reads per candidate, replacing an M-deep
    * element_at chain whose per-lookup ArrayData indirection costs more
    * than the exact dot it was meant to avoid (measured: the chain form
    * LOST to brute force at dims=128; this kernel is what makes PQ's
    * 8x FLOP cut show up as wall clock). `table` is the query's dense
    * positional distance table (slot = m·k + code, 0-based). */
  def adcSum(codes: ArrayData, table: ArrayData, k: Int): Long = {
    val m = codes.numElements()
    var sum = 0L
    var i = 0
    while (i < m) {
      TextKernels.requireSlot(codes, i, "graft_adc_sum")
      val slot = i * k + codes.getLong(i).toInt
      TextKernels.requireSlot(table, slot, "graft_adc_sum")
      sum += table.getLong(slot)
      i += 1
    }
    sum
  }

  /** Quantize a FLOAT vector to integer micro-units (Exact.micro per
    * element). HALF_UP (away from zero), matching Spark's and DuckDB's
    * round() — NOT Math.round, which rounds half toward +infinity.
    */
  def microQuantize(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      TextKernels.requireSlot(a, i, "graft_micro_quantize")
      val v = a.getFloat(i).toDouble * 1000000.0
      out(i) = (if (v >= 0) Math.floor(v + 0.5) else Math.ceil(v - 0.5)).toLong
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Base for one-liner native expressions: nullSafeEval + a single static
  * codegen call, so the expression participates in whole-stage codegen.
  */
abstract class NativeUnaryExpression extends UnaryExpression {
  /** Fully-qualified static call template, e.g. "graft...kernel(%s)". */
  protected def staticCall: String

  /** Analysis-time input contract. SQL-path misuse (e.g.
    * graft_minhash8('x')) must fail in the analyzer with a readable
    * message, not mid-job as a codegen ClassCastException — the same
    * failure mode fixed for graft_countmin_longs in round 4.
    * (ExpectsInputTypes and DataType.sameType are private[sql]; catalogString
    * comparison is the public nullability-insensitive equivalent.)
    */
  protected def expectedInputType: DataType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.catalogString == expectedInputType.catalogString)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ${expectedInputType.catalogString}, got ${child.dataType.catalogString}")

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => staticCall.format(c))
}

case class ShingleHashesExpr(child: Expression) extends NativeUnaryExpression {
  override protected def expectedInputType: DataType = StringType
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def staticCall: String =
    "graft.functions.TextKernels.shingleHashes(%s)"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.shingleHashes(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
}

case class MinHash8Expr(child: Expression) extends NativeUnaryExpression {
  override protected def expectedInputType: DataType = ArrayType(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def staticCall: String =
    "graft.functions.TextKernels.minhash8(%s)"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.minhash8(input.asInstanceOf[ArrayData])
  override protected def withNewChildInternal(newChild: Expression): MinHash8Expr =
    copy(child = newChild)
}

case class SimHash20Expr(child: Expression) extends NativeUnaryExpression {
  override protected def expectedInputType: DataType = ArrayType(LongType)
  override def dataType: DataType = LongType
  override protected def staticCall: String =
    "graft.functions.TextKernels.simhash20(%s)"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.simhash20(input.asInstanceOf[ArrayData])
  override protected def withNewChildInternal(newChild: Expression): SimHash20Expr =
    copy(child = newChild)
}

case class SimHash64Expr(child: Expression) extends NativeUnaryExpression {
  override protected def expectedInputType: DataType = ArrayType(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def staticCall: String =
    "graft.functions.TextKernels.simhash64(%s)"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.simhash64(input.asInstanceOf[ArrayData])
  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

case class RollingMinHash8Expr(child: Expression) extends NativeUnaryExpression {
  override protected def expectedInputType: DataType = StringType
  override def dataType: DataType = LongType
  override protected def staticCall: String =
    "graft.functions.TextKernels.rollingMinHash8(%s)"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.rollingMinHash8(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): RollingMinHash8Expr =
    copy(child = newChild)
}

case class TokenHashExpr(child: Expression) extends NativeUnaryExpression {
  override protected def expectedInputType: DataType = StringType
  override def dataType: DataType = LongType
  override protected def staticCall: String =
    "graft.functions.TextKernels.tokenHashU(%s)"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.tokenHashU(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): TokenHashExpr =
    copy(child = newChild)
}

case class WordNgramsExpr(child: Expression, n: Int) extends NativeUnaryExpression {
  require(n > 0, s"graft_word_ngrams: n must be positive, got $n")
  override protected def expectedInputType: DataType = StringType
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def staticCall: String =
    s"graft.functions.TextKernels.wordNgrams(%s, $n)"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.wordNgrams(input.asInstanceOf[UTF8String], n)
  override protected def withNewChildInternal(newChild: Expression): WordNgramsExpr =
    copy(child = newChild)
}

case class WordChunksExpr(child: Expression, n: Int) extends NativeUnaryExpression {
  require(n > 0, s"graft_word_chunks: n must be positive, got $n")
  override protected def expectedInputType: DataType = StringType
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def staticCall: String =
    s"graft.functions.TextKernels.wordChunks(%s, $n)"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.wordChunks(input.asInstanceOf[UTF8String], n)
  override protected def withNewChildInternal(newChild: Expression): WordChunksExpr =
    copy(child = newChild)
}

/** Pair/graph kernels: native generation of the co-occurrence pair set
  * from a per-basket sorted item array. The declarative form — an
  * interpreted `flatten(transform(ps, (x,i) -> transform(slice(...))))`
  * HOF chain — re-walks the expression tree per element and allocates a
  * nested array per prefix (the exact non-codegen overhead the r15
  * verdict flagged in the q106/q126/q121 hot path); this emits the same
  * i<j pairs in one tight loop as a single static codegen call.
  */
object PairKernels {
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

  /** All ordered pairs (a[i], a[j]), i < j, of a sorted BIGINT array —
    * value-identical to the sorted-set pair explode (x before y in the
    * sorted array ⟺ p1 < p2, each unordered pair exactly once). Empty
    * for size < 2. Fan-out is C(n,2): callers bound n (basket size). */
  def sortedPairs(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val vals = new Array[Long](n)
    var i = 0
    while (i < n) {
      TextKernels.requireSlot(arr, i, "graft_sorted_pairs")
      vals(i) = arr.getLong(i)
      i += 1
    }
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        out(k) = new GenericInternalRow(Array[Any](vals(i), vals(j)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Product-quantization codebook held as flat primitive arrays, shipped
  * to tasks once per plan (codegen reference object, like the q204 query
  * table) — the nearest-sub-centroid argmin then runs map-side with no
  * ×codes row fan-out, no broadcast join and no per-(vec,m) aggregation
  * exchange. Entries are grouped by sub-space m and sorted by code.
  *
  * Equivalence to the declarative assignSub (min over codes of
  * struct(l2, code) with l2 = snsq + cnorm − 2·dot): snsq is constant
  * across a row's candidate codes, so argmin over (cnorm − 2·dot, code)
  * picks the identical code, ties included (ascending code order +
  * strict improvement ⟹ smallest code wins a tie).
  */
final class PqCodebook(val subDim: Int, val mOff: Array[Int],
                       val codes: Array[Long], val cnorms: Array[Long],
                       val cvecs: Array[Long]) extends Serializable {
  def argmin(m: Int, sv: ArrayData): Long = {
    var best = Long.MaxValue
    var bestCode = 0L
    var e = mOff(m)
    val end = mOff(m + 1)
    while (e < end) {
      var dot = 0L
      var j = 0
      val base = e * subDim
      while (j < subDim) {
        TextKernels.requireSlot(sv, j, "graft_pq_argmin")
        dot += sv.getLong(j) * cvecs(base + j)
        j += 1
      }
      val score = cnorms(e) - 2L * dot
      if (score < best) { best = score; bestCode = codes(e) }
      e += 1
    }
    bestCode
  }
}

/** Morton (Z-order) interleave of the low 31 bits of two non-negative
  * longs: bit i of each input lands at output bits 2i / 2i+1, so sorting
  * by the result clusters rows that are close in BOTH dimensions — the
  * multi-dimensional data-layout key behind `Sinks.zorderedParquet`.
  */
object LayoutKernels {
  def morton2(a: Long, b: Long): Long = {
    val x = a & 0x7fffffffL
    val y = b & 0x7fffffffL
    // spread bits: abcd -> a0b0c0d0 (classic magic-number dilation)
    def spread(v0: Long): Long = {
      var v = v0
      v = (v | (v << 16)) & 0x0000ffff0000ffffL
      v = (v | (v << 8)) & 0x00ff00ff00ff00ffL
      v = (v | (v << 4)) & 0x0f0f0f0f0f0f0f0fL
      v = (v | (v << 2)) & 0x3333333333333333L
      v = (v | (v << 1)) & 0x5555555555555555L
      v
    }
    spread(x) | (spread(y) << 1)
  }
}

case class Morton2Expr(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType.catalogString == LongType.catalogString &&
        right.dataType.catalogString == LongType.catalogString)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint, bigint), got (${left.dataType.catalogString}, ${right.dataType.catalogString})")
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    LayoutKernels.morton2(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.LayoutKernels.morton2($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Morton2Expr =
    copy(left = newLeft, right = newRight)
}

case class DotLongExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType.catalogString == ArrayType(LongType).catalogString &&
        right.dataType.catalogString == ArrayType(LongType).catalogString)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, array<bigint>), got (${left.dataType.catalogString}, ${right.dataType.catalogString})")
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.dotLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VecKernels.dotLong($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotLongExpr =
    copy(left = newLeft, right = newRight)
}

case class AdcSumExpr(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType.catalogString == ArrayType(LongType).catalogString &&
        right.dataType.catalogString == ArrayType(LongType).catalogString)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, array<bigint>), got (${left.dataType.catalogString}, ${right.dataType.catalogString})")
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.adcSum(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VecKernels.adcSum($a, $b, $k)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): AdcSumExpr =
    copy(left = newLeft, right = newRight)
}

case class DeletionVariantsExpr(child: Expression) extends NativeUnaryExpression {
  override protected def expectedInputType: DataType = StringType
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def staticCall: String =
    "graft.functions.TextKernels.deletionVariants(%s)"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.deletionVariants(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): DeletionVariantsExpr =
    copy(child = newChild)
}

case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType.catalogString == ArrayType(StringType).catalogString &&
        right.dataType.catalogString == ArrayType(StringType).catalogString)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, array<string>), got (${left.dataType.catalogString}, ${right.dataType.catalogString})")
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.sortedIntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.TextKernels.sortedIntersectCount($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SortedIntersectCountExpr =
    copy(left = newLeft, right = newRight)
}

case class SortedPairsExpr(child: Expression) extends NativeUnaryExpression {
  override protected def expectedInputType: DataType = ArrayType(LongType)
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("p1", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("p2", LongType, nullable = false))),
    containsNull = false)
  override protected def staticCall: String =
    "graft.functions.PairKernels.sortedPairs(%s)"
  override protected def nullSafeEval(input: Any): Any =
    PairKernels.sortedPairs(input.asInstanceOf[ArrayData])
  override protected def withNewChildInternal(newChild: Expression): SortedPairsExpr =
    copy(child = newChild)
}

case class PqArgminExpr(left: Expression, right: Expression, cb: PqCodebook)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType.catalogString == org.apache.spark.sql.types.IntegerType.catalogString &&
        right.dataType.catalogString == ArrayType(LongType).catalogString)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (int, array<bigint>), got (${left.dataType.catalogString}, ${right.dataType.catalogString})")
  override def dataType: DataType = LongType
  override protected def nullSafeEval(m: Any, sv: Any): Any =
    cb.argmin(m.asInstanceOf[Int], sv.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqcb", cb, classOf[PqCodebook].getName)
    defineCodeGen(ctx, ev, (m, sv) => s"$ref.argmin($m, $sv)")
  }
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqArgminExpr =
    copy(left = newLeft, right = newRight)
}

case class MicroQuantizeExpr(child: Expression) extends NativeUnaryExpression {
  override protected def expectedInputType: DataType = ArrayType(FloatType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def staticCall: String =
    "graft.functions.VecKernels.microQuantize(%s)"
  override protected def nullSafeEval(input: Any): Any =
    VecKernels.microQuantize(input.asInstanceOf[ArrayData])
  override protected def withNewChildInternal(newChild: Expression): MicroQuantizeExpr =
    copy(child = newChild)
}

/** Column-API wrappers for the native expressions — drop-in replacements
  * for the declarative [[Text]] / [[Exact]] kernels in hot paths.
  */
object NativeText {
  private def wrap(e: Expression): Column = ColumnBridge.column(e)
  private def expr(c: Column): Expression = ColumnBridge.expression(c)

  /** Native Text.shingleHashes(Text.tokens(c)) over a text column. */
  def shingleHashesOfText(c: Column): Column = wrap(ShingleHashesExpr(expr(c)))

  def simhash20(arr: Column): Column = wrap(SimHash20Expr(expr(arr)))

  /** 64-bit SimHash as [lo, hi] 32-bit halves — see TextKernels.simhash64. */
  def simhash64(arr: Column): Column = wrap(SimHash64Expr(expr(arr)))

  /** All 8 MinHash minima of a shingle-hash array in ONE pass — replaces
    * 8 interpreted Text.minhash walks in the q33/q34 hot path. */
  def minhash8(arr: Column): Column = wrap(MinHash8Expr(expr(arr)))

  /** Native Text.wordNgrams(Text.tokens(c), n) over a text column. */
  def wordNgrams(c: Column, n: Int): Column = wrap(WordNgramsExpr(expr(c), n))

  /** Native Text.wordChunks(Text.tokens(c), n) over a text column. */
  def wordChunks(c: Column, n: Int): Column = wrap(WordChunksExpr(expr(c), n))

  def rollingMinHash8(c: Column): Column = wrap(RollingMinHash8Expr(expr(c)))

  /** Native exact dot of two BIGINT-array columns (Exact integer space). */
  def dotLong(a: Column, b: Column): Column = wrap(DotLongExpr(expr(a), expr(b)))

  /** Native ADC lookup-sum over a dense positional distance table. */
  def adcSum(codes: Column, table: Column, k: Int): Column =
    wrap(AdcSumExpr(expr(codes), expr(table), k))

  /** Native Exact.micro quantization of a float-vector column. */
  def microQuantize(a: Column): Column = wrap(MicroQuantizeExpr(expr(a)))

  /** Morton (Z-order) interleave of two non-negative BIGINT columns. */
  def morton2(a: Column, b: Column): Column = wrap(Morton2Expr(expr(a), expr(b)))

  /** Native Text.tokenHashMod over a single-token string column. */
  def tokenHashMod(c: Column): Column = wrap(TokenHashExpr(expr(c)))

  /** All i<j pairs of a sorted BIGINT-array column as array<struct<p1,p2>>. */
  def sortedPairs(c: Column): Column = wrap(SortedPairsExpr(expr(c)))

  /** Self + single-deletion variants of a string column (q80 FastSS). */
  def deletionVariants(c: Column): Column = wrap(DeletionVariantsExpr(expr(c)))

  /** |a ∩ b| of two sorted distinct string-array columns (q74 verify). */
  def sortedIntersectCount(a: Column, b: Column): Column =
    wrap(SortedIntersectCountExpr(expr(a), expr(b)))

  /** Map-side PQ nearest-sub-centroid code for (m: int, sv: array<bigint>). */
  def pqArgmin(m: Column, sv: Column, cb: PqCodebook): Column =
    wrap(PqArgminExpr(expr(m), expr(sv), cb))
}
