package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Batched multi-query top-k scan: ONE pass over the corpus scoring every
  * row against ALL queries at once, with a bounded per-query heap.
  *
  * The pair-join formulation of k-NN (`corpus.crossJoin(broadcast(queries))`
  * → score → top-k) materializes N×Q join rows; Spark's per-row machinery
  * (BNLJ iteration, UnsafeRow projection, aggregate dispatch) costs
  * ~20-25 ns/pair, which FLOORS the scan no matter how cheap the scoring
  * kernel is — measured here, a 16-lookup ADC score and a 128-dim exact
  * dot land within noise of each other because neither is the bottleneck.
  * This aggregate restores the arithmetic as the cost: the query set rides
  * in as ONE broadcast row (array of (qid, table, norm²) structs, decoded
  * once per GROUP into the aggregation buffer — so a grouped aggregation
  * can carry a different query set per group, which is exactly the IVF
  * composition: groupBy(cell) with each cell's own probing queries), each
  * corpus row is loaded once into a primitive scratch buffer, and the Q×M
  * inner loop runs as tight JIT'd code — per-(row,query) cost drops to
  * the few ns of the kernel itself.
  *
  * At 100 TB this is the shape that matters: the corpus is scanned once
  * (never joined), queries are broadcast once (Q×table bytes, megabytes),
  * candidate generation happens map-side as partial aggregation, and only
  * per-partition top-k candidates — k×Q rows per partition, independent of
  * corpus size — cross the wire.
  *
  * Modes:
  *  - `mode="dot"`: `vec` is a micro-quantized BIGINT vector, each query
  *    table is a query vector of the same length; score is the exact
  *    integer dot.
  *  - `mode="adc"`: `vec` is an M-element PQ code array, each query table
  *    is the query's dense ADC distance table (slot = m·subK + code, the
  *    q197/q199 layout); score is the M-lookup ADC sum.
  * Either way the emitted similarity is exact-integer cosine
  * `dot / sqrt(nsq·qnsq)` — bit-identical to `Exact.cosineMicro` and any
  * SQL engine evaluating the same IEEE expression — ranked (cos DESC,
  * id ASC) via an order-preserving long encoding of the double.
  *
  * Merge semantics:
  *  - `exact=true`: merges insert into the capped heap → the EXACT global
  *    top-k per query, deterministic under any partitioning (an element of
  *    the global top-k is necessarily in its partition's top-k).
  *  - `exact=false`: merges CONCATENATE → the union of per-partition
  *    top-k candidates (⊇ the global top-k, same argument). This is the
  *    shortlist generator for ADC + exact re-rank: k can stay small per
  *    partition while the union provides the recall budget, and the final
  *    merge is O(entries) instead of O(entries·log k).
  */
case class MultiQueryTopK(
    id: Expression,
    vec: Expression,
    nsq: Expression,
    qtabs: Expression,
    mode: String,
    k: Int,
    subK: Int,
    exact: Boolean,
    bc: Option[org.apache.spark.broadcast.Broadcast[Array[(Long, Array[Long], Long)]]] = None,
    bcGrouped: Option[org.apache.spark.broadcast.Broadcast[Map[Long, Array[(Long, Array[Long], Long)]]]] = None,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MultiQueryTopK.MQBuf] {

  require(k > 0, "k must be positive")
  require(mode == "dot" || mode == "adc", s"unknown mode: $mode")
  private val isAdc = mode == "adc"

  override def children: Seq[Expression] = Seq(id, vec, nsq, qtabs)
  override def nullable: Boolean = false
  override def dataType: DataType = MultiQueryTopK.outType

  import MultiQueryTopK.{MQBuf, sortableBits}

  // per-row vector scratch (content-independent — safe per task instance)
  @transient private var scratch: Array[Long] = _

  override def createAggregationBuffer(): MQBuf = new MQBuf(null, null, null, null)

  /** Decode the query tables INTO the buffer, once per GROUP (not per
    * task): under a grouped aggregation — the IVF composition, where
    * each cell group carries its OWN query set — different groups see
    * different `qtabs` values through one aggregate instance, so an
    * instance-level cache would silently score a cell against another
    * cell's queries. The buffer is per group by construction; global
    * aggregation (q204) has one group, so the decode count is unchanged
    * there. Tables are update-side only — [[serialize]] skips them (the
    * merge path needs qids/heaps/extras alone). */
  private def initBuf(buf: MQBuf, a: ArrayData): Unit = {
    val n = a.numElements()
    val idx = (0 until n).sortBy(i => a.getStruct(i, 3).getLong(0))
    buf.qids = new Array[Long](n)
    buf.tabs = new Array[Array[Long]](n)
    buf.qnsq = new Array[Double](n)
    var o = 0
    idx.foreach { i =>
      val s = a.getStruct(i, 3)
      buf.qids(o) = s.getLong(0)
      buf.tabs(o) = s.getArray(1).toLongArray()
      buf.qnsq(o) = s.getLong(2).toDouble
      o += 1
    }
    finishBuf(buf, n)
  }

  /** Decode from a BROADCAST table set — the scale-correct transport: a
    * qtabs Literal rides in every task binary as boxed generic rows
    * (measured: a 1.6 MB ADC table cost ~2 s of flat per-run
    * serialization overhead), while a Broadcast ships primitive arrays
    * once per executor and is fetched from the block manager. */
  private def initArr(buf: MQBuf, arr: Array[(Long, Array[Long], Long)]): Unit = {
    val n = arr.length
    val sorted = arr.sortBy(_._1)
    buf.qids = sorted.map(_._1)
    buf.tabs = sorted.map(_._2)
    buf.qnsq = sorted.map(_._3.toDouble)
    finishBuf(buf, n)
  }

  private def finishBuf(buf: MQBuf, n: Int): Unit = {
    buf.sizes = new Array[Int](n)
    buf.heaps = Array.fill(n)(new Array[Long](2 * k))
    buf.extras = if (exact) null else Array.fill(n)(new ArrayBuffer[Long])
    // fast-screen state: per-query 1/sqrt(qnsq) and the current heap-root
    // cos. The per-pair hot path tests `dot · invSn · invSq(q)` against
    // `rootCos(q) − 1e-9` — one multiply-compare instead of the exact
    // sqrt — and only near/above-root candidates pay the EXACT
    // `dot / sqrt(nd·qnsq)` (the emitted value, bit-identical to the
    // declarative plan; the product screen errs by ≤ ~1e-14, far inside
    // the margin, so no true candidate is ever screened out).
    buf.invSq = buf.qnsq.map(x => 1.0 / math.sqrt(x))
    buf.rootCos = Array.fill(n)(Double.NegativeInfinity)
    // ADC mode scores row-blocked / query-outer (see [[flushAdc]]): the
    // per-query tables are used directly, L1-resident per block — no
    // transposed copy needed (the r10 transpose fixed the per-row
    // q-inner random walks but still streamed m Q-long blocks plus a
    // Q-long accumulator per ROW, which became the bottleneck at high
    // Q; the block tiling amortizes table traffic over the block).
  }

  // (e1,i1) ranks strictly ahead of (e2,i2) under (cos DESC, id ASC).
  @inline private def ahead(e1: Long, i1: Long, e2: Long, i2: Long): Boolean =
    e1 > e2 || (e1 == e2 && i1 < i2)

  /** Worst-at-root interleaved [enc,id] heap; returns the new size. */
  private def insert(h: Array[Long], size: Int, e: Long, i: Long): Int = {
    if (size == k) {
      if (!ahead(e, i, h(0), h(1))) return size // O(1) reject
      h(0) = e; h(1) = i
      // sift down
      var p = 0
      while (true) {
        val l = 2 * p + 1; val r = l + 1
        var w = p
        if (l < size && !ahead(h(2 * l), h(2 * l + 1), h(2 * w), h(2 * w + 1))) w = l
        if (r < size && !ahead(h(2 * r), h(2 * r + 1), h(2 * w), h(2 * w + 1))) w = r
        if (w == p) return size
        val ts = h(2 * p); val ti = h(2 * p + 1)
        h(2 * p) = h(2 * w); h(2 * p + 1) = h(2 * w + 1)
        h(2 * w) = ts; h(2 * w + 1) = ti
        p = w
      }
      size
    } else {
      h(2 * size) = e; h(2 * size + 1) = i
      var c = size
      while (c > 0) {
        val p = (c - 1) / 2
        if (!ahead(h(2 * c), h(2 * c + 1), h(2 * p), h(2 * p + 1))) {
          val ts = h(2 * p); val ti = h(2 * p + 1)
          h(2 * p) = h(2 * c); h(2 * p + 1) = h(2 * c + 1)
          h(2 * c) = ts; h(2 * c + 1) = ti
          c = p
        } else c = 0
      }
      size + 1
    }
  }

  override def update(buf: MQBuf, input: InternalRow): MQBuf = {
    if (buf.qids == null) {
      if (bc.isDefined) initArr(buf, bc.get.value)
      else if (bcGrouped.isDefined) {
        // grouped broadcast: the 4th child is the GROUP KEY (a cheap
        // long column); a group with no query set never initializes —
        // its rows are skipped and eval emits nothing
        val g = qtabs.eval(input)
        if (g == null) return buf
        bcGrouped.get.value.get(g.asInstanceOf[Long]) match {
          case Some(a) if a.nonEmpty => initArr(buf, a)
          case _                     => return buf
        }
      } else {
        val tv = qtabs.eval(input)
        if (tv == null) return buf
        initBuf(buf, tv.asInstanceOf[ArrayData])
      }
    } else if (buf.tabs == null) {
      // a buffer that came back from serialize/merge (spilled partial)
      // carries qids/heaps but NOT the update-side tables — serialize
      // skips them by design. Spark's ObjectAggregationIterator today
      // processes a group's input rows before merging spilled partials,
      // so update never sees such a buffer, but that ordering is an
      // implicit invariant of someone else's code: re-derive the tables
      // instead of NPEing if a Spark version ever reorders the fallback.
      val fresh = new MQBuf(null, null, null, null)
      if (bc.isDefined) initArr(fresh, bc.get.value)
      else if (bcGrouped.isDefined) {
        val g = qtabs.eval(input)
        if (g == null) return buf
        bcGrouped.get.value.get(g.asInstanceOf[Long]) match {
          case Some(a) if a.nonEmpty => initArr(fresh, a)
          case _                     => return buf
        }
      } else {
        val tv = qtabs.eval(input)
        if (tv == null) return buf
        initBuf(fresh, tv.asInstanceOf[ArrayData])
      }
      require(java.util.Arrays.equals(fresh.qids, buf.qids),
        "multi_query_topk: re-derived query set differs from the merged buffer's")
      buf.tabs = fresh.tabs; buf.qnsq = fresh.qnsq
      buf.invSq = fresh.invSq
      // screen state from the EXISTING (merged) heaps, not fresh's empty
      // ones — a full heap's root is the exact running threshold
      buf.rootCos = Array.tabulate(buf.qids.length)(q =>
        if (buf.sizes(q) == k)
          java.lang.Double.longBitsToDouble(sortableBits(buf.heaps(q)(0)))
        else Double.NegativeInfinity)
    }
    val vv = vec.eval(input); val nv = nsq.eval(input); val iv = id.eval(input)
    if (vv == null || nv == null || iv == null) return buf
    val va = vv.asInstanceOf[ArrayData]
    val m = va.numElements()
    if (scratch == null || scratch.length < m) scratch = new Array[Long](m)
    var j = 0
    while (j < m) { scratch(j) = va.getLong(j); j += 1 }
    val nd = nv.asInstanceOf[Long].toDouble
    val idL = iv.asInstanceOf[Long]
    val qn = buf.qids.length
    val invSn = 1.0 / math.sqrt(nd) // one sqrt per ROW, not per pair
    if (isAdc) {
      // ROW-BATCHED, QUERY-OUTER tiling: buffer a block of rows' codes,
      // then for each query score the whole block with that query's own
      // table (M·K longs, ~4 KB — L1-resident for the block) before
      // moving to the next. The earlier layouts were memory-bound at
      // high Q: per-row q-inner over Q separate tables streamed Q random
      // walks, and the transposed m-outer variant wrote+read a Q-long
      // accumulator and touched m Q-long blocks of an L3-sized table
      // EVERY row (~15 KB/row at Q=625). Tiling amortizes the Q·4 KB
      // table traffic over the whole block (~2.4 KB/row at block 1024)
      // and needs no accumulator at all.
      if (buf.pend == null) {
        buf.pend = new Array[Int](MultiQueryTopK.adcBlock * m)
        buf.pendNd = new Array[Double](MultiQueryTopK.adcBlock)
        buf.pendInv = new Array[Double](MultiQueryTopK.adcBlock)
        buf.pendId = new Array[Long](MultiQueryTopK.adcBlock)
        buf.pendN = 0
      }
      val base = buf.pendN * m
      var i = 0
      while (i < m) { buf.pend(base + i) = scratch(i).toInt; i += 1 }
      buf.pendNd(buf.pendN) = nd
      buf.pendInv(buf.pendN) = invSn
      buf.pendId(buf.pendN) = idL
      buf.pendN += 1
      if (buf.pendN == MultiQueryTopK.adcBlock) flushAdc(buf, m)
    } else {
      var q = 0
      while (q < qn) {
        val tab = buf.tabs(q)
        var dot = 0L
        var i = 0
        while (i < m) { dot += tab(i) * scratch(i); i += 1 }
        score(buf, q, dot, nd, invSn, idL)
        q += 1
      }
    }
    buf
  }

  /** Score the buffered ADC row block, query-outer / row-inner: each
    * query's table stays L1-resident across the block, the codes stream
    * sequentially from the block buffer. Set-identical to per-row
    * scoring (heap top-k content is insert-order independent). */
  private def flushAdc(buf: MQBuf, m: Int): Unit = {
    val cnt = buf.pendN
    if (cnt == 0) return
    val qn = buf.qids.length
    val codes = buf.pend
    var q = 0
    while (q < qn) {
      val tab = buf.tabs(q)
      var r = 0
      while (r < cnt) {
        val base = r * m
        var dot = 0L
        var i = 0
        while (i < m) { dot += tab(i * subK + codes(base + i)); i += 1 }
        score(buf, q, dot, buf.pendNd(r), buf.pendInv(r), buf.pendId(r))
        r += 1
      }
      q += 1
    }
    buf.pendN = 0
  }

  /** Flush any buffered ADC rows (m recovered from the table length) —
    * must run before the buffer's heaps are read (serialize/merge/eval). */
  private def drain(buf: MQBuf): Unit =
    if (isAdc && buf.pendN > 0 && buf.tabs != null)
      flushAdc(buf, buf.tabs(0).length / subK)

  /** Screened exact-cos heap insert: the cheap product estimate rejects
    * pairs provably below the heap root (k·ln(n) survivors expected);
    * survivors compute the exact emitted cosine. */
  @inline private def score(buf: MQBuf, q: Int, dot: Long, nd: Double,
                            invSn: Double, idL: Long): Unit = {
    if (buf.sizes(q) == k &&
        dot.toDouble * invSn * buf.invSq(q) < buf.rootCos(q) - 1e-9) return
    val cos = dot.toDouble / math.sqrt(nd * buf.qnsq(q))
    if (!cos.isNaN) {
      buf.sizes(q) = insert(buf.heaps(q), buf.sizes(q), sortableBits(cos), idL)
      if (buf.sizes(q) == k)
        buf.rootCos(q) =
          java.lang.Double.longBitsToDouble(sortableBits(buf.heaps(q)(0)))
    }
  }

  override def merge(buf: MQBuf, other: MQBuf): MQBuf = {
    if (other.qids == null) return buf
    if (buf.qids == null) { drain(other); return other }
    drain(buf); drain(other)
    var q = 0
    while (q < buf.qids.length) {
      val oh = other.heaps(q); val on = other.sizes(q)
      if (exact) {
        var i = 0
        while (i < on) {
          buf.sizes(q) = insert(buf.heaps(q), buf.sizes(q), oh(2 * i), oh(2 * i + 1))
          i += 1
        }
      } else {
        val ex = buf.extras(q)
        var i = 0
        while (i < on) { ex += oh(2 * i); ex += oh(2 * i + 1); i += 1 }
        ex ++= other.extras(q)
      }
      q += 1
    }
    buf
  }

  override def eval(buf: MQBuf): Any = {
    if (buf.qids == null) return new GenericArrayData(Array.empty[Any])
    drain(buf)
    val out = new Array[Any](buf.qids.length)
    var q = 0
    while (q < buf.qids.length) {
      val n = buf.sizes(q) + (if (buf.extras == null) 0 else buf.extras(q).length / 2)
      val es = new Array[Long](n); val is = new Array[Long](n)
      var i = 0
      while (i < buf.sizes(q)) {
        es(i) = buf.heaps(q)(2 * i); is(i) = buf.heaps(q)(2 * i + 1); i += 1
      }
      if (buf.extras != null) {
        val ex = buf.extras(q)
        var j = 0
        while (j < ex.length / 2) { es(i) = ex(2 * j); is(i) = ex(2 * j + 1); i += 1; j += 1 }
      }
      val ord = (0 until n).sortWith((a, b) => ahead(es(a), is(a), es(b), is(b)))
      out(q) = InternalRow(buf.qids(q), new GenericArrayData(
        ord.map(x => InternalRow(
          java.lang.Double.longBitsToDouble(sortableBits(es(x))), is(x))).toArray[Any]))
      q += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: MQBuf): Array[Byte] = {
    drain(buf)
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    if (buf.qids == null) out.writeInt(-1)
    else {
      out.writeInt(buf.qids.length)
      var q = 0
      while (q < buf.qids.length) {
        out.writeLong(buf.qids(q))
        out.writeInt(buf.sizes(q))
        var i = 0
        while (i < buf.sizes(q)) {
          out.writeLong(buf.heaps(q)(2 * i)); out.writeLong(buf.heaps(q)(2 * i + 1)); i += 1
        }
        val exn = if (buf.extras == null) 0 else buf.extras(q).length / 2
        out.writeInt(exn)
        var j = 0
        while (j < exn) {
          out.writeLong(buf.extras(q)(2 * j)); out.writeLong(buf.extras(q)(2 * j + 1)); j += 1
        }
        q += 1
      }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MQBuf = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    if (n < 0) return new MQBuf(null, null, null, null)
    val qids = new Array[Long](n)
    val sizes = new Array[Int](n)
    val heaps = new Array[Array[Long]](n)
    val extras = if (exact) null else new Array[ArrayBuffer[Long]](n)
    var q = 0
    while (q < n) {
      qids(q) = in.readLong()
      val hs = in.readInt()
      val h = new Array[Long](math.max(2 * k, 2 * hs))
      var i = 0
      while (i < hs) { h(2 * i) = in.readLong(); h(2 * i + 1) = in.readLong(); i += 1 }
      sizes(q) = hs; heaps(q) = h
      val exn = in.readInt()
      val ex = if (exact) null else new ArrayBuffer[Long](2 * exn)
      var j = 0
      while (j < exn) {
        val e = in.readLong(); val iv = in.readLong()
        if (ex != null) { ex += e; ex += iv }
        j += 1
      }
      if (extras != null) extras(q) = ex
      q += 1
    }
    new MQBuf(qids, heaps, sizes, extras)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MultiQueryTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MultiQueryTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MultiQueryTopK =
    copy(id = newChildren(0), vec = newChildren(1), nsq = newChildren(2), qtabs = newChildren(3))

  override def prettyName: String = "multi_query_topk"
}

object MultiQueryTopK {

  /** Per-query candidate buffer: interleaved [enc,id] worst-at-root heaps
    * plus (union mode only) the concatenated merge overflow. `qids == null`
    * marks the untouched buffer of an empty partition. `tabs`/`qnsq` are
    * the group's decoded query tables — UPDATE-SIDE ONLY (per-group so a
    * grouped aggregation can carry a different query set per group, the
    * IVF composition); serialize/merge never touch them. */
  final class MQBuf(
      var qids: Array[Long],
      var heaps: Array[Array[Long]],
      var sizes: Array[Int],
      var extras: Array[ArrayBuffer[Long]],
      var tabs: Array[Array[Long]] = null,
      var qnsq: Array[Double] = null,
      var invSq: Array[Double] = null,
      var rootCos: Array[Double] = null,
      // ADC row-block buffer (update-side only, drained before any
      // serialize/merge/eval reads the heaps)
      var pend: Array[Int] = null,
      var pendNd: Array[Double] = null,
      var pendInv: Array[Double] = null,
      var pendId: Array[Long] = null,
      var pendN: Int = 0)

  val entryType: StructType = StructType(Seq(
    StructField("cos", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false)))

  val outType: ArrayType = ArrayType(
    StructType(Seq(
      StructField("qid", LongType, nullable = false),
      StructField("tk", ArrayType(entryType, containsNull = false), nullable = false))),
    containsNull = false)

  val qtabType: ArrayType = ArrayType(
    StructType(Seq(
      StructField("qid", LongType, nullable = false),
      StructField("tab", ArrayType(LongType, containsNull = false), nullable = false),
      StructField("qnsq", LongType, nullable = false))),
    containsNull = false)

  /** The query tables travel as a real Spark BROADCAST, never as a
    * per-row column and never as a plan literal. The original
    * `crossJoin(broadcast(oneRowOfTabs))` form materialized (copied) the
    * whole table into EVERY corpus row at the aggregate boundary —
    * measured at 500k×128d, Q × table-bytes per row dominated the scan
    * and exactly inverted the ADC FLOP win. A plan Literal fixes the
    * per-row copy but ships the table in every TASK binary as boxed
    * generic rows (~2 s flat overhead for a 1.6 MB ADC table). The
    * broadcast ships primitive arrays once per EXECUTOR — at a
    * 1000-executor cluster this is the only transport that scales. */
  private def bcOf(tabs: Seq[(Long, Seq[Long], Long)]) =
    org.apache.spark.sql.SparkSession.active.sparkContext.broadcast(
      tabs.map { case (q, t, n) => (q, t.toArray, n) }.toArray)

  private def bcGroupedOf(tabs: Map[Long, Seq[(Long, Seq[Long], Long)]]) = {
    // a query probing SEVERAL groups (IVF nprobe > 1) usually shares ONE
    // table object across its group entries — identity-dedup so the
    // broadcast ships (and each executor holds) each shared table once,
    // not nprobe times (at Q=10k, nprobe=4, 4 KB ADC tables that is
    // 40 MB instead of 160 MB). Keyed by the Seq INSTANCE, not the qid:
    // residual IVFADC tables legitimately differ per (query, cell) —
    // same qid, different content — and must NOT be collapsed.
    val arrBySeq = new java.util.IdentityHashMap[Seq[Long], Array[Long]]()
    org.apache.spark.sql.SparkSession.active.sparkContext.broadcast(
      tabs.map { case (g, ts) =>
        g -> ts.map { case (q, t, n) =>
          var a = arrBySeq.get(t)
          if (a == null) { a = t.toArray; arrBySeq.put(t, a) }
          (q, a, n)
        }.toArray })
  }

  /** ADC scoring block size: 1024 rows x M codes (ints) keeps the
    * block buffer ~32-64 KB while amortizing the Q x (M*K*8B) table
    * stream to ~Q*4KB/1024 per row. */
  val adcBlock: Int = 1024

  /** Order-preserving involution double-bits <-> signed long: signed
    * comparison of the encoding matches IEEE total order on the doubles
    * (NaN excluded; callers filter NaN before insert). */
  @inline def sortableBits(b: Long): Long = b ^ ((b >> 63) & 0x7fffffffffffffffL)
  @inline def sortableBits(d: Double): Long =
    sortableBits(java.lang.Double.doubleToRawLongBits(d))

  /** Exact global top-k per query over micro-quantized vectors: the
    * batched replacement for crossJoin(broadcast(queries)) + window.
    * Column-qtabs form — prefer the broadcast overload. */
  def dotTopK(id: Column, vec: Column, nsq: Column, qtabs: Column, k: Int): Column =
    build(id, vec, nsq, qtabs, "dot", k, 0, exact = true)

  /** Broadcast form: the query set ships once per executor. */
  def dotTopK(id: Column, vec: Column, nsq: Column,
              tabs: Seq[(Long, Seq[Long], Long)], k: Int): Column =
    build(id, vec, nsq, org.apache.spark.sql.functions.lit(0L),
      "dot", k, 0, exact = true, bc = Some(bcOf(tabs)))

  /** Grouped broadcast form (the IVF composition): `group` selects each
    * aggregation group's OWN query set from the broadcast map — a group
    * absent from the map scores nothing. */
  def dotTopKGrouped(id: Column, vec: Column, nsq: Column, group: Column,
                     tabs: Map[Long, Seq[(Long, Seq[Long], Long)]], k: Int): Column =
    build(id, vec, nsq, group, "dot", k, 0, exact = true,
      bcGrouped = Some(bcGroupedOf(tabs)))

  /** Union-of-per-partition-top-k shortlist via ADC lookup scoring
    * (PQ codes vs dense distance tables, slot = m·subK + code). */
  def adcShortlist(id: Column, codes: Column, nsq: Column, qtabs: Column,
                   k: Int, subK: Int): Column =
    build(id, codes, nsq, qtabs, "adc", k, subK, exact = false)

  /** Broadcast ADC shortlist. */
  def adcShortlist(id: Column, codes: Column, nsq: Column,
                   tabs: Seq[(Long, Seq[Long], Long)], k: Int, subK: Int): Column =
    build(id, codes, nsq, org.apache.spark.sql.functions.lit(0L),
      "adc", k, subK, exact = false, bc = Some(bcOf(tabs)))

  /** Exact-merge ADC top-k (global ADC-score top-k per query). */
  def adcTopK(id: Column, codes: Column, nsq: Column, qtabs: Column,
              k: Int, subK: Int): Column =
    build(id, codes, nsq, qtabs, "adc", k, subK, exact = true)

  /** Broadcast exact-merge ADC top-k. */
  def adcTopK(id: Column, codes: Column, nsq: Column,
              tabs: Seq[(Long, Seq[Long], Long)], k: Int, subK: Int): Column =
    build(id, codes, nsq, org.apache.spark.sql.functions.lit(0L),
      "adc", k, subK, exact = true, bc = Some(bcOf(tabs)))

  /** Grouped broadcast exact-merge ADC top-k (the IVF-PQ composition):
    * `group` selects each aggregation group's OWN per-query ADC tables
    * from the broadcast map — the probed-cell analogue of
    * [[dotTopKGrouped]], scoring each cell's docs against only the
    * queries that probed it, at 4-lookups-per-candidate ADC cost with
    * zero per-pair join rows. */
  def adcTopKGrouped(id: Column, codes: Column, nsq: Column, group: Column,
                     tabs: Map[Long, Seq[(Long, Seq[Long], Long)]],
                     k: Int, subK: Int): Column =
    build(id, codes, nsq, group, "adc", k, subK, exact = true,
      bcGrouped = Some(bcGroupedOf(tabs)))

  /** Union-of-per-partition-top-k shortlist on exact dots. */
  def dotShortlist(id: Column, vec: Column, nsq: Column, qtabs: Column, k: Int): Column =
    build(id, vec, nsq, qtabs, "dot", k, 0, exact = false)

  /** Broadcast dot shortlist. */
  def dotShortlist(id: Column, vec: Column, nsq: Column,
                   tabs: Seq[(Long, Seq[Long], Long)], k: Int): Column =
    build(id, vec, nsq, org.apache.spark.sql.functions.lit(0L),
      "dot", k, 0, exact = false, bc = Some(bcOf(tabs)))

  private def build(id: Column, vec: Column, nsq: Column, qtabs: Column,
                    mode: String, k: Int, subK: Int, exact: Boolean,
                    bc: Option[org.apache.spark.broadcast.Broadcast[Array[(Long, Array[Long], Long)]]] = None,
                    bcGrouped: Option[org.apache.spark.broadcast.Broadcast[Map[Long, Array[(Long, Array[Long], Long)]]]] = None): Column =
    ColumnBridge.column(
      MultiQueryTopK(
        ColumnBridge.expression(id), ColumnBridge.expression(vec),
        ColumnBridge.expression(nsq), ColumnBridge.expression(qtabs),
        mode, k, subK, exact, bc, bcGrouped).toAggregateExpression())
}
