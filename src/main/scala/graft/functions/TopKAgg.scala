package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Top-k rows per group as a real AGGREGATE, not a window.
  *
  * The window formulation of top-k (`rank().over(partitionBy(g).orderBy(s))`
  * + filter, operators/Windows.topKPerGroup) shuffles and SORTS every row of
  * every group; a hot group is one task. This aggregate keeps a bounded
  * k-element buffer per group, combines map-side (partial aggregation), and
  * ships only k rows per group across the shuffle — per-group cost is
  * O(n log k) with O(k) state, and skew is capped at k rows per key post-map.
  * That is the shape that survives a 1000-executor / 100 TB group-by where
  * the biggest key no longer fits in one task's sort.
  *
  * Semantics: retains the k (score, id) pairs that are largest under the
  * total order (score DESC, id ASC) — i.e. `row_number() OVER (ORDER BY
  * score DESC, id) <= k`, deterministic for distinct ids. Runs under
  * ObjectHashAggregateExec (TypedImperativeAggregate); the surrounding
  * project/scan stages stay in whole-stage codegen.
  */
case class TopKLongs(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Long, Long)]] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = TopKLongs.outType

  override def createAggregationBuffer(): ArrayBuffer[(Long, Long)] =
    ArrayBuffer.empty[(Long, Long)]

  // (s1,i1) ranks strictly ahead of (s2,i2) under (score DESC, id ASC).
  @inline private def ahead(s1: Long, i1: Long, s2: Long, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  // The buffer is a BINARY HEAP with the WORST-ranked element at the
  // root: O(1) reject for a row that doesn't beat the current worst,
  // O(log k) for one that does. The previous sorted-array linear insert
  // was O(k) per accepted row — fine at k=10, but filling a k=1000
  // shortlist buffer cost O(k²) element shifts per (group × partition)
  // and dominated the whole ADC scan it served. eval() sorts once.
  @inline private def worseEq(a: (Long, Long), b: (Long, Long)): Boolean =
    !ahead(a._1, a._2, b._1, b._2) // a ranks at-or-behind b

  private def siftUp(buf: ArrayBuffer[(Long, Long)], from: Int): Unit = {
    var i = from
    while (i > 0) {
      val p = (i - 1) / 2
      if (worseEq(buf(p), buf(i))) return
      val t = buf(p); buf(p) = buf(i); buf(i) = t
      i = p
    }
  }

  private def siftDown(buf: ArrayBuffer[(Long, Long)], from: Int): Unit = {
    val n = buf.length
    var i = from
    while (true) {
      val l = 2 * i + 1; val r = l + 1
      var w = i // index of the worst-ranked among i and its children
      if (l < n && worseEq(buf(l), buf(w))) w = l
      if (r < n && worseEq(buf(r), buf(w))) w = r
      if (w == i) return
      val t = buf(w); buf(w) = buf(i); buf(i) = t
      i = w
    }
  }

  private def insert(buf: ArrayBuffer[(Long, Long)], s: Long, i: Long): Unit = {
    if (buf.length == k) {
      val worst = buf(0)
      if (!ahead(s, i, worst._1, worst._2)) return // O(1) fast path
      buf(0) = (s, i)
      siftDown(buf, 0)
    } else {
      buf += ((s, i))
      siftUp(buf, buf.length - 1)
    }
  }

  override def update(buf: ArrayBuffer[(Long, Long)], input: InternalRow): ArrayBuffer[(Long, Long)] = {
    val sv = score.eval(input)
    val iv = id.eval(input)
    if (sv != null && iv != null) {
      insert(buf, sv.asInstanceOf[Long], iv.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: ArrayBuffer[(Long, Long)], other: ArrayBuffer[(Long, Long)]): ArrayBuffer[(Long, Long)] = {
    other.foreach { case (s, i) => insert(buf, s, i) }
    buf
  }

  // Consumers rank by array position (explode + pos+1), so the emitted
  // array is sorted best-first — one O(k log k) sort per GROUP, not
  // per row.
  override def eval(buf: ArrayBuffer[(Long, Long)]): Any =
    new GenericArrayData(buf.toArray
      .sortWith((a, b) => ahead(a._1, a._2, b._1, b._2))
      .map { case (s, i) => InternalRow(s, i) }.toArray[Any])

  override def serialize(buf: ArrayBuffer[(Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(8 + 16 * buf.length)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { case (s, i) => out.writeLong(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Long, Long)] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = ArrayBuffer.empty[(Long, Long)]
    var j = 0
    while (j < n) { buf += ((in.readLong(), in.readLong())); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKLongs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKLongs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKLongs =
    copy(score = newChildren(0), id = newChildren(1))

  override def prettyName: String = "topk_longs"
}

object TopKLongs {
  val outType: ArrayType = ArrayType(
    StructType(Seq(
      StructField("score", LongType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  /** Column API: array<struct<score,id>> of the top-k rows of the group
    * under (score DESC, id ASC). Explode + (pos+1) for ranked output. */
  def topK(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKLongs(ColumnBridge.expression(score), ColumnBridge.expression(id), k)
        .toAggregateExpression())
}
