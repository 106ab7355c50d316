package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Count-Min sketch as a real AGGREGATE: frequency estimation over an
  * unbounded key stream in CONSTANT state — d×w counters per partial
  * (d=4, w=256 → 8 KB), merged by elementwise sum.
  *
  * The companion to [[TopKLongs]] (bounded top-k) and the q58 KMV sketch
  * (bounded distinct-count): exact per-key counting needs vocabulary-sized
  * aggregation state, which at 100 TB means a vocabulary-sized shuffle;
  * the sketch ships 8 KB per map partial regardless of corpus or
  * vocabulary size and answers point queries with one-sided error
  * (estimate >= true count, overcount bounded by e·N/w per row, taken as
  * the MIN over d rows).
  *
  * Every choice is deterministic and engine-independent — the row hashes
  * are the same universal family as the MinHash path
  * (((v % P) * (2r+3) + (101r+7)) % P, P = 2^31-1), counters are
  * order-independent sums — so a DuckDB oracle reproduces the full counter
  * matrix and the estimates bit-for-bit (unlike library CMS/HLL impls
  * whose hash seeds are private). Runs under ObjectHashAggregateExec.
  */
case class CountMinLongs(
    child: Expression,
    d: Int,
    w: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(d > 0 && w > 0, "d and w must be positive")
  // Bound the per-partial buffer: d*w longs are allocated per aggregation
  // buffer (one per group per task), so an unbounded d*w from SQL text
  // would be an arbitrary-allocation hole. 2^22 counters = 32 MB, far
  // above any sensible sketch and far below harm.
  require(d.toLong * w <= (1L << 22),
    s"countmin d*w = ${d.toLong * w} exceeds the 2^22 counter bound")

  // SQL-path misuse (non-BIGINT child) must fail at analysis, not as a
  // mid-job ClassCastException in update().
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_countmin_longs requires a BIGINT input, got ${child.dataType.catalogString}")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v0 = child.eval(input)
    if (v0 != null) {
      val v = ((v0.asInstanceOf[Long] % CountMin.P) + CountMin.P) % CountMin.P
      var r = 0
      while (r < d) {
        val b = ((v * (2L * r + 3) + (101L * r + 7)) % CountMin.P % w).toInt
        buf(r * w + b) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bytes = new Array[Byte](buf.length * 8)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    buf.foreach(bb.putLong)
    bytes
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinLongs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinLongs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CountMinLongs =
    copy(child = newChildren(0))

  override def prettyName: String = "countmin_longs"
}

object CountMin {
  val P: Long = 2147483647L // 2^31 - 1, the MinHash prime

  /** Column API: flattened d×w counter matrix over a BIGINT key column. */
  def sketch(v: Column, d: Int, w: Int): Column =
    ColumnBridge.column(
      CountMinLongs(ColumnBridge.expression(v), d, w).toAggregateExpression())

  /** Bucket of key `v` in sketch row `r` — the declarative mirror of the
    * aggregate's hash, usable on either side of a query and in the oracle:
    * ((v % P) * (2r+3) + (101r+7)) % P % w (callers pass non-negative v).
    */
  def bucket(v: Column, r: Int, w: Int): Column =
    (pmod(v, lit(P)) * lit(2L * r + 3) + lit(101L * r + 7)) % lit(P) % lit(w)

  /** Point estimate for key `v` from a sketch column: min over the d rows
    * (classic CMS query; one-sided overestimate).
    */
  def estimate(sk: Column, v: Column, d: Int, w: Int): Column =
    least((0 until d).map { r =>
      element_at(sk, (lit(r * w) + bucket(v, r, w) + lit(1)).cast("int"))
    }: _*)
}
