package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.DataType
import org.apache.spark.unsafe.types.UTF8String

/** Deletion-vector POSITION PREDICATE: `keep(file_path, row_index)` is
  * false exactly for the (file, position) pairs a deletion vector dooms.
  *
  * This replaces the broadcast ANTI-JOIN on (rel-path, row_index) that
  * merge-on-read scans used to pay: the join path evaluated a
  * `regexp_extract` per row, hashed a (string, long) key per row, and
  * put a join operator between the scan and the consumer — lakebench
  * measured the rent at 2.3× a clean scan with ONE dv'd dir. As a
  * plain codegen predicate the dv filter FUSES into the scan's
  * whole-stage-codegen: per row it is one cached pointer-equality check
  * on the (per-file constant) path plus a binary search over that
  * file's sorted positions — and files without dv'd rows pay just the
  * path check. The dv payload travels as a real Broadcast (once per
  * executor), keyed by the file's last TWO path components
  * (`<data-dir>/<part-file>` — dir names are txn-UUIDs, so the key is
  * unique by construction; the part-file NAME alone embeds only the
  * write JOB's UUID, and the round-12 bulk partition writer stages
  * many dirs from one job, giving files in different partitions
  * identical basenames — a name-keyed lookup aliased their positions
  * across partitions, caught by the q233 oracle as cross-partition
  * over-deletion).
  *
  * Sized for the MoR premise (KB-sized dvs); the caller size-gates on
  * the manifest's dv row counts and falls back to the anti-join for
  * pathological dv volumes.
  */
case class DvKeep(path: Expression, idx: Expression,
                  lookup: DvKeep.Lookup)
  extends BinaryExpression with Predicate {

  override def left: Expression = path
  override def right: Expression = idx
  override def nullable: Boolean = false

  override def nullSafeEval(p: Any, i: Any): Any =
    lookup.keep(p.asInstanceOf[UTF8String], i.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dvLookup", lookup, classOf[DvKeep.Lookup].getName)
    nullSafeCodeGen(ctx, ev, (p, i) => s"${ev.value} = $ref.keep($p, $i);")
  }

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "dv_keep"
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): DvKeep =
    copy(path = newLeft, idx = newRight)
}

object DvKeep {

  /** Broadcast-backed position index with a single-entry per-task cache:
    * `_metadata.file_path` is constant across a file's rows, so the
    * common per-row cost is one UTF8String equality check. */
  final class Lookup(bc: Broadcast[Map[String, Array[Long]]]) extends Serializable {
    @transient private var lastPath: UTF8String = _
    @transient private var lastArr: Array[Long] = _ // null = clean file

    def keep(path: UTF8String, idx: Long): Boolean = {
      val lp = lastPath
      if (lp == null || !lp.equals(path)) {
        // new file: resolve its sorted doomed positions by the
        // dir/name suffix (see the class doc — basenames alone are
        // NOT unique across one bulk write job's partition dirs)
        val s = path.toString
        lastArr = bc.value.getOrElse(DvKeep.dirAndName(s), null)
        lastPath = path.clone()
      }
      val arr = lastArr
      arr == null || java.util.Arrays.binarySearch(arr, idx) < 0
    }
  }

  /** The last two path components (`dir/name`) — the unique dv key. */
  def dirAndName(path: String): String = {
    val i = path.lastIndexOf('/')
    if (i <= 0) path
    else {
      val j = path.lastIndexOf('/', i - 1)
      path.substring(j + 1)
    }
  }

  /** `keep` column over the hidden metadata columns: rows at dv'd
    * positions drop, inside whole-stage codegen. `positions` maps
    * parquet part-file name → sorted doomed row indexes. */
  def keepColumn(spark: org.apache.spark.sql.SparkSession,
                 positions: Map[String, Array[Long]]): Column = {
    import org.apache.spark.sql.functions.col
    val bc = spark.sparkContext.broadcast(positions)
    ColumnBridge.column(DvKeep(
      ColumnBridge.expression(col("_metadata.file_path")),
      ColumnBridge.expression(col("_metadata.row_index")),
      new Lookup(bc)))
  }
}
