package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType}

/** Reinterpret a TIMESTAMP_NTZ value as its internal epoch-LOCAL
  * microseconds — the engine-controlled long projection the dir-stats
  * tier needs for NTZ statsCols (TxnTable.longProj).
  *
  * Why an expression and not a cast chain: Spark deliberately ships no
  * NTZ→numeric cast, and every SQL-level detour
  * (`cast(ntz as timestamp)`, `to_utc_timestamp`) re-interprets the
  * wall-clock fields through the SESSION TIMEZONE — the value would
  * depend on a config the filter-translation side cannot see, which is
  * exactly the rendering-drift hazard the stats tier bans. The PHYSICAL
  * representation of TIMESTAMP_NTZ is already a timezone-free micros
  * long (the same value `DateTimeUtils.localDateTimeToMicros` produces
  * from the pushed `java.time.LocalDateTime` filter literal), so the
  * sound projection is the identity reinterpret — zero arithmetic,
  * stays inside whole-stage codegen as a no-op.
  */
case class NtzMicros(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == TimestampNTZType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ntz_micros expects TIMESTAMP_NTZ, got ${child.dataType.catalogString}")
  override protected def nullSafeEval(input: Any): Any = input // Long micros already
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => c) // identity — a register copy in codegen
  override protected def withNewChildInternal(newChild: Expression): NtzMicros =
    copy(child = newChild)
}

object TimeKernels {
  /** Column form of [[NtzMicros]]. */
  def ntzMicros(c: Column): Column =
    ColumnBridge.column(NtzMicros(ColumnBridge.expression(c)))
}
