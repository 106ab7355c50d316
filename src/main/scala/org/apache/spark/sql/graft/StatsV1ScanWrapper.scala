package org.apache.spark.sql.graft

import org.apache.spark.sql.connector.read.{Statistics, SupportsReportStatistics}
import org.apache.spark.sql.execution.datasources.v2.V1ScanWrapper
import org.apache.spark.sql.types.StructType

/** [[V1ScanWrapper]] that KEEPS the wrapped scan's statistics surface.
  *
  * `V2ScanRelationPushDown` wraps every `V1Scan` in a `V1ScanWrapper`
  * that implements ONLY `Scan` — the wrapped scan's
  * `SupportsReportStatistics` is swallowed, so a V1-bridged source's
  * row/size/column statistics never reach `DataSourceV2ScanRelation
  * .computeStats` and the relation falls back to
  * `defaultSizeInBytes` (8 EiB): no broadcast from reported stats, no
  * CBO cardinality, ever. This subclass (same product elements, so
  * every `V1ScanWrapper(...)` pattern in Spark's planner still
  * matches) forwards the statistics; a small optimizer rule
  * (graft.plans.GraftStatsRestore) swaps it in for graft scans. Lives
  * in the org.apache.spark.sql namespace because the wrapper's third
  * constructor parameter type (`PushedDownOperators`) is
  * private[sql] — the same conventional shim access as
  * [[ColumnBridge]].
  */
final class StatsV1ScanWrapper(inner: V1ScanWrapper,
                               reporting: SupportsReportStatistics)
    extends V1ScanWrapper(inner.v1Scan, inner.handledFilters,
      inner.pushedDownOperators)
    with SupportsReportStatistics {
  override def estimateStatistics(): Statistics = reporting.estimateStatistics()
  override def readSchema(): StructType = inner.readSchema()
  // the case-class-generated equality would make this wrapper == its
  // plain base (same product elements) — and then `plan.transform`
  // discards the rewrite as a no-op (fastEquals keeps the ORIGINAL
  // node when the rule's output compares equal). Distinguish the types.
  override def canEqual(that: Any): Boolean = that.isInstanceOf[StatsV1ScanWrapper]
  override def equals(other: Any): Boolean = other match {
    case s: StatsV1ScanWrapper => super.equals(s)
    case _                     => false
  }
  override def hashCode(): Int = super.hashCode() * 31 + 1
}
