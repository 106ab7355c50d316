package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.read.SupportsReportStatistics
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2ScanRelation, V1ScanWrapper}
import org.apache.spark.sql.graft.StatsV1ScanWrapper

/** Restore the statistics surface the V1 bridge drops: pushdown wraps a
  * `V1Scan` in a `V1ScanWrapper` that implements only `Scan`, hiding
  * the graft scan's `SupportsReportStatistics` from
  * `DataSourceV2ScanRelation.computeStats` — the relation then reports
  * `defaultSizeInBytes` (8 EiB) and neither broadcast sizing nor CBO
  * cardinality can ever fire. This rule swaps in a subclass wrapper
  * (same product elements — every `V1ScanWrapper(...)` match in
  * Spark's physical strategies still fires) that forwards the graft
  * scan's row count, size, and NDV/null column statistics.
  *
  * Runtime-injectable (`spark.experimental.extraOptimizations`, the
  * "User Provided Optimizers" batch — runs before planning reads plan
  * stats), installed by [[GraftDml.install]] alongside the DML
  * strategy. Non-graft scans never match.
  *
  * Coverage boundary: the User Provided Optimizers batch runs AFTER
  * the optimizer's own Join Reorder batch, so `CostBasedJoinReorder`
  * (logical join reordering) still sees `defaultSizeInBytes` for graft
  * scans. What the restored stats DO reach is every planning-time
  * consumer — `JoinSelection` broadcast sizing and any stats read at
  * physical planning — which is where the broadcast-vs-shuffle call is
  * made. A session-extensions install (`injectOptimizerRule`, a
  * pre-CBO batch) would close the reorder gap but cannot be injected
  * into the driver's already-built session; documented trade.
  */
final class GraftStatsRestore extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case r @ DataSourceV2ScanRelation(_, w: V1ScanWrapper, _, _, _)
        if w.v1Scan.isInstanceOf[SupportsReportStatistics] &&
          w.v1Scan.isInstanceOf[graft.sources.GraftScan] &&
          !w.isInstanceOf[StatsV1ScanWrapper] =>
      r.copy(scan = new StatsV1ScanWrapper(
        w, w.v1Scan.asInstanceOf[SupportsReportStatistics]))
  }
}

object GraftStatsRestore {
  /** Idempotent runtime install. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[GraftStatsRestore]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ new GraftStatsRestore
}
