package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Join-side helpers. */
object Joins {

  /** Broadcast hint gated on the optimizer's own size estimate.
    *
    * An unconditional `broadcast(dim)` is correct while the dimension is
    * small, but the hint overrides Spark's size check — at 100× data a
    * "dimension" like `part` stops fitting and the forced broadcast OOMs the
    * driver. Hint only when the estimated size is under the session's
    * autoBroadcastJoinThreshold; otherwise return the frame unhinted and let
    * AQE pick broadcast vs shuffle from the *runtime* size.
    */
  def dimBroadcast(df: DataFrame): DataFrame = {
    val threshold = df.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    val estimated = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (threshold > 0 && estimated <= BigInt(threshold)) broadcast(df) else df
  }
}
