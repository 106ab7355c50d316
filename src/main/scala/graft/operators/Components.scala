package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the cluster
  * step of a dedup pipeline (near-dup PAIRS → duplicate CLUSTERS → one
  * survivor per cluster).
  *
  * Each iteration joins the symmetrized edge list against current labels
  * and takes the per-node min — the standard distributed CC (what GraphX
  * Pregel computes), expressed as DataFrame joins so Catalyst/AQE own the
  * physical plan. Iteration count = component diameter, which for near-dup
  * graphs is tiny (duplicate sets are near-cliques); each round is one
  * hash-join + partial-agg shuffle over the EDGE list, never all-pairs.
  * `localCheckpoint` cuts the growing lineage so the plan stays bounded.
  * The min-label fixpoint is unique, hence deterministic under any
  * partitioning; labels are monotonically non-increasing, so an unchanged
  * label sum certifies convergence (one scalar action per round — the
  * driver drives ITERATION only, never data).
  */
object Components {

  /** Returns (id, cluster_id = min node id reachable). Nodes absent from
    * `edges` keep themselves as their cluster. */
  def minLabel(nodes: DataFrame, idCol: String,
               edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val es = edges.select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .unionByName(edges.select(col(dstCol).cast("long").as("a"), col(srcCol).cast("long").as("b")))
      .distinct().cache()
    var cur = nodes.select(col(idCol).cast("long").as("id"),
      col(idCol).cast("long").as("lbl")).localCheckpoint()
    var curSum = cur.agg(sum("lbl")).head.getLong(0)
    var converged = false
    while (!converged) {
      val prop = es.join(cur, es("a") === cur("id"))
        .select(col("b").as("id"), col("lbl"))
        .unionByName(cur.select("id", "lbl"))
        .groupBy("id").agg(min("lbl").as("lbl"))
        .localCheckpoint()
      val propSum = prop.agg(sum("lbl")).head.getLong(0)
      converged = propSum == curSum
      cur = prop
      curSum = propSum
    }
    es.unpersist()
    cur.select(col("id"), col("lbl").as("cluster_id"))
  }
}
