package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.functions.{CountMin, CountMinLongs}

/** Optimizer rule: sketch-pruned heavy-hitter aggregation — the q140
  * two-job pattern (graft/queries/TextQueries.scala q140) auto-injected
  * by Catalyst instead of hand-written by the query author.
  *
  * Target shape (a heavy-hitter query):
  * {{{
  *   Filter(cnt >= N, Aggregate(k, cnt = count(1), child))
  * }}}
  * Rewritten to:
  * {{{
  *   Filter(cnt >= N, Aggregate(k,
  *     Filter(isnull(k) OR cms_estimate(scalar-subquery(CMS(child)), k) >= N,
  *       child)))
  * }}}
  * A Count-Min estimate is a ONE-SIDED overestimate (estimate >= true
  * count, always), so dropping rows whose key's estimate is below N can
  * never drop a real heavy hitter — the rewrite is lossless and the
  * results are hash-identical to the unrewritten plan (pinned in
  * PlanAuditSpec). What it buys at scale: the exact aggregate's shuffle
  * carries only rows of CANDIDATE keys; on the long-tailed key
  * distributions heavy-hitter queries exist for, that is most of the
  * shuffle gone, at the cost of one extra map-side pass folding into an
  * 8 KB sketch. Null keys always survive the prune (the CMS aggregate
  * skips nulls, so their estimate is meaningless).
  *
  * Construction follows Spark's own InjectRuntimeFilter precedent: the
  * sketch build is a [[ScalarSubquery]] over a copy of the child plan
  * (one Aggregate to a single 8 KB array row), and the probe is pure
  * arithmetic on the subquery result — the exact bucket/estimate algebra
  * of [[CountMin.estimate]], as resolved expression nodes.
  *
  * Opt-in via `spark.graft.cmsPrune.enabled` (with
  * `spark.graft.cmsPrune.d`/`.w` sizing the sketch); the rule runs in a
  * fixed-point batch, so it structurally skips plans it already rewrote.
  * It also requires a fully deterministic child (the subquery re-executes
  * it) and a non-nullable-safe, Long-typed grouping key.
  */
class CmsHeavyHitterPrune(session: SparkSession)
  extends Rule[LogicalPlan] with PredicateHelper {

  private def confBool(k: String, dflt: String): Boolean =
    session.sessionState.conf.getConfString(k, dflt).toBoolean
  private def confInt(k: String, dflt: String): Int =
    session.sessionState.conf.getConfString(k, dflt).toInt

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!confBool("spark.graft.cmsPrune.enabled", "false")) return plan
    val d = confInt("spark.graft.cmsPrune.d", "4")
    val w = confInt("spark.graft.cmsPrune.w", "256")
    plan.transformUp {
      case f @ Filter(cond, agg @ Aggregate(Seq(key), aggExprs, child, _))
          if eligible(key, child) && !alreadyPruned(child) =>
        thresholdOf(cond, aggExprs) match {
          case Some(n) if n >= 2L =>
            val pruned = Filter(pruneCondition(key, child, n, d, w), child)
            f.copy(child = agg.copy(child = pruned))
          case _ => f
        }
    }
  }

  /** Long-typed deterministic key over a fully deterministic child (the
    * sketch subquery executes the child a second time). */
  private def eligible(key: Expression, child: LogicalPlan): Boolean =
    key.dataType == LongType && key.deterministic &&
      child.collect { case p => p }.forall(_.expressions.forall(_.deterministic))

  /** Fixed-point guard: the filter we inject carries a scalar subquery
    * whose plan aggregates a CountMinLongs. Other operator-optimization
    * rules MOVE that filter (PushDownPredicates slides it below projects
    * on its way to the scan — by design), so the guard must search the
    * whole subtree, not just the immediate child: an immediate-child
    * check re-injects every fixed-point iteration and the plan grows
    * without bound. */
  private def alreadyPruned(child: LogicalPlan): Boolean =
    child.exists {
      case Filter(c, _) => c.exists {
        case s: ScalarSubquery => s.plan.expressions.exists(_.exists {
          case ae: AggregateExpression => ae.aggregateFunction.isInstanceOf[CountMinLongs]
          case _ => false
        })
        case _ => false
      }
      case _ => false
    }

  /** The largest `cnt >= N` bound the filter places on an unfiltered
    * row count aggregate of this Aggregate, if any. */
  private def thresholdOf(cond: Expression,
                          aggExprs: Seq[NamedExpression]): Option[Long] = {
    // output attributes that are plain row counts: count(1) / count(lit)
    // / count(non-nullable expr), NOT count(distinct) and NOT FILTERed
    val countIds = aggExprs.collect {
      case a @ Alias(AggregateExpression(Count(Seq(c)), Complete, false, None, _), _)
          if c.foldable || !c.nullable => a.exprId
    }.toSet
    if (countIds.isEmpty) return None
    val bounds = splitConjunctivePredicates(cond).collect {
      case GreaterThanOrEqual(a: Attribute, IntegerLiteral(n))
          if countIds.contains(a.exprId) => n.toLong
      case GreaterThanOrEqual(a: Attribute, LongLiteral(n))
          if countIds.contains(a.exprId) => n
      case GreaterThan(a: Attribute, IntegerLiteral(n))
          if countIds.contains(a.exprId) => n.toLong + 1L
      case GreaterThan(a: Attribute, LongLiteral(n))
          if countIds.contains(a.exprId) => n + 1L
    }
    bounds.sorted.lastOption
  }

  private object IntegerLiteral {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, IntegerType) => Some(v)
      case _ => None
    }
  }
  private object LongLiteral {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Long, LongType) => Some(v)
      case _ => None
    }
  }

  /** `isnull(k) OR least(sketch[bucket_r(k)] for r < d) >= n` with the
    * sketch arriving as a scalar subquery: Aggregate(CMS(k), child). The
    * bucket algebra mirrors CountMinLongs.update exactly
    * (((k pmod P)·(2r+3) + (101r+7)) % P % w). */
  private def pruneCondition(key: Expression, child: LogicalPlan,
                             n: Long, d: Int, w: Int): Expression = {
    val P = CountMin.P
    val cmsAgg = Alias(
      AggregateExpression(CountMinLongs(key, d, w), Complete, isDistinct = false),
      "graft_cms")()
    val sketch = ScalarSubquery(Aggregate(Nil, Seq(cmsAgg), child))
    val vmod = Pmod(key, Literal(P))
    val lanes = (0 until d).map { r =>
      val bucket = Remainder(
        Remainder(
          Add(Multiply(vmod, Literal(2L * r + 3)), Literal(101L * r + 7)),
          Literal(P)),
        Literal(w.toLong))
      ElementAt(sketch,
        Cast(Add(Literal(r.toLong * w + 1L), bucket), IntegerType))
    }
    val estimate = if (lanes.length == 1) lanes.head else Least(lanes)
    Or(IsNull(key), GreaterThanOrEqual(estimate, Literal(n)))
  }
}
