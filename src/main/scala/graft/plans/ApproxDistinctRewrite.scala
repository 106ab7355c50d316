package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

import graft.functions.TopKLongs

/** Optimizer rule: approximate-distinct rewrite — `count(distinct c)`
  * replaced by the q58 KMV (k-minimum-values) estimate under an
  * EXPLICIT opt-in (`spark.graft.approxDistinct.enabled`; default off —
  * unlike [[CmsHeavyHitterPrune]] this rewrite changes answers, so it
  * must never fire on its own).
  *
  * Why at 100 TB: exact `count(distinct)` shuffles every (group, value)
  * pair — for "distinct users per day" that is the full event stream
  * re-keyed. The KMV sketch is a 64-long bounded heap per (partial,
  * group) with map-side merge; the shuffle carries 64 values per group
  * per partial regardless of cardinality, and the estimate carries the
  * classic ~1/sqrt(k-1) ≈ 13% relative error (measured in
  * KmvSketchSpec / ScaleBench). The construction is the oracle-checked
  * q58 one — deterministic md5-prefix hashing, exact below k — so the
  * rewritten answer is reproducible across engines, unlike native HLL
  * whose hash seeds are private.
  *
  * Mechanics: each `count(distinct c)` aggregate becomes a
  * DISTINCT-flagged [[TopKLongs]] over the negated 48-bit hash (the
  * distinct flag dedups hashes before they reach the heap — Spark plans
  * it with the same Expand machinery as the exact form, but the heap
  * state replaces the unbounded distinct-set state), and a Project
  * above the Aggregate computes `n_seen < k ? n_seen : (k-1)·2^48 / h_k`
  * UNDER THE ORIGINAL exprId, so downstream references are untouched.
  * Non-distinct aggregates in the same Aggregate pass through.
  */
class ApproxDistinctRewrite(session: SparkSession) extends Rule[LogicalPlan] {

  private val K = 64
  private val HashSpace = 281474976710656L // 2^48

  private def enabled: Boolean = session.sessionState.conf
    .getConfString("spark.graft.approxDistinct.enabled", "false").toBoolean

  private def okType(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType || e.dataType == StringType

  private def isRewritable(ne: NamedExpression): Boolean = ne match {
    case Alias(AggregateExpression(Count(Seq(c)), Complete, true, None, _), _) => okType(c)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case agg @ Aggregate(_, aggExprs, _, _) if aggExprs.exists(isRewritable) =>
        val newAggList = scala.collection.mutable.ArrayBuffer.empty[NamedExpression]
        val projList = aggExprs.map {
          case a @ Alias(AggregateExpression(Count(Seq(c)), Complete, true, None, _), name)
              if okType(c) =>
            // 48-bit deterministic hash: md5 hex prefix, the q58 form
            val hv = Cast(Conv(Substring(Md5(Cast(Cast(c, StringType), org.apache.spark.sql.types.BinaryType)),
              Literal(1), Literal(12)), Literal(16), Literal(10)), LongType)
            val tkAlias = Alias(
              AggregateExpression(TopKLongs(UnaryMinus(hv), hv, K), Complete,
                isDistinct = true), s"__kmv_$name")()
            newAggList += tkAlias
            val tk = tkAlias.toAttribute
            val nSeen = Cast(Size(tk), LongType)
            val kth = GetStructField(
              ElementAt(tk, Size(tk)), 1, Some("id"))
            val est = If(LessThan(nSeen, Literal(K.toLong)), nSeen,
              IntegralDivide(Literal((K - 1).toLong * HashSpace),
                Greatest(Seq(kth, Literal(1L)))))
            Alias(est, name)(exprId = a.exprId)
          case other =>
            newAggList += other
            other.toAttribute
        }
        Project(projList, agg.copy(aggregateExpressions = newAggList.toSeq))
    }
  }
}
