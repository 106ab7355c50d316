package graft.queries

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Typed Dataset[T] API coverage: case-class rows, a custom typed
  * [[Aggregator]], and per-group [[org.apache.spark.sql.KeyValueGroupedDataset.mapGroups]]
  * — the type-safe half of the engine's API surface (the untyped Column
  * half is everything else). Both queries are oracle-paired with plain SQL,
  * proving the typed path computes the same answers as the declarative one.
  *
  * Scale notes: a typed Aggregator compiles to a regular aggregate with
  * partial merge (reduce map-side, merge post-shuffle) — same wire profile
  * as sum(). mapGroups materializes ONE group per call — fine when groups
  * are bounded (events per user); it is the batch sibling of
  * flatMapGroupsWithState and documented as group-bounded, not corpus-bounded.
  */
object TypedQueries {

  /** Typed row for the lineitem slice (public: encoder codegen). */
  final case class FlagCents(rflag: String, price_c: Long)

  /** Exact-cents sum as a typed Aggregator: IN=FlagCents, BUF=Long, OUT=Long. */
  object SumCents extends Aggregator[FlagCents, Long, Long] {
    override def zero: Long = 0L
    override def reduce(b: Long, a: FlagCents): Long = b + a.price_c
    override def merge(b1: Long, b2: Long): Long = b1 + b2
    override def finish(b: Long): Long = b
    override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Typed row for per-user event values (public: encoder codegen). */
  final case class UserValue(user_id: Long, vc: Long)

  val all: Seq[Q] = Seq(

    // ---- q60: custom typed Aggregator — the same exact-cents sum as the
    // declarative q45, via the Dataset[T] path. Partial-merge profile
    // identical to sum(); the oracle (the plain SQL group-by) proves it.
    Q("q60_typed_aggregator",
      Some("""SELECT l_returnflag AS rflag,
             |       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c
             |FROM lineitem
             |GROUP BY 1
             |ORDER BY rflag""".stripMargin),
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .select(col("l_returnflag").as("rflag"),
            round(col("l_extendedprice") * 100).cast("long").as("price_c"))
          .as[FlagCents]
          .groupByKey(_.rflag)
          .agg(SumCents.toColumn.name("sum_price_c"))
          .toDF("rflag", "sum_price_c")
          .orderBy("rflag")
      }),

    // ---- q61: per-group exact median via typed mapGroups — the k-th order
    // statistic (lower median) of event value cents per user. The group is
    // materialized in one task (bounded: events per user), sorted locally;
    // the oracle derives the same order statistic with a window.
    Q("q61_grouped_median",
      Some("""WITH v AS (SELECT user_id, CAST(round(value * 100) AS BIGINT) AS vc FROM events),
             |r AS (SELECT user_id, vc,
             |             row_number() OVER (PARTITION BY user_id ORDER BY vc) AS rn,
             |             COUNT(*) OVER (PARTITION BY user_id) AS n
             |      FROM v)
             |SELECT user_id, vc AS median_c FROM r
             |WHERE rn = (n + 1) // 2
             |ORDER BY user_id""".stripMargin),
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .select(col("user_id"), graft.functions.Exact.cents(col("value")).as("vc"))
          .as[UserValue]
          .groupByKey(_.user_id)
          .mapGroups { (uid, rows) =>
            val vals = rows.map(_.vc).toArray
            java.util.Arrays.sort(vals)
            (uid, vals((vals.length - 1) / 2))
          }
          .toDF("user_id", "median_c")
          .orderBy("user_id")
      }),

    // ---- q62: typed cogroup — per-user reconciliation of two event slices
    // (purchases vs views) in one pass; users present in EITHER side
    // appear, which is exactly FULL OUTER JOIN semantics — the oracle says
    // so. Both sides shuffle once on the key; each group is processed by
    // one task (group-bounded, like q61).
    Q("q62_cogroup_reconcile",
      Some("""WITH p AS (SELECT user_id, COUNT(*) AS n_purch,
             |                 CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_purch_c
             |          FROM events WHERE event_type = 'purchase' GROUP BY 1),
             |v AS (SELECT user_id, COUNT(*) AS n_view,
             |             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_view_c
             |      FROM events WHERE event_type = 'view' GROUP BY 1)
             |SELECT COALESCE(p.user_id, v.user_id) AS user_id,
             |       COALESCE(n_purch, 0) AS n_purch, COALESCE(sum_purch_c, 0) AS sum_purch_c,
             |       COALESCE(n_view, 0) AS n_view, COALESCE(sum_view_c, 0) AS sum_view_c
             |FROM p FULL OUTER JOIN v ON p.user_id = v.user_id
             |ORDER BY user_id""".stripMargin),
      (s, d) => {
        import s.implicits._
        def slice(t: String) = Tables.events(s, d)
          .filter(col("event_type") === t)
          .select(col("user_id"), graft.functions.Exact.cents(col("value")).as("vc"))
          .as[UserValue]
          .groupByKey(_.user_id)
        slice("purchase").cogroup(slice("view")) { (uid, ps, vs) =>
          var np = 0L; var sp = 0L
          ps.foreach { r => np += 1; sp += r.vc }
          var nv = 0L; var sv = 0L
          vs.foreach { r => nv += 1; sv += r.vc }
          Iterator((uid, np, sp, nv, sv))
        }
          .toDF("user_id", "n_purch", "sum_purch_c", "n_view", "sum_view_c")
          .orderBy("user_id")
      })
  )
}
