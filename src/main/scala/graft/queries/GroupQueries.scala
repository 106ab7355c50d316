package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables
import graft.operators.Joins.dimBroadcast
import graft.functions.Exact.cents

/** Aggregation inventory (SURVEY.md §2.5 + P6/P7): distinct-dedup,
  * first-per-group collapse, DQ count metrics, multi-aggregate, distinct
  * counts, rollup/cube subtotals.
  *
  * All aggregates here are associative (count / sum over exact BIGINT cents /
  * min/max / min_by on unique keys), so Spark's partial aggregation
  * (map-side combine) applies — the shuffle carries one row per group per
  * partition, not the raw data. `first(ignoreNulls)` from the reference is
  * replaced with `min_by` over a unique ordering key: same semantics the
  * reference relies on, but deterministic under any partitioning (Spark's
  * `first` is order-sensitive and therefore not reproducible at scale).
  */
object GroupQueries {

  val all: Seq[Q] = Seq(

    // ---- q08: exact dedup via DISTINCT (ref P6, transform.py:98,296
    // dropDuplicates on products). Full-row distinct = hash aggregate on all
    // columns; at 100 TB this is one shuffle on the value hash.
    Q("q08_dedup",
      Some("""SELECT DISTINCT lang, source FROM documents
             |ORDER BY lang, source""".stripMargin),
      (s, d) => Tables.documents(s, d)
        .select("lang", "source").distinct()
        .orderBy("lang", "source")),

    // ---- q10: first-non-null-per-group collapse (ref A1,
    // transform.py:334-366 collapses multi-purchase clients with
    // first(ignoreNulls)). min_by/max_by over the unique o_orderkey gives
    // the reference's "first by insertion order" deterministically.
    Q("q10_groupby_first",
      Some("""SELECT o_custkey AS custkey,
             |       min_by(o_orderstatus, o_orderkey) AS first_status,
             |       max_by(o_orderpriority, o_orderkey) AS last_priority,
             |       CAST(MIN(o_orderdate) AS DATE) AS first_date,
             |       COUNT(*) AS n_orders
             |FROM orders
             |GROUP BY 1
             |ORDER BY custkey""".stripMargin),
      (s, d) => Tables.orders(s, d)
        .groupBy(col("o_custkey").as("custkey"))
        .agg(
          min_by(col("o_orderstatus"), col("o_orderkey")).as("first_status"),
          max_by(col("o_orderpriority"), col("o_orderkey")).as("last_priority"),
          min(col("o_orderdate").cast(DateType)).as("first_date"),
          count(lit(1)).as("n_orders"))
        .orderBy("custkey")),

    // ---- q16: data-quality count metrics (ref P7, transform.py:173-178
    // missing-product gate; generalized to a one-pass DQ profile).
    Q("q16_dq_counts",
      Some("""SELECT COUNT(*) AS n_rows,
             |       COUNT(CASE WHEN l_shipdate IS NULL THEN 1 END) AS n_null_ship,
             |       COUNT(CASE WHEN l_discount < 0 OR l_discount > 0.5 THEN 1 END) AS n_bad_disc,
             |       COUNT(CASE WHEN l_quantity <= 0 THEN 1 END) AS n_bad_qty,
             |       COUNT(DISTINCT l_orderkey) AS n_orders,
             |       CAST(MIN(l_shipdate) AS DATE) AS first_ship,
             |       CAST(MAX(l_shipdate) AS DATE) AS last_ship
             |FROM lineitem""".stripMargin),
      (s, d) => Tables.lineitem(s, d)
        .agg(
          count(lit(1)).as("n_rows"),
          count(when(col("l_shipdate").isNull, 1)).as("n_null_ship"),
          count(when(col("l_discount") < 0 || col("l_discount") > 0.5, 1)).as("n_bad_disc"),
          count(when(col("l_quantity") <= 0, 1)).as("n_bad_qty"),
          countDistinct(col("l_orderkey")).as("n_orders"),
          min(col("l_shipdate").cast(DateType)).as("first_ship"),
          max(col("l_shipdate").cast(DateType)).as("last_ship"))),

    // ---- q18: multi-aggregate per group — count/sum/min/max/avg/distinct
    // (ref A2, the KPI layer). All money in exact BIGINT cents; the average
    // is floor(sum_cents / n) — one IEEE divide over exact integers, then
    // floor — identical in any engine at any parallelism.
    Q("q18_agg_multi",
      Some("""SELECT o_orderpriority AS priority,
             |       COUNT(*) AS n,
             |       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c,
             |       MIN(CAST(round(o_totalprice * 100) AS BIGINT)) AS min_price_c,
             |       MAX(CAST(round(o_totalprice * 100) AS BIGINT)) AS max_price_c,
             |       CAST(FLOOR(CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / COUNT(*)) AS BIGINT) AS avg_price_cents,
             |       COUNT(DISTINCT o_custkey) AS n_custs
             |FROM orders
             |GROUP BY 1
             |ORDER BY priority""".stripMargin),
      (s, d) => {
        val priceC = cents(col("o_totalprice"))
        Tables.orders(s, d)
          .groupBy(col("o_orderpriority").as("priority"))
          .agg(
            count(lit(1)).as("n"),
            sum(priceC).as("sum_price_c"),
            min(priceC).as("min_price_c"),
            max(priceC).as("max_price_c"),
            floor(sum(priceC).cast(DoubleType) / count(lit(1)))
              .cast(LongType).as("avg_price_cents"),
            countDistinct(col("o_custkey")).as("n_custs"))
          .orderBy("priority")
      }),

    // ---- q19: exact distinct counts per group (ref A4, the "loyal
    // customers" distinct-sale counting). countDistinct expands to a
    // two-phase aggregate; approx_count_distinct (HLL) is the 100 TB
    // alternative but is sketch-implementation-specific, so only the exact
    // form is oracle-checked.
    Q("q19_agg_distinct",
      Some("""SELECT l_returnflag AS rflag,
             |       COUNT(DISTINCT l_partkey) AS nd_part,
             |       COUNT(DISTINCT l_suppkey) AS nd_supp,
             |       COUNT(DISTINCT CAST(l_shipdate AS DATE)) AS nd_days,
             |       COUNT(*) AS n
             |FROM lineitem
             |GROUP BY 1
             |ORDER BY rflag""".stripMargin),
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag").as("rflag"))
        .agg(
          countDistinct(col("l_partkey")).as("nd_part"),
          countDistinct(col("l_suppkey")).as("nd_supp"),
          countDistinct(col("l_shipdate").cast(DateType)).as("nd_days"),
          count(lit(1)).as("n"))
        .orderBy("rflag")),

    // ---- q20: rollup subtotals over a dimension join (ref A3 — dashboard
    // subtotal parity; absent from the reference itself).
    Q("q20_rollup",
      Some("""SELECT COALESCE(c_mktsegment, 'ALL') AS segment,
             |       COALESCE(o_orderstatus, 'ALL') AS status,
             |       COUNT(*) AS n,
             |       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY ROLLUP(c_mktsegment, o_orderstatus)
             |ORDER BY segment, status""".stripMargin),
      (s, d) => {
        val o = Tables.orders(s, d)
        val c = Tables.customer(s, d).select("c_custkey", "c_mktsegment")
        o.join(dimBroadcast(c), o("o_custkey") === c("c_custkey"))
          .rollup(col("c_mktsegment"), col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            sum(cents(col("o_totalprice"))).as("sum_price_c"))
          .select(
            coalesce(col("c_mktsegment"), lit("ALL")).as("segment"),
            coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
            col("n"), col("sum_price_c"))
          .orderBy("segment", "status")
      }),

    // ---- q27: cube over two low-cardinality dimensions (§2.5 A3).
    Q("q27_cube",
      Some("""SELECT COALESCE(l_returnflag, 'ALL') AS rflag,
             |       COALESCE(l_linestatus, 'ALL') AS lstatus,
             |       COUNT(*) AS n,
             |       CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c
             |FROM lineitem
             |GROUP BY CUBE(l_returnflag, l_linestatus)
             |ORDER BY rflag, lstatus""".stripMargin),
      (s, d) => Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(cents(col("l_quantity"))).as("sum_qty_c"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
          col("n"), col("sum_qty_c"))
        .orderBy("rflag", "lstatus")),

    // ---- q68: exact grouped percentiles — p50/p95 latency-style order
    // statistics per group, Spark's exact `percentile` vs DuckDB's
    // quantile_cont (both define rank = p*(n-1) with linear interpolation
    // lower + frac*(higher-lower), so the doubles agree bit-for-bit on
    // identical inputs). Exact percentile buffers each group's values —
    // fine for bounded groups; at unbounded scale approx_percentile (
    // KLL-ish sketch, fixed state, partial-merge) is the drop-in, tested
    // for self-consistency in KmvSketchSpec's HLL pattern.
    Q("q68_grouped_quantiles",
      Some("""SELECT o_orderpriority AS priority,
             |       COUNT(*) AS n,
             |       quantile_cont(o_totalprice, 0.5) AS p50,
             |       quantile_cont(o_totalprice, 0.95) AS p95
             |FROM orders
             |GROUP BY 1
             |ORDER BY priority""".stripMargin),
      (s, d) => Tables.orders(s, d)
        .groupBy(col("o_orderpriority").as("priority"))
        .agg(count(lit(1)).as("n"),
          expr("percentile(o_totalprice, 0.5)").as("p50"),
          expr("percentile(o_totalprice, 0.95)").as("p95"))
        .orderBy("priority")),

    // ---- q114: contribution analysis — each nation's share of its
    // region's revenue, in exact ppm (the percent-of-total column every
    // drill-down report carries). The window runs over the AGGREGATED
    // frame (nations-sized), so the share computation costs nothing at
    // any fact scale — the pattern to pin is "aggregate first, window
    // the rollup", never a window over fact rows. Revenue is strictly
    // positive, keeping the floored division on the positive domain
    // where Spark `div` and DuckDB `//` agree (they differ on negatives:
    // truncation vs floor — every graft ratio keeps positive operands).
    Q("q114_contribution",
      Some("""WITH r AS (SELECT n.n_regionkey AS region, n.n_name AS nation,
             |                 CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_c
             |          FROM orders o
             |          JOIN customer c ON o.o_custkey = c.c_custkey
             |          JOIN nation n ON c.c_nationkey = n.n_nationkey
             |          GROUP BY 1, 2)
             |SELECT region, nation, rev_c,
             |       CAST((rev_c * 1000000) // SUM(rev_c) OVER (PARTITION BY region) AS BIGINT) AS share_ppm
             |FROM r ORDER BY region, nation""".stripMargin),
      (s, d) => {
        val r = Tables.orders(s, d)
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_regionkey").as("region"), col("n_name").as("nation"))
          .agg(sum(graft.functions.Exact.cents(col("o_totalprice"))).as("rev_c"))
        r.withColumn("share_ppm",
            expr("(rev_c * 1000000) div sum(rev_c) over (partition by region)"))
          .orderBy("region", "nation")
      }),

    // ---- q134: UNPIVOT / melt — the wide→long reshape (q47's inverse):
    // a metrics row per (group, metric) is what generic dashboards,
    // metric stores, and drift monitors consume. Spark expresses it as
    // the `stack` generator (codegen, map-side, no shuffle beyond the
    // feeding aggregate); the oracle uses the portable UNION ALL form —
    // reshaping must not change a single value, which the hash compare
    // enforces per cell.
    Q("q134_unpivot_metrics",
      Some("""WITH m AS (SELECT o_orderpriority AS prio,
             |                 CAST(COUNT(*) AS BIGINT) AS n_orders,
             |                 CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_c,
             |                 CAST(MIN(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS min_c,
             |                 CAST(MAX(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS max_c
             |          FROM orders GROUP BY 1)
             |SELECT prio, metric, value FROM (
             |  SELECT prio, 'n_orders' AS metric, n_orders AS value FROM m
             |  UNION ALL SELECT prio, 'sum_c', sum_c FROM m
             |  UNION ALL SELECT prio, 'min_c', min_c FROM m
             |  UNION ALL SELECT prio, 'max_c', max_c FROM m)
             |ORDER BY prio, metric""".stripMargin),
      (s, d) => {
        val m = Tables.orders(s, d)
          .groupBy(col("o_orderpriority").as("prio"))
          .agg(count(lit(1)).as("n_orders"),
            sum(cents(col("o_totalprice"))).as("sum_c"),
            min(cents(col("o_totalprice"))).as("min_c"),
            max(cents(col("o_totalprice"))).as("max_c"))
        m.select(col("prio"), expr(
            "stack(4, 'n_orders', n_orders, 'sum_c', sum_c, " +
              "'min_c', min_c, 'max_c', max_c) AS (metric, value)"))
          .orderBy("prio", "metric")
      }),

    // ---- q135: grouped ordered-array aggregation — per nation, the
    // top-3 customer balances as an ORDERED list column (the shape
    // feature stores and API layers export: one row per entity, ranked
    // list inside). collect_list has no deterministic order under
    // parallel merge, so the rank rides INSIDE the collected struct and
    // array_sort restores it — the only safe way to emit ordered lists
    // from a distributed agg. Emitted as a joined string: array columns
    // hash-compare differently across engines, strings never do.
    Q("q135_grouped_toplist",
      Some("""WITH c AS (SELECT c_nationkey AS nk, c_custkey AS ck,
             |                 CAST(round(c_acctbal * 100) AS BIGINT) AS bal FROM customer),
             |r AS (SELECT nk, ck, bal,
             |        row_number() OVER (PARTITION BY nk ORDER BY bal DESC, ck) AS rnk FROM c)
             |SELECT nk, CAST(COUNT(*) AS BIGINT) AS n_top,
             |       string_agg(CAST(bal AS VARCHAR), ',' ORDER BY rnk) AS top_bals
             |FROM r WHERE rnk <= 3 GROUP BY 1 ORDER BY nk""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy(col("nk"))
          .orderBy(col("bal").desc, col("ck"))
        Tables.customer(s, d)
          .select(col("c_nationkey").as("nk"), col("c_custkey").as("ck"),
            cents(col("c_acctbal")).as("bal"))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 3)
          .groupBy("nk")
          .agg(count(lit(1)).as("n_top"),
            array_join(transform(
              array_sort(collect_list(struct(col("rnk"), col("bal")))),
              x => x.getField("bal").cast("string")), ",").as("top_bals"))
          .orderBy("nk")
      }),

    // ---- q136: multi-metric pivot — q47 widened to several aggregates
    // per pivot bucket (count AND exact-cents sum per order status), the
    // actual shape of a KPI matrix. One Expand-free pivot: Spark plans
    // pivot-with-multiple-aggs as a single aggregate whose output
    // columns are the (status × metric) cross — one shuffle total; the
    // oracle writes the same matrix as explicit CASE columns (the
    // portable form). Column names are pinned on both sides.
    Q("q136_pivot_multi",
      Some("""SELECT o_orderpriority AS prio,
             |       CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS f_n,
             |       CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(round(o_totalprice * 100) AS BIGINT) END), 0) AS BIGINT) AS f_sum_c,
             |       CAST(COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS o_n,
             |       CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(round(o_totalprice * 100) AS BIGINT) END), 0) AS BIGINT) AS o_sum_c,
             |       CAST(COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS p_n,
             |       CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(round(o_totalprice * 100) AS BIGINT) END), 0) AS BIGINT) AS p_sum_c
             |FROM orders
             |GROUP BY 1 ORDER BY prio""".stripMargin),
      (s, d) => {
        val piv = Tables.orders(s, d)
          .groupBy(col("o_orderpriority").as("prio"))
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(count(lit(1)).as("n"), sum(cents(col("o_totalprice"))).as("sum_c"))
        // pivot emits NULL for empty (group, bucket) cells — normalize to
        // the 0 the CASE-based oracle produces
        def z(c: String) = coalesce(col(c), lit(0L))
        piv.select(col("prio"),
            z("F_n").as("f_n"), z("F_sum_c").as("f_sum_c"),
            z("O_n").as("o_n"), z("O_sum_c").as("o_sum_c"),
            z("P_n").as("p_n"), z("P_sum_c").as("p_sum_c"))
          .orderBy("prio")
      })
  )
}
