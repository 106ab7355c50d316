package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables
import graft.operators.Joins.dimBroadcast
import graft.functions.Exact.cents

/** Core relational inventory (SURVEY.md §2.1-2.3 slice): scan / project /
  * rename / cast / filter / join / aggregate / top-k.
  *
  * Conventions shared by every query (and mirrored in its oracle SQL):
  *  - money math in exact BIGINT cents (graft.functions.Exact.cents) so
  *    distributed partial aggregation is order-independent AND the output
  *    schema carries no DecimalType (the driver's hash is decimal-
  *    representation-sensitive — round-1 lesson);
  *  - a total ORDER BY ending in a unique key, so output is deterministic;
  *  - every computed column aliased identically in Spark and SQL (the
  *    driver's compare keys on column names).
  */
object CoreQueries {

  val all: Seq[Q] = Seq(

    // ---- q01: scan + projection + rename + cast (ref: etl/extract.py:70-81,
    // transform.py:123-131 conform renames; main.py:99-100 projections).
    // Column pruning must reach the parquet scan: only 4 of 11 columns read.
    Q("q01_scan_project",
      Some("""SELECT l_orderkey AS okey, l_linenumber AS lineno,
             |       CAST(l_quantity AS INTEGER) AS qty, l_returnflag AS rflag
             |FROM lineitem
             |ORDER BY okey, lineno""".stripMargin),
      (s, d) => Tables.lineitem(s, d)
        .select(
          col("l_orderkey").as("okey"),
          col("l_linenumber").as("lineno"),
          col("l_quantity").cast(IntegerType).as("qty"),
          col("l_returnflag").as("rflag"))
        .orderBy("okey", "lineno")),

    // ---- q02: filter predicates incl. null checks and <> (ref:
    // transform.py:334-335 null-email filter; extract.py:143 header filter).
    // Predicates push down to the parquet scan.
    Q("q02_filter_pred",
      Some("""SELECT o_orderkey AS okey, o_custkey AS custkey,
             |       o_orderstatus AS status,
             |       CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
             |FROM orders
             |WHERE o_orderstatus <> 'O' AND o_totalprice > 150000
             |  AND o_orderdate IS NOT NULL
             |ORDER BY okey""".stripMargin),
      (s, d) => Tables.orders(s, d)
        .filter(col("o_orderstatus") =!= "O" && col("o_totalprice") > 150000
          && col("o_orderdate").isNotNull)
        .select(
          col("o_orderkey").as("okey"),
          col("o_custkey").as("custkey"),
          col("o_orderstatus").as("status"),
          cents(col("o_totalprice")).as("price_cents"))
        .orderBy("okey")),

    // ---- q03: type casts across the reference's whole cast vocabulary
    // (ref: extract.py:84-85 bool, transform.py:51,92 int, 105,148 double,
    // 294 double, 397 string). Money lands as exact integer cents, not
    // decimal — the sink-boundary DECIMAL(10,2) of the reference is a
    // storage concern, not a query-output type.
    Q("q03_cast_types",
      Some("""SELECT p_partkey AS pkey,
             |       CAST(p_size AS VARCHAR) AS size_str,
             |       CAST(round(p_retailprice * 100) AS BIGINT) AS retail_cents,
             |       CAST(p_partkey AS DOUBLE) AS pkey_d,
             |       CAST(p_size >= 3 AS BOOLEAN) AS is_large
             |FROM part
             |ORDER BY pkey""".stripMargin),
      (s, d) => Tables.part(s, d)
        .select(
          col("p_partkey").as("pkey"),
          col("p_size").cast(StringType).as("size_str"),
          cents(col("p_retailprice")).as("retail_cents"),
          col("p_partkey").cast(DoubleType).as("pkey_d"),
          (col("p_size") >= 3).cast(BooleanType).as("is_large"))
        .orderBy("pkey")),

    // ---- q11: left equi-join big->small dimension, size-gated broadcast,
    // null backfill with coalesce (ref: transform.py:96-103,152-170,399-406 —
    // all five reference joins are this shape). At 100 TB the fact side
    // streams; the dimension broadcasts only while it provably fits.
    // revenue_e4 = sum(price_cents * (100 - discount_pct)) — exact longs in
    // 1e-4 currency units.
    Q("q11_join_left",
      Some("""SELECT COALESCE(p.p_brand, 'UNKNOWN') AS brand,
             |       COUNT(*) AS n_items,
             |       CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT) *
             |                (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4
             |FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
             |GROUP BY 1
             |ORDER BY brand""".stripMargin),
      (s, d) => {
        val l = Tables.lineitem(s, d)
        val p = Tables.part(s, d).select("p_partkey", "p_brand")
        l.join(dimBroadcast(p), l("l_partkey") === p("p_partkey"), "left")
          .groupBy(coalesce(col("p_brand"), lit("UNKNOWN")).as("brand"))
          .agg(
            count(lit(1)).as("n_items"),
            sum(cents(col("l_extendedprice")) *
                (lit(100L) - cents(col("l_discount")))).as("revenue_e4"))
          .orderBy("brand")
      }),

    // ---- q17: TPC-H Q1-style grouped aggregation — the "global sales
    // trends" KPI shape (ref: README.md:47-51; A2 in SURVEY §2.5). Partial
    // (map-side) aggregation applies because all sums are over exact longs:
    // cents (1e-2), cents*pct (1e-4), cents*pct*pct (1e-6 units).
    Q("q17_agg_sum",
      Some("""SELECT l_returnflag AS rflag, l_linestatus AS lstatus,
             |       CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
             |       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_c,
             |       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT) *
             |                (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS sum_disc_e4,
             |       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT) *
             |                (100 - CAST(round(l_discount * 100) AS BIGINT)) *
             |                (100 + CAST(round(l_tax * 100) AS BIGINT))) AS BIGINT) AS sum_charge_e6,
             |       COUNT(*) AS n
             |FROM lineitem
             |WHERE l_shipdate <= DATE '1998-09-02'
             |GROUP BY 1, 2
             |ORDER BY rflag, lstatus""".stripMargin),
      (s, d) => {
        val priceC = cents(col("l_extendedprice"))
        val discMul = lit(100L) - cents(col("l_discount"))
        val taxMul  = lit(100L) + cents(col("l_tax"))
        Tables.lineitem(s, d)
          .filter(col("l_shipdate") <= lit(java.sql.Date.valueOf("1998-09-02")))
          .groupBy(col("l_returnflag").as("rflag"), col("l_linestatus").as("lstatus"))
          .agg(
            sum(cents(col("l_quantity"))).as("sum_qty_c"),
            sum(priceC).as("sum_base_c"),
            sum(priceC * discMul).as("sum_disc_e4"),
            sum(priceC * discMul * taxMul).as("sum_charge_e6"),
            count(lit(1)).as("n"))
          .orderBy("rflag", "lstatus")
      }),

    // ---- q24: the flagship "best products" top-k — scan→join→agg→sort→limit
    // (ref: README.md:47-51 product-performance KPI; SURVEY §7 step 1).
    // Deterministic: exact integer revenue + unique tie-break on pkey.
    // Physical shape: broadcast join → partial agg → TakeOrderedAndProject.
    Q("q24_sort_limit_topk",
      Some("""SELECT p.p_partkey AS pkey, p.p_name AS pname,
             |       CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT) *
             |                (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4
             |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
             |GROUP BY 1, 2
             |ORDER BY revenue_e4 DESC, pkey
             |LIMIT 10""".stripMargin),
      (s, d) => {
        val l = Tables.lineitem(s, d)
        val p = Tables.part(s, d).select("p_partkey", "p_name")
        l.join(dimBroadcast(p), l("l_partkey") === p("p_partkey"))
          .groupBy(col("p_partkey").as("pkey"), col("p_name").as("pname"))
          .agg(sum(cents(col("l_extendedprice")) *
                 (lit(100L) - cents(col("l_discount")))).as("revenue_e4"))
          .orderBy(col("revenue_e4").desc, col("pkey"))
          .limit(10)
      })
  )
}
