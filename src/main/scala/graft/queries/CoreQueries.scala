package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables
import graft.functions.Exact.dec

/** Core relational inventory (SURVEY.md §2.1-2.3 slice): scan / project /
  * rename / cast / filter / join / aggregate / top-k.
  *
  * Conventions shared by every query (and mirrored in its oracle SQL):
  *  - money math in exact DecimalType so distributed partial aggregation is
  *    order-independent (see graft.functions.Exact);
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
             |       CAST(o_totalprice AS DECIMAL(18,2)) AS price
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
          dec(col("o_totalprice")).as("price"))
        .orderBy("okey")),

    // ---- q03: type casts across the reference's whole cast vocabulary
    // (ref: extract.py:84-85 bool, transform.py:51,92 int, 105,148 double,
    // 294 double, 397 string).
    Q("q03_cast_types",
      Some("""SELECT p_partkey AS pkey,
             |       CAST(p_size AS VARCHAR) AS size_str,
             |       CAST(p_retailprice AS DECIMAL(12,2)) AS retail,
             |       CAST(p_partkey AS DOUBLE) AS pkey_d,
             |       CAST(p_size >= 3 AS BOOLEAN) AS is_large
             |FROM part
             |ORDER BY pkey""".stripMargin),
      (s, d) => Tables.part(s, d)
        .select(
          col("p_partkey").as("pkey"),
          col("p_size").cast(StringType).as("size_str"),
          col("p_retailprice").cast(DecimalType(12, 2)).as("retail"),
          col("p_partkey").cast(DoubleType).as("pkey_d"),
          (col("p_size") >= 3).cast(BooleanType).as("is_large"))
        .orderBy("pkey")),

    // ---- q11: left equi-join big->small dimension, broadcast hint, null
    // backfill with coalesce (ref: transform.py:96-103,152-170,399-406 — all
    // five reference joins are this shape). At 100 TB the fact side streams;
    // the dimension broadcasts (part is ~MBs even at sf100).
    Q("q11_join_left",
      Some("""SELECT COALESCE(p.p_brand, 'UNKNOWN') AS brand,
             |       COUNT(*) AS n_items,
             |       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) *
             |                CAST(1 - CAST(l.l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)))
             |            AS DECIMAL(38,4)) AS revenue
             |FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
             |GROUP BY 1
             |ORDER BY brand""".stripMargin),
      (s, d) => {
        val l = Tables.lineitem(s, d)
        val p = Tables.part(s, d).select("p_partkey", "p_brand")
        l.join(broadcast(p), l("l_partkey") === p("p_partkey"), "left")
          .groupBy(coalesce(col("p_brand"), lit("UNKNOWN")).as("brand"))
          .agg(
            count(lit(1)).as("n_items"),
            sum(dec(col("l_extendedprice"), 12, 2) *
                (lit(1) - dec(col("l_discount"), 4, 2)).cast(DecimalType(4, 2)))
              .cast(DecimalType(38, 4)).as("revenue"))
          .orderBy("brand")
      }),

    // ---- q17: TPC-H Q1-style grouped aggregation — the "global sales
    // trends" KPI shape (ref: README.md:47-51; A2 in SURVEY §2.5). Partial
    // (map-side) aggregation applies because all aggs are associative.
    Q("q17_agg_sum",
      Some("""SELECT l_returnflag AS rflag, l_linestatus AS lstatus,
             |       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS sum_qty,
             |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS sum_base,
             |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
             |                CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)))
             |            AS DECIMAL(38,4)) AS sum_disc_price,
             |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
             |                CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)) *
             |                CAST(1 + CAST(l_tax AS DECIMAL(4,2)) AS DECIMAL(4,2)))
             |            AS DECIMAL(38,6)) AS sum_charge,
             |       COUNT(*) AS n
             |FROM lineitem
             |WHERE l_shipdate <= DATE '1998-09-02'
             |GROUP BY 1, 2
             |ORDER BY rflag, lstatus""".stripMargin),
      (s, d) => {
        val discount = (lit(1) - dec(col("l_discount"), 4, 2)).cast(DecimalType(4, 2))
        val taxMul   = (lit(1) + dec(col("l_tax"), 4, 2)).cast(DecimalType(4, 2))
        val price    = dec(col("l_extendedprice"), 12, 2)
        Tables.lineitem(s, d)
          .filter(col("l_shipdate") <= lit(java.sql.Date.valueOf("1998-09-02")))
          .groupBy(col("l_returnflag").as("rflag"), col("l_linestatus").as("lstatus"))
          .agg(
            sum(dec(col("l_quantity"), 12, 2)).cast(DecimalType(38, 2)).as("sum_qty"),
            sum(price).cast(DecimalType(38, 2)).as("sum_base"),
            sum(price * discount).cast(DecimalType(38, 4)).as("sum_disc_price"),
            sum(price * discount * taxMul).cast(DecimalType(38, 6)).as("sum_charge"),
            count(lit(1)).as("n"))
          .orderBy("rflag", "lstatus")
      }),

    // ---- q24: the flagship "best products" top-k — scan→join→agg→sort→limit
    // (ref: README.md:47-51 product-performance KPI; SURVEY §7 step 1).
    // Deterministic: exact decimal revenue + unique tie-break on pkey.
    Q("q24_sort_limit_topk",
      Some("""SELECT p.p_partkey AS pkey, p.p_name AS pname,
             |       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) *
             |                CAST(1 - CAST(l.l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)))
             |            AS DECIMAL(38,4)) AS revenue
             |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
             |GROUP BY 1, 2
             |ORDER BY revenue DESC, pkey
             |LIMIT 10""".stripMargin),
      (s, d) => {
        val l = Tables.lineitem(s, d)
        val p = Tables.part(s, d).select("p_partkey", "p_name")
        l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
          .groupBy(col("p_partkey").as("pkey"), col("p_name").as("pname"))
          .agg(sum(dec(col("l_extendedprice"), 12, 2) *
                 (lit(1) - dec(col("l_discount"), 4, 2)).cast(DecimalType(4, 2)))
            .cast(DecimalType(38, 4)).as("revenue"))
          .orderBy(col("revenue").desc, col("pkey"))
          .limit(10)
      })
  )
}
