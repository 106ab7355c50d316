package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.Joins.dimBroadcast
import graft.functions.Exact.cents

/** Join + set-operation inventory (SURVEY.md §2.4, §2.7): USING-style join,
  * semi/anti joins, union-by-name with missing-column null-fill,
  * intersect/except. Money emitted as exact BIGINT cents (see Exact.cents).
  */
object JoinSetQueries {

  val all: Seq[Q] = Seq(

    // ---- q12: USING-column equi-join (ref J4, transform.py:395-397 joins
    // fact to Dim_Client on="Email"). The shared-name join collapses the key
    // to a single output column.
    Q("q12_join_using",
      Some("""SELECT c_mktsegment AS segment, COUNT(*) AS n_orders,
             |       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_c
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY 1
             |ORDER BY segment""".stripMargin),
      (s, d) => {
        val o = Tables.orders(s, d).withColumnRenamed("o_custkey", "custkey")
        val c = Tables.customer(s, d).withColumnRenamed("c_custkey", "custkey")
          .select("custkey", "c_mktsegment")
        o.join(dimBroadcast(c), Seq("custkey"))
          .groupBy(col("c_mktsegment").as("segment"))
          .agg(count(lit(1)).as("n_orders"),
            sum(cents(col("o_totalprice"))).as("revenue_c"))
          .orderBy("segment")
      }),

    // ---- q13: anti join — rows with no match (ref J6, transform.py:173
    // "products not found" check, done natively instead of left-join +
    // isNull filter): customers with no high-value order. At scale:
    // broadcast the smaller side's keys.
    Q("q13_join_anti",
      Some("""SELECT c_custkey AS custkey, c_name AS cname
             |FROM customer c
             |WHERE NOT EXISTS (SELECT 1 FROM orders o
             |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
             |ORDER BY custkey""".stripMargin),
      (s, d) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d).filter(col("o_totalprice") > 450000).select("o_custkey")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select(col("c_custkey").as("custkey"), col("c_name").as("cname"))
          .orderBy("custkey")
      }),

    // ---- q26: semi join — EXISTS with a pushed predicate (§2.4, the
    // complement of q13; not in the reference but required for a complete
    // join surface).
    Q("q26_join_semi",
      Some("""SELECT c_custkey AS custkey, c_mktsegment AS segment
             |FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o
             |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
             |ORDER BY custkey""".stripMargin),
      (s, d) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d).filter(col("o_totalprice") > 300000).select("o_custkey")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select(col("c_custkey").as("custkey"), col("c_mktsegment").as("segment"))
          .orderBy("custkey")
      }),

    // ---- q14: union-by-name with missing-column null-fill (ref S2/O4,
    // extract.py:89-92,123-127 + transform.py:332,387 — the reference's
    // multi-file and SFCC∪CEGID unions). Spark aligns by name and null-fills
    // the absent column; the oracle writes the null padding explicitly.
    Q("q14_union",
      Some("""SELECT c_name AS name,
             |       CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_c,
             |       c_mktsegment AS segment, 'customer' AS kind
             |FROM customer
             |UNION ALL
             |SELECT s_name, CAST(round(s_acctbal * 100) AS BIGINT),
             |       CAST(NULL AS VARCHAR), 'supplier'
             |FROM supplier
             |ORDER BY kind, name""".stripMargin),
      (s, d) => {
        val c = Tables.customer(s, d).select(
          col("c_name").as("name"), cents(col("c_acctbal")).as("acctbal_c"),
          col("c_mktsegment").as("segment"), lit("customer").as("kind"))
        val su = Tables.supplier(s, d).select(
          col("s_name").as("name"), cents(col("s_acctbal")).as("acctbal_c"),
          lit("supplier").as("kind"))
        c.unionByName(su, allowMissingColumns = true)
          .orderBy("kind", "name")
      }),

    // ---- q25: intersect / except set semantics (§2.7 O5). Distinct
    // semantics on both, tagged and unioned into one result.
    Q("q25_setops",
      Some("""WITH c AS (SELECT DISTINCT c_nationkey AS nkey FROM customer),
             |     s AS (SELECT DISTINCT s_nationkey AS nkey FROM supplier)
             |SELECT 'both' AS op, nkey FROM (SELECT nkey FROM c INTERSECT SELECT nkey FROM s)
             |UNION ALL
             |SELECT 'cust_only' AS op, nkey FROM (SELECT nkey FROM c EXCEPT SELECT nkey FROM s)
             |UNION ALL
             |SELECT 'supp_only' AS op, nkey FROM (SELECT nkey FROM s EXCEPT SELECT nkey FROM c)
             |ORDER BY op, nkey""".stripMargin),
      (s, d) => {
        val c = Tables.customer(s, d).select(col("c_nationkey").as("nkey"))
        val su = Tables.supplier(s, d).select(col("s_nationkey").as("nkey"))
        val both = c.intersect(su).select(lit("both").as("op"), col("nkey"))
        val custOnly = c.except(su).select(lit("cust_only").as("op"), col("nkey"))
        val suppOnly = su.except(c).select(lit("supp_only").as("op"), col("nkey"))
        both.unionAll(custOnly).unionAll(suppOnly).orderBy("op", "nkey")
      }),

    // ---- q120: referential-integrity matrix — one audit frame covering
    // every FK edge of the star (child rows, orphan rows) in a single
    // run; the pre-load gate a warehouse runs before the q98 merge, and
    // the fleet-wide view q13's single anti-join generalizes to. Each
    // edge costs ONE left join against a unique parent key + a
    // count/sum aggregate (no second anti-join pass). Parent sides go
    // through the size-gated dimBroadcast: true dims broadcast, while a
    // fact-sized parent (lineitem->orders at 100 TB) degrades to a
    // shuffle join instead of a fatal forced broadcast.
    // Zero orphans is the PASS state — the row proves the check ran.
    Q("q120_fk_integrity",
      Some("""SELECT 'customer->nation' AS edge, CAST(COUNT(*) AS BIGINT) AS n_child,
             |       CAST(SUM(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
             |FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
             |UNION ALL
             |SELECT 'lineitem->orders' AS edge, CAST(COUNT(*) AS BIGINT) AS n_child,
             |       CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
             |FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
             |UNION ALL
             |SELECT 'orders->customer' AS edge, CAST(COUNT(*) AS BIGINT) AS n_child,
             |       CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
             |FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
             |ORDER BY edge""".stripMargin),
      (s, d) => {
        def edge(name: String, child: org.apache.spark.sql.DataFrame,
                 childKey: String, parent: org.apache.spark.sql.DataFrame,
                 parentKey: String) =
          child.select(col(childKey))
            .join(dimBroadcast(parent.select(col(parentKey).as("pk"))),
              col(childKey) === col("pk"), "left")
            .agg(count(lit(1)).as("n_child"),
              sum(when(col("pk").isNull, 1L).otherwise(0L)).as("n_orphans"))
            .select(lit(name).as("edge"), col("n_child"), col("n_orphans"))
        edge("customer->nation", Tables.customer(s, d), "c_nationkey",
            Tables.nation(s, d), "n_nationkey")
          .unionAll(edge("lineitem->orders", Tables.lineitem(s, d), "l_orderkey",
            Tables.orders(s, d), "o_orderkey"))
          .unionAll(edge("orders->customer", Tables.orders(s, d), "o_custkey",
            Tables.customer(s, d), "c_custkey"))
          .orderBy("edge")
      })
  )
}
