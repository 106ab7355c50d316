package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{Derived, Tables}
import graft.operators.Cleaning

/** Row-level scalar-function inventory (SURVEY.md §2.2-2.3): string
  * cleaning, conditional repair, date functions, substring/isin, regex
  * extraction. Each transplants a reference cleaning rule onto the harness
  * tables; all expressions are Catalyst built-ins inside one projection, so
  * the whole query is a single codegen'd scan stage — no shuffle at all.
  */
object RowQueries {

  val all: Seq[Q] = Seq(

    // ---- q04: whitespace scrub + edge-quote strip + email-style normalize
    // (ref F1-F3, transform.py:53-70,61,372).
    Q("q04_string_clean",
      Some("""SELECT c_custkey AS custkey,
             |       trim(regexp_replace(c_name, '[\t\r\n]+', ' ', 'g')) AS name_clean,
             |       regexp_replace(regexp_replace(c_mktsegment, '^[\s"]+|[\s"]+$', '', 'g'), '"', '', 'g') AS seg_clean,
             |       lower(trim(regexp_replace(c_name, '[^a-zA-Z0-9._%+\-@]+', '', 'g'))) AS email_norm
             |FROM customer
             |ORDER BY custkey""".stripMargin),
      (s, d) => Tables.customer(s, d)
        .select(
          col("c_custkey").as("custkey"),
          Cleaning.scrubWhitespace(col("c_name")).as("name_clean"),
          Cleaning.stripEdgeQuotes(col("c_mktsegment")).as("seg_clean"),
          Cleaning.normalizeEmail(col("c_name")).as("email_norm"))
        .orderBy("custkey")),

    // ---- q05: conditional repair — when/otherwise chains, coalesce/nullif,
    // startsWith + substr + concat, and the phone standardization rule
    // (ref F4/F6/F7/F9/F10, transform.py:72-87,139-149,184-220,405).
    Q("q05_conditional",
      Some("""SELECT c_custkey AS custkey,
             |       CASE WHEN c_acctbal < 0 THEN 'overdrawn'
             |            WHEN c_acctbal < 1000 THEN 'low'
             |            WHEN c_acctbal < 5000 THEN 'mid'
             |            ELSE 'high' END AS bal_band,
             |       CASE WHEN c_name LIKE 'Customer#%'
             |            THEN 'C_' || substring(c_name, 10, 9)
             |            ELSE c_name END AS short_id,
             |       COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), 'OTHER') AS seg_or_other,
             |       CASE WHEN length(regexp_replace(CAST((c_custkey + 1) * 67000 AS VARCHAR), '^0+', '')) = 9
             |                 AND regexp_matches(regexp_replace(CAST((c_custkey + 1) * 67000 AS VARCHAR), '^0+', ''), '^[0-9]+$')
             |            THEN '+33' || regexp_replace(CAST((c_custkey + 1) * 67000 AS VARCHAR), '^0+', '')
             |            ELSE NULL END AS phone_std
             |FROM customer
             |ORDER BY custkey""".stripMargin),
      (s, d) => Tables.customer(s, d)
        .select(
          col("c_custkey").as("custkey"),
          when(col("c_acctbal") < 0, "overdrawn")
            .when(col("c_acctbal") < 1000, "low")
            .when(col("c_acctbal") < 5000, "mid")
            .otherwise("high").as("bal_band"),
          when(col("c_name").startsWith("Customer#"),
            concat(lit("C_"), substring(col("c_name"), 10, 9)))
            .otherwise(col("c_name")).as("short_id"),
          coalesce(nullif(col("c_mktsegment"), lit("MACHINERY")), lit("OTHER")).as("seg_or_other"),
          Cleaning.standardizePhone(((col("c_custkey") + 1) * 67000).cast(StringType)).as("phone_std"))
        .orderBy("custkey")),

    // ---- q06: date functions — year/month/day extraction, ISO weekday,
    // datediff (ref F5, extract.py:86, transform.py:134-136 + the
    // "trends by month" KPI shape). Aggregated by calendar month.
    Q("q06_date_funcs",
      Some("""SELECT CAST(year(l_shipdate) AS BIGINT) AS y,
             |       CAST(month(l_shipdate) AS BIGINT) AS m,
             |       COUNT(*) AS n,
             |       CAST(MIN(l_shipdate) AS DATE) AS first_ship,
             |       CAST(MAX(l_shipdate) AS DATE) AS last_ship,
             |       MIN(CAST(datediff('day', CAST(l_shipdate AS DATE), DATE '1999-01-01') AS BIGINT)) AS min_days_to_99
             |FROM lineitem
             |GROUP BY 1, 2
             |ORDER BY y, m""".stripMargin),
      (s, d) => Tables.lineitem(s, d)
        .groupBy(
          year(col("l_shipdate")).cast(LongType).as("y"),
          month(col("l_shipdate")).cast(LongType).as("m"))
        .agg(
          count(lit(1)).as("n"),
          min(col("l_shipdate").cast(DateType)).as("first_ship"),
          max(col("l_shipdate").cast(DateType)).as("last_ship"),
          min(datediff(lit(java.sql.Date.valueOf("1999-01-01")),
            col("l_shipdate").cast(DateType)).cast(LongType)).as("min_days_to_99"))
        .orderBy("y", "m")),

    // ---- q07: substring extraction + isin whitelist validation
    // (ref F8, transform.py:180-251 store-ID derivation + whitelist).
    Q("q07_substr_isin",
      Some("""SELECT p_partkey AS pkey,
             |       substring(p_brand, 7, 2) AS brand_num,
             |       p_brand IN ('Brand#1', 'Brand#2', 'Brand#13', 'Brand#17') AS is_listed
             |FROM part
             |WHERE p_size IN (1, 3, 5, 7)
             |ORDER BY pkey""".stripMargin),
      (s, d) => Tables.part(s, d)
        .filter(col("p_size").isin(1, 3, 5, 7))
        .select(
          col("p_partkey").as("pkey"),
          substring(col("p_brand"), 7, 2).as("brand_num"),
          col("p_brand").isin("Brand#1", "Brand#2", "Brand#13", "Brand#17").as("is_listed"))
        .orderBy("pkey")),

    // ---- q15: regex group extraction from a raw string column
    // (ref S4, extract.py:134-153 parses pipe-delimited text via
    // regexp_extract; here applied to the events.props JSON-ish strings).
    Q("q15_regex_extract",
      Some("""SELECT event_id AS eid, event_type AS etype,
             |       CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INTEGER) AS k
             |FROM events
             |ORDER BY eid""".stripMargin),
      (s, d) => Tables.events(s, d)
        .select(
          col("event_id").as("eid"),
          col("event_type").as("etype"),
          regexp_extract(col("props"), "\"k\": ([0-9]+)", 1).cast(IntegerType).as("k"))
        .orderBy("eid")),

    // ---- q83: PERMISSIVE CSV read with bad-record QUARANTINE — the
    // 100 TB posture for dirty text inputs: FAILFAST kills the job on one
    // bad line, DROPMALFORMED hides data loss; PERMISSIVE routes every
    // unparseable line's raw text into _corrupt_record so ONE read splits
    // clean rows from a bad-record audit frame (Tables.csvWithQuarantine,
    // SinksSpec-tested since round 3 — declared here so the driver's
    // oracle certifies the split). The dirty CSV is SYNTHESIZED
    // deterministically from the customer parquet (rows with
    // c_custkey % 37 = 3 get "N/A" in a BIGINT column), so the oracle
    // can compute both sides from the clean source: good rows must
    // reproduce count/key-sum/points-sum exactly, and the quarantined
    // side re-derives its keys FROM THE RAW CORRUPT LINES
    // (regexp_extract), proving the audit frame carries enough to triage.
    Q("q83_csv_quarantine",
      Some("""SELECT 'good' AS status, count(*) AS n,
             |       CAST(sum(c_custkey) AS BIGINT) AS key_sum,
             |       CAST(sum(c_custkey % 1000) AS BIGINT) AS pts_sum
             |FROM customer WHERE c_custkey % 37 <> 3
             |UNION ALL
             |SELECT 'quarantined', count(*),
             |       CAST(sum(c_custkey) AS BIGINT), CAST(NULL AS BIGINT)
             |FROM customer WHERE c_custkey % 37 = 3
             |ORDER BY status""".stripMargin),
      (s, d) => {
        val dir = s"/tmp/graft_derived/${new java.io.File(d).getName}/dirty_csv"
        Derived.ensure(dir, Derived.fingerprint(d, Seq("customer"))) {
          Tables.customer(s, d)
            .select(col("c_custkey"), col("c_name"),
              when(col("c_custkey") % 37 === 3, lit("N/A"))
                .otherwise((col("c_custkey") % 1000).cast("string")).as("points"))
            .write.mode("overwrite").option("header", "true").csv(dir)
        }
        val schema = StructType(Seq(
          StructField("c_custkey", LongType),
          StructField("c_name", StringType),
          StructField("points", LongType)))
        // Cached handle: Spark disallows plans that reference ONLY the
        // corrupt column of a raw CSV scan (the parser would never
        // materialize it); caching the parsed frame is the documented
        // idiom, and both branches reuse the single read anyway.
        graft.operators.CacheScope.release("q83")
        val parsed = graft.operators.CacheScope.persist("q83",
          Tables.csvWithQuarantine(s, schema, dir))
        val good = parsed.filter(col("_corrupt_record").isNull)
          .agg(count(lit(1)).as("n"), sum(col("c_custkey")).as("key_sum"),
            sum(col("points")).as("pts_sum"))
          .select(lit("good").as("status"), col("n"), col("key_sum"), col("pts_sum"))
        val quarantined = parsed.filter(col("_corrupt_record").isNotNull)
          .agg(count(lit(1)).as("n"),
            sum(regexp_extract(col("_corrupt_record"), "^([0-9]+),", 1)
              .cast("long")).as("key_sum"))
          .select(lit("quarantined").as("status"), col("n"), col("key_sum"),
            lit(null).cast("long").as("pts_sum"))
        good.unionByName(quarantined).orderBy("status")
      }),

    // ---- q69: PII masking + stable pseudonymization — the anonymization
    // stage of a training-data pipeline: identifier digits masked by regex,
    // and a salted-hash pseudonym that is STABLE (same entity → same
    // pseudonym across runs and tables, enabling joins on pseudonymized
    // data) but not reversible without the salt. Map-only codegen; at
    // 100 TB anonymization is the scan. (The synthetic corpus carries no
    // free-text PII, so the demonstration material is the customer
    // identifier column — the operator is the point, not the data.)
    Q("q69_pseudonymize",
      Some("""SELECT c_custkey AS ckey,
             |       regexp_replace(c_name, '[0-9]', '#', 'g') AS masked_name,
             |       md5(concat('graft_salt_v1:', c_name)) AS pseudonym
             |FROM customer
             |ORDER BY ckey""".stripMargin),
      (s, d) => Tables.customer(s, d)
        .select(
          col("c_custkey").as("ckey"),
          regexp_replace(col("c_name"), "[0-9]", "#").as("masked_name"),
          md5(concat(lit("graft_salt_v1:"), col("c_name"))).as("pseudonym"))
        .orderBy("ckey")),

    // ---- q117: order-independent table checksum — one row summarizing a
    // table's full content as (row count, sum of bounded row hashes), the
    // anti-entropy fingerprint replicas/migrations compare to detect
    // divergence without moving data (pairs with q62's row-level
    // reconcile: checksum first, cogroup-diff only on mismatch). SUM over
    // per-row md5-derived integers is commutative — partition order,
    // file order, and parallelism cannot change it — and partial
    // aggregation makes it one scan + a 1-row exchange. Row hashes are
    // bounded to 10^12 so 10^6 rows stay ~10^18, inside BIGINT; at
    // larger scales the sum wraps per-partition into modular arithmetic
    // (both engines would need the same mod — noted, not needed here).
    Q("q117_table_checksum",
      Some("""WITH m AS (SELECT md5(CONCAT_WS('|',
             |             CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR), o_orderstatus,
             |             CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR))) AS hx
             |          FROM orders),
             |h AS (SELECT CAST(list_sum(list_transform(generate_series(1, 12),
             |        i -> (CASE WHEN ord(substr(hx, i, 1)) >= 97
             |              THEN ord(substr(hx, i, 1)) - 87
             |              ELSE ord(substr(hx, i, 1)) - 48 END)
             |             * CAST(pow(16, 12 - i) AS BIGINT))) AS BIGINT) % 1000000000000 AS hv
             |      FROM m)
             |SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(hv) AS BIGINT) AS checksum
             |FROM h""".stripMargin),
      (s, d) => {
        val rowHash = conv(substring(md5(concat_ws("|",
            col("o_orderkey").cast("string"), col("o_custkey").cast("string"),
            col("o_orderstatus"),
            graft.functions.Exact.cents(col("o_totalprice")).cast("string"))),
          1, 12), 16, 10).cast("long") % 1000000000000L
        Tables.orders(s, d)
          .agg(count(lit(1)).as("n"), sum(rowHash).as("checksum"))
      })
  )
}
