package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.Exact.cents
import graft.sources.{Derived, Tables}

/** Columnar-format interchange queries: ORC and Avro read+write round
  * trips, declared with FULL DuckDB oracles. The trick that makes a
  * non-parquet format oracle-checkable in a parquet-only harness: the
  * engine writes a fingerprint-keyed derived COPY of a source table in
  * the target format (rebuilt only when the source build changes — the
  * q79/q81 Derived pattern), reads it back, and aggregates; the oracle
  * runs the same aggregate on the original parquet. Content equality
  * across the format hop is exactly the property a format integration
  * must prove — a corrupted writer, a lossy type mapping, or a
  * misconfigured reader all surface as a hash mismatch.
  *
  * Scale notes: both formats are splittable columnar containers — the
  * read path partitions by file/stripe (ORC) / block (Avro) the same way
  * the parquet scans do, and predicate/column pushdown is native for ORC
  * (`spark.sql.orc.filterPushdown` on by default). Numeric columns only
  * (long/int/double/string): the exact-cents aggregation would expose any
  * lossy round-trip in the value path.
  */
object FormatQueries {

  private def derivedDir(sfDir: String, name: String): String = {
    val base = new java.io.File(sfDir).getName
    s"/tmp/graft_derived/$base/$name"
  }

  val all: Seq[Q] = Seq(

    // ---- q100: ORC write + read round trip over `supplier`. Spark's ORC
    // support is built in (no extra jars); the aggregate proves the hop
    // preserved every row and every value to the cent.
    Q("q100_orc_roundtrip",
      Some("""SELECT s_nationkey, CAST(COUNT(*) AS BIGINT) AS n,
             |       CAST(SUM(CAST(round(s_acctbal * 100) AS BIGINT)) AS BIGINT) AS sum_bal_c
             |FROM supplier
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        val dir = derivedDir(d, "supplier_orc")
        Derived.ensure(dir, Derived.fingerprint(d, Seq("supplier"))) {
          Tables.supplier(s, d).write.mode("overwrite").orc(dir)
        }
        s.read.orc(dir)
          .groupBy(col("s_nationkey"))
          .agg(count(lit(1)).as("n"), sum(cents(col("s_acctbal"))).as("sum_bal_c"))
          .orderBy("s_nationkey")
      }),

    // ---- q101: Avro write + read round trip over `part`. Avro is the
    // row-oriented interchange format of Kafka/schema-registry pipelines,
    // so the ingest edge of a 100 TB corpus often speaks it. Spark 4.1
    // ships org.apache.spark.sql.avro.AvroFileFormat inside spark-sql,
    // but this distribution's DataSourceRegister service file does not
    // map the "avro" short name — hence the fully-qualified provider
    // class, which lookupDataSource resolves via Class.forName.
    Q("q101_avro_roundtrip",
      Some("""SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n,
             |       CAST(SUM(CAST(round(p_retailprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c,
             |       CAST(SUM(p_size) AS BIGINT) AS sum_size
             |FROM part
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        val dir = derivedDir(d, "part_avro")
        Derived.ensure(dir, Derived.fingerprint(d, Seq("part"))) {
          Tables.part(s, d).write.mode("overwrite").format("org.apache.spark.sql.avro.AvroFileFormat").save(dir)
        }
        s.read.format("org.apache.spark.sql.avro.AvroFileFormat").load(dir)
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).as("n"),
            sum(cents(col("p_retailprice"))).as("sum_price_c"),
            sum(col("p_size")).cast("long").as("sum_size"))
          .orderBy("p_brand")
      }),

    // ---- q104: XML write + read round trip over `nation`. Spark 4
    // absorbed spark-xml (the Databricks donation) as a native source,
    // service-registered under "xml". XML is the partner-feed edge of
    // enterprise ingest. The read passes an EXPLICIT schema: XML carries
    // no type system, so schema inference would round-trip the INT keys
    // as LONG and hash-mismatch the oracle — the explicit schema is the
    // correct production posture anyway.
    Q("q104_xml_roundtrip",
      Some("""SELECT n_regionkey, CAST(COUNT(*) AS BIGINT) AS n,
             |       MIN(n_name) AS min_name
             |FROM nation
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        import org.apache.spark.sql.types._
        val dir = derivedDir(d, "nation_xml")
        Derived.ensure(dir, Derived.fingerprint(d, Seq("nation"))) {
          Tables.nation(s, d).write.mode("overwrite")
            .option("rowTag", "nation").format("xml").save(dir)
        }
        val schema = StructType(Seq(
          StructField("n_nationkey", IntegerType),
          StructField("n_name", StringType),
          StructField("n_regionkey", IntegerType)))
        s.read.schema(schema).option("rowTag", "nation").format("xml").load(dir)
          .groupBy(col("n_regionkey"))
          .agg(count(lit(1)).as("n"), min(col("n_name")).as("min_name"))
          .orderBy("n_regionkey")
      }),

    // ---- q113: schema-evolution read — a dataset whose later batches
    // ADDED a column (the normal life of any long-lived feed): batch 1
    // was written before `o_orderpriority` existed, batch 2 carries it.
    // `mergeSchema=true` unions the file schemas and null-fills the old
    // batch — the mechanism that lets a 100 TB historical lake evolve
    // without rewriting history. The two batches live as partition
    // directories (batch=1/2) of ONE fingerprint-keyed derived dataset;
    // the oracle reproduces the evolution with a CASE on the same date
    // cutoff. Old-batch rows surface with priority 'none' — proving the
    // null-fill, not hiding it.
    Q("q113_schema_evolution",
      Some("""SELECT COALESCE(CASE WHEN CAST(o_orderdate AS DATE) >= DATE '2001-01-01'
             |                     THEN o_orderpriority END, 'none') AS prio,
             |       CAST(COUNT(*) AS BIGINT) AS n,
             |       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_c
             |FROM orders
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        val dir = derivedDir(d, "orders_evolved")
        val cutoff = lit("2001-01-01").cast("date")
        Derived.ensure(dir, Derived.fingerprint(d, Seq("orders"))) {
          val o = Tables.orders(s, d)
          o.filter(col("o_orderdate").cast("date") < cutoff)
            .select("o_orderkey", "o_totalprice")
            .write.mode("overwrite").parquet(s"$dir/batch=1")
          o.filter(col("o_orderdate").cast("date") >= cutoff)
            .select("o_orderkey", "o_totalprice", "o_orderpriority")
            .write.mode("overwrite").parquet(s"$dir/batch=2")
        }
        s.read.option("mergeSchema", "true").parquet(dir)
          .groupBy(coalesce(col("o_orderpriority"), lit("none")).as("prio"))
          .agg(count(lit(1)).as("n"), sum(cents(col("o_totalprice"))).as("sum_c"))
          .orderBy("prio")
      }),

    // ---- q124: JSONL write + read round trip over `documents` metadata.
    // Spark's json writer emits one object per line — exactly the JSONL
    // that LLM training loaders and data-exchange pipelines consume, so
    // this hop is the EXPORT path of the corpus engine. Read back under
    // an explicit schema (JSON numbers would otherwise infer wide) and
    // aggregate per language; text itself stays out of the frame to keep
    // the round trip about structure, not string-escaping trivia.
    Q("q124_jsonl_roundtrip",
      Some("""SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
             |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
             |       MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
             |FROM documents
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        import org.apache.spark.sql.types._
        val dir = derivedDir(d, "documents_jsonl")
        Derived.ensure(dir, Derived.fingerprint(d, Seq("documents"))) {
          Tables.documents(s, d).select("doc_id", "lang", "n_chars")
            .write.mode("overwrite").json(dir)
        }
        val schema = StructType(Seq(
          StructField("doc_id", LongType), StructField("lang", StringType),
          StructField("n_chars", LongType)))
        s.read.schema(schema).json(dir)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"),
            min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
          .orderBy("lang")
      }),

    // ---- q125: zstd-compressed parquet round trip — codec choice is a
    // first-order cost lever at 100 TB (zstd ~30% smaller than snappy at
    // comparable scan speed; the write option is per-dataset, not
    // cluster-wide). Content equality across the codec hop is the check;
    // the exact-cents aggregate would expose any decode corruption.
    Q("q125_zstd_roundtrip",
      Some("""SELECT l_returnflag AS rf, CAST(COUNT(*) AS BIGINT) AS n,
             |       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c
             |FROM lineitem
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        val dir = derivedDir(d, "lineitem_zstd")
        Derived.ensure(dir, Derived.fingerprint(d, Seq("lineitem"))) {
          Tables.lineitem(s, d).select("l_returnflag", "l_extendedprice")
            .write.mode("overwrite").option("compression", "zstd").parquet(dir)
        }
        s.read.parquet(dir)
          .groupBy(col("l_returnflag").as("rf"))
          .agg(count(lit(1)).as("n"), sum(cents(col("l_extendedprice"))).as("sum_price_c"))
          .orderBy("rf")
      }),

    // ---- q196: transactional-table snapshot read — the Delta-style
    // write path (BASELINE "Parquet/Delta writes") self-built over plain
    // parquet (sources/TxnTable.scala: staged immutable data dirs + an
    // atomic put-if-absent commit log). The derived build makes THREE
    // commits — append(even orders), append(odd orders), overwrite(tiny
    // F-slice) — and the query time-travels to version 1: the full
    // orders table, BEHIND a later overwrite that replaced everything.
    // The oracle aggregates the original parquet, so a hash match proves
    // (a) the two appends lost/duplicated nothing across the commit
    // protocol and (b) the overwrite at v2 did not leak into the v1
    // snapshot — snapshot isolation as a checkable query result.
    Q("q196_txn_snapshot",
      Some("""SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
             |       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c
             |FROM orders
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        import graft.sources.TxnTable
        val dir = derivedDir(d, "orders_txn")
        Derived.ensure(dir, Derived.fingerprint(d, Seq("orders"))) {
          val t = new java.io.File(dir, "t")
          def wipe(f: java.io.File): Unit = {
            Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(wipe)
            f.delete(): Unit
          }
          wipe(t) // a rebuilt fingerprint must not append onto a stale log
          val orders = Tables.orders(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice")
          TxnTable.append(orders.filter(col("o_orderkey") % 2 === 0), t.getPath,
            txnId = Some("even"))
          TxnTable.append(orders.filter(col("o_orderkey") % 2 === 1), t.getPath,
            txnId = Some("odd"))
          TxnTable.overwrite(orders.filter(col("o_orderstatus") === "F").limit(10), t.getPath)
          ()
        }
        TxnTable.read(s, s"$dir/t", version = Some(1L))
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), sum(cents(col("o_totalprice"))).as("sum_price_c"))
          .orderBy("o_orderstatus")
      }),

    // ---- q198: transactional MERGE (upsert) — the row-level operation
    // the plain-parquet sink family explicitly could NOT offer (see
    // Sinks.overwritePartitions: "row-level MERGE needs a table format").
    // The derived build seeds a TxnTable with orders in exact cents,
    // then MERGEs an update set (every 10th order's price doubled) —
    // copy-on-write, one atomic commit. The query reads the POST-merge
    // snapshot; the oracle computes the same merged state from the
    // original parquet with a CASE — a hash match proves the upsert
    // replaced exactly the keyed rows and lost none.
    Q("q198_txn_merge",
      Some("""SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
             |       CAST(SUM(CASE WHEN o_orderkey % 10 = 0
             |                     THEN 2 * CAST(round(o_totalprice * 100) AS BIGINT)
             |                     ELSE CAST(round(o_totalprice * 100) AS BIGINT) END) AS BIGINT) AS sum_price_c
             |FROM orders
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        import graft.sources.TxnTable
        val dir = derivedDir(d, "orders_txn_merge")
        Derived.ensure(dir, Derived.fingerprint(d, Seq("orders"))) {
          val t = new java.io.File(dir, "t")
          def wipe(f: java.io.File): Unit = {
            Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(wipe)
            f.delete(): Unit
          }
          wipe(t)
          val base = Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_orderstatus"),
              cents(col("o_totalprice")).as("price_c"))
          TxnTable.append(base, t.getPath, txnId = Some("seed"))
          TxnTable.merge(s, t.getPath,
            base.filter(col("o_orderkey") % 10 === 0)
              .withColumn("price_c", col("price_c") * 2L),
            keyCols = Seq("o_orderkey"), txnId = Some("price-fix"))
          ()
        }
        TxnTable.read(s, s"$dir/t")
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), sum(col("price_c")).as("sum_price_c"))
          .orderBy("o_orderstatus")
      }),

    // ---- q200: small-file compaction round trip — the layout
    // maintenance operator (Sinks.compactParquet) under the oracle gate:
    // the derived build writes lineitem's money columns deliberately
    // OVER-FRAGMENTED (8 files per l_returnflag partition — the drip-
    // append pathology), then bin-packs every leaf back to one file.
    // The query aggregates the COMPACTED dataset; the oracle aggregates
    // the original parquet — a hash match proves the rewrite moved
    // every row and every cent while collapsing 24 files to 3. The
    // build also asserts the file counts, so a silently non-compacting
    // regression fails the build, not just a spec.
    Q("q200_compaction_roundtrip",
      Some("""SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
             |       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c
             |FROM lineitem
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        import graft.sources.Sinks
        val dir = derivedDir(d, "lineitem_compacted")
        Derived.ensure(dir, Derived.fingerprint(d, Seq("lineitem"))) {
          val t = s"$dir/t"
          Tables.lineitem(s, d)
            .select(col("l_returnflag"), cents(col("l_extendedprice")).as("price_c"))
            .repartition(8)
            .write.mode("overwrite").partitionBy("l_returnflag").parquet(t)
          val stats = Sinks.compactParquet(s, t, targetFileBytes = 512L * 1024 * 1024)
          require(stats.filesAfter < stats.filesBefore,
            s"compaction did not reduce files: $stats")
        }
        s.read.parquet(s"$dir/t")
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"), sum(col("price_c")).as("sum_price_c"))
          .orderBy("l_returnflag")
      }),

    // ---- q201: transactional change-data feed — the incremental
    // consumption side of the q196/q198 table: a downstream pipeline
    // asks "what changed between version 0 and version 1?" instead of
    // rescanning the table. The derived build commits even orders, then
    // odd orders; the CDC read of the (0 → 1) window takes the
    // FILE-LEVEL fast path (the append's dirs, zero comparison work) and
    // must contain exactly the odd orders — which is what the oracle
    // computes from the original parquet. Insert-tag grouped in, so the
    // change-type column itself is under the hash.
    Q("q201_txn_cdc",
      Some("""SELECT o_orderstatus, 'insert' AS change, CAST(COUNT(*) AS BIGINT) AS n,
             |       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c
             |FROM orders WHERE o_orderkey % 2 = 1
             |GROUP BY 1, 2 ORDER BY 1""".stripMargin),
      (s, d) => {
        import graft.sources.TxnTable
        val dir = derivedDir(d, "orders_txn_cdc")
        Derived.ensure(dir, Derived.fingerprint(d, Seq("orders"))) {
          val t = new java.io.File(dir, "t")
          def wipe(f: java.io.File): Unit = {
            Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(wipe)
            f.delete(): Unit
          }
          wipe(t)
          val base = Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_orderstatus"),
              cents(col("o_totalprice")).as("price_c"))
          TxnTable.append(base.filter(col("o_orderkey") % 2 === 0), t.getPath,
            txnId = Some("even"))
          TxnTable.append(base.filter(col("o_orderkey") % 2 === 1), t.getPath,
            txnId = Some("odd"))
          ()
        }
        TxnTable.changes(s, s"$dir/t", fromVersion = 0L, toVersion = 1L)
          .groupBy(col("o_orderstatus"), col("_change").as("change"))
          .agg(count(lit(1)).as("n"), sum(col("price_c")).as("sum_price_c"))
          .orderBy("o_orderstatus")
      }),

    // ---- q202: manifest-stats DATA SKIPPING on the transactional read
    // path — the gap between "has a table format" and "has a lake
    // table" (Delta add-file stats / Iceberg manifest entries). The
    // derived build appends orders as FOUR key-range commits, each
    // carrying o_orderkey min/max bounds that the commit folds into the
    // manifest; the query is a range read [1, 300] that PLANS ONLY THE
    // ONE DIR whose bounds intersect — asserted with a require on every
    // execution (pruned=1 of live=4), so a regression to scan-everything
    // fails the build, not just a spec. The oracle applies the same
    // range over the original parquet: a hash match proves dir-level
    // skipping dropped no qualifying row. At 100 TB: a point/range query
    // reads ONE manifest, then the handful of files its keys live in.
    Q("q202_txn_data_skipping",
      Some("""SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
             |       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c
             |FROM orders WHERE o_orderkey BETWEEN 1 AND 300
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        import graft.sources.TxnTable
        val dir = derivedDir(d, "orders_txn_skip")
        Derived.ensure(dir, Derived.fingerprint(d, Seq("orders"))) {
          val t = new java.io.File(dir, "t")
          def wipe(f: java.io.File): Unit = {
            Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(wipe)
            f.delete(): Unit
          }
          wipe(t)
          val base = Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_orderstatus"),
              cents(col("o_totalprice")).as("price_c"))
          val maxKey = base.agg(max(col("o_orderkey"))).head().getLong(0)
          val m = maxKey / 4
          Seq((Long.MinValue, m), (m, 2 * m), (2 * m, 3 * m), (3 * m, Long.MaxValue))
            .zipWithIndex.foreach { case ((lo, hi), i) =>
              TxnTable.append(
                base.filter(col("o_orderkey") > lo && col("o_orderkey") <= hi),
                t.getPath, txnId = Some(s"slice-$i"), statsCol = Some("o_orderkey"))
            }
          ()
        }
        val t = s"$dir/t"
        val snap = TxnTable.snapshot(t, TxnTable.latestVersion(t).get)
        val planned = TxnTable.pruneLive(snap, "o_orderkey", 1L, 300L)
        require(planned.size == 1 && snap.live.size == 4,
          s"data skipping regressed: planned ${planned.size} of ${snap.live.size} dirs")
        TxnTable.readRange(s, t, "o_orderkey", 1L, 300L)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), sum(col("price_c")).as("sum_price_c"))
          .orderBy("o_orderstatus")
      }),

    // ---- q203: PARTITIONED transactional table — dynamic partition
    // overwrite as one atomic, time-travelable commit plus partition-
    // pruned snapshot reads. The derived build lands orders partitioned
    // by o_orderstatus (one manifest-recorded dir per status), then a
    // SECOND commit replaces ONLY partition O (prices doubled). The
    // query reads partition F at the LATEST version — behind the later
    // unrelated-partition commit — planning 1 of 3 live dirs (require'd
    // every execution; PlanAuditSpec pins the planned files). The oracle
    // aggregates the ORIGINAL parquet's F rows: a hash match proves both
    // the pruning (no O/P rows leaked into the plan) and the isolation
    // (the O rewrite touched nothing in F). At 100 TB: replacing a
    // day's partition is one staged dir + one conditional PUT, and
    // readers of any other partition never see a torn state.
    Q("q203_txn_partitioned",
      Some("""SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
             |       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c
             |FROM orders WHERE o_orderstatus = 'F'
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        import graft.sources.TxnTable
        val dir = derivedDir(d, "orders_txn_part")
        Derived.ensure(dir, Derived.fingerprint(d, Seq("orders"))) {
          val t = new java.io.File(dir, "t")
          def wipe(f: java.io.File): Unit = {
            Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(wipe)
            f.delete(): Unit
          }
          wipe(t)
          val base = Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_orderstatus"),
              cents(col("o_totalprice")).as("price_c"))
          TxnTable.overwritePartitions(s, t.getPath, base, "o_orderstatus",
            txnId = Some("day0"))
          TxnTable.overwritePartitions(s, t.getPath,
            base.filter(col("o_orderstatus") === "O")
              .withColumn("price_c", col("price_c") * 2L),
            "o_orderstatus", txnId = Some("day1-O-restate"))
          ()
        }
        val t = s"$dir/t"
        val snap = TxnTable.snapshot(t, TxnTable.latestVersion(t).get)
        val planned = TxnTable.prunePartition(snap, "o_orderstatus", "F")
        require(planned.size == 1 && snap.live.size == 3,
          s"partition pruning regressed: planned ${planned.size} of ${snap.live.size} dirs")
        TxnTable.readPartition(s, t, "o_orderstatus", "F")
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), sum(col("price_c")).as("sum_price_c"))
          .orderBy("o_orderstatus")
      }),

    // ---- q205: CLUSTERED compaction (OPTIMIZE ZORDER's 1-D analogue) —
    // the maintenance action that CREATES data-skipping power. The
    // derived build lands orders as four interleaved commits keyed
    // o_orderkey % 4, so every dir's manifest bounds span the FULL key
    // range and q202's skipping keeps all 4 dirs (asserted in the
    // build: pruning is powerless before clustering). compactClustered
    // then rewrites the snapshot into 4 range-clustered dirs — one
    // range shuffle, per-dir min/max re-derived — after which the same
    // range read [40, 160] PLANS ONE DIR (require'd every execution,
    // along with action == "compact": the skip must come from the
    // clustered rewrite, not the original layout). The oracle applies
    // the range to the original parquet: a hash match proves the
    // cluster rewrite moved every row exactly once and the pruned plan
    // dropped none that qualify. At 100 TB: nightly clustering turns
    // key-range reads from full-table scans into touching the files
    // the keys live in — the reason Delta/Iceberg ship OPTIMIZE as a
    // first-class command.
    Q("q205_txn_clustered_compact",
      Some("""SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
             |       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c
             |FROM orders WHERE o_orderkey BETWEEN 40 AND 160
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        import graft.sources.TxnTable
        val dir = derivedDir(d, "orders_txn_cluster")
        Derived.ensure(dir, Derived.fingerprint(d, Seq("orders"))) {
          val t = new java.io.File(dir, "t")
          def wipe(f: java.io.File): Unit = {
            Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(wipe)
            f.delete(): Unit
          }
          wipe(t)
          val base = Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_orderstatus"),
              cents(col("o_totalprice")).as("price_c"))
          (0L until 4L).foreach { i =>
            TxnTable.append(base.filter(pmod(col("o_orderkey"), lit(4L)) === i),
              t.getPath, txnId = Some(s"mod-$i"), statsCol = Some("o_orderkey"))
          }
          // pre-clustering, every dir spans the full key range: skipping
          // must be POWERLESS here, or the query below proves nothing
          val pre = TxnTable.snapshot(t.getPath, TxnTable.latestVersion(t.getPath).get)
          require(TxnTable.pruneLive(pre, "o_orderkey", 40L, 160L).size == 4,
            "interleaved layout unexpectedly prunable; build invalid")
          TxnTable.compactClustered(s, t.getPath, "o_orderkey", 4)
          ()
        }
        val t = s"$dir/t"
        val snap = TxnTable.snapshot(t, TxnTable.latestVersion(t).get)
        val planned = TxnTable.pruneLive(snap, "o_orderkey", 40L, 160L)
        require(snap.action == "compact" && planned.size == 1 && snap.live.size == 4,
          s"clustered skipping regressed: action=${snap.action}, " +
            s"planned ${planned.size} of ${snap.live.size} dirs")
        TxnTable.readRange(s, t, "o_orderkey", 40L, 160L)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), sum(col("price_c")).as("sum_price_c"))
          .orderBy("o_orderstatus")
      }),

    // ---- q206: Z-ORDER clustering — data skipping on a SECOND column.
    // q205's 1-D clustering gives the cluster key tight per-dir bounds
    // but leaves every OTHER column full-range (a custkey predicate
    // still scans everything). The 2-key compactClustered interleaves
    // uniform 10-bit buckets of (o_orderkey, o_custkey) into a 20-bit
    // Z-value and range-clusters on the curve, so BOTH columns get
    // locality: the build proves the pre-state is unprunable, then
    // every execution requires a custkey range read to plan at most
    // HALF the 16 dirs (and an orderkey range likewise — measured 4-7
    // of 16 across scales). The oracle applies the same custkey range
    // to the original parquet. At 100 TB this is Delta's OPTIMIZE
    // ZORDER BY: multi-dimensional point/range access over one sorted
    // rewrite, no second copy of the data.
    Q("q206_txn_zorder",
      Some("""SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
             |       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c
             |FROM orders WHERE o_custkey BETWEEN 1 AND 30
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        import graft.sources.TxnTable
        val dir = derivedDir(d, "orders_txn_zorder")
        Derived.ensure(dir, Derived.fingerprint(d, Seq("orders"))) {
          val t = new java.io.File(dir, "t")
          def wipe(f: java.io.File): Unit = {
            Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(wipe)
            f.delete(): Unit
          }
          wipe(t)
          val base = Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
              cents(col("o_totalprice")).as("price_c"))
          (0L until 4L).foreach { i =>
            TxnTable.append(base.filter(pmod(col("o_orderkey"), lit(4L)) === i),
              t.getPath, txnId = Some(s"mod-$i"), statsCol = Some("o_orderkey"))
          }
          val pre = TxnTable.snapshot(t.getPath, TxnTable.latestVersion(t.getPath).get)
          require(TxnTable.pruneLive(pre, "o_orderkey", 1L, 300L).size == 4,
            "interleaved layout unexpectedly prunable; build invalid")
          TxnTable.compactClustered(s, t.getPath,
            Seq("o_orderkey", "o_custkey"), 16)
          ()
        }
        val t = s"$dir/t"
        val snap = TxnTable.snapshot(t, TxnTable.latestVersion(t).get)
        val pc = TxnTable.pruneLive(snap, "o_custkey", 1L, 30L)
        val po = TxnTable.pruneLive(snap, "o_orderkey", 1L, 300L)
        require(snap.action == "compact" && snap.live.size == 16 &&
            pc.size <= 8 && po.size <= 8,
          s"Z-order skipping regressed: custkey planned ${pc.size}, " +
            s"orderkey planned ${po.size}, of ${snap.live.size} dirs")
        TxnTable.readRange(s, t, "o_custkey", 1L, 30L)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), sum(col("price_c")).as("sum_price_c"))
          .orderBy("o_orderstatus")
      }),

    // ---- q207: row-level DELETE with manifest-stats file pruning.
    // The table is built as four orderkey-quartile dirs (each with
    // min/max bounds); deleteRange purges [q1, mid-100) — covering
    // most of the SECOND quartile and nothing else — and the build
    // REQUIRES the pre-state pruned the rewrite set to that ONE dir:
    // three of four dirs are never read or written (the 100 TB GDPR/
    // retention-sweep shape: a clustered delete rewrites the files the
    // keys live in, not the table). Post-state: the deleted range is
    // unplannable (pruneLive returns zero dirs), the rewrite carries
    // fresh bounds, time travel still reads the pre-delete rows. The
    // oracle derives the same quartile cuts with integer division in a
    // CTE and applies NOT(range) to the original parquet — a hash
    // match proves the copy-on-write rewrite kept exactly the
    // complement rows.
    Q("q207_txn_delete",
      Some("""WITH m AS (SELECT (max(o_orderkey)+1)//4 AS q1,
             |                  (max(o_orderkey)+1)//2 - 100 AS q2h FROM orders)
             |SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
             |       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c
             |FROM orders, m
             |WHERE NOT (o_orderkey >= m.q1 AND o_orderkey < m.q2h)
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        import graft.sources.TxnTable
        def cuts(): (Long, Long, Long, Long) = {
          val maxK = Tables.orders(s, d)
            .agg(max(col("o_orderkey").cast("long"))).head().getLong(0) + 1L
          (maxK / 4, maxK / 2, maxK * 3 / 4, maxK)
        }
        val dir = derivedDir(d, "orders_txn_delete")
        Derived.ensure(dir, Derived.fingerprint(d, Seq("orders"))) {
          val t = new java.io.File(dir, "t")
          def wipe(f: java.io.File): Unit = {
            Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(wipe)
            f.delete(): Unit
          }
          wipe(t)
          val base = Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_orderstatus"),
              cents(col("o_totalprice")).as("price_c"))
          val (q1, q2, q3, maxK) = cuts()
          Seq((0L, q1 - 1), (q1, q2 - 1), (q2, q3 - 1), (q3, maxK))
            .foreach { case (lo, hi) =>
              TxnTable.append(base.filter(col("o_orderkey").between(lo, hi)),
                t.getPath, statsCol = Some("o_orderkey"))
            }
          val pre = TxnTable.snapshot(t.getPath, TxnTable.latestVersion(t.getPath).get)
          require(pre.live.size == 4 &&
              TxnTable.pruneLive(pre, "o_orderkey", q1, q2 - 101).size == 1,
            "pre-state must prune the delete's rewrite set to ONE of 4 dirs")
          TxnTable.deleteRange(s, t.getPath, "o_orderkey", q1, q2 - 101)
          val post = TxnTable.snapshot(t.getPath, TxnTable.latestVersion(t.getPath).get)
          require(pre.live.count(post.live.contains) == 3,
            "delete must keep the three disjoint dirs byte-untouched")
          ()
        }
        val t = s"$dir/t"
        val (q1, q2, _, _) = cuts()
        val snap = TxnTable.snapshot(t, TxnTable.latestVersion(t).get)
        require(snap.action == "delete" && snap.live.size == 4 &&
            TxnTable.pruneLive(snap, "o_orderkey", q1, q2 - 101).isEmpty,
          s"delete skipping regressed: purged range still plans " +
            s"${TxnTable.pruneLive(snap, "o_orderkey", q1, q2 - 101).size} " +
            s"of ${snap.live.size} dirs")
        TxnTable.read(s, t)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), sum(col("price_c")).as("sum_price_c"))
          .orderBy("o_orderstatus")
      }),

    // ---- q208: commit HISTORY as a metadata-only DataFrame (the
    // DESCRIBE HISTORY surface). Each commit folds its staged dirs'
    // `.nrows` counts and a timestamp into the manifest, so "what
    // changed when, by how much" is answered from manifests alone —
    // zero data files read (at 100 TB: milliseconds, not a scan). The
    // build appends the three order-status slices as three commits; the
    // history's per-version cumulative row counts must then equal the
    // status counts DuckDB computes from the raw parquet — the oracle
    // proves the manifest-carried metadata agrees with the data. The
    // execution phase also requires commit timestamps be present and
    // nondecreasing (the TIMESTAMP AS OF ordering contract).
    Q("q208_txn_history",
      Some("""WITH c AS (SELECT
             |  CAST(count(*) FILTER (o_orderstatus='F') AS BIGINT) AS f,
             |  CAST(count(*) FILTER (o_orderstatus='O') AS BIGINT) AS o,
             |  CAST(count(*) FILTER (o_orderstatus='P') AS BIGINT) AS p FROM orders)
             |SELECT version, action, num_files, num_rows FROM (
             |  SELECT CAST(0 AS BIGINT) AS version, 'append' AS action,
             |         CAST(1 AS INT) AS num_files, f AS num_rows FROM c
             |  UNION ALL SELECT CAST(1 AS BIGINT), 'append', CAST(2 AS INT), f+o FROM c
             |  UNION ALL SELECT CAST(2 AS BIGINT), 'append', CAST(3 AS INT), f+o+p FROM c)
             |ORDER BY version""".stripMargin),
      (s, d) => {
        import graft.sources.TxnTable
        val dir = derivedDir(d, "orders_txn_history")
        Derived.ensure(dir, Derived.fingerprint(d, Seq("orders"))) {
          val t = new java.io.File(dir, "t")
          def wipe(f: java.io.File): Unit = {
            Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(wipe)
            f.delete(): Unit
          }
          wipe(t)
          val base = Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_orderstatus"),
              cents(col("o_totalprice")).as("price_c"))
          Seq("F", "O", "P").foreach(st =>
            TxnTable.append(base.filter(col("o_orderstatus") === st), t.getPath))
          ()
        }
        val t = s"$dir/t"
        val h = TxnTable.history(s, t)
        val tss = h.orderBy("version").select("ts").collect()
          .map(_.getTimestamp(0).getTime).toSeq
        require(tss.size == 3 && tss.forall(_ > 0L) &&
            tss.sliding(2).forall(p => p(0) <= p(1)),
          s"history timestamps missing or non-monotonic: $tss")
        h.select(col("version"), col("action"), col("num_files"), col("num_rows"))
          .orderBy("version")
      }),

    // ---- q209: RESTORE TABLE TO VERSION — metadata-only undo. The
    // build appends the F slice (v0) and O slice (v1), then a delete
    // damages the table (v2: every order with a low orderkey gone),
    // then RESTORE to v1 (v3) undoes it by committing
    // v1's live set again — zero data copied (the build REQUIRES v3's
    // dir list equals v1's, and that the restore re-folded per-dir
    // stats so pruning still works). The oracle is simply F+O on the
    // original parquet: a hash match proves the restore returned the
    // table to exactly the pre-delete content. At 100 TB this is the
    // operational "bad job ran at 3am" recovery: one manifest write,
    // not a petabyte rewrite, with the bad versions still auditable
    // until vacuumed.
    Q("q209_txn_restore",
      Some("""SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
             |       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c
             |FROM orders WHERE o_orderstatus IN ('F','O')
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        import graft.sources.TxnTable
        val dir = derivedDir(d, "orders_txn_restore")
        Derived.ensure(dir, Derived.fingerprint(d, Seq("orders"))) {
          val t = new java.io.File(dir, "t")
          def wipe(f: java.io.File): Unit = {
            Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(wipe)
            f.delete(): Unit
          }
          wipe(t)
          val base = Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_orderstatus"),
              cents(col("o_totalprice")).as("price_c"))
          Seq("F", "O").foreach(st =>
            TxnTable.append(base.filter(col("o_orderstatus") === st),
              t.getPath, statsCol = Some("o_orderkey")))
          val v1 = TxnTable.latestVersion(t.getPath).get
          val good = TxnTable.snapshot(t.getPath, v1)
          TxnTable.deleteRange(s, t.getPath, "o_orderkey", 0L, 1000L) // the 3am damage
          val v3 = TxnTable.restore(s, t.getPath, v1)
          val restored = TxnTable.snapshot(t.getPath, v3)
          require(restored.action == "restore" &&
              restored.live.toSet == good.live.toSet &&
              restored.stats == good.stats,
            "restore must reference the target version's dirs and stats verbatim")
          ()
        }
        val t = s"$dir/t"
        require(TxnTable.snapshot(t, TxnTable.latestVersion(t).get).action == "restore")
        TxnTable.read(s, t)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), sum(col("price_c")).as("sum_price_c"))
          .orderBy("o_orderstatus")
      }),

    // ---- q210: BLOOM point-lookup pruning. The table is built as 8
    // INTERLEAVED commits (orderkey mod 8), the write pattern min/max
    // bounds are helpless against: every dir spans the whole key range,
    // so a point probe's stats prune keeps all 8 (the build REQUIRES
    // it). Each staged dir also carries a `.bloom` sidecar over the
    // stats column (1% fpp — the Delta bloom-index / Iceberg puffin
    // shape); the probe consults the blooms of the bounds-surviving
    // dirs and every execution REQUIRES the probe plans ≤ 2 of 8 (the
    // one true dir + rare false positives; no false negatives — the
    // oracle hash-match proves the row is found). At 100 TB: id
    // lookups on a high-cardinality key touch ~1 file with a
    // kilobytes-per-file index, no clustering rewrite needed.
    Q("q210_txn_bloom_point",
      Some("""SELECT o_orderkey, o_orderstatus,
             |       CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
             |FROM orders WHERE o_orderkey = 777""".stripMargin),
      (s, d) => {
        import graft.sources.TxnTable
        val dir = derivedDir(d, "orders_txn_bloom")
        Derived.ensure(dir, Derived.fingerprint(d, Seq("orders"))) {
          val t = new java.io.File(dir, "t")
          def wipe(f: java.io.File): Unit = {
            Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(wipe)
            f.delete(): Unit
          }
          wipe(t)
          val base = Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_orderstatus"),
              cents(col("o_totalprice")).as("price_c"))
          (0L until 8L).foreach(i =>
            TxnTable.append(base.filter(pmod(col("o_orderkey"), lit(8L)) === i),
              t.getPath, statsCol = Some("o_orderkey")))
          val snap = TxnTable.snapshot(t.getPath, TxnTable.latestVersion(t.getPath).get)
          require(TxnTable.pruneLive(snap, "o_orderkey", 777L, 777L).size == 8,
            "interleaved build must defeat min/max bounds; build invalid")
          ()
        }
        val t = s"$dir/t"
        val snap = TxnTable.snapshot(t, TxnTable.latestVersion(t).get)
        val planned = TxnTable.pruneLivePoint(t, snap, "o_orderkey", 777L)
        require(planned.size <= 2,
          s"bloom point pruning regressed: planned ${planned.size} of ${snap.live.size} dirs")
        TxnTable.readPoint(s, t, "o_orderkey", 777L)
          .select(col("o_orderkey"), col("o_orderstatus"), col("price_c"))
      }),

    // ---- q211: row-level DELETE as a MERGE-ON-READ deletion vector
    // (Delta DVs / Iceberg positional deletes). Same purge as q207, but
    // the write path records doomed ROW POSITIONS in a per-dir dv
    // sidecar instead of rewriting the file: the build proves the live
    // set is BYTE-IDENTICAL across the delete (zero data rewritten —
    // at 100 TB a small purge stops being a terabyte rewrite) and that
    // manifest stats pruned dv staging to the ONE overlapping dir; the
    // read anti-joins the broadcast positions away at scan time, and the
    // oracle hash-match proves merge-on-read content equals what a
    // copy-on-write delete (q207) would have produced.
    Q("q211_txn_dv_delete",
      Some("""WITH m AS (SELECT (max(o_orderkey)+1)//4 AS q1,
             |                  (max(o_orderkey)+1)//2 - 100 AS q2h FROM orders)
             |SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
             |       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c
             |FROM orders, m
             |WHERE NOT (o_orderkey >= m.q1 AND o_orderkey < m.q2h)
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        import graft.sources.TxnTable
        def cuts(): (Long, Long, Long, Long) = {
          val maxK = Tables.orders(s, d)
            .agg(max(col("o_orderkey").cast("long"))).head().getLong(0) + 1L
          (maxK / 4, maxK / 2, maxK * 3 / 4, maxK)
        }
        val dir = derivedDir(d, "orders_txn_dv_delete")
        Derived.ensure(dir, Derived.fingerprint(d, Seq("orders"))) {
          val t = new java.io.File(dir, "t")
          def wipe(f: java.io.File): Unit = {
            Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(wipe)
            f.delete(): Unit
          }
          wipe(t)
          val base = Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_orderstatus"),
              cents(col("o_totalprice")).as("price_c"))
          val (q1, q2, q3, maxK) = cuts()
          Seq((0L, q1 - 1), (q1, q2 - 1), (q2, q3 - 1), (q3, maxK))
            .foreach { case (lo, hi) =>
              TxnTable.append(base.filter(col("o_orderkey").between(lo, hi)),
                t.getPath, statsCol = Some("o_orderkey"))
            }
          val pre = TxnTable.snapshot(t.getPath, TxnTable.latestVersion(t.getPath).get)
          TxnTable.deleteRangeDV(s, t.getPath, "o_orderkey", q1, q2 - 101)
          val post = TxnTable.snapshot(t.getPath, TxnTable.latestVersion(t.getPath).get)
          require(post.live == pre.live,
            "merge-on-read delete must leave the live set byte-identical")
          require(post.dvs.size == 1,
            s"stats must prune dv staging to ONE of 4 dirs, got ${post.dvs.size}")
          ()
        }
        val t = s"$dir/t"
        val (q1, q2, _, _) = cuts()
        val snap = TxnTable.snapshot(t, TxnTable.latestVersion(t).get)
        val dvd = TxnTable.pruneLive(snap, "o_orderkey", q1, q2 - 101)
        require(snap.action == "delete" && snap.live.size == 4 &&
            snap.dvs.keySet == dvd.toSet && dvd.size == 1,
          s"dv delete regressed: ${snap.dvs.size} dvs, " +
            s"${dvd.size} dirs planned for the purged range")
        TxnTable.read(s, t)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), sum(col("price_c")).as("sum_price_c"))
          .orderBy("o_orderstatus")
      }),

    // ---- q212: row-level UPDATE ... SET with manifest-stats file
    // pruning (the Delta/Iceberg UPDATE). The build appends orders as
    // four key-range commits, then reprices ONE key range — a
    // multi-column SET (status relabeled, price bumped) that the stats
    // must prune to a single dir's rewrite, the other three dirs
    // byte-untouched (asserted on the live set). Non-matching rows in
    // the rewritten dir must be byte-preserved, matching rows must
    // take BOTH set expressions atomically — the oracle recomputes the
    // same repricing with CASE WHEN on the raw parquet and
    // hash-matches the post-update table. At 100 TB this is "fix a
    // mispriced SKU range": the write cost is the files the keys live
    // in, not the table.
    Q("q212_txn_update",
      Some("""WITH m AS (SELECT (max(o_orderkey)+1)//4 AS q1,
             |                  (max(o_orderkey)+1)//2 - 100 AS q2h FROM orders),
             |u AS (SELECT CASE WHEN o_orderkey >= m.q1 AND o_orderkey < m.q2h
             |                  THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
             |             CAST(round(o_totalprice * 100) AS BIGINT)
             |               + CASE WHEN o_orderkey >= m.q1 AND o_orderkey < m.q2h
             |                      THEN 7 ELSE 0 END AS price_c
             |      FROM orders, m)
             |SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
             |       CAST(SUM(price_c) AS BIGINT) AS sum_price_c
             |FROM u GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        import graft.sources.TxnTable
        def cuts(): (Long, Long, Long, Long) = {
          val maxK = Tables.orders(s, d)
            .agg(max(col("o_orderkey").cast("long"))).head().getLong(0) + 1L
          (maxK / 4, maxK / 2, maxK * 3 / 4, maxK)
        }
        val dir = derivedDir(d, "orders_txn_update")
        Derived.ensure(dir, Derived.fingerprint(d, Seq("orders"))) {
          val t = new java.io.File(dir, "t")
          def wipe(f: java.io.File): Unit = {
            Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(wipe)
            f.delete(): Unit
          }
          wipe(t)
          val base = Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_orderstatus"),
              cents(col("o_totalprice")).as("price_c"))
          val (q1, q2, q3, maxK) = cuts()
          Seq((0L, q1 - 1), (q1, q2 - 1), (q2, q3 - 1), (q3, maxK))
            .foreach { case (lo, hi) =>
              TxnTable.append(base.filter(col("o_orderkey").between(lo, hi)),
                t.getPath, statsCol = Some("o_orderkey"))
            }
          val pre = TxnTable.snapshot(t.getPath, TxnTable.latestVersion(t.getPath).get)
          require(pre.live.size == 4 &&
              TxnTable.pruneLive(pre, "o_orderkey", q1, q2 - 101).size == 1,
            "pre-state must prune the update's rewrite set to ONE of 4 dirs")
          TxnTable.updateRange(s, t.getPath, "o_orderkey", q1, q2 - 101,
            Map("o_orderstatus" -> lit("U"), "price_c" -> (col("price_c") + 7L)))
          val post = TxnTable.snapshot(t.getPath, TxnTable.latestVersion(t.getPath).get)
          require(pre.live.count(post.live.contains) == 3,
            "update must keep the three disjoint dirs byte-untouched")
          ()
        }
        val t = s"$dir/t"
        val snap = TxnTable.snapshot(t, TxnTable.latestVersion(t).get)
        require(snap.action == "update" && snap.live.size == 4,
          s"update commit regressed: action=${snap.action} live=${snap.live.size}")
        TxnTable.read(s, t)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), sum(col("price_c")).as("sum_price_c"))
          .orderBy("o_orderstatus")
      }),

    // ---- q213: metadata-only ADD COLUMN schema evolution (Delta ALTER
    // TABLE ADD COLUMNS / Iceberg schema evolution). The build commits
    // the first half of orders in the ORIGINAL shape, evolves the
    // table with a nullable `disc_c` as ONE manifest write — the live
    // set is asserted byte-identical, zero data rewritten — then
    // appends the second half in the evolved shape. One snapshot scan
    // must then serve BOTH file generations: the parquet reader takes
    // the manifest-carried DDL and null-backfills `disc_c` on the
    // pre-evolution files, and the oracle recomputes the same
    // half-and-half table with CASE WHEN on the raw parquet (SUM over
    // the evolved column ignoring backfilled NULLs, per SQL). At
    // 100 TB: adding a feature column to a petabyte table costs one
    // manifest write, not a rewrite.
    Q("q213_txn_add_column",
      Some("""WITH m AS (SELECT (max(o_orderkey)+1)//2 AS h FROM orders),
             |u AS (SELECT o_orderstatus,
             |             CAST(round(o_totalprice * 100) AS BIGINT) AS price_c,
             |             CASE WHEN o_orderkey >= m.h
             |                  THEN CAST(round(o_totalprice * 100) AS BIGINT) // 10
             |                  ELSE NULL END AS disc_c
             |      FROM orders, m)
             |SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
             |       CAST(COUNT(disc_c) AS BIGINT) AS n_disc,
             |       CAST(SUM(price_c) AS BIGINT) AS sum_price_c,
             |       CAST(SUM(disc_c) AS BIGINT) AS sum_disc_c
             |FROM u GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        import graft.sources.TxnTable
        def half(): Long = Tables.orders(s, d)
          .agg(max(col("o_orderkey").cast("long"))).head().getLong(0) / 2 + 1L
        val dir = derivedDir(d, "orders_txn_add_column")
        Derived.ensure(dir, Derived.fingerprint(d, Seq("orders"))) {
          val t = new java.io.File(dir, "t")
          def wipe(f: java.io.File): Unit = {
            Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(wipe)
            f.delete(): Unit
          }
          wipe(t)
          val base = Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_orderstatus"),
              cents(col("o_totalprice")).as("price_c"))
          val h = half()
          TxnTable.append(base.filter(col("o_orderkey") < h),
            t.getPath, statsCol = Some("o_orderkey"))
          val pre = TxnTable.snapshot(t.getPath, TxnTable.latestVersion(t.getPath).get)
          TxnTable.addColumn(s, t.getPath, "disc_c", "bigint")
          val evo = TxnTable.snapshot(t.getPath, TxnTable.latestVersion(t.getPath).get)
          require(evo.live == pre.live && evo.action == "addColumn",
            "ADD COLUMN must be metadata-only: live set byte-identical")
          TxnTable.append(
            base.filter(col("o_orderkey") >= h)
              .withColumn("disc_c", (col("price_c") / 10).cast("long")),
            t.getPath, statsCol = Some("o_orderkey"))
          ()
        }
        val t = s"$dir/t"
        val snap = TxnTable.snapshot(t, TxnTable.latestVersion(t).get)
        require(snap.schema.exists(_.contains("disc_c")) && snap.live.size == 2,
          s"evolved manifest regressed: schema=${snap.schema} live=${snap.live.size}")
        TxnTable.read(s, t)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), count(col("disc_c")).as("n_disc"),
            sum(col("price_c")).as("sum_price_c"),
            sum(col("disc_c")).as("sum_disc_c"))
          .orderBy("o_orderstatus")
      }),

    // ---- q214: row-level UPDATE as MERGE-ON-READ (the Delta
    // deletion-vector-update shape). Same repricing as q212 — but
    // instead of rewriting the quartile file the keys live in, the
    // matched ROW POSITIONS land in a KB-sized deletion vector and the
    // rewritten rows re-enter as ONE appended dir: the build asserts
    // every pre-update dir is BYTE-IDENTICAL in the live set (stats
    // pruning confined the dv to 1 of 4 quartile dirs), so at 100 TB
    // repricing a key range costs KB of dv + the changed rows, not a
    // terabyte rewrite. The scan-time anti-join restores exactly the
    // CoW result — the oracle is the SAME SQL as q212, so the
    // hash-match proves MoR ≡ CoW ≡ CASE WHEN on the raw parquet.
    Q("q214_txn_update_mor",
      Some("""WITH m AS (SELECT (max(o_orderkey)+1)//4 AS q1,
             |                  (max(o_orderkey)+1)//2 - 100 AS q2h FROM orders),
             |u AS (SELECT CASE WHEN o_orderkey >= m.q1 AND o_orderkey < m.q2h
             |                  THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
             |             CAST(round(o_totalprice * 100) AS BIGINT)
             |               + CASE WHEN o_orderkey >= m.q1 AND o_orderkey < m.q2h
             |                      THEN 7 ELSE 0 END AS price_c
             |      FROM orders, m)
             |SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
             |       CAST(SUM(price_c) AS BIGINT) AS sum_price_c
             |FROM u GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        import graft.sources.TxnTable
        def cuts(): (Long, Long, Long, Long) = {
          val maxK = Tables.orders(s, d)
            .agg(max(col("o_orderkey").cast("long"))).head().getLong(0) + 1L
          (maxK / 4, maxK / 2, maxK * 3 / 4, maxK)
        }
        val dir = derivedDir(d, "orders_txn_update_mor")
        Derived.ensure(dir, Derived.fingerprint(d, Seq("orders"))) {
          val t = new java.io.File(dir, "t")
          def wipe(f: java.io.File): Unit = {
            Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(wipe)
            f.delete(): Unit
          }
          wipe(t)
          val base = Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_orderstatus"),
              cents(col("o_totalprice")).as("price_c"))
          val (q1, q2, q3, maxK) = cuts()
          Seq((0L, q1 - 1), (q1, q2 - 1), (q2, q3 - 1), (q3, maxK))
            .foreach { case (lo, hi) =>
              TxnTable.append(base.filter(col("o_orderkey").between(lo, hi)),
                t.getPath, statsCol = Some("o_orderkey"))
            }
          val pre = TxnTable.snapshot(t.getPath, TxnTable.latestVersion(t.getPath).get)
          require(pre.live.size == 4 &&
              TxnTable.pruneLive(pre, "o_orderkey", q1, q2 - 101).size == 1,
            "pre-state must prune the update's dv set to ONE of 4 dirs")
          TxnTable.updateRangeDV(s, t.getPath, "o_orderkey", q1, q2 - 101,
            Map("o_orderstatus" -> lit("U"), "price_c" -> (col("price_c") + 7L)))
          val post = TxnTable.snapshot(t.getPath, TxnTable.latestVersion(t.getPath).get)
          require(post.live.startsWith(pre.live) && post.live.size == 5,
            "MoR update must keep every pre-update dir byte-identical + append one")
          require(post.dvs.size == 1,
            s"stats pruning must confine the dv to one dir, got ${post.dvs.size}")
          ()
        }
        val t = s"$dir/t"
        val snap = TxnTable.snapshot(t, TxnTable.latestVersion(t).get)
        require(snap.action == "update" && snap.live.size == 5 && snap.dvs.size == 1,
          s"MoR update commit regressed: action=${snap.action} " +
            s"live=${snap.live.size} dvs=${snap.dvs.size}")
        TxnTable.read(s, t)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), sum(col("price_c")).as("sum_price_c"))
          .orderBy("o_orderstatus")
      }),

    // ---- q215: manifest-carried CHECK constraints (Delta ALTER TABLE
    // ADD CONSTRAINT). The build declares two checks on the txn table
    // — non-negative prices, known status codes — then proves the
    // governance: a poisoned batch (negated prices) is REJECTED with
    // the typed ConstraintViolation and leaves NO trace (version and
    // live set unchanged, the staged dir reaped), a constraint the
    // existing data violates cannot be added, and the checks ride the
    // manifest forward through later commits. Enforcement costs one
    // extra aggregate fused over data the writer already scans — at
    // 100 TB the check is free relative to the write it guards. The
    // oracle aggregates the raw parquet: the hash-match proves the
    // guarded table holds exactly the valid rows, nothing dropped,
    // nothing poisoned.
    Q("q215_txn_constraints",
      Some("""SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
             |       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             |         AS sum_price_c
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        import graft.sources.TxnTable
        val dir = derivedDir(d, "orders_txn_constraints")
        Derived.ensure(dir, Derived.fingerprint(d, Seq("orders"))) {
          val t = new java.io.File(dir, "t")
          def wipe(f: java.io.File): Unit = {
            Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(wipe)
            f.delete(): Unit
          }
          wipe(t)
          val base = Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_orderstatus"),
              cents(col("o_totalprice")).as("price_c"))
          val maxK = base.agg(max(col("o_orderkey").cast("long"))).head().getLong(0) + 1L
          val h = maxK / 2
          TxnTable.append(base.filter(col("o_orderkey") < h),
            t.getPath, statsCol = Some("o_orderkey"))
          TxnTable.addConstraint(s, t.getPath, "price_nonneg", "price_c >= 0")
          TxnTable.addConstraint(s, t.getPath, "status_known",
            "o_orderstatus IN ('F', 'O', 'P')")
          // a constraint the existing data violates must NOT land
          val beforeBad = TxnTable.latestVersion(t.getPath).get
          val rejectedAdd =
            try { TxnTable.addConstraint(s, t.getPath, "tiny", "price_c < 100"); false }
            catch { case _: TxnTable.ConstraintViolation => true }
          require(rejectedAdd && TxnTable.latestVersion(t.getPath).contains(beforeBad),
            "violated addConstraint must throw and leave no commit")
          // the second half lands under the checks
          TxnTable.append(base.filter(col("o_orderkey") >= h),
            t.getPath, statsCol = Some("o_orderkey"))
          // a poisoned batch is rejected with NO trace
          val before = TxnTable.latestVersion(t.getPath).get
          val liveBefore = TxnTable.snapshot(t.getPath, before).live
          val rejected =
            try {
              TxnTable.append(base.limit(50)
                .withColumn("price_c", -col("price_c") - 1L), t.getPath,
                statsCol = Some("o_orderkey"))
              false
            } catch { case _: TxnTable.ConstraintViolation => true }
          require(rejected, "poisoned batch must throw ConstraintViolation")
          require(TxnTable.latestVersion(t.getPath).contains(before) &&
              TxnTable.snapshot(t.getPath, before).live == liveBefore,
            "rejected write left a trace")
          ()
        }
        val t = s"$dir/t"
        val snap = TxnTable.snapshot(t, TxnTable.latestVersion(t).get)
        require(snap.constraints.keySet == Set("price_nonneg", "status_known"),
          s"constraints regressed: ${snap.constraints.keySet}")
        TxnTable.read(s, t)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), sum(col("price_c")).as("sum_price_c"))
          .orderBy("o_orderstatus")
      }),

    // ---- q216: MERGE as MERGE-ON-READ (Delta's low-shuffle merge +
    // deletion vectors). Same upsert semantics as q198's copy-on-write
    // merge, but the build proves the MoR structure: every pre-merge
    // dir is BYTE-IDENTICAL in the live set, the old versions of
    // matched keys die in ONE dv (manifest key stats pruned the probe
    // to the quartile dir the keys live in), and the whole batch —
    // repriced updates AND brand-new inserted orders — lands as one
    // appended dir. At 100 TB, a CDC upsert batch costs KB of dv plus
    // the batch, not a rewrite of every file a matched key lives in.
    // The oracle recomputes the merged state from the raw parquet
    // (CASE for the updates, UNION ALL for the inserts) — the hash
    // match proves MoR merge ≡ (current ∖ keys) ∪ batch exactly.
    Q("q216_txn_merge_mor",
      Some("""WITH m AS (SELECT (max(o_orderkey)+1)//4 AS q1,
             |                  (max(o_orderkey)+1)//2 - 100 AS q2h,
             |                  max(o_orderkey)+1 AS mk FROM orders),
             |merged AS (
             |  SELECT CASE WHEN o_orderkey >= m.q1 AND o_orderkey < m.q2h
             |                   AND o_orderkey % 10 = 0
             |              THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
             |         CAST(round(o_totalprice * 100) AS BIGINT)
             |           * CASE WHEN o_orderkey >= m.q1 AND o_orderkey < m.q2h
             |                       AND o_orderkey % 10 = 0
             |                  THEN 2 ELSE 1 END AS price_c
             |  FROM orders, m
             |  UNION ALL
             |  SELECT 'N' AS o_orderstatus,
             |         CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
             |  FROM orders WHERE o_orderkey % 20 = 0)
             |SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
             |       CAST(SUM(price_c) AS BIGINT) AS sum_price_c
             |FROM merged GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        import graft.sources.TxnTable
        val dir = derivedDir(d, "orders_txn_merge_mor")
        Derived.ensure(dir, Derived.fingerprint(d, Seq("orders"))) {
          val t = new java.io.File(dir, "t")
          def wipe(f: java.io.File): Unit = {
            Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(wipe)
            f.delete(): Unit
          }
          wipe(t)
          val base = Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_orderstatus"),
              cents(col("o_totalprice")).as("price_c"))
          val maxK = base.agg(max(col("o_orderkey").cast("long"))).head().getLong(0) + 1L
          val (q1, q2, q3) = (maxK / 4, maxK / 2, maxK * 3 / 4)
          Seq((0L, q1 - 1), (q1, q2 - 1), (q2, q3 - 1), (q3, maxK))
            .foreach { case (lo, hi) =>
              TxnTable.append(base.filter(col("o_orderkey").between(lo, hi)),
                t.getPath, statsCol = Some("o_orderkey"))
            }
          val pre = TxnTable.snapshot(t.getPath, TxnTable.latestVersion(t.getPath).get)
          require(pre.live.size == 4, "seed must land as 4 quartile dirs")
          // batch: every 10th order in the dv-prunable Q2 range repriced
          // to 'U' at double, PLUS fresh inserts (keys shifted past maxK)
          val upd = base.filter(col("o_orderkey") >= q1 &&
              col("o_orderkey") <= q2 - 101 && col("o_orderkey") % 10 === 0)
            .withColumn("o_orderstatus", lit("U"))
            .withColumn("price_c", col("price_c") * 2L)
          val ins = base.filter(col("o_orderkey") % 20 === 0)
            .withColumn("o_orderkey", col("o_orderkey") + lit(maxK))
            .withColumn("o_orderstatus", lit("N"))
          TxnTable.mergeDV(s, t.getPath, upd.unionByName(ins),
            keyCols = Seq("o_orderkey"), txnId = Some("cdc-batch"))
          val post = TxnTable.snapshot(t.getPath, TxnTable.latestVersion(t.getPath).get)
          require(post.live.startsWith(pre.live) && post.live.size == 5,
            "MoR merge must keep every pre-merge dir byte-identical + append one")
          // Q1 is bounds-pruned from the probe entirely; Q3/Q4 fall in
          // the batch's [q1, 2·maxK] span so they ARE probed, but no key
          // matches and writeDV elides an empty dv — either way only the
          // Q2 dir pays a dv
          require(post.dvs.size == 1,
            s"only the matched Q2 dir may gain a dv, got ${post.dvs.size}")
          ()
        }
        val t = s"$dir/t"
        val snap = TxnTable.snapshot(t, TxnTable.latestVersion(t).get)
        require(snap.action == "merge" && snap.live.size == 5 && snap.dvs.size == 1,
          s"MoR merge commit regressed: action=${snap.action} " +
            s"live=${snap.live.size} dvs=${snap.dvs.size}")
        TxnTable.read(s, t)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), sum(col("price_c")).as("sum_price_c"))
          .orderBy("o_orderstatus")
      }),

    // ---- q217: SHALLOW CLONE (Delta CREATE TABLE ... SHALLOW CLONE) —
    // fork a table by METADATA ONLY, then diverge. The build clones the
    // seeded orders table (asserting the clone copied ZERO data files —
    // its data dir is empty, every live entry a relative reference into
    // the source) and reprices Q1 orders IN THE CLONE via a MoR update;
    // the source's version chain is asserted untouched. At 100 TB this
    // is the dev/test-fork story: a writable copy of a production table
    // for the cost of one manifest write, CHECK constraints and schema
    // enforcement inherited. The query reads the diverged CLONE; the
    // oracle recomputes the repriced state from the raw parquet — the
    // hash match proves the fork reads the source's bytes exactly and
    // layers its own edits on top.
    Q("q217_txn_clone",
      Some("""WITH m AS (SELECT (max(o_orderkey)+1)//4 AS q1 FROM orders)
             |SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
             |       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)
             |           + CASE WHEN o_orderkey < m.q1 THEN 5 ELSE 0 END) AS BIGINT)
             |         AS sum_price_c
             |FROM orders, m GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        import graft.sources.TxnTable
        val dir = derivedDir(d, "orders_txn_clone")
        Derived.ensure(dir, Derived.fingerprint(d, Seq("orders"))) {
          val src = new java.io.File(dir, "src")
          val fork = new java.io.File(dir, "fork")
          def wipe(f: java.io.File): Unit = {
            Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(wipe)
            f.delete(): Unit
          }
          wipe(src); wipe(fork)
          val base = Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_orderstatus"),
              cents(col("o_totalprice")).as("price_c"))
          val maxK = base.agg(max(col("o_orderkey").cast("long"))).head().getLong(0) + 1L
          val q1 = maxK / 4
          TxnTable.append(base.filter(col("o_orderkey") < q1), src.getPath,
            statsCol = Some("o_orderkey"))
          TxnTable.append(base.filter(col("o_orderkey") >= q1), src.getPath,
            statsCol = Some("o_orderkey"))
          TxnTable.addConstraint(s, src.getPath, "price_nonneg", "price_c >= 0")
          val srcV = TxnTable.latestVersion(src.getPath).get
          TxnTable.cloneTable(s, src.getPath, fork.getPath)
          require(Option(new java.io.File(fork, "data").listFiles())
              .getOrElse(Array.empty[java.io.File]).isEmpty,
            "shallow clone must copy zero data files")
          // diverge: reprice Q1 in the FORK only (MoR — the source's
          // referenced dirs stay byte-identical even inside the fork)
          TxnTable.updateRangeDV(s, fork.getPath, "o_orderkey", 0L, q1 - 1,
            Map("price_c" -> (col("price_c") + 5L)))
          require(TxnTable.latestVersion(src.getPath).contains(srcV),
            "the fork's update must not touch the source's version chain")
          ()
        }
        val fork = s"$dir/fork"
        val v0 = TxnTable.snapshot(fork, 0L)
        val latest = TxnTable.snapshot(fork, TxnTable.latestVersion(fork).get)
        require(v0.action == "clone" &&
            v0.constraints.keySet == Set("price_nonneg") &&
            latest.action == "update",
          s"clone lineage regressed: v0=${v0.action} latest=${latest.action}")
        TxnTable.read(s, fork)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), sum(col("price_c")).as("sum_price_c"))
          .orderBy("o_orderstatus")
      }),

    // ---- q218: CONCURRENT disjoint-partition loads — Delta's
    // WriteSerializable conflict resolution. Two racing writers each
    // atomically restate a DIFFERENT partition of the same table; the
    // base+1 loser inspects the winner's manifest, proves partition
    // disjointness, and REBASES instead of failing — the 1000-executor
    // load pattern (one loader per partition, all landing at once)
    // must not serialize through caller-level retries. The build races
    // real threads and requires BOTH commits landed (version advanced
    // by exactly 2, no CommitConflict); overlap still conflicts
    // (spec-pinned). The oracle recomputes both restatements on the
    // raw parquet — the hash match proves neither concurrent write was
    // lost and untouched partitions kept their bytes.
    Q("q218_txn_concurrent_loads",
      Some("""SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
             |       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)
             |           + CASE o_orderstatus WHEN 'F' THEN 1
             |                                WHEN 'O' THEN 2 ELSE 0 END) AS BIGINT)
             |         AS sum_price_c
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        import graft.sources.TxnTable
        val dir = derivedDir(d, "orders_txn_concurrent")
        Derived.ensure(dir, Derived.fingerprint(d, Seq("orders"))) {
          val t = new java.io.File(dir, "t")
          def wipe(f: java.io.File): Unit = {
            Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(wipe)
            f.delete(): Unit
          }
          wipe(t)
          val base = Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_orderstatus"),
              cents(col("o_totalprice")).as("price_c"))
          TxnTable.overwritePartitions(s, t.getPath, base, "o_orderstatus")
          val err = new java.util.concurrent.atomic.AtomicReference[Throwable]()
          val th = new Thread(() =>
            try TxnTable.overwritePartitions(s, t.getPath,
              base.filter(col("o_orderstatus") === "F")
                .withColumn("price_c", col("price_c") + 1L),
              "o_orderstatus"): Unit
            catch { case e: Throwable => err.set(e) })
          th.start()
          TxnTable.overwritePartitions(s, t.getPath,
            base.filter(col("o_orderstatus") === "O")
              .withColumn("price_c", col("price_c") + 2L),
            "o_orderstatus")
          th.join()
          require(err.get() == null,
            s"disjoint concurrent load must rebase and land, threw: ${err.get()}")
          require(TxnTable.latestVersion(t.getPath).contains(2L),
            "both concurrent restatements must commit (v1 and v2)")
          ()
        }
        val t = s"$dir/t"
        require(TxnTable.latestVersion(t).contains(2L),
          "concurrent-load lineage regressed")
        TxnTable.read(s, t)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), sum(col("price_c")).as("sum_price_c"))
          .orderBy("o_orderstatus")
      }),

    // ---- q219: INCREMENTAL dv-debt compaction (Delta REORG ... APPLY
    // (PURGE)). q200/q205 compact the WHOLE table — fine at GB scale,
    // non-viable at 100 TB, where maintenance must pay proportional to
    // the DEBT: the scan-time anti-join rent that deletion-vector'd
    // files accrue. The build dv-deletes a range confined to one
    // quartile dir, then compactDirty rewrites ONLY that dir — the
    // build requires the other three stay BYTE-IDENTICAL in the live
    // set, the dv map empties, and the rewritten dir re-derives its
    // bounds (the purged range stays unplannable). The oracle computes
    // NOT(range) on the raw parquet — the hash match proves the purge
    // moved exactly the surviving rows and nothing else.
    Q("q219_txn_compact_dirty",
      Some("""WITH m AS (SELECT (max(o_orderkey)+1)//4 AS q1,
             |                  (max(o_orderkey)+1)//2 - 100 AS q2h FROM orders)
             |SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
             |       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             |         AS sum_price_c
             |FROM orders, m
             |WHERE o_orderkey < m.q1 OR o_orderkey >= m.q2h
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        import graft.sources.TxnTable
        val dir = derivedDir(d, "orders_txn_compact_dirty")
        Derived.ensure(dir, Derived.fingerprint(d, Seq("orders"))) {
          val t = new java.io.File(dir, "t")
          def wipe(f: java.io.File): Unit = {
            Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(wipe)
            f.delete(): Unit
          }
          wipe(t)
          val base = Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_orderstatus"),
              cents(col("o_totalprice")).as("price_c"))
          val maxK = base.agg(max(col("o_orderkey").cast("long"))).head().getLong(0) + 1L
          val (q1, q2, q3) = (maxK / 4, maxK / 2, maxK * 3 / 4)
          Seq((0L, q1 - 1), (q1, q2 - 1), (q2, q3 - 1), (q3, maxK))
            .foreach { case (lo, hi) =>
              TxnTable.append(base.filter(col("o_orderkey").between(lo, hi)),
                t.getPath, statsCol = Some("o_orderkey"))
            }
          TxnTable.deleteRangeDV(s, t.getPath, "o_orderkey", q1, q2 - 101)
          val pre = TxnTable.snapshot(t.getPath, TxnTable.latestVersion(t.getPath).get)
          require(pre.dvs.size == 1, s"debt must sit in one dir, got ${pre.dvs}")
          TxnTable.compactDirty(s, t.getPath)
          val post = TxnTable.snapshot(t.getPath, TxnTable.latestVersion(t.getPath).get)
          val clean = pre.live.filterNot(pre.dvs.keySet)
          require(post.live.take(3) == clean && post.live.size == 4,
            s"purge must rewrite ONLY the dv'd dir: ${post.live} vs $clean")
          require(post.dvs.isEmpty, "purge must materialize the dv away")
          require(TxnTable.pruneLive(post, "o_orderkey", q1, q2 - 101).isEmpty,
            "the purged range must be unplannable from the refreshed bounds")
          ()
        }
        val t = s"$dir/t"
        val snap = TxnTable.snapshot(t, TxnTable.latestVersion(t).get)
        require(snap.action == "compact" && snap.live.size == 4 && snap.dvs.isEmpty,
          s"dirty-compaction lineage regressed: ${snap.action} ${snap.live.size}")
        TxnTable.read(s, t)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), sum(col("price_c")).as("sum_price_c"))
          .orderBy("o_orderstatus")
      }),

    // ---- q220: HIDDEN partitioning (Iceberg partition transforms).
    // The build lays orders out by a DERIVED year bucket —
    // substring(cast(o_orderdate as string), 1, 4) — that exists only
    // in .part sidecars and the manifest-carried spec (pta/pte), never
    // in the data files (the build asserts the stored schema has no
    // such column, and that a divergent transform is rejected: the
    // layout cannot silently fork, the exact failure Iceberg built
    // this to prevent). The query reads ONE year back residual-free —
    // every planned dir is partition-exact, so the scan touches only
    // that year's bytes; at 100 TB the query never needs to know the
    // scheme, and re-partitioning by month later changes no query
    // text. Oracle recomputes the same year slice with the same
    // transform on the raw parquet.
    Q("q220_txn_hidden_partition",
      Some("""SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
             |       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             |         AS sum_price_c
             |FROM orders
             |WHERE substr(CAST(o_orderdate AS VARCHAR), 1, 4) = '1995'
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        import graft.sources.TxnTable
        val dir = derivedDir(d, "orders_txn_hidden")
        Derived.ensure(dir, Derived.fingerprint(d, Seq("orders"))) {
          val t = new java.io.File(dir, "t")
          def wipe(f: java.io.File): Unit = {
            Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(wipe)
            f.delete(): Unit
          }
          wipe(t)
          val base = Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderdate"),
              cents(col("o_totalprice")).as("price_c"))
          TxnTable.overwritePartitionsHidden(s, t.getPath, base,
            "oy", "substring(cast(o_orderdate as string), 1, 4)")
          require(!TxnTable.read(s, t.getPath).columns.contains("oy"),
            "hidden partition column leaked into the data")
          val rejected =
            try {
              TxnTable.overwritePartitionsHidden(s, t.getPath, base.limit(1),
                "oy", "substring(cast(o_orderdate as string), 1, 7)")
              false
            } catch { case _: IllegalArgumentException => true }
          require(rejected, "a divergent transform must be rejected")
          ()
        }
        val t = s"$dir/t"
        val snap = TxnTable.snapshot(t, TxnTable.latestVersion(t).get)
        require(snap.ptrans.exists(_._1 == "oy") && snap.parts.nonEmpty,
          "hidden-partition spec regressed")
        val planned = TxnTable.prunePartition(snap, "oy", "1995")
        require(planned.nonEmpty && planned.size < snap.live.size,
          s"year probe must plan a strict subset: ${planned.size} of ${snap.live.size}")
        TxnTable.readPartition(s, t, "oy", "1995")
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), sum(col("price_c")).as("sum_price_c"))
          .orderBy("o_orderstatus")
      }),

    // ---- q221: full MERGE INTO with ordered WHEN MATCHED clauses
    // (SQL:2003 / Delta MERGE) — the CDC-apply workhorse q198's plain
    // upsert cannot express. One atomic commit applies: WHEN MATCHED
    // AND o_orderkey % 20 = 10 THEN DELETE (tombstones), WHEN MATCHED
    // THEN UPDATE from the source row (first true clause wins — the
    // %20=10 rows fire BOTH conditions and must die, not update), WHEN
    // NOT MATCHED THEN INSERT (the keys shifted past maxK). The oracle
    // recomputes the post-merge state from the raw parquet with
    // CASE/WHERE/UNION ALL — the hash match proves clause ordering,
    // conditional deletes, source-valued updates, and inserts all
    // landed exactly, through the same stats-pruned copy-on-write and
    // constraint-gated staging as every other writer.
    Q("q221_txn_merge_into",
      Some("""WITH m AS (SELECT max(o_orderkey)+1 AS mk FROM orders),
             |kept AS (
             |  SELECT CASE WHEN o_orderkey % 10 = 0 THEN 'U'
             |              ELSE o_orderstatus END AS o_orderstatus,
             |         CAST(round(o_totalprice * 100) AS BIGINT)
             |           * CASE WHEN o_orderkey % 10 = 0 THEN 2 ELSE 1 END AS price_c
             |  FROM orders WHERE o_orderkey % 20 <> 10),
             |ins AS (
             |  SELECT 'N' AS o_orderstatus,
             |         CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
             |  FROM orders WHERE o_orderkey % 20 = 5),
             |u AS (SELECT * FROM kept UNION ALL SELECT * FROM ins)
             |SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
             |       CAST(SUM(price_c) AS BIGINT) AS sum_price_c
             |FROM u GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        import graft.sources.TxnTable
        val dir = derivedDir(d, "orders_txn_merge_into")
        Derived.ensure(dir, Derived.fingerprint(d, Seq("orders"))) {
          val t = new java.io.File(dir, "t")
          def wipe(f: java.io.File): Unit = {
            Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(wipe)
            f.delete(): Unit
          }
          wipe(t)
          val base = Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_orderstatus"),
              cents(col("o_totalprice")).as("price_c"))
          val maxK = base.agg(max(col("o_orderkey").cast("long"))).head().getLong(0) + 1L
          TxnTable.append(base, t.getPath, statsCol = Some("o_orderkey"))
          // source: every 10th key (update/tombstone intent, status 'U',
          // price doubled) + every (20k+5)th key shifted past maxK
          // (insert intent, status 'N')
          val upd = base.filter(col("o_orderkey") % 10 === 0)
            .withColumn("o_orderstatus", lit("U"))
            .withColumn("price_c", col("price_c") * 2L)
          val ins = base.filter(col("o_orderkey") % 20 === 5)
            .withColumn("o_orderkey", col("o_orderkey") + lit(maxK))
            .withColumn("o_orderstatus", lit("N"))
          TxnTable.mergeInto(s, t.getPath, upd.unionByName(ins),
            keyCols = Seq("o_orderkey"),
            whenMatched = Seq(
              TxnTable.MatchedDelete(col("o_orderkey") % 20 === 10),
              TxnTable.MatchedUpdate(lit(true),
                Map("o_orderstatus" -> col("_src_o_orderstatus"),
                  "price_c" -> col("_src_price_c")))),
            txnId = Some("cdc-apply"))
          ()
        }
        val t = s"$dir/t"
        val snap = TxnTable.snapshot(t, TxnTable.latestVersion(t).get)
        require(snap.action == "merge", s"merge lineage regressed: ${snap.action}")
        TxnTable.read(s, t)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), sum(col("price_c")).as("sum_price_c"))
          .orderBy("o_orderstatus")
      }),

    // ---- q222: EQUALITY delete (Iceberg positional/equality taxonomy
    // completed: CoW q207, positional-dv q211, and this). A CDC
    // tombstone batch — every 50th key in the second quartile — lands
    // as a KB-sized key file and ONE manifest write with ZERO table
    // data scanned (even the positional dv form pays one scan of the
    // overlapping files to find row positions; at 100 TB and a
    // high-rate tombstone stream, O(|keys|) per commit is the only
    // sustainable write). The build requires the live set byte-
    // identical, the applies-to scope stats-pruned to a strict subset
    // of dirs, and a post-delete re-append of one tombstoned key to be
    // VISIBLE (manifest scoping — Iceberg's sequence-number rule: a
    // delete never applies to later data). The oracle recomputes the
    // surviving multiset on the raw parquet — the hash proves the
    // scan-time anti-join deletes exactly the tombstoned rows.
    Q("q222_txn_eq_delete",
      Some("""WITH m AS (SELECT (max(o_orderkey)+1)//4 AS q1,
             |                  (max(o_orderkey)+1)//2 - 100 AS q2h FROM orders),
             |kept AS (
             |  SELECT o_orderstatus,
             |         CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
             |  FROM orders, m
             |  WHERE NOT (o_orderkey % 50 = 0
             |             AND o_orderkey >= m.q1 AND o_orderkey < m.q2h)
             |  UNION ALL
             |  SELECT 'R' AS o_orderstatus,
             |         CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
             |  FROM orders, m
             |  WHERE o_orderkey = (SELECT min(o_orderkey) FROM orders, m
             |                      WHERE o_orderkey % 50 = 0
             |                        AND o_orderkey >= m.q1 AND o_orderkey < m.q2h))
             |SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
             |       CAST(SUM(price_c) AS BIGINT) AS sum_price_c
             |FROM kept GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        import graft.sources.TxnTable
        val dir = derivedDir(d, "orders_txn_eq_delete")
        Derived.ensure(dir, Derived.fingerprint(d, Seq("orders"))) {
          val t = new java.io.File(dir, "t")
          def wipe(f: java.io.File): Unit = {
            Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(wipe)
            f.delete(): Unit
          }
          wipe(t)
          val base = Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_orderstatus"),
              cents(col("o_totalprice")).as("price_c"))
          val maxK = base.agg(max(col("o_orderkey").cast("long"))).head().getLong(0) + 1L
          val (q1, q2, q3) = (maxK / 4, maxK / 2, maxK * 3 / 4)
          Seq((0L, q1 - 1), (q1, q2 - 1), (q2, q3 - 1), (q3, maxK))
            .foreach { case (lo, hi) =>
              TxnTable.append(base.filter(col("o_orderkey").between(lo, hi)),
                t.getPath, statsCol = Some("o_orderkey"))
            }
          val pre = TxnTable.snapshot(t.getPath, TxnTable.latestVersion(t.getPath).get)
          val tomb = base.filter(col("o_orderkey") % 50 === 0 &&
              col("o_orderkey") >= q1 && col("o_orderkey") <= q2 - 101)
            .select(col("o_orderkey"))
          val v = TxnTable.deleteKeysEq(s, t.getPath, tomb, txnId = Some("tomb-1"))
          val post = TxnTable.snapshot(t.getPath, v)
          require(post.live == pre.live,
            "equality delete must leave every data dir byte-identical")
          require(post.eqs.size == 1 &&
              post.eqs.values.head._2.size < post.live.size,
            s"applies-to must be stats-pruned to a strict subset: ${post.eqs}")
          // manifest scoping: re-append ONE tombstoned key (restated 'R')
          // — it must be visible, never retro-deleted
          val first = tomb.agg(min(col("o_orderkey"))).head().getLong(0)
          TxnTable.append(base.filter(col("o_orderkey") === first)
            .withColumn("o_orderstatus", lit("R")),
            t.getPath, statsCol = Some("o_orderkey"))
          ()
        }
        val t = s"$dir/t"
        val snap = TxnTable.snapshot(t, TxnTable.latestVersion(t).get)
        require(snap.eqs.size == 1 && snap.live.size == 5,
          s"eq-delete lineage regressed: eqs=${snap.eqs.size} live=${snap.live.size}")
        TxnTable.read(s, t)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), sum(col("price_c")).as("sum_price_c"))
          .orderBy("o_orderstatus")
      }),

    // ---- q223: GENERATED columns (Delta GENERATED ALWAYS AS). The
    // table declares o_year = substring(cast(o_orderdate as string),
    // 1, 4) in the MANIFEST; the first half of orders lands with the
    // column supplied (validated by the fused stage gate), the second
    // half OMITS it and the engine computes it at write time, and a
    // poisoned batch (wrong year) is rejected traceless with the typed
    // error — the build asserts version and live set unchanged. This
    // is how a derived feature/partition column stays TRUSTWORTHY at
    // 100 TB: the invariant is table metadata enforced on every write
    // path, not a pipeline convention that silently drifts. The oracle
    // recomputes the year from the raw timestamps — the hash match
    // proves supplied and computed halves agree exactly.
    Q("q223_txn_generated_column",
      Some("""SELECT substr(CAST(o_orderdate AS VARCHAR), 1, 4) AS o_year,
             |       o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
             |       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             |         AS sum_price_c
             |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      (s, d) => {
        import graft.sources.TxnTable
        val dir = derivedDir(d, "orders_txn_generated")
        val genExpr = "substring(cast(o_orderdate as string), 1, 4)"
        Derived.ensure(dir, Derived.fingerprint(d, Seq("orders"))) {
          val t = new java.io.File(dir, "t")
          def wipe(f: java.io.File): Unit = {
            Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(wipe)
            f.delete(): Unit
          }
          wipe(t)
          val base = Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderdate"),
              cents(col("o_totalprice")).as("price_c"))
          val maxK = base.agg(max(col("o_orderkey").cast("long"))).head().getLong(0) + 1L
          val h = maxK / 2
          // first half: column SUPPLIED (conforming) — then declare
          TxnTable.append(base.filter(col("o_orderkey") < h)
            .withColumn("o_year", expr(genExpr)), t.getPath)
          TxnTable.addGeneratedColumn(s, t.getPath, "o_year", genExpr)
          // second half: column OMITTED — computed at write time
          TxnTable.append(base.filter(col("o_orderkey") >= h), t.getPath)
          // a poisoned batch (wrong year) is rejected traceless
          val before = TxnTable.latestVersion(t.getPath).get
          val liveBefore = TxnTable.snapshot(t.getPath, before).live
          val rejected =
            try {
              TxnTable.append(base.limit(20)
                .withColumn("o_year", lit("1900")), t.getPath)
              false
            } catch { case _: TxnTable.ConstraintViolation => true }
          require(rejected &&
              TxnTable.latestVersion(t.getPath).contains(before) &&
              TxnTable.snapshot(t.getPath, before).live == liveBefore,
            "poisoned generated value must be rejected traceless")
          ()
        }
        val t = s"$dir/t"
        val snap = TxnTable.snapshot(t, TxnTable.latestVersion(t).get)
        require(snap.gens.get("o_year").contains(genExpr),
          s"generated-column spec regressed: ${snap.gens}")
        TxnTable.read(s, t)
          .groupBy(col("o_year"), col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), sum(col("price_c")).as("sum_price_c"))
          .orderBy("o_year", "o_orderstatus")
      }),

    // ---- q224: the DataSource V2 FRONT-END (GraftDataSource) over the
    // SAME four-commit table q202 builds — but the query is now what a
    // BI tool would write: `spark.read.format("graft").load(dir)` with
    // a PLAIN `.filter`, no (column, lo, hi) hand-plumbing. The DSv2
    // ScanBuilder receives Spark's pushed filters
    // (SupportsPushDownFilters), prunes the planned dirs through the
    // manifest min/max stats exactly as readRange does — require'd
    // every execution: 1 of 4 dirs planned, from the ScanMeta record —
    // and pushes the translated predicates + pruned columns into the
    // inner parquet read (row-group tier). Same oracle as q202: the
    // hash match proves the SQL-shaped path loses nothing vs the
    // library call. At 100 TB this is the difference between "a Scala
    // library" and "a table format BI tools can query".
    Q("q224_dsv2_pushdown",
      Some("""SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
             |       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c
             |FROM orders WHERE o_orderkey BETWEEN 1 AND 300
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        import graft.sources.{GraftScanMeta, TxnTable}
        val dir = derivedDir(d, "orders_txn_skip") // share q202's build
        Derived.ensure(dir, Derived.fingerprint(d, Seq("orders"))) {
          val t = new java.io.File(dir, "t")
          def wipe(f: java.io.File): Unit = {
            Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(wipe)
            f.delete(): Unit
          }
          wipe(t)
          val base = Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_orderstatus"),
              cents(col("o_totalprice")).as("price_c"))
          val maxKey = base.agg(max(col("o_orderkey"))).head().getLong(0)
          val m = maxKey / 4
          Seq((Long.MinValue, m), (m, 2 * m), (2 * m, 3 * m), (3 * m, Long.MaxValue))
            .zipWithIndex.foreach { case ((lo, hi), i) =>
              TxnTable.append(
                base.filter(col("o_orderkey") > lo && col("o_orderkey") <= hi),
                t.getPath, txnId = Some(s"slice-$i"), statsCol = Some("o_orderkey"))
            }
          ()
        }
        val t = s"$dir/t"
        val out = s.read.format("graft").load(t)
          .filter(col("o_orderkey") >= 1L && col("o_orderkey") <= 300L)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), sum(col("price_c")).as("sum_price_c"))
          .orderBy("o_orderstatus")
        // force planning so the ScanMeta record reflects THIS query,
        // then pin the dir-level skip: the DSv2 path must plan the same
        // 1-of-4 dirs the explicit readRange call does (q202). Keyed
        // lookup, not the global `last` slot — a concurrent graft scan
        // of another table must not swap the record under the audit.
        out.queryExecution.executedPlan: Unit
        val meta = GraftScanMeta.forTable(t).getOrElse(
          sys.error("DSv2 scan never planned"))
        require(meta.tableDir == t && meta.live.size == 4 && meta.planned.size == 1,
          s"DSv2 manifest skipping regressed: planned ${meta.planned.size} " +
            s"of ${meta.live.size} dirs (pushed=${meta.pushed})")
        val snap = TxnTable.snapshot(t, TxnTable.latestVersion(t).get)
        require(meta.planned == TxnTable.pruneLive(snap, "o_orderkey", 1L, 300L),
          "DSv2 planned a different dir set than pruneLive")
        out
      }),

    // ---- q227: MERGE INTO with WHEN NOT MATCHED BY SOURCE (Delta's
    // third clause family, SQL:2023) — the full-sync/retention merge
    // q221 cannot express: clauses that fire on TARGET rows ABSENT from
    // the source. One atomic commit applies: WHEN MATCHED THEN UPDATE
    // from the source (restated keys, price doubled, status 'S'); WHEN
    // NOT MATCHED THEN INSERT (keys shifted past maxK, status 'N');
    // WHEN NOT MATCHED BY SOURCE AND key % 5 = 1 THEN DELETE (retention
    // purge) and otherwise UPDATE SET status = 'X' (stale-mark) —
    // first-true-wins pinned: purge-eligible rows fire BOTH by-source
    // clauses and must DIE, not get stale-marked (a broken clause order
    // shifts them into the 'X' bucket and the hash catches it). The
    // oracle recomputes all four row classes from the raw parquet with
    // CASE/WHERE/UNION ALL.
    Q("q227_txn_merge_by_source",
      Some("""WITH matched AS (
             |  SELECT 'S' AS o_orderstatus,
             |         CAST(round(o_totalprice * 100) AS BIGINT) * 2 AS price_c
             |  FROM orders WHERE o_orderkey % 3 = 0),
             |stale AS (
             |  SELECT 'X' AS o_orderstatus,
             |         CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
             |  FROM orders WHERE o_orderkey % 3 <> 0 AND o_orderkey % 5 <> 1),
             |ins AS (
             |  SELECT 'N' AS o_orderstatus,
             |         CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
             |  FROM orders WHERE o_orderkey % 6 = 2),
             |u AS (SELECT * FROM matched UNION ALL SELECT * FROM stale
             |      UNION ALL SELECT * FROM ins)
             |SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
             |       CAST(SUM(price_c) AS BIGINT) AS sum_price_c
             |FROM u GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        import graft.sources.TxnTable
        val dir = derivedDir(d, "orders_txn_merge_by_source")
        Derived.ensure(dir, Derived.fingerprint(d, Seq("orders"))) {
          val t = new java.io.File(dir, "t")
          def wipe(f: java.io.File): Unit = {
            Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(wipe)
            f.delete(): Unit
          }
          wipe(t)
          val base = Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_orderstatus"),
              cents(col("o_totalprice")).as("price_c"))
          val maxK = base.agg(max(col("o_orderkey").cast("long"))).head().getLong(0) + 1L
          TxnTable.append(base, t.getPath, statsCol = Some("o_orderkey"))
          val src = base.filter(col("o_orderkey") % 3 === 0)
            .withColumn("o_orderstatus", lit("S"))
            .withColumn("price_c", col("price_c") * 2L)
            .unionByName(base.filter(col("o_orderkey") % 6 === 2)
              .withColumn("o_orderkey", col("o_orderkey") + lit(maxK))
              .withColumn("o_orderstatus", lit("N")))
          TxnTable.mergeInto(s, t.getPath, src,
            keyCols = Seq("o_orderkey"),
            whenMatched = Seq(
              TxnTable.MatchedUpdate(lit(true),
                Map("o_orderstatus" -> col("_src_o_orderstatus"),
                  "price_c" -> col("_src_price_c")))),
            whenNotMatchedBySource = Seq(
              TxnTable.MatchedDelete(col("o_orderkey") % 5 === 1),
              TxnTable.MatchedUpdate(lit(true),
                Map("o_orderstatus" -> lit("X")))),
            txnId = Some("full-sync"))
          ()
        }
        val t = s"$dir/t"
        val snap = TxnTable.snapshot(t, TxnTable.latestVersion(t).get)
        require(snap.action == "merge", s"merge lineage regressed: ${snap.action}")
        TxnTable.read(s, t)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), sum(col("price_c")).as("sum_price_c"))
          .orderBy("o_orderstatus")
      }),

    // ---- q226: RENAME + type-WIDEN schema evolution via manifest
    // field ids (the Iceberg mechanism; VERDICT r9 #5) — both
    // METADATA-ONLY commits, zero data rewritten. The build appends the
    // first half of orders with an INT cents column named `price_c`,
    // renames it to `price_cents`, widens it to BIGINT, then appends
    // the second half in the new shape — so the final table holds one
    // pre-evolution dir (old physical name, narrow type, no `.cols`
    // sidecar: the schema0 era) and one post-evolution dir, and the
    // read resolves BOTH by field id, casting the old era up. The
    // oracle aggregates ALL of orders from raw parquet under the new
    // name: the hash match proves the rename mapped (not nulled) the
    // old files, the widen cast losslessly, and the two eras unioned
    // without loss or duplication. At 100 TB this is what makes schema
    // evolution real: renaming a column over petabytes is one manifest
    // write, and every old file keeps resolving forever.
    Q("q226_txn_rename_widen",
      Some("""SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
             |       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             |         AS sum_price_cents
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        import graft.sources.TxnTable
        val dir = derivedDir(d, "orders_txn_rename_widen")
        Derived.ensure(dir, Derived.fingerprint(d, Seq("orders"))) {
          val t = new java.io.File(dir, "t")
          def wipe(f: java.io.File): Unit = {
            Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(wipe)
            f.delete(): Unit
          }
          wipe(t)
          val base = Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_orderstatus"),
              cents(col("o_totalprice")).cast("int").as("price_c"))
          val maxK = base.agg(max(col("o_orderkey").cast("long"))).head().getLong(0) + 1L
          val h = maxK / 2
          TxnTable.append(base.filter(col("o_orderkey") < h), t.getPath,
            statsCol = Some("o_orderkey"))
          TxnTable.renameColumn(s, t.getPath, "price_c", "price_cents")
          TxnTable.widenColumn(s, t.getPath, "price_cents", "bigint")
          TxnTable.append(base.filter(col("o_orderkey") >= h)
            .withColumnRenamed("price_c", "price_cents")
            .withColumn("price_cents", col("price_cents").cast("bigint")),
            t.getPath, statsCol = Some("o_orderkey"))
          ()
        }
        val t = s"$dir/t"
        val snap = TxnTable.snapshot(t, TxnTable.latestVersion(t).get)
        require(snap.fids.get("price_cents").contains(3) && snap.schema0.isDefined,
          s"field-id evolution regressed: fids=${snap.fids}")
        val df = TxnTable.read(s, t)
        require(df.schema("price_cents").dataType ==
          org.apache.spark.sql.types.LongType, "widen did not take effect")
        df.groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            sum(col("price_cents")).as("sum_price_cents"))
          .orderBy("o_orderstatus")
      }),

    // ---- q228: hidden-partition SPEC EVOLUTION (Iceberg's partition
    // evolution; VERDICT r9 #9). The build lands the first half of
    // orders hidden-partitioned by MONTH (`om`), then EVOLVES the spec
    // and lands the second half partitioned by YEAR (`oy`,
    // evolveSpec = true) — old dirs keep their month layout, the
    // manifest carries the full spec history (`pth`). The query probes
    // one source date across the boundary: era-1 dirs prune by THEIR
    // month transform, era-2 dirs by THEIR year transform — require'd
    // every execution (planned < live, both eras represented in the
    // plan). The oracle filters the raw parquet by the same date: the
    // hash match proves neither era leaked nor lost rows through the
    // evolved planning. At 100 TB this is how a table migrates from
    // daily to hourly partitioning without rewriting history — new
    // data under the new spec, old files planned under the spec they
    // were written with, queries unchanged.
    Q("q228_txn_partition_spec_evolution",
      Some("""SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
             |       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             |         AS sum_price_c
             |FROM orders
             |WHERE o_orderdate = (SELECT max(o_orderdate) FROM orders)
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        import graft.sources.TxnTable
        val dir = derivedDir(d, "orders_txn_spec_evo")
        val mTr = "substring(cast(o_orderdate as string), 1, 7)"
        val yTr = "substring(cast(o_orderdate as string), 1, 4)"
        Derived.ensure(dir, Derived.fingerprint(d, Seq("orders"))) {
          val t = new java.io.File(dir, "t")
          def wipe(f: java.io.File): Unit = {
            Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(wipe)
            f.delete(): Unit
          }
          wipe(t)
          val base = Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderdate"),
              cents(col("o_totalprice")).as("price_c"))
          val maxK = base.agg(max(col("o_orderkey").cast("long"))).head().getLong(0) + 1L
          val h = maxK / 2
          TxnTable.overwritePartitionsHidden(s, t.getPath,
            base.filter(col("o_orderkey") < h), "om", mTr, txnId = Some("era1"))
          TxnTable.overwritePartitionsHidden(s, t.getPath,
            base.filter(col("o_orderkey") >= h), "oy", yTr,
            txnId = Some("era2"), evolveSpec = true)
          ()
        }
        val t = s"$dir/t"
        val snap = TxnTable.snapshot(t, TxnTable.latestVersion(t).get)
        require(snap.ptrans.exists(_._1 == "oy") &&
            snap.pthist.keySet == Set("om", "oy"),
          s"spec history regressed: ptrans=${snap.ptrans} pth=${snap.pthist}")
        val maxDate = Tables.orders(s, d).agg(max(col("o_orderdate"))).head().get(0)
        val planned = {
          // mirror the read's planning to pin both eras prune
          val one = s.range(1).withColumn("o_orderdate", lit(maxDate))
          val mv = one.select(expr(mTr).cast("string")).head().getString(0)
          val yv = one.select(expr(yTr).cast("string")).head().getString(0)
          snap.live.filter(dd => snap.parts.get(dd) match {
            case Some(("om", v)) => v == mv
            case Some(("oy", v)) => v == yv
            case _               => true
          })
        }
        // each era prunes to AT MOST ONE dir under ITS OWN transform
        // (at tiny SF the probe date may exist in only one half, so the
        // other era legitimately plans zero dirs)
        def eraPlanned(a: String) =
          planned.count(dd => snap.parts.get(dd).exists(_._1 == a))
        require(planned.size < snap.live.size && planned.nonEmpty &&
            eraPlanned("om") <= 1 && eraPlanned("oy") <= 1,
          s"evolved-spec pruning regressed: ${planned.size} of ${snap.live.size} " +
            s"(om=${eraPlanned("om")}, oy=${eraPlanned("oy")})")
        TxnTable.readPartitionHidden(s, t, Map("o_orderdate" -> maxDate))
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), sum(col("price_c")).as("sum_price_c"))
          .orderBy("o_orderstatus")
      }),

    // ---- q229: DSv2 WRITE path (round 11) — `df.write.format("graft")`
    // and SQL `INSERT INTO` / `INSERT OVERWRITE` over a `USING graft`
    // catalog table, each landing as ONE atomic TxnTable commit through
    // the same staged-write + manifest-publish gates as the Scala API
    // (schema-on-write, constraints, conflict rebase). The build: half
    // of orders lands via the DataFrame writer (with statsCol pruning
    // sidecars), the other half via pure-SQL INSERT INTO, then INSERT
    // OVERWRITE replaces everything with the full table — so the final
    // content equals raw orders and the oracle's hash match proves all
    // three write shapes landed losslessly. Lineage is require'd:
    // exactly [append, append, overwrite], and the v0 dirs carry
    // manifest bounds (the writer option reached the sidecar writer).
    Q("q229_dsv2_write",
      Some("""SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
             |       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             |         AS sum_price_c
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        import graft.sources.TxnTable
        val dir = derivedDir(d, "orders_dsv2_write")
        Derived.ensure(dir, Derived.fingerprint(d, Seq("orders"))) {
          val t = new java.io.File(dir, "t")
          def wipe(f: java.io.File): Unit = {
            Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(wipe)
            f.delete(): Unit
          }
          wipe(t)
          val base = Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_orderstatus"),
              cents(col("o_totalprice")).as("price_c"))
          val maxK = base.agg(max(col("o_orderkey").cast("long"))).head().getLong(0)
          val h = maxK / 2
          // v0: the DataFrame writer creates the table (first commit
          // records the schema; statsCol writes pruning sidecars)
          base.filter(col("o_orderkey") <= h)
            .write.format("graft").option("statsCol", "o_orderkey")
            .mode("append").save(t.getPath)
          // v1: pure-SQL INSERT INTO through the session catalog
          s.sql("DROP TABLE IF EXISTS graft_q229_t")
          s.sql(s"CREATE TABLE graft_q229_t USING graft LOCATION '${t.getPath}'")
          base.filter(col("o_orderkey") > h)
            .createOrReplaceTempView("graft_q229_src_hi")
          s.sql("INSERT INTO graft_q229_t SELECT * FROM graft_q229_src_hi")
          // v2: INSERT OVERWRITE replaces the content with the full set
          base.createOrReplaceTempView("graft_q229_src_all")
          s.sql("INSERT OVERWRITE graft_q229_t SELECT * FROM graft_q229_src_all")
          s.sql("DROP TABLE graft_q229_t")
          ()
        }
        val t = s"$dir/t"
        val actions = TxnTable.versions(t)
          .map(v => TxnTable.snapshot(t, v).action)
        require(actions == Seq("append", "append", "overwrite"),
          s"DSv2 write lineage regressed: $actions")
        require(TxnTable.snapshot(t, 0L).stats.nonEmpty,
          "statsCol option did not reach the sidecar writer through DSv2")
        s.read.format("graft").load(t)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), sum(col("price_c")).as("sum_price_c"))
          .orderBy("o_orderstatus")
      }),

    // ---- q230: SQL MERGE INTO over a graft catalog table (round 11) —
    // the q221 CDC-apply scenario executed from pure SQL TEXT: ordered
    // WHEN MATCHED clauses (conditional DELETE tombstones first, then
    // source-valued UPDATE — first true clause wins) plus WHEN NOT
    // MATCHED INSERT *, dispatched by [[graft.plans.GraftDml]] (a
    // runtime-injectable planner strategy, the extension shape Delta
    // uses) to [[TxnTable.mergeInto]] — ONE atomic stats-pruned
    // copy-on-write commit. Identical oracle to q221: the hash match
    // proves SQL-text MERGE ≡ the Scala-API merge, clause order and all.
    Q("q230_sql_merge_into",
      Some("""WITH m AS (SELECT max(o_orderkey)+1 AS mk FROM orders),
             |kept AS (
             |  SELECT CASE WHEN o_orderkey % 10 = 0 THEN 'U'
             |              ELSE o_orderstatus END AS o_orderstatus,
             |         CAST(round(o_totalprice * 100) AS BIGINT)
             |           * CASE WHEN o_orderkey % 10 = 0 THEN 2 ELSE 1 END AS price_c
             |  FROM orders WHERE o_orderkey % 20 <> 10),
             |ins AS (
             |  SELECT 'N' AS o_orderstatus,
             |         CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
             |  FROM orders WHERE o_orderkey % 20 = 5),
             |u AS (SELECT * FROM kept UNION ALL SELECT * FROM ins)
             |SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
             |       CAST(SUM(price_c) AS BIGINT) AS sum_price_c
             |FROM u GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        import graft.sources.TxnTable
        val dir = derivedDir(d, "orders_sql_merge_into")
        Derived.ensure(dir, Derived.fingerprint(d, Seq("orders"))) {
          val t = new java.io.File(dir, "t")
          def wipe(f: java.io.File): Unit = {
            Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(wipe)
            f.delete(): Unit
          }
          wipe(t)
          graft.plans.GraftDml.install(s)
          val base = Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_orderstatus"),
              cents(col("o_totalprice")).as("price_c"))
          val maxK = base.agg(max(col("o_orderkey").cast("long"))).head().getLong(0) + 1L
          TxnTable.append(base, t.getPath, statsCol = Some("o_orderkey"))
          val upd = base.filter(col("o_orderkey") % 10 === 0)
            .withColumn("o_orderstatus", lit("U"))
            .withColumn("price_c", col("price_c") * 2L)
          val ins = base.filter(col("o_orderkey") % 20 === 5)
            .withColumn("o_orderkey", col("o_orderkey") + lit(maxK))
            .withColumn("o_orderstatus", lit("N"))
          upd.unionByName(ins).createOrReplaceTempView("graft_q230_src")
          s.sql("DROP TABLE IF EXISTS graft_q230_t")
          s.sql(s"CREATE TABLE graft_q230_t USING graft LOCATION '${t.getPath}'")
          s.sql("""MERGE INTO graft_q230_t AS t USING graft_q230_src AS s
                  |ON t.o_orderkey = s.o_orderkey
                  |WHEN MATCHED AND t.o_orderkey % 20 = 10 THEN DELETE
                  |WHEN MATCHED THEN UPDATE SET
                  |  o_orderstatus = s.o_orderstatus, price_c = s.price_c
                  |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
          s.sql("DROP TABLE graft_q230_t")
          ()
        }
        val t = s"$dir/t"
        val snap = TxnTable.snapshot(t, TxnTable.latestVersion(t).get)
        require(snap.action == "merge",
          s"SQL MERGE did not land as a TxnTable merge commit: ${snap.action}")
        TxnTable.read(s, t)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), sum(col("price_c")).as("sum_price_c"))
          .orderBy("o_orderstatus")
      }),

    // ---- q231: SQL UPDATE + DELETE over a graft catalog table (round
    // 11) — the remaining two DML verbs as pure SQL text through the
    // same [[graft.plans.GraftDml]] dispatch: UPDATE doubles the
    // price of every 10th key ([[TxnTable.updateWhere]], stats-pruned
    // CoW rewrite), then DELETE purges every 20th-plus-10 key
    // ([[TxnTable.deleteWhere]]). The oracle recomputes the final
    // state from raw parquet — the doubled-then-deleted overlap keys
    // (%20 = 10 are %10 = 0 too) make a clause-bleed or wrong-order
    // execution hash-visible.
    Q("q231_sql_update_delete",
      Some("""SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
             |       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)
             |         * CASE WHEN o_orderkey % 10 = 0 THEN 2 ELSE 1 END) AS BIGINT)
             |         AS sum_price_c
             |FROM orders WHERE o_orderkey % 20 <> 10
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        import graft.sources.TxnTable
        val dir = derivedDir(d, "orders_sql_update_delete")
        Derived.ensure(dir, Derived.fingerprint(d, Seq("orders"))) {
          val t = new java.io.File(dir, "t")
          def wipe(f: java.io.File): Unit = {
            Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(wipe)
            f.delete(): Unit
          }
          wipe(t)
          graft.plans.GraftDml.install(s)
          val base = Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_orderstatus"),
              cents(col("o_totalprice")).as("price_c"))
          TxnTable.append(base, t.getPath, statsCol = Some("o_orderkey"))
          s.sql("DROP TABLE IF EXISTS graft_q231_t")
          s.sql(s"CREATE TABLE graft_q231_t USING graft LOCATION '${t.getPath}'")
          s.sql("UPDATE graft_q231_t SET price_c = price_c * 2 WHERE o_orderkey % 10 = 0")
          s.sql("DELETE FROM graft_q231_t WHERE o_orderkey % 20 = 10")
          s.sql("DROP TABLE graft_q231_t")
          ()
        }
        val t = s"$dir/t"
        val actions = TxnTable.versions(t)
          .map(v => TxnTable.snapshot(t, v).action)
        require(actions == Seq("append", "update", "delete"),
          s"SQL UPDATE/DELETE lineage regressed: $actions")
        TxnTable.read(s, t)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), sum(col("price_c")).as("sum_price_c"))
          .orderBy("o_orderstatus")
      }),

    // ---- q232: the SQL MAINTENANCE surface (round 12) — OPTIMIZE /
    // DESCRIBE HISTORY via [[graft.plans.GraftSql]] (Spark's parser has
    // no grammar for them; GraftSql is the documented CALL-style escape
    // that delegates everything else to spark.sql), and ALTER TABLE
    // ADD CONSTRAINT as native Spark 4 SQL through the same
    // GraftDmlStrategy dispatch the DML verbs use. The build runs three
    // status-sliced appends, `OPTIMIZE … TARGET 2 FILES` (one bin-packed
    // commit), and a SQL CHECK constraint (validates existing rows,
    // metadata-only commit); the declared result is DESCRIBE HISTORY's
    // (version, action, num_files, num_rows) — deterministic dir counts
    // and row sums the oracle reconstructs from raw parquet, so a
    // maintenance op that rewrote rows, lost a commit, or miscounted
    // files is hash-visible.
    Q("q232_sql_maintenance",
      Some("""WITH c AS (SELECT
             |  CAST(count(*) FILTER (o_orderstatus='F') AS BIGINT) AS f,
             |  CAST(count(*) FILTER (o_orderstatus='O') AS BIGINT) AS o,
             |  CAST(count(*) FILTER (o_orderstatus='P') AS BIGINT) AS p FROM orders)
             |SELECT version, action, num_files, num_rows FROM (
             |  SELECT CAST(0 AS BIGINT) AS version, 'append' AS action,
             |         CAST(1 AS INT) AS num_files, f AS num_rows FROM c
             |  UNION ALL SELECT CAST(1 AS BIGINT), 'append', CAST(2 AS INT), f+o FROM c
             |  UNION ALL SELECT CAST(2 AS BIGINT), 'append', CAST(3 AS INT), f+o+p FROM c
             |  UNION ALL SELECT CAST(3 AS BIGINT), 'compact', CAST(1 AS INT), f+o+p FROM c
             |  UNION ALL SELECT CAST(4 AS BIGINT), 'addConstraint', CAST(1 AS INT), f+o+p FROM c)
             |ORDER BY version""".stripMargin),
      (s, d) => {
        import graft.sources.TxnTable
        val dir = derivedDir(d, "orders_sql_maintenance")
        Derived.ensure(dir, Derived.fingerprint(d, Seq("orders"))) {
          val t = new java.io.File(dir, "t")
          def wipe(f: java.io.File): Unit = {
            Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(wipe)
            f.delete(): Unit
          }
          wipe(t)
          graft.plans.GraftDml.install(s)
          val base = Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_orderstatus"),
              cents(col("o_totalprice")).as("price_c"))
          Seq("F", "O", "P").foreach(st =>
            TxnTable.append(base.filter(col("o_orderstatus") === st), t.getPath))
          val opt = graft.plans.GraftSql
            .sql(s, s"OPTIMIZE graft.`${t.getPath}` TARGET 2 FILES").head()
          require(opt.getLong(0) == 3L && opt.getLong(2) == 2L,
            s"OPTIMIZE did not bin-pack to 2 files at v3: $opt")
          s.sql("DROP TABLE IF EXISTS graft_q232_t")
          s.sql(s"CREATE TABLE graft_q232_t USING graft LOCATION '${t.getPath}'")
          s.sql("ALTER TABLE graft_q232_t ADD CONSTRAINT price_pos CHECK (price_c >= 0)")
          s.sql("DROP TABLE graft_q232_t")
          ()
        }
        val t = s"$dir/t"
        require(TxnTable.snapshot(t, 4L).constraints.contains("price_pos"),
          "SQL ADD CONSTRAINT did not land in the manifest")
        graft.plans.GraftSql.sql(s, s"DESCRIBE HISTORY graft.`$t`")
          .select(col("version"), col("action"), col("num_files"), col("num_rows"))
          .orderBy("version")
      }),

    // ---- q233: partition MAINTENANCE end-to-end (round 12) — the
    // bulk partition writer (one shuffled job stages all three status
    // partitions), merge-on-read deletes cutting across every
    // partition, and partition-scoped compaction (`OPTIMIZE … WHERE`
    // via [[TxnTable.compactPartition]]): F's deletion vector
    // materializes away and its files bin-pack, while O and P keep
    // their dv debt AND their dirs byte-untouched. The read must fold
    // the remaining dvs correctly — the oracle recomputes the final
    // state from raw parquet, so a compaction that resurrected deleted
    // rows, dropped a partition, or leaked F's dv into O/P is
    // hash-visible. SHOW PARTITIONS and the manifest lineage are
    // require'd in-build.
    Q("q233_partition_maintenance",
      Some("""SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
             |       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             |         AS sum_price_c
             |FROM orders WHERE o_orderkey % 50 <> 10
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        import graft.sources.TxnTable
        val dir = derivedDir(d, "orders_partition_maintenance")
        Derived.ensure(dir, Derived.fingerprint(d, Seq("orders"))) {
          val t = new java.io.File(dir, "t")
          def wipe(f: java.io.File): Unit = {
            Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(wipe)
            f.delete(): Unit
          }
          wipe(t)
          val base = Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_orderstatus"),
              cents(col("o_totalprice")).as("price_c"))
          TxnTable.overwritePartitions(s, t.getPath, base, "o_orderstatus")
          TxnTable.deleteWhereDV(s, t.getPath, col("o_orderkey") % 50 === 10)
          TxnTable.compactPartition(s, t.getPath, "o_orderstatus", "F")
          ()
        }
        val t = s"$dir/t"
        val snap = TxnTable.snapshot(t, TxnTable.latestVersion(t).get)
        require(snap.action == "compactPartition",
          s"maintenance lineage regressed: ${snap.action}")
        val fDirs = snap.live.filter(dd => snap.parts.get(dd).exists(_._2 == "F"))
        require(fDirs.size == 1 && fDirs.forall(!snap.dvs.contains(_)),
          "partition F did not compact to one dv-free dir")
        require(snap.dvs.nonEmpty,
          "O/P must keep their dv debt — compaction scope leaked")
        val parts = graft.plans.GraftSql.sql(s, s"SHOW PARTITIONS graft.`$t`")
          .collect().map(_.getString(1)).sorted.toSeq
        require(parts == Seq("F", "O", "P"), s"SHOW PARTITIONS wrong: $parts")
        TxnTable.read(s, t)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), sum(col("price_c")).as("sum_price_c"))
          .orderBy("o_orderstatus")
      }),

    // ---- q234: STRING min-max data skipping (round 13) — the q202
    // story on the predicates real tables filter by most: status/date/
    // category STRINGS, which integral bounds never served. The derived
    // build lands orders as four date-range slices with
    // `statsCol = o_date_s` (an ISO yyyy-MM-dd string — lexicographic
    // order IS chronological order), so each dir's manifest carries
    // base64(UTF-8-byte-truncated) string bounds. The query is a
    // one-year range read: the build REQUIRES pruneLiveString to plan a
    // strict subset (1 of 4 dirs — 1994 lives entirely in one slice),
    // then aggregates through readRangeString. The oracle applies the
    // same date-string range to the original parquet: a hash match
    // proves the truncated byte bounds dropped no qualifying row. At
    // 100 TB: "WHERE day BETWEEN x AND y" on an ingest-date-sliced
    // corpus plans the handful of files those days live in — with the
    // bounds served from the ONE manifest fetch the scan already pays.
    Q("q234_txn_string_skipping",
      Some("""SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
             |       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c
             |FROM orders
             |WHERE strftime(o_orderdate, '%Y-%m-%d') BETWEEN '1997-01-01' AND '1997-12-31'
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        import graft.sources.TxnTable
        val dir = derivedDir(d, "orders_txn_sskip")
        Derived.ensure(dir, Derived.fingerprint(d, Seq("orders"))) {
          val t = new java.io.File(dir, "t")
          def wipe(f: java.io.File): Unit = {
            Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(wipe)
            f.delete(): Unit
          }
          wipe(t)
          val base = Tables.orders(s, d)
            .select(date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date_s"),
              col("o_orderstatus"),
              cents(col("o_totalprice")).as("price_c"))
          // four sorted date slices (the synthetic orders span
          // 1995-01-01..2001-08-01 at every SF): each dir's string
          // bounds cover a disjoint date range, with 1997 entirely
          // inside one slice
          Seq(("0000-00-00", "1996-06-30"), ("1996-07-01", "1997-12-31"),
              ("1998-01-01", "1999-12-31"), ("2000-01-01", "9999-99-99"))
            .zipWithIndex.foreach { case ((lo, hi), i) =>
              TxnTable.append(
                base.filter(col("o_date_s") >= lo && col("o_date_s") <= hi),
                t.getPath, txnId = Some(s"dateslice-$i"),
                statsCol = Some("o_date_s"))
            }
          ()
        }
        val t = s"$dir/t"
        val snap = TxnTable.snapshot(t, TxnTable.latestVersion(t).get)
        val planned = TxnTable.pruneLiveString(snap, "o_date_s",
          "1997-01-01", "1997-12-31")
        require(planned.size == 1 && snap.live.size == 4,
          s"string skipping regressed: planned ${planned.size} of ${snap.live.size} dirs")
        TxnTable.readRangeString(s, t, "o_date_s", "1997-01-01", "1997-12-31")
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), sum(col("price_c")).as("sum_price_c"))
          .orderBy("o_orderstatus")
      }),

    // ---- q235: NATIVE MULTI-COLUMN partition specs (round 13) — the
    // two-level layout a real lake table runs (status / year), composed
    // with partition-scoped maintenance, without detouring through a
    // composite hidden transform. The derived build lands orders
    // partitioned by (o_orderstatus, o_year) in ONE bulk job (the
    // levels ride as a '|'-joined url-encoded carrier; each staged dir's
    // manifest entry is an ordered value vector), then compacts the F
    // SUBTREE via a partial spec — Map(status -> F) rewrites only F's
    // year-dirs into one packed dir carrying the exact common level
    // (status=F; the year level widens conservatively). The query reads
    // the exact tuple (F, 1997): the packed dir plans (its widened year
    // cannot contradict) and the in-data year residual filters rows,
    // while every other status's dirs prune by level 1 — REQUIRED to be
    // 1 of the live set each run. The oracle applies the same two
    // equality predicates to the original parquet: a hash match proves
    // tuple pruning dropped no qualifying row AND subtree compaction
    // moved every F row exactly once. At 100 TB: day-grain loads under a
    // coarser first level, maintenance scoped to a subtree, reads
    // planned from one manifest fetch.
    Q("q235_txn_multicol_partitions",
      Some("""SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
             |       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c
             |FROM orders
             |WHERE o_orderstatus = 'F' AND strftime(o_orderdate, '%Y') = '1997'
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        import graft.sources.TxnTable
        val dir = derivedDir(d, "orders_txn_mpart")
        Derived.ensure(dir, Derived.fingerprint(d, Seq("orders"))) {
          val t = new java.io.File(dir, "t")
          def wipe(f: java.io.File): Unit = {
            Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(wipe)
            f.delete(): Unit
          }
          wipe(t)
          val base = Tables.orders(s, d)
            .select(col("o_orderstatus"),
              date_format(col("o_orderdate"), "yyyy").as("o_year"),
              cents(col("o_totalprice")).as("price_c"))
          TxnTable.overwritePartitions(s, t.getPath, base,
            Seq("o_orderstatus", "o_year"), txnId = Some("load0"))
          // partition-scoped maintenance on a PARTIAL spec: pack the F
          // subtree; other statuses' dirs stay byte-identical
          TxnTable.compactPartition(s, t.getPath,
            Map("o_orderstatus" -> "F"), targetFiles = 1): Unit
          ()
        }
        val t = s"$dir/t"
        val snap = TxnTable.snapshot(t, TxnTable.latestVersion(t).get)
        val planned = TxnTable.prunePartitionSpec(snap,
          Map("o_orderstatus" -> "F", "o_year" -> "1997"))
        require(planned.size == 1 && snap.live.size > 4,
          s"tuple pruning regressed: planned ${planned.size} of ${snap.live.size} dirs")
        require(snap.partsN.nonEmpty, "manifest lost the multi-col vectors")
        TxnTable.readPartition(s, t,
            Map("o_orderstatus" -> "F", "o_year" -> "1997"))
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), sum(col("price_c")).as("sum_price_c"))
          .orderBy("o_orderstatus")
      }),

    // ---- q236: DATE data skipping through the PLAIN DSv2 reader (round
    // 14) — the round-13 bounds machinery promoted from an expert API to
    // engine behavior every user gets. The derived build appends orders
    // in four date slices with `statsCol = o_orderdate` — a DATE column,
    // whose bounds now ride the integral `.stats` tier as epoch days
    // (TxnTable.longProj). The query is exactly what a BI tool or naive
    // notebook issues: `spark.read.format("graft").load(t).filter(date
    // between …)` — no readRange, no readRangeString, no knowledge the
    // table format exists. GraftScan translates the pushed Date values
    // through Spark's own DateTimeUtils (the exact inverse of the
    // write-side unix_date projection — both sides engine-controlled, so
    // the rendering-drift hazard that excludes dates from PARTITION
    // pruning cannot arise) and must plan 1 of the 4 dirs, REQUIRED each
    // run via the keyed ScanMeta record and pinned equal to the explicit
    // pruneLive plan. The oracle applies the same date window to the
    // original parquet — a hash match proves dir skipping dropped no
    // qualifying row. At 100 TB: a date range is THE most common fact-
    // table predicate; this is the difference between scanning a year
    // and scanning the table, with zero API opt-in.
    Q("q236_dsv2_date_skipping",
      Some("""SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
             |       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c
             |FROM orders
             |WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1997-01-01' AND DATE '1997-12-31'
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        import graft.sources.{GraftScanMeta, TxnTable}
        val dir = derivedDir(d, "orders_txn_dateskip")
        Derived.ensure(dir, Derived.fingerprint(d, Seq("orders"))) {
          val t = new java.io.File(dir, "t")
          def wipe(f: java.io.File): Unit = {
            Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(wipe)
            f.delete(): Unit
          }
          wipe(t)
          // the synthetic o_orderdate is a (midnight) TIMESTAMP_NTZ —
          // land it as a true DATE column, the type this query verifies
          val base = Tables.orders(s, d)
            .select(to_date(col("o_orderdate")).as("o_orderdate"),
              col("o_orderstatus"),
              cents(col("o_totalprice")).as("price_c"))
          // four date slices (synthetic orders span 1995-01-01..
          // 2001-08-01 at every SF), 1997 entirely inside one — the
          // sorted-ingest layout a daily-loaded fact table has naturally
          Seq(("1900-01-01", "1996-06-30"), ("1996-07-01", "1997-12-31"),
              ("1998-01-01", "1999-12-31"), ("2000-01-01", "2099-12-31"))
            .zipWithIndex.foreach { case ((lo, hi), i) =>
              TxnTable.append(
                base.filter(col("o_orderdate") >= lit(java.sql.Date.valueOf(lo)) &&
                  col("o_orderdate") <= lit(java.sql.Date.valueOf(hi))),
                t.getPath, txnId = Some(s"dslice-$i"),
                statsCol = Some("o_orderdate"))
            }
          ()
        }
        val t = s"$dir/t"
        val out = s.read.format("graft").load(t)
          .filter(col("o_orderdate") >= lit(java.sql.Date.valueOf("1997-01-01")) &&
            col("o_orderdate") <= lit(java.sql.Date.valueOf("1997-12-31")))
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), sum(col("price_c")).as("sum_price_c"))
          .orderBy("o_orderstatus")
        // force planning, then pin the dir-level skip through the PLAIN
        // reader: same keyed-record audit as q224, and the planned set
        // must equal the explicit epoch-day pruneLive plan
        out.queryExecution.executedPlan: Unit
        val meta = GraftScanMeta.forTable(t).getOrElse(
          sys.error("DSv2 scan never planned"))
        require(meta.live.size == 4 && meta.planned.size == 1,
          s"DSv2 date skipping regressed: planned ${meta.planned.size} " +
            s"of ${meta.live.size} dirs (pushed=${meta.pushed})")
        val snap = TxnTable.snapshot(t, TxnTable.latestVersion(t).get)
        require(meta.planned == TxnTable.pruneLive(snap, "o_orderdate",
            java.time.LocalDate.parse("1997-01-01").toEpochDay,
            java.time.LocalDate.parse("1997-12-31").toEpochDay),
          "DSv2 planned a different dir set than the epoch-day pruneLive")
        out
      }),

    // ---- q237: DECIMAL data skipping through the PLAIN DSv2 reader
    // (round 14) — the last predicate family the dir tier excluded.
    // The derived build lands orders in four price bands with
    // `statsCol = price_d`, a DECIMAL(18,2) column constructed EXACTLY
    // from integer cents (price_c / 100 — no float rounding anywhere),
    // whose bounds ride the integral `.stats` tier as UNSCALED longs
    // (value × 10^2 == the cents, TxnTable.longProj). The query filters
    // a price band through the plain reader; GraftScan translates the
    // pushed BigDecimal values to the same unscaled form using the
    // column's schema scale (exact-or-nothing — a value needing
    // rounding prunes nothing, sound) and must plan 1 of 4 dirs,
    // REQUIRED each run and pinned equal to the explicit cents-range
    // pruneLive plan. The oracle applies the equivalent integer-cents
    // band to the raw parquet — band ↔ cents range is exact by
    // construction, so a hash match proves no qualifying row was
    // skipped. At 100 TB: amount/price range scans are the second most
    // common fact-table predicate after dates.
    Q("q237_dsv2_decimal_skipping",
      Some("""SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
             |       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c
             |FROM orders
             |WHERE CAST(round(o_totalprice * 100) AS BIGINT) BETWEEN 10000000 AND 19999999
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        import graft.sources.{GraftScanMeta, TxnTable}
        val dir = derivedDir(d, "orders_txn_decskip")
        Derived.ensure(dir, Derived.fingerprint(d, Seq("orders"))) {
          val t = new java.io.File(dir, "t")
          def wipe(f: java.io.File): Unit = {
            Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(wipe)
            f.delete(): Unit
          }
          wipe(t)
          val base = Tables.orders(s, d)
            .select(col("o_orderstatus"), cents(col("o_totalprice")).as("price_c"))
            .withColumn("price_d",
              (col("price_c").cast("decimal(18,2)") / lit(100))
                .cast("decimal(18,2)"))
          // four price bands (cents): <100k$, 100-200k$, 200-300k$, ≥300k$
          Seq((Long.MinValue, 9999999L), (10000000L, 19999999L),
              (20000000L, 29999999L), (30000000L, Long.MaxValue))
            .zipWithIndex.foreach { case ((lo, hi), i) =>
              TxnTable.append(
                base.filter(col("price_c") >= lo && col("price_c") <= hi),
                t.getPath, txnId = Some(s"band-$i"), statsCol = Some("price_d"))
            }
          ()
        }
        val t = s"$dir/t"
        val out = s.read.format("graft").load(t)
          .filter(col("price_d") >= lit("100000.00").cast("decimal(18,2)") &&
            col("price_d") <= lit("199999.99").cast("decimal(18,2)"))
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), sum(col("price_c")).as("sum_price_c"))
          .orderBy("o_orderstatus")
        out.queryExecution.executedPlan: Unit
        val meta = GraftScanMeta.forTable(t).getOrElse(
          sys.error("DSv2 scan never planned"))
        require(meta.live.size == 4 && meta.planned.size == 1,
          s"DSv2 decimal skipping regressed: planned ${meta.planned.size} " +
            s"of ${meta.live.size} dirs (pushed=${meta.pushed})")
        val snap = TxnTable.snapshot(t, TxnTable.latestVersion(t).get)
        require(meta.planned ==
            TxnTable.pruneLive(snap, "price_d", 10000000L, 19999999L),
          "DSv2 planned a different dir set than the unscaled-cents pruneLive")
        out
      }),

    // ---- q238: CONCURRENT blind append vs stats-disjoint DELETE, both
    // committing (round 15) — the logical conflict re-check as a
    // declared, oracle-hashed behavior, not just a spec. The derived
    // build lands orders in four yyyymmdd key bands (`okey`, stats
    // sidecars on every dir), then races a deleteRange of the 1997 band
    // against a blind append of those same rows re-keyed +30000000
    // (synthetic "2097" — provably disjoint by manifest stats): a
    // LogStore trip lands the append right before the delete's first
    // publish attempt, so the delete ALWAYS loses its base+1 slot and
    // must rebase through the winner (build-time requires pin v(append)
    // = 4, v(delete) = 5 — one attempt, no re-run). The oracle computes
    // the SERIAL result (delete's snapshot minus the band, plus the
    // appended rows) from the raw parquet, so a hash match proves the
    // rebase dropped neither the winner's rows nor the delete's effect.
    // In-query requires re-pin the committed shape every execution:
    // head = 5, append-then-delete actions, and the delete's live set
    // is exactly the append head's minus the one band dir it removed.
    // At 100 TB this IS the starvation fix: a streaming sink appending
    // every few seconds no longer wedges retention DELETEs or OPTIMIZE
    // (VERDICT r14 top-next; TxnTable.publishRebasing).
    Q("q238_txn_rebase_race",
      Some("""WITH o AS (SELECT CAST(year(o_orderdate)*10000 +
             |                      month(o_orderdate)*100 +
             |                      day(o_orderdate) AS BIGINT) AS okey,
             |                 o_orderstatus,
             |                 CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
             |          FROM orders)
             |SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
             |       CAST(SUM(price_c) AS BIGINT) AS sum_price_c
             |FROM (
             |  SELECT okey, o_orderstatus, price_c FROM o
             |  WHERE okey NOT BETWEEN 19970101 AND 19971231
             |  UNION ALL
             |  SELECT okey + 30000000, o_orderstatus, price_c FROM o
             |  WHERE okey BETWEEN 19970101 AND 19971231
             |)
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, d) => {
        import graft.sources.{LocalLogStore, LogStore, TxnTable}
        val dir = derivedDir(d, "orders_txn_rebase")
        Derived.ensure(dir, Derived.fingerprint(d, Seq("orders"))) {
          val t = new java.io.File(dir, "t")
          def wipe(f: java.io.File): Unit = {
            Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(wipe)
            f.delete(): Unit
          }
          wipe(t)
          val base = Tables.orders(s, d)
            .select((year(col("o_orderdate")) * 10000 +
                month(col("o_orderdate")) * 100 +
                dayofmonth(col("o_orderdate"))).cast("long").as("okey"),
              col("o_orderstatus"),
              cents(col("o_totalprice")).as("price_c"))
          // four yyyymmdd bands (orders span 1995-01-01..2001-08-01 at
          // every SF, so each band is non-empty and gets real stats)
          Seq((0L, 19961231L), (19970101L, 19971231L),
              (19980101L, 19991231L), (20000101L, 99999999L))
            .zipWithIndex.foreach { case ((lo, hi), i) =>
              TxnTable.append(base.filter(col("okey") >= lo && col("okey") <= hi),
                t.getPath, txnId = Some(s"kband-$i"), statsCol = Some("okey"))
            }
          // the RACE: a trip store lands the blind append (1997 rows
          // re-keyed to 2097 — stats-disjoint from the delete range) on
          // this thread immediately before the delete's first manifest
          // put, so the delete provably loses its base+1 slot
          val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
          val vAppend = new java.util.concurrent.atomic.AtomicLong(-1L)
          TxnTable.installLogStore(t.getPath, new LogStore {
            override def putIfAbsent(dest: java.io.File, bytes: Array[Byte]): Boolean = {
              if (dest.getName.startsWith("v") && dest.getName.endsWith(".json") &&
                  fired.compareAndSet(false, true))
                vAppend.set(TxnTable.append(
                  base.filter(col("okey").between(19970101L, 19971231L))
                    .withColumn("okey", col("okey") + 30000000L),
                  t.getPath, txnId = Some("kband-2097"), statsCol = Some("okey")))
              LocalLogStore.putIfAbsent(dest, bytes)
            }
            override def putReplace(dest: java.io.File, bytes: Array[Byte]): Unit =
              LocalLogStore.putReplace(dest, bytes)
            override def readBytes(f: java.io.File): Option[Array[Byte]] =
              LocalLogStore.readBytes(f)
            override def exists(f: java.io.File): Boolean = LocalLogStore.exists(f)
            override def list(d0: java.io.File): Seq[String] = LocalLogStore.list(d0)
            override def delete(f: java.io.File): Unit = LocalLogStore.delete(f)
          })
          val vDelete =
            try TxnTable.deleteRange(s, t.getPath, "okey", 19970101L, 19971231L)
            finally TxnTable.uninstallLogStore(t.getPath)
          require(vAppend.get() == 4L && vDelete == 5L,
            s"rebase race did not land as append=4/delete=5 " +
              s"(got append=${vAppend.get()}, delete=$vDelete)")
          ()
        }
        val t = s"$dir/t"
        // re-pin the committed shape on EVERY execution: the append won
        // version 4, the delete rebased onto it at 5, and the delete's
        // live set is the append head's minus exactly the 1997 band dir
        require(TxnTable.latestVersion(t).contains(5L),
          "rebase-race table must head at version 5")
        val sApp = TxnTable.snapshot(t, 4L)
        val sDel = TxnTable.snapshot(t, 5L)
        require(sApp.action == "append" && sDel.action == "delete",
          s"expected append@4/delete@5, got ${sApp.action}@4/${sDel.action}@5")
        val bandDirs = TxnTable.pruneLive(sApp, "okey", 19970101L, 19971231L)
        require(bandDirs.size == 1 &&
            sDel.live.toSet == sApp.live.toSet -- bandDirs,
          "the rebased delete must remove exactly the 1997 band dir and " +
            "keep the winner's appended dir")
        s.read.format("graft").load(t)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), sum(col("price_c")).as("sum_price_c"))
          .orderBy("o_orderstatus")
      })
  )
}
