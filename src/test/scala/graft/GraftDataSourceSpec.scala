package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.{col, lit}

import graft.sources.{GraftScanMeta, TxnTable}

/** DSv2 front-end proofs: `spark.read.format("graft")` plans through the
  * manifest (stats/bloom/partition pruning from PLAIN `.filter`s), reads
  * through DVs and equality deletes, honors evolved schemas, pins a
  * version (repeatable reads), and time-travels via reader options —
  * the layer that turns the TxnTable library into an engine.
  */
class GraftDataSourceSpec extends SparkTestBase {

  import spark.implicits._

  private def tmpTable(): String =
    Files.createTempDirectory("graft-dsv2").toString

  private def graftDf(dir: String) = spark.read.format("graft").load(dir)

  test("format(\"graft\"): latest read, column order, and SQL over a temp view") {
    val dir = tmpTable()
    TxnTable.append(Seq((1, "a", 10L), (2, "b", 20L)).toDF("id", "v", "w"), dir)
    TxnTable.append(Seq((3, "c", 30L)).toDF("id", "v", "w"), dir)
    val df = graftDf(dir)
    assert(df.columns.toSeq == Seq("id", "v", "w"))
    assert(df.orderBy("id").collect().map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    df.createOrReplaceTempView("graft_t")
    val n = spark.sql("SELECT COUNT(*) AS n FROM graft_t WHERE w >= 20").head().getLong(0)
    assert(n == 2L)
  }

  test("range filter prunes dirs through manifest stats; filters pushed; residual correct") {
    val dir = tmpTable()
    // four key-disjoint commits, each with o-key stats
    Seq((0L, 99L), (100L, 199L), (200L, 299L), (300L, 399L)).foreach { case (lo, hi) =>
      TxnTable.append((lo to hi).map(k => (k, s"r$k")).toDF("k", "v"), dir,
        statsCol = Some("k"))
    }
    val df = graftDf(dir).filter(col("k") >= 120L && col("k") <= 180L)
    assert(df.count() == 61L)
    val meta = GraftScanMeta.last.get
    assert(meta.live.size == 4 && meta.planned.size == 1,
      s"manifest skipping through DSv2 regressed: ${meta.planned.size} of ${meta.live.size}")
    assert(meta.pushed.exists(_.contains("GreaterThanOrEqual(k,120)")) &&
      meta.pushed.exists(_.contains("LessThanOrEqual(k,180)")),
      s"range filter not pushed: ${meta.pushed}")
    // the DSv2 plan shows the pushed filters (RowDataSourceScanExec)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") || p.contains("GraftScan"), p.take(500))
  }

  test("point equality consults the bloom sidecars; partition equality the parts map") {
    val dir = tmpTable()
    // interleaved keys: every dir spans the full range, bounds are useless,
    // blooms are not
    (0 until 4).foreach { i =>
      TxnTable.append((0L until 400L).filter(_ % 4 == i).map(k => (k, i))
        .toDF("k", "src"), dir, statsCol = Some("k"))
    }
    assert(graftDf(dir).filter(col("k") === 17L).count() == 1L)
    val meta = GraftScanMeta.last.get
    assert(meta.live.size == 4 && meta.planned.size < 4,
      s"bloom point pruning through DSv2 did not fire: ${meta.planned.size} of 4")

    val pdir = tmpTable()
    TxnTable.overwritePartitions(spark, pdir,
      Seq((1, "A"), (2, "B"), (3, "C")).toDF("id", "part"), "part")
    assert(graftDf(pdir).filter(col("part") === "B").count() == 1L)
    val pm = GraftScanMeta.last.get
    assert(pm.live.size == 3 && pm.planned.size == 1,
      s"partition pruning through DSv2 regressed: ${pm.planned.size} of ${pm.live.size}")
  }

  test("partition pruning declines value types without a proven stable " +
      "rendering (date/timestamp) — planned conservatively, rows correct") {
    val pdir = tmpTable()
    val df = Seq(
      (1, java.sql.Date.valueOf("2024-01-15")),
      (2, java.sql.Date.valueOf("2024-02-15")),
      (3, java.sql.Date.valueOf("2024-03-15"))).toDF("id", "d")
    TxnTable.overwritePartitions(spark, pdir, df, "d")
    // the pushed EqualTo carries a Date/LocalDate whose rendering depends
    // on spark.sql.datetime.java8API.enabled — pruning on it could drop a
    // MATCHING dir; the scan must plan ALL dirs and let the residual
    // filter select rows
    val out = graftDf(pdir).filter(col("d") === lit(java.sql.Date.valueOf("2024-02-15")))
    assert(out.collect().map(_.getInt(0)).toSeq == Seq(2))
    val meta = GraftScanMeta.forTable(pdir).get
    assert(meta.live.size == 3 && meta.planned.size == 3,
      s"date-valued partition equality must not prune (rendering not " +
        s"proven stable): planned ${meta.planned.size} of ${meta.live.size}")
    // integral partition values have a canonical rendering → still prune
    val idir = tmpTable()
    TxnTable.overwritePartitions(spark, idir,
      Seq((1, 10), (2, 20), (3, 30)).toDF("id", "bucket"), "bucket")
    assert(graftDf(idir).filter(col("bucket") === 20).collect()
      .map(_.getInt(0)).toSeq == Seq(2))
    val im = GraftScanMeta.forTable(idir).get
    assert(im.planned.size == 1,
      s"integral partition equality should prune: ${im.planned} of ${im.live}")
  }

  test("reads go through deletion vectors and equality deletes") {
    val dir = tmpTable()
    TxnTable.append((1L to 10L).map(k => (k, s"r$k")).toDF("k", "v"), dir,
      statsCol = Some("k"))
    TxnTable.deleteRangeDV(spark, dir, "k", 3L, 4L)
    TxnTable.deleteKeysEq(spark, dir, Seq(9L).toDF("k"))
    assert(graftDf(dir).select("k").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 5L, 6L, 7L, 8L, 10L))
  }

  test("evolved schema: added column null-backfills over pre-evolution dirs") {
    val dir = tmpTable()
    TxnTable.append(Seq((1, "a")).toDF("id", "v"), dir)
    TxnTable.addColumn(spark, dir, "score", "bigint")
    TxnTable.append(Seq((2, "b", 5L)).toDF("id", "v", "score"), dir)
    val got = graftDf(dir).orderBy("id").collect()
      .map(r => (r.getInt(0), if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    assert(got == Seq((1, -1L), (2, 5L)))
  }

  test("version pinning: a DataFrame handle is a snapshot; options time-travel") {
    val dir = tmpTable()
    TxnTable.append(Seq((1, "a")).toDF("id", "v"), dir)
    val pinned = graftDf(dir) // pins v0
    TxnTable.append(Seq((2, "b")).toDF("id", "v"), dir)
    assert(pinned.count() == 1L, "a pinned handle saw a later commit")
    assert(graftDf(dir).count() == 2L)
    assert(spark.read.format("graft").option("versionAsOf", "0").load(dir)
      .count() == 1L)
    val ts1 = TxnTable.snapshot(dir, 1L).ts
    assert(spark.read.format("graft").option("timestampAsOf", ts1.toString)
      .load(dir).count() == 2L)
  }

  test("CREATE TABLE ... USING graft LOCATION: plain SQL over the catalog, " +
      "pruning intact") {
    val dir = tmpTable()
    TxnTable.append((0L to 99L).map(k => (k, s"r$k")).toDF("k", "v"), dir,
      statsCol = Some("k"))
    TxnTable.append((100L to 199L).map(k => (k, s"r$k")).toDF("k", "v"), dir,
      statsCol = Some("k"))
    spark.sql("DROP TABLE IF EXISTS graft_sql_t")
    spark.sql(s"CREATE TABLE graft_sql_t USING graft LOCATION '$dir'")
    try {
      // a BI-tool-shaped query: pure SQL, no Scala API anywhere —
      // the catalog hands the location through as a file: URI
      val n = spark.sql(
        "SELECT count(*) AS n FROM graft_sql_t WHERE k BETWEEN 10 AND 20")
        .head().getLong(0)
      assert(n == 11L)
      val meta = GraftScanMeta.last.get
      assert(meta.live.size == 2 && meta.planned.size == 1,
        s"manifest pruning did not fire through SQL: ${meta.planned.size} of 2")
    } finally spark.sql("DROP TABLE graft_sql_t")
  }

  test("IS NULL / IS NOT NULL prune dirs through manifest null counts") {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val dir = tmpTable()
    val schema = StructType(Seq(StructField("k", LongType), StructField("v", StringType)))
    def rows(xs: Seq[(java.lang.Long, String)]) =
      spark.createDataFrame(
        spark.sparkContext.parallelize(xs.map { case (k, v) =>
          org.apache.spark.sql.Row(k, v) }), schema)
    // dir A: no nulls; dir B: all nulls; dir C: mixed
    TxnTable.append(rows(Seq((1L, "a"), (2L, "b"))), dir, statsCol = Some("k"))
    TxnTable.append(rows(Seq((null, "c"), (null, "d"))), dir, statsCol = Some("k"))
    TxnTable.append(rows(Seq((5L, "e"), (null, "f"))), dir, statsCol = Some("k"))
    // IS NULL plans B and C only (A records zero nulls)
    assert(graftDf(dir).filter(col("k").isNull).count() == 3L)
    val m1 = GraftScanMeta.last.get
    assert(m1.live.size == 3 && m1.planned.size == 2,
      s"IS NULL pruning regressed: ${m1.planned.size} of ${m1.live.size}")
    // IS NOT NULL plans A and C only (B is all-null — never planned)
    assert(graftDf(dir).filter(col("k").isNotNull).count() == 3L)
    val m2 = GraftScanMeta.last.get
    assert(m2.planned.size == 2 && m2.planned != m1.planned,
      s"IS NOT NULL pruning regressed: ${m2.planned.size} of ${m2.live.size}")
    // the library tier agrees with the DSv2 tier
    val snap = TxnTable.snapshot(dir, TxnTable.latestVersion(dir).get)
    assert(TxnTable.pruneLiveNull(snap, "k", wantNull = true) == m1.planned)
    assert(TxnTable.pruneLiveNull(snap, "k", wantNull = false) == m2.planned)
  }

  test("count(*) (empty projection) and empty pruned plans stay correct") {
    val dir = tmpTable()
    TxnTable.append((1L to 50L).map(k => (k, k * 2)).toDF("k", "v"), dir,
      statsCol = Some("k"))
    assert(graftDf(dir).count() == 50L)
    // a range provably outside every dir: zero dirs planned, zero rows
    val none = graftDf(dir).filter(col("k") > lit(1000L))
    assert(none.count() == 0L)
    assert(GraftScanMeta.last.get.planned.isEmpty,
      "an impossible range should plan zero dirs")
  }

  test("KMV NDV sidecars feed DSv2 column statistics, scoped to the " +
      "PLANNED dirs") {
    import org.apache.spark.sql.connector.expressions.Expressions
    val dir = tmpTable()
    // two dirs with OVERLAPPING key ranges: union NDV (1500) is less
    // than the sum of per-dir NDVs (2000) — a merge that double-counts
    // is caught, and a per-dir estimate proves planned-subset scoping
    TxnTable.append((0L until 1000L).map(k => (k, s"r$k")).toDF("k", "v"), dir,
      statsCol = Some("k"))
    TxnTable.append((500L until 1500L).map(k => (k, s"r$k")).toDF("k", "v"), dir,
      statsCol = Some("k"))
    val v = TxnTable.latestVersion(dir).get
    val schema = spark.read.format("graft").load(dir).schema
    def ndvOf(filters: Array[org.apache.spark.sql.sources.Filter]): Long = {
      val scan = new graft.sources.GraftScan(dir, v, schema, schema, filters)
      val cs = scan.estimateStatistics().columnStats()
      val st = cs.get(Expressions.column("k"))
      assert(st != null, "no column statistics for the sketched column")
      st.distinctCount().getAsLong
    }
    val full = ndvOf(Array.empty)
    assert(math.abs(full - 1500L) <= 1500L / 4,
      s"union NDV estimate off: $full vs ~1500 (13% expected error)")
    // a range filter prunes to ONE dir — the estimate must cover only it
    val pruned = ndvOf(Array(
      org.apache.spark.sql.sources.GreaterThanOrEqual("k", 1100L)))
    assert(math.abs(pruned - 1000L) <= 1000L / 4,
      s"planned-subset NDV estimate off: $pruned vs ~1000")
    assert(pruned < full, "pruning did not shrink the NDV estimate")
    // exact below the sketch size: a 40-distinct dir reports exactly 40
    val tiny = tmpTable()
    TxnTable.append((0L until 40L).map(k => (k, "x")).toDF("k", "v"), tiny,
      statsCol = Some("k"))
    assert(TxnTable.estimateDistinct(tiny,
      "k", TxnTable.snapshot(tiny, 0L).live).contains(40L))
  }

  test("CBO: the NDV column statistic flips a filtered graft join side to " +
      "broadcast — row counts alone do not") {
    // two identical 200k-row tables; only one carries the KMV sidecars.
    // An equality filter selects ~1 row: with the NDV stat, CBO's filter
    // estimation shrinks the side to rows/ndv and the join broadcasts;
    // without it the side keeps its full planned size and stays
    // sort-merge. This is exactly what cardinality (vs size) buys.
    // the filter column (k, sketched) is NOT the join key (j) — an
    // equality on the join key would constant-propagate to the other
    // side and shrink it too, making the flip unattributable
    val sk = tmpTable()
    TxnTable.append((0L until 200000L).map(k => (k, k % 1000L)).toDF("k", "j"),
      sk, statsCol = Some("k"))
    val nosk = tmpTable()
    TxnTable.append((0L until 200000L).map(k => (k, k % 1000L)).toDF("k", "j"),
      nosk)
    val big = spark.range(0L, 3000000L).toDF("j")
    def initialJoinPlan(dir: String): String = {
      val filtered = graftDf(dir).filter(col("k") === 12345L)
      big.join(filtered, "j").queryExecution.executedPlan.toString
    }
    graft.plans.GraftDml.install(spark) // injects the stats-restore rule
    val saved = Seq("spark.sql.cbo.enabled", "spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold").map(k =>
      k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false") // static decision under test
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (200 * 1024).toString)
    try {
      val withNdv = initialJoinPlan(sk)
      assert(withNdv.contains("BroadcastHashJoin"),
        s"NDV-backed filter estimate did not flip the join to broadcast:\n${withNdv.take(600)}")
      val withoutNdv = initialJoinPlan(nosk)
      assert(!withoutNdv.contains("BroadcastHashJoin"),
        "without the NDV stat the full-size side must NOT broadcast — " +
          "the flip would not be attributable to the sketch")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  // ---- DSv2 WRITE path (round 11) ----

  test("df.write.format(\"graft\"): first append creates the table, later " +
      "appends and overwrite land as atomic versioned commits") {
    val dir = tmpTable()
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .write.format("graft").option("statsCol", "k").mode("append").save(dir)
    assert(TxnTable.latestVersion(dir).contains(0L), "first write = commit v0")
    Seq((3L, "c")).toDF("k", "v")
      .write.format("graft").option("statsCol", "k").mode("append").save(dir)
    assert(graftDf(dir).orderBy("k").collect().map(_.getLong(0)).toSeq ==
      Seq(1L, 2L, 3L))
    // schema-on-write holds through the DSv2 writer — Spark's by-name
    // output resolution rejects the drifted frame at ANALYSIS time
    // (before TxnTable's own SchemaMismatch gate would)
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq((4L, 1.5)).toDF("k", "x").write.format("graft").mode("append").save(dir)
    }
    // overwrite replaces content; earlier versions still readable
    Seq((9L, "z")).toDF("k", "v").write.format("graft").mode("overwrite").save(dir)
    assert(graftDf(dir).collect().map(_.getLong(0)).toSeq == Seq(9L))
    assert(spark.read.format("graft").option("versionAsOf", "1").load(dir)
      .count() == 3L)
    // statsCol sidecars from the DSv2 writer drive pruning like the API's
    val snap = TxnTable.snapshot(dir, 1L)
    assert(TxnTable.pruneLive(snap, "k", 3L, 3L).size == 1,
      "statsCol written through DSv2 did not produce pruning bounds")
  }

  test("DSv2 dynamic-partition overwrite: only the incoming partitions swap") {
    val dir = tmpTable()
    Seq((1, "2024-01"), (2, "2024-02"), (3, "2024-03")).toDF("id", "month")
      .write.format("graft").option("overwritePartitions", "month")
      .mode("overwrite").save(dir)
    // reload ONE month through the same writer; others must survive
    Seq((20, "2024-02")).toDF("id", "month")
      .write.format("graft").option("overwritePartitions", "month")
      .mode("overwrite").save(dir)
    assert(graftDf(dir).orderBy("id").collect().map(_.getInt(0)).toSeq ==
      Seq(1, 3, 20))
    // and the partition read plans one dir from the manifest
    assert(graftDf(dir).filter(col("month") === "2024-02").count() == 1L)
    assert(GraftScanMeta.forTable(dir).get.planned.size == 1)
  }

  test("SQL INSERT INTO / INSERT OVERWRITE over a USING graft catalog table") {
    val dir = tmpTable()
    TxnTable.append(Seq((1L, "a")).toDF("k", "v"), dir)
    spark.sql("DROP TABLE IF EXISTS graft_w_t")
    spark.sql(s"CREATE TABLE graft_w_t USING graft LOCATION '$dir'")
    try {
      spark.sql("INSERT INTO graft_w_t VALUES (2, 'b'), (3, 'c')")
      assert(spark.sql("SELECT k FROM graft_w_t ORDER BY k").collect()
        .map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
      assert(TxnTable.latestVersion(dir).contains(1L),
        "INSERT INTO must land as ONE TxnTable commit")
      spark.sql("INSERT OVERWRITE graft_w_t VALUES (7, 'q')")
      assert(spark.sql("SELECT k, v FROM graft_w_t").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((7L, "q")))
      // time travel still sees the pre-overwrite content
      assert(spark.read.format("graft").option("versionAsOf", "1").load(dir)
        .count() == 3L)
    } finally spark.sql("DROP TABLE graft_w_t")
  }

  test("CHECK constraints and concurrent-append conflict rebase hold " +
      "through the DSv2 writer") {
    val dir = tmpTable()
    TxnTable.append(Seq((1L, 10L)).toDF("k", "amt"), dir)
    TxnTable.addConstraint(spark, dir, "amt_pos", "amt > 0")
    intercept[TxnTable.ConstraintViolation] {
      Seq((2L, -5L)).toDF("k", "amt").write.format("graft").mode("append").save(dir)
    }
    assert(graftDf(dir).count() == 1L, "a rejected DSv2 write left rows behind")
    // two racing DSv2 appends: both must commit (one rebases), no loss
    val t1 = new Thread(() =>
      Seq((10L, 1L)).toDF("k", "amt").write.format("graft").mode("append").save(dir))
    val t2 = new Thread(() =>
      Seq((20L, 2L)).toDF("k", "amt").write.format("graft").mode("append").save(dir))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert(graftDf(dir).orderBy("k").collect().map(_.getLong(0)).toSeq ==
      Seq(1L, 10L, 20L), "a concurrent DSv2 append was lost")
    assert(TxnTable.latestVersion(dir).contains(3L))
  }

  test("SQL time travel: VERSION AS OF / TIMESTAMP AS OF through the graft " +
      "path catalog; DML dispatches on catalog relations too") {
    graft.plans.GraftDml.install(spark)
    val dir = tmpTable()
    TxnTable.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir)
    Thread.sleep(30) // distinct manifest timestamps (ms resolution)
    TxnTable.append(Seq((3L, "c")).toDF("k", "v"), dir)
    val t = s"graft.`$dir`"
    assert(spark.sql(s"SELECT * FROM $t").count() == 3L)
    assert(spark.sql(s"SELECT * FROM $t VERSION AS OF 0").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L),
      "VERSION AS OF 0 did not pin the first commit")
    // TIMESTAMP AS OF the v0 commit time (manifest ts is millis; the
    // session is UTC) resolves to v0
    val ts0 = new java.sql.Timestamp(TxnTable.snapshot(dir, 0L).ts)
    val got = spark.sql(s"SELECT * FROM $t TIMESTAMP AS OF '$ts0'").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 2L), s"TIMESTAMP AS OF '$ts0' returned $got")
    // a pre-table timestamp is a typed retention error, not a crash
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM $t TIMESTAMP AS OF '1999-01-01 00:00:00'").collect()
    }
    assert(e.getMessage != null)
    // the catalog relation is a GraftTable: DML strategy matches it
    spark.sql(s"DELETE FROM $t WHERE k = 2")
    assert(spark.sql(s"SELECT * FROM $t").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    // and INSERT INTO commits through the DSv2 write path
    spark.sql(s"INSERT INTO $t VALUES (9, 'z')")
    assert(spark.sql(s"SELECT * FROM $t").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L, 9L))
    // time travel still sees every pre-DML version
    assert(spark.sql(s"SELECT * FROM $t VERSION AS OF 1").count() == 3L)
  }

  test("path-catalog DDL: CREATE TABLE is a schema-only v0 commit, CTAS " +
      "appends on top, DROP TABLE deletes only provable graft dirs") {
    graft.plans.GraftDml.install(spark)
    val p = s"${tmpTable()}/t1"
    spark.sql(s"CREATE TABLE graft.`$p` (k BIGINT, v STRING)")
    assert(TxnTable.snapshot(p, 0L).action == "create")
    val empty = spark.sql(s"SELECT * FROM graft.`$p`")
    assert(empty.columns.toSeq == Seq("k", "v") && empty.count() == 0L,
      "created table must read empty with the declared schema")
    spark.sql(s"INSERT INTO graft.`$p` VALUES (1, 'a'), (2, 'b')")
    assert(spark.sql(s"SELECT * FROM graft.`$p`").count() == 2L)
    // CTAS: createTable + append through the same write path
    val p2 = s"${tmpTable()}/t2"
    spark.sql(s"CREATE TABLE graft.`$p2` AS SELECT k, v FROM graft.`$p` WHERE k = 1")
    assert(spark.sql(s"SELECT * FROM graft.`$p2`").collect()
      .map(_.getLong(0)).toSeq == Seq(1L))
    // DROP deletes the directory — but only one carrying a graft _log
    spark.sql(s"DROP TABLE graft.`$p2`")
    assert(!new java.io.File(p2).exists(), "DROP TABLE left the table dir")
    // CREATE over an existing table is rejected, table intact
    intercept[Exception] { spark.sql(s"CREATE TABLE graft.`$p` (x INT)") }
    assert(spark.sql(s"SELECT * FROM graft.`$p`").count() == 2L)
    // native metadata grammar works over the path catalog too
    val desc = spark.sql(s"DESCRIBE TABLE graft.`$p`").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(desc.contains(("k", "bigint")) && desc.contains(("v", "string")),
      s"native DESCRIBE over the path catalog wrong: $desc")
    assert(spark.sql("SHOW TABLES IN graft").collect().isEmpty,
      "path tables must not enumerate from a metastore")
  }

  test("ATOMIC CTAS (StagingTableCatalog): a failing CTAS leaves NO table; " +
      "success is one rename — no createTable+append window; RTAS swaps") {
    graft.plans.GraftDml.install(spark)
    val root = tmpTable()
    val src = s"$root/src"
    spark.sql(s"CREATE TABLE graft.`$src` (k BIGINT, v STRING)")
    spark.sql(s"INSERT INTO graft.`$src` VALUES (1, 'a'), (2, 'b')")
    // FAILING CTAS: the query body throws mid-write → the destination
    // path must not exist at all (the staged dir aborted), and no
    // staging residue is left behind
    val dst = s"$root/ctas_fail"
    intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.`$dst` AS " +
        s"SELECT k, assert_true(k < 2, 'boom') AS x FROM graft.`$src`")
    }
    assert(!new java.io.File(dst).exists(),
      "failed CTAS left a (half-written) table at the destination")
    val residue = Option(new java.io.File(root).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .map(_.getName).filter(_.contains("ctas-staging"))
    assert(residue.isEmpty, s"failed CTAS left staging residue: ${residue.toSeq}")
    // SUCCESSFUL CTAS: lands atomically; content + schema right
    val ok = s"$root/ctas_ok"
    spark.sql(s"CREATE TABLE graft.`$ok` AS SELECT k, v FROM graft.`$src` WHERE k = 1")
    assert(spark.sql(s"SELECT * FROM graft.`$ok`").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "a")))
    // CTAS over an existing table rejects and the old table is intact
    intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.`$ok` AS SELECT k, v FROM graft.`$src`")
    }
    assert(spark.sql(s"SELECT * FROM graft.`$ok`").count() == 1L)
    // RTAS: REPLACE swaps content wholesale; a failing RTAS keeps the old
    spark.sql(s"REPLACE TABLE graft.`$ok` AS SELECT k, v FROM graft.`$src`")
    assert(spark.sql(s"SELECT * FROM graft.`$ok`").count() == 2L)
    intercept[Exception] {
      spark.sql(s"REPLACE TABLE graft.`$ok` AS " +
        s"SELECT k, assert_true(false, 'boom2') AS x FROM graft.`$src`")
    }
    assert(spark.sql(s"SELECT * FROM graft.`$ok`").count() == 2L,
      "failed RTAS damaged the existing table")
  }

  test("RTAS crash-window recovery: a stranded .rtas-old sibling blocks " +
      "shadowing creates and recoverOrphans restores the displaced table") {
    graft.plans.GraftDml.install(spark)
    import spark.implicits._
    val root = tmpTable()
    val t = s"$root/t"
    spark.sql(s"CREATE TABLE graft.`$t` (k BIGINT, v STRING)")
    spark.sql(s"INSERT INTO graft.`$t` VALUES (1, 'a'), (2, 'b')")
    // simulate a crash BETWEEN the RTAS swap's two renames: the real
    // table displaced to .rtas-old-*, destination missing, the staged
    // RTAS result stranded under .ctas-staging-*
    val displaced = new java.io.File(s"$t.rtas-old-deadbeef")
    graft.sources.TxnTable.invalidateSnapshotCache(t)
    java.nio.file.Files.move(new java.io.File(t).toPath, displaced.toPath)
    val staging = s"$t.ctas-staging-cafe"
    graft.sources.TxnTable.append(Seq((9L, "z")).toDF("k", "v"), staging)
    // creating over the path would shadow the stranded data → typed refuse
    val e = intercept[Exception] { spark.sql(s"CREATE TABLE graft.`$t` (x INT)") }
    def chain(x: Throwable): Seq[String] =
      if (x == null) Nil else Option(x.getMessage).toSeq ++ chain(x.getCause)
    assert(chain(e).exists(_.contains("recoverOrphans")),
      s"create over a recoverable orphan must direct to recovery: ${chain(e)}")
    intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.`$t` AS SELECT 1L AS k, 'x' AS v")
    }
    // maintenance recovery: displaced table restored, staging reaped
    val report = graft.sources.GraftCatalog.recoverOrphans(t)
    assert(report.contains("restored") && report.contains("reaped"),
      s"recovery report wrong: $report")
    assert(spark.sql(s"SELECT * FROM graft.`$t`").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted ==
      Seq((1L, "a"), (2L, "b")), "recovered table content wrong")
    assert(!displaced.exists() && !new java.io.File(staging).exists(),
      "recovery left orphan siblings behind")
    // with the destination live, leftover siblings are plain garbage
    graft.sources.TxnTable.append(Seq((7L, "g")).toDF("k", "v"),
      s"$t.ctas-staging-feed")
    assert(graft.sources.GraftCatalog.recoverOrphans(t).contains("reaped"))
    assert(graft.sources.GraftCatalog.recoverOrphans(t) == "no orphans")
  }

  test("decimal columns type-gate the prune translation: an integral-typed " +
      "pushed literal scales exactly instead of reading as an unscaled long") {
    // ADVICE r14: eqOf/lowerOf tried longOf first, so a raw Long 5
    // against DECIMAL(18,2) would prune as unscaled 5 (= 0.05) instead
    // of 500 (= 5.00) — off by 10^scale, unsound. The gate routes every
    // decimal-column literal through the scaled path, which now also
    // scales integral literals exactly.
    import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, In}
    import org.apache.spark.sql.types.{DecimalType, StructField, StructType}
    val schema = StructType(Seq(StructField("d", DecimalType(18, 2))))
    // two dirs: cents [1, 10] (holds 0.05-ish values) and [400, 600]
    // (holds 5.00): the literal 5 must plan ONLY the second
    val snap = TxnTable.Snapshot(0L, "append", Seq("lo", "hi"), None,
      stats = Map("lo" -> Seq(("d", 1L, 10L)), "hi" -> Seq(("d", 400L, 600L))))
    def plan(fs: Filter*): Seq[String] =
      graft.sources.GraftScan.prune("/nope", snap, fs.toArray, schema)
    assert(plan(EqualTo("d", java.lang.Long.valueOf(5L))) == Seq("hi"),
      "integral literal against DECIMAL must scale to 500, not read as 5")
    assert(plan(EqualTo("d", java.lang.Integer.valueOf(5))) == Seq("hi"))
    assert(plan(GreaterThan("d", java.lang.Long.valueOf(1L))) == Seq("hi"),
      "d > 1 (= cents > 100) excludes the [1,10] dir")
    // mixed-type In list: both values translate on the scaled path
    assert(plan(In("d", Array[Any](java.lang.Long.valueOf(5L),
      new java.math.BigDecimal("5.50")))) == Seq("hi"))
    // the BigDecimal path is unchanged
    assert(plan(EqualTo("d", new java.math.BigDecimal("0.05"))) == Seq("lo"))
  }
}
