package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.plans.GraftDml
import graft.sources.TxnTable

/** SQL DML text (`DELETE FROM` / `UPDATE` / `MERGE INTO`) over graft
  * catalog tables, dispatched by the runtime-injected planner strategy
  * to the TxnTable transactional ops — and, crucially, NOT touching any
  * non-graft table (the strategy matches only graft DSv2 relations). */
class GraftDmlSpec extends SparkTestBase {

  import spark.implicits._

  GraftDml.install(spark)

  private def tmpTable(): String =
    Files.createTempDirectory("graft-dml").toString

  private def freshTable(name: String, rows: Seq[(Long, String, Long)]): String = {
    val dir = tmpTable()
    TxnTable.append(rows.toDF("k", "v", "amt"), dir, statsCol = Some("k"))
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name USING graft LOCATION '$dir'")
    dir
  }

  test("DELETE FROM <graft table> WHERE … lands as one TxnTable delete commit") {
    val dir = freshTable("dml_del_t",
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L)))
    try {
      spark.sql("DELETE FROM dml_del_t WHERE k % 2 = 0 AND amt > 25")
      assert(TxnTable.read(spark, dir).orderBy("k").collect()
        .map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
      assert(TxnTable.snapshot(dir, TxnTable.latestVersion(dir).get).action == "delete")
      // the catalog read sees the new version (fresh scan resolves latest)
      assert(spark.read.format("graft").load(dir).count() == 3L)
    } finally spark.sql("DROP TABLE dml_del_t")
  }

  test("UPDATE <graft table> SET … WHERE … dispatches to updateWhere") {
    val dir = freshTable("dml_upd_t",
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)))
    try {
      spark.sql("UPDATE dml_upd_t SET amt = amt * 10, v = 'X' WHERE k >= 2")
      val got = TxnTable.read(spark, dir).orderBy("k").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      assert(got == Seq((1L, "a", 10L), (2L, "X", 200L), (3L, "X", 300L)))
      assert(TxnTable.snapshot(dir, TxnTable.latestVersion(dir).get).action == "update")
    } finally spark.sql("DROP TABLE dml_upd_t")
  }

  test("MERGE INTO <graft table>: ordered clauses, BY SOURCE family, INSERT *") {
    val dir = freshTable("dml_mrg_t",
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L)))
    try {
      Seq((2L, "B", 200L), (3L, "C", 300L), (9L, "i", 90L)).toDF("k", "v", "amt")
        .createOrReplaceTempView("dml_mrg_src")
      spark.sql("""MERGE INTO dml_mrg_t AS t USING dml_mrg_src AS s
                  |ON t.k = s.k
                  |WHEN MATCHED AND t.k = 2 THEN DELETE
                  |WHEN MATCHED THEN UPDATE SET v = s.v, amt = s.amt + t.amt
                  |WHEN NOT MATCHED THEN INSERT *
                  |WHEN NOT MATCHED BY SOURCE AND t.k = 4 THEN UPDATE SET v = 'stale'
                  |""".stripMargin)
      val got = TxnTable.read(spark, dir).orderBy("k").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      // k=2 deleted (first true clause wins), k=3 updated with BOTH-side
      // expr, k=9 inserted, k=4 stale-marked by source-absence, k=1 kept
      assert(got == Seq((1L, "a", 10L), (3L, "C", 330L), (4L, "stale", 40L),
        (9L, "i", 90L)))
      assert(TxnTable.snapshot(dir, TxnTable.latestVersion(dir).get).action == "merge")
    } finally spark.sql("DROP TABLE dml_mrg_t")
  }

  test("non-graft tables are untouched by the strategy (parquet DML still " +
      "rejected by Spark; v2 in-memory DML untouched semantics preserved)") {
    // a parquet catalog table: DELETE must still fail with Spark's own
    // "does not support deletes" error, not be silently swallowed or
    // misrouted by the graft strategy
    val pdir = tmpTable()
    Seq((1L, "a")).toDF("k", "v").write.mode("overwrite").parquet(pdir)
    spark.sql("DROP TABLE IF EXISTS dml_parq_t")
    spark.sql(s"CREATE TABLE dml_parq_t USING parquet LOCATION '$pdir'")
    try {
      val e = intercept[Exception] {
        spark.sql("DELETE FROM dml_parq_t WHERE k = 1")
      }
      assert(!e.getMessage.contains("graft"),
        s"graft DML strategy leaked onto a parquet table: ${e.getMessage}")
      assert(spark.read.parquet(pdir).count() == 1L,
        "a non-graft table lost rows through the DML strategy")
    } finally spark.sql("DROP TABLE dml_parq_t")
  }

  test("MERGE SET on a merge key: identity `k = s.k` is accepted (and a " +
      "no-op); any other key assignment is rejected, not silently dropped") {
    val dir = freshTable("dml_key_t", Seq((1L, "a", 10L), (2L, "b", 20L)))
    try {
      Seq((2L, "B", 200L)).toDF("k", "v", "amt")
        .createOrReplaceTempView("dml_key_src")
      // identity form (what UPDATE SET * resolves to) passes through
      spark.sql("""MERGE INTO dml_key_t t USING dml_key_src s
                  |ON t.k = s.k
                  |WHEN MATCHED THEN UPDATE SET k = s.k, v = s.v, amt = s.amt
                  |""".stripMargin)
      val got = TxnTable.read(spark, dir).orderBy("k").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      assert(got == Seq((1L, "a", 10L), (2L, "B", 200L)))
      // value-rewriting key assignment: rejected with the mergeInto
      // contract error, NOT silently ignored (the pre-fix behavior)
      val e = intercept[UnsupportedOperationException] {
        spark.sql("""MERGE INTO dml_key_t t USING dml_key_src s
                    |ON t.k = s.k
                    |WHEN MATCHED THEN UPDATE SET k = t.k + 100, v = s.v
                    |""".stripMargin)
      }
      assert(e.getMessage.contains("merge key"))
      assert(TxnTable.latestVersion(dir).contains(1L),
        "a rejected key-rewriting MERGE must not commit")
    } finally spark.sql("DROP TABLE dml_key_t")
  }

  test("UPDATE with duplicate assignment targets and DML conditions " +
      "containing subqueries are rejected up front") {
    val dir = freshTable("dml_dup_t", Seq((1L, "a", 10L), (2L, "b", 20L)))
    try {
      val dup = intercept[UnsupportedOperationException] {
        spark.sql("UPDATE dml_dup_t SET amt = 1, amt = 2 WHERE k = 1")
      }
      assert(dup.getMessage.contains("duplicate assignment"))
      Seq(1L).toDF("k").createOrReplaceTempView("dml_dup_keys")
      val sub = intercept[UnsupportedOperationException] {
        spark.sql("DELETE FROM dml_dup_t WHERE k IN (SELECT k FROM dml_dup_keys)")
      }
      assert(sub.getMessage.contains("subquer"))
      assert(TxnTable.read(spark, dir).count() == 2L)
      assert(TxnTable.latestVersion(dir).contains(0L),
        "rejected statements must not commit")
    } finally spark.sql("DROP TABLE dml_dup_t")
  }

  test("MERGE with a non-equality ON or value-rewriting INSERT is rejected " +
      "with a clear error, leaving the table unchanged") {
    val dir = freshTable("dml_rej_t", Seq((1L, "a", 10L)))
    try {
      Seq((1L, "z", 99L)).toDF("k", "v", "amt")
        .createOrReplaceTempView("dml_rej_src")
      val e = intercept[Exception] {
        spark.sql("""MERGE INTO dml_rej_t t USING dml_rej_src s
                    |ON t.k < s.k
                    |WHEN MATCHED THEN DELETE""".stripMargin)
      }
      assert(e.getMessage != null)
      assert(TxnTable.read(spark, dir).count() == 1L)
      assert(TxnTable.latestVersion(dir).contains(0L),
        "a rejected MERGE must not commit")
    } finally spark.sql("DROP TABLE dml_rej_t")
  }

  test("ALTER TABLE … ADD/DROP CONSTRAINT as SQL text: validates existing " +
      "rows, gates later writes, drops cleanly; non-graft tables untouched") {
    val dir = freshTable("dml_cons_t",
      Seq((1L, "a", 10L), (2L, "b", 20L)))
    try {
      spark.sql("ALTER TABLE dml_cons_t ADD CONSTRAINT amt_pos CHECK (amt > 0)")
      val snap = TxnTable.snapshot(dir, TxnTable.latestVersion(dir).get)
      assert(snap.constraints.get("amt_pos").exists(_.contains("amt")),
        s"constraint not in manifest: ${snap.constraints}")
      // the manifest-carried check now gates every writer
      intercept[TxnTable.ConstraintViolation] {
        TxnTable.append(Seq((9L, "x", -5L)).toDF("k", "v", "amt"), dir)
      }
      // adding a constraint EXISTING rows violate is rejected
      val bad = intercept[Exception] {
        spark.sql("ALTER TABLE dml_cons_t ADD CONSTRAINT amt_big CHECK (amt > 15)")
      }
      assert(bad.getMessage != null)
      spark.sql("ALTER TABLE dml_cons_t DROP CONSTRAINT amt_pos")
      assert(TxnTable.snapshot(dir, TxnTable.latestVersion(dir).get)
        .constraints.isEmpty, "DROP CONSTRAINT did not clear the manifest")
      TxnTable.append(Seq((9L, "x", -5L)).toDF("k", "v", "amt"), dir)
      assert(TxnTable.read(spark, dir).count() == 3L)
    } finally spark.sql("DROP TABLE dml_cons_t")
  }

  test("GraftSql: DESCRIBE HISTORY / OPTIMIZE / VACUUM as SQL text over a " +
      "catalog name; passthrough for everything else") {
    import graft.plans.GraftSql
    val dir = freshTable("dml_maint_t",
      (1L to 40L).map(k => (k, s"r$k", k * 10L)))
    try {
      (2 to 4).foreach(i => TxnTable.append(
        Seq((100L + i, s"x$i", 5L)).toDF("k", "v", "amt"), dir,
        statsCol = Some("k")))
      // DESCRIBE HISTORY: one row per retained version, metadata-only
      val hist = GraftSql.sql(spark, "DESCRIBE HISTORY dml_maint_t").collect()
      assert(hist.length == 4 && hist.map(_.getLong(0)).sorted.toSeq == Seq(0L, 1L, 2L, 3L))
      // OPTIMIZE bin-packs the small-file debt down to 2 part-files
      val opt = GraftSql.sql(spark, "OPTIMIZE dml_maint_t TARGET 2 FILES").head()
      assert(opt.getLong(1) >= 4L && opt.getLong(2) == 2L,
        s"OPTIMIZE files_before/after wrong: $opt")
      assert(TxnTable.read(spark, dir).count() == 43L)
      // VACUUM DRY RUN previews (retain window excludes nothing yet at
      // 168h), then RETAIN 0 HOURS drops all but the head
      val dry = GraftSql.sql(spark, "VACUUM dml_maint_t RETAIN 0 HOURS DRY RUN")
        .collect()
      assert(dry.nonEmpty && dry.forall(!_.getBoolean(2)),
        "DRY RUN must not mark rows executed")
      assert(TxnTable.versions(dir).size == 5, "DRY RUN must not delete")
      val real = GraftSql.sql(spark, "VACUUM dml_maint_t RETAIN 0 HOURS").collect()
      assert(real.forall(_.getBoolean(2)))
      assert(TxnTable.versions(dir).size == 1, "VACUUM did not drop history")
      assert(TxnTable.read(spark, dir).count() == 43L)
      // ZORDER form clusters and records multi-column bounds
      val z = GraftSql.sql(spark, "OPTIMIZE dml_maint_t ZORDER BY (k, amt) TARGET 2 FILES")
        .head()
      assert(z.getLong(2) == 2L)
      val zsnap = TxnTable.snapshot(dir, TxnTable.latestVersion(dir).get)
      assert(zsnap.stats.values.exists(_.exists(_._1 == "amt")),
        "ZORDER did not record second-key bounds")
      // passthrough: plain SQL still works through the same entry point
      assert(GraftSql.sql(spark, "SELECT 1 + 1 AS two").head().getInt(0) == 2)
    } finally spark.sql("DROP TABLE dml_maint_t")
  }

  test("GraftSql: RESTORE TO VERSION undoes metadata-only; DESCRIBE DETAIL " +
      "profiles the table from one manifest fetch") {
    import graft.plans.GraftSql
    val dir = freshTable("dml_restore_t",
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)))
    try {
      spark.sql("DELETE FROM dml_restore_t WHERE k >= 2") // v1: damage
      assert(TxnTable.read(spark, dir).count() == 1L)
      val r = GraftSql.sql(spark, "RESTORE TABLE dml_restore_t TO VERSION AS OF 0")
        .head()
      assert(r.getLong(0) == 2L && r.getLong(1) == 0L, s"restore row wrong: $r")
      assert(TxnTable.read(spark, dir).count() == 3L,
        "RESTORE did not return the pre-delete content")
      TxnTable.addConstraint(spark, dir, "amt_pos", "amt > 0")
      val det = GraftSql.sql(spark, s"DESCRIBE DETAIL graft.`$dir`").head()
      assert(det.getString(0) == "graft" && det.getString(1) == dir)
      assert(det.getLong(2) == 3L, s"version wrong: $det")          // v3: addConstraint
      // num_files counts parquet PART-FILES (the OPTIMIZE / SHOW
      // PARTITIONS definition, round 13) — compare against the layout
      val actualFiles = TxnTable.snapshot(dir, 3L).live.map(d =>
        Option(new java.io.File(s"$dir/data/$d").listFiles())
          .getOrElse(Array.empty[java.io.File])
          .count(_.getName.endsWith(".parquet"))).sum.toLong
      assert(det.getLong(4) == actualFiles && actualFiles >= 1L,
        s"num_files wrong: $det (layout has $actualFiles)")
      assert(det.getLong(5) == 3L, s"num_rows wrong: $det")
      assert(det.getLong(6) > 0L, "size_bytes must be positive")
      assert(det.getString(8) == "amt_pos", s"constraints wrong: $det")
      assert(det.getString(10).contains("k:bigint"),
        s"schema_ddl wrong: ${det.getString(10)}")
    } finally spark.sql("DROP TABLE dml_restore_t")
  }

  test("GraftSql SHOW PARTITIONS: graft tables answer from the manifest; " +
      "non-graft tables pass through to Spark's own grammar") {
    import graft.plans.GraftSql
    val dir = tmpTable()
    TxnTable.overwritePartitions(spark, dir,
      Seq((1, "2024-01"), (2, "2024-01"), (3, "2024-02")).toDF("id", "month"),
      "month")
    val got = GraftSql.sql(spark, s"SHOW PARTITIONS graft.`$dir`").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(("month", "2024-01", 1L, 2L), ("month", "2024-02", 1L, 1L)),
      s"manifest partition listing wrong: $got")
    // OPTIMIZE … WHERE: partition-scoped bin-packing as SQL text —
    // only the named partition's dirs rewrite
    val pre = TxnTable.snapshot(dir, TxnTable.latestVersion(dir).get)
    val keep = pre.live.filter(d => pre.parts.get(d).exists(_._2 == "2024-02"))
    val o = GraftSql.sql(spark,
      s"OPTIMIZE graft.`$dir` WHERE month = '2024-01' TARGET 1 FILES").head()
    val post = TxnTable.snapshot(dir, o.getLong(0))
    assert(keep.forall(post.live.contains),
      "OPTIMIZE WHERE rewrote an out-of-scope partition")
    assert(TxnTable.read(spark, dir).count() == 3L)
    // passthrough: a hive-partitioned parquet catalog table still goes
    // through Spark's own SHOW PARTITIONS
    spark.sql("DROP TABLE IF EXISTS dml_hivepart_t")
    Seq((1, "a"), (2, "b")).toDF("id", "p").write
      .partitionBy("p").format("parquet").saveAsTable("dml_hivepart_t")
    try {
      val hive = GraftSql.sql(spark, "SHOW PARTITIONS dml_hivepart_t").collect()
        .map(_.getString(0)).sorted.toSeq
      assert(hive == Seq("p=a", "p=b"), s"passthrough SHOW PARTITIONS wrong: $hive")
    } finally spark.sql("DROP TABLE dml_hivepart_t")
  }
}
