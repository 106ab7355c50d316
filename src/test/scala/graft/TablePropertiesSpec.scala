package graft

import java.io.File
import java.nio.file.Files

import graft.sources.{LocalLogStore, LogStore, TxnTable}

/** Round-15 manifest-carried table properties (TBLPROPERTIES): policy
  * persists IN the manifest and inherits forward like constraints, so a
  * FRESH JVM — modeled here as "no per-table installs + cold snapshot
  * cache" — honors a table's layout/maintenance mode on both read and
  * write paths. The per-JVM installs ([[TxnTable.installInPlaceData]] &
  * co.) are demoted to overrides above the manifest layer.
  */
class TablePropertiesSpec extends SparkTestBase {

  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-props").toString

  test("setProperties persists in the manifest, inherits across commits, " +
      "survives a cold parse, and unset drops the key") {
    val dir = tmp()
    TxnTable.append(Seq((1, "a")).toDF("id", "v"), dir) // v0
    val v1 = TxnTable.setProperties(dir,
      Map("owner" -> "ml-platform", "graft.minRetainVersions" -> "2"))
    assert(v1 == 1L)
    TxnTable.append(Seq((2, "b")).toDF("id", "v"), dir) // v2: inherit
    TxnTable.clearSnapshotCache() // prove the MANIFEST carries them
    val snap = TxnTable.snapshot(dir, 2L)
    assert(snap.props == Map("owner" -> "ml-platform",
      "graft.minRetainVersions" -> "2"), s"props lost: ${snap.props}")
    assert(TxnTable.tableProperty(dir, "owner").contains("ml-platform"))
    val v3 = TxnTable.unsetProperties(dir, Seq("owner"))
    assert(v3 == 3L)
    assert(TxnTable.snapshot(dir, 3L).props ==
      Map("graft.minRetainVersions" -> "2"))
    // time travel still shows the old map (properties are versioned)
    assert(TxnTable.snapshot(dir, 2L).props.contains("owner"))
  }

  test("setProperties validates: reserved keys, quote-bearing values and " +
      "non-identifier keys are rejected with no commit") {
    val dir = tmp()
    TxnTable.append(Seq((1, "a")).toDF("id", "v"), dir)
    intercept[IllegalArgumentException] {
      TxnTable.setProperties(dir, Map("schema" -> "x")) // reserved
    }
    intercept[IllegalArgumentException] {
      TxnTable.setProperties(dir, Map("ok.key" -> "bad\"value"))
    }
    intercept[IllegalArgumentException] {
      TxnTable.setProperties(dir, Map("bad key!" -> "v"))
    }
    assert(TxnTable.latestVersion(dir).contains(0L), "a rejected set committed")
  }

  test("graft.ckptDirThreshold property flips commits to incremental " +
      "manifests with ZERO per-JVM installs (fresh-JVM write path)") {
    val dir = tmp()
    (0 until 5).foreach(i =>
      TxnTable.append(Seq((i, s"r$i")).toDF("id", "v"), dir))
    assert(TxnTable.snapshot(dir, 4L).base.isEmpty,
      "default threshold (512) must keep manifests self-contained")
    TxnTable.setProperties(dir, Map("graft.ckptDirThreshold" -> "4"))
    TxnTable.append(Seq((9, "z")).toDF("id", "v"), dir) // 6 live dirs >= 4
    val snap = TxnTable.snapshot(dir, TxnTable.latestVersion(dir).get)
    assert(snap.base.isDefined,
      "manifest-carried threshold was not honored by the commit path")
    assert(snap.live.size == 6 && snap.props.nonEmpty)
    TxnTable.clearSnapshotCache() // cold reconstruction still reads it
    assert(TxnTable.read(spark, dir).count() == 6L)
  }

  test("graft.inPlaceData property switches bulk loads to nested references " +
      "with ZERO per-JVM installs (fresh-JVM write path)") {
    val dir = tmp()
    TxnTable.overwritePartitions(spark, dir,
      Seq((1, "a", 10L), (2, "b", 20L)).toDF("id", "p", "v"), "p")
    val before = TxnTable.snapshot(dir, TxnTable.latestVersion(dir).get)
    assert(before.live.forall(!_.contains("/")), "pre-property load renamed")
    TxnTable.setProperties(dir, Map("graft.inPlaceData" -> "true"))
    TxnTable.overwritePartitions(spark, dir,
      Seq((3, "c", 30L)).toDF("id", "p", "v"), "p")
    val after = TxnTable.snapshot(dir, TxnTable.latestVersion(dir).get)
    val fresh = after.live.filterNot(before.live.contains)
    assert(fresh.nonEmpty && fresh.forall(_.contains("/")),
      s"manifest-carried inPlaceData ignored by the bulk path: $fresh")
    assert(TxnTable.read(spark, dir).count() == 3L)
    assert(TxnTable.readPartition(spark, dir, Map("p" -> "c"))
      .collect().map(_.getInt(0)).toSeq == Seq(3))
  }

  test("graft.minRetainVersions floors every vacuum call (fat-finger guard)") {
    val dir = tmp()
    (0 until 5).foreach(i =>
      TxnTable.append(Seq((i, s"r$i")).toDF("id", "v"), dir)) // v0..v4
    TxnTable.setProperties(dir, Map("graft.minRetainVersions" -> "4")) // v5
    TxnTable.vacuum(dir, retain = 1) // asks for 1, policy says 4
    val vs = TxnTable.versions(dir)
    assert(vs == Seq(2L, 3L, 4L, 5L),
      s"vacuum ignored the minRetainVersions floor: $vs")
    assert(TxnTable.read(spark, dir, Some(2L)).count() == 3L)
    intercept[TxnTable.RetentionError] {
      TxnTable.read(spark, dir, Some(1L)).count()
    }: Unit
  }

  test("properties ride into a shallow clone and survive restore") {
    val src = tmp(); val dest = tmp()
    TxnTable.append(Seq((1, "a")).toDF("id", "v"), src)
    TxnTable.setProperties(src, Map("owner" -> "ml-platform"))
    new File(dest).delete() // cloneTable wants a fresh path
    TxnTable.cloneTable(spark, src, dest)
    assert(TxnTable.snapshot(dest, 0L).props == Map("owner" -> "ml-platform"),
      "clone dropped the source's properties")
    // restore keeps the CURRENT property map (data reverts, policy stays)
    TxnTable.append(Seq((2, "b")).toDF("id", "v"), src) // v2
    TxnTable.restore(spark, src, 0L)                    // v3
    val rSnap = TxnTable.snapshot(src, TxnTable.latestVersion(src).get)
    assert(rSnap.props == Map("owner" -> "ml-platform"),
      "restore dropped the property map")
    assert(TxnTable.read(spark, src).count() == 1L)
  }

  test("keyed DML rebases past a setProperties winner and carries the new " +
      "property forward") {
    val dir = tmp()
    TxnTable.append((0 until 8).map(k => (k, s"r$k")).toDF("id", "v"), dir,
      statsCol = Some("id"))
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    TxnTable.installLogStore(dir, new LogStore {
      override def putIfAbsent(dest: File, bytes: Array[Byte]): Boolean = {
        if (dest.getName.startsWith("v") && dest.getName.endsWith(".json") &&
            fired.compareAndSet(false, true))
          TxnTable.setProperties(dir, Map("owner" -> "ml-platform")): Unit
        LocalLogStore.putIfAbsent(dest, bytes)
      }
      override def putReplace(dest: File, bytes: Array[Byte]): Unit =
        LocalLogStore.putReplace(dest, bytes)
      override def readBytes(f: File): Option[Array[Byte]] = LocalLogStore.readBytes(f)
      override def exists(f: File): Boolean = LocalLogStore.exists(f)
      override def list(d: File): Seq[String] = LocalLogStore.list(d)
      override def delete(f: File): Unit = LocalLogStore.delete(f)
    })
    val v =
      try TxnTable.deleteRange(spark, dir, "id", 0L, 1L)
      finally TxnTable.uninstallLogStore(dir)
    assert(v == 2L, s"delete must rebase past the property commit, got $v")
    val snap = TxnTable.snapshot(dir, v)
    assert(snap.props == Map("owner" -> "ml-platform"),
      "the rebased delete dropped the winner's property")
    assert(TxnTable.read(spark, dir).count() == 6L)
  }

  test("GraftSql: ALTER TABLE SET/UNSET TBLPROPERTIES, SHOW TBLPROPERTIES " +
      "and the DESCRIBE DETAIL properties column") {
    import graft.plans.GraftSql
    val dir = tmp()
    TxnTable.append(Seq((1, "a")).toDF("id", "v"), dir)
    val r = GraftSql.sql(spark,
      s"ALTER TABLE graft.`$dir` SET TBLPROPERTIES(" +
        "'owner'='ml-platform', 'graft.minRetainVersions'='3')").head()
    assert(r.getLong(0) == 1L && r.getInt(1) == 2, s"SET row wrong: $r")
    val shown = GraftSql.sql(spark, s"SHOW TBLPROPERTIES graft.`$dir`")
      .collect().map(x => (x.getString(0), x.getString(1))).toSeq
    assert(shown == Seq(("graft.minRetainVersions", "3"),
      ("owner", "ml-platform")), s"SHOW wrong: $shown")
    val det = GraftSql.sql(spark, s"DESCRIBE DETAIL graft.`$dir`").head()
    assert(det.getString(det.fieldIndex("properties")) ==
      "graft.minRetainVersions=3,owner=ml-platform", s"DETAIL wrong: $det")
    val u = GraftSql.sql(spark,
      s"ALTER TABLE graft.`$dir` UNSET TBLPROPERTIES('owner')").head()
    assert(u.getLong(0) == 2L && u.getInt(1) == 1, s"UNSET row wrong: $u")
    assert(TxnTable.tableProperty(dir, "owner").isEmpty)
    // a non-graft ALTER ... SET TBLPROPERTIES passes through to Spark
    spark.sql("CREATE TABLE props_passthrough (id INT) USING parquet " +
      "TBLPROPERTIES('a'='1')")
    try {
      GraftSql.sql(spark,
        "ALTER TABLE props_passthrough SET TBLPROPERTIES('a'='2')"): Unit
      val got = spark.sql("SHOW TBLPROPERTIES props_passthrough")
        .collect().map(x => (x.getString(0), x.getString(1))).toMap
      assert(got.get("a").contains("2"), s"passthrough lost: $got")
    } finally spark.sql("DROP TABLE props_passthrough")
  }
}
