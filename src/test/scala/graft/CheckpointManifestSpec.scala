package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.sources.{TxnCheckpoint, TxnTable}

/** Round-13 manifest checkpointing: past a dir-count threshold, commits
  * publish INCREMENTAL manifests (O(new dirs) bytes) anchored on a
  * columnar parquet checkpoint of dir entries, instead of re-listing
  * every live dir per commit. These tests pin:
  *   - byte-cost: an incremental manifest is a small constant, not
  *     O(live dirs), and the threshold-crossing behavior is exact;
  *   - equivalence: a COLD reconstruction (cache cleared, walking
  *     checkpoint + deltas) equals the writer's in-hand snapshot
  *     field-for-field, through appends / deletes / dv deletes /
  *     compaction / restore / partition overwrites;
  *   - the checkpoint parquet lands on the interval cadence and a
  *     direct round trip of DirState is lossless;
  *   - vacuum keeps the reconstruction chain alive, still answers
  *     RetentionError below the floor, and sweeps superseded chain
  *     manifests + checkpoints on later runs;
  *   - small tables (< threshold) never change format.
  */
class CheckpointManifestSpec extends SparkTestBase {

  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-ckptmani").toString

  /** Per-TABLE threshold pin: mutating the global sys prop would race
    * concurrently running suites (see TxnTable.installCkptThreshold). */
  private def withThreshold[T](dir: String, n: Int)(body: => T): T = {
    TxnTable.installCkptThreshold(dir, n)
    try body finally TxnTable.uninstallCkptThreshold(dir)
  }

  private def manifestBytes(dir: String, v: Long): Long =
    new File(new File(dir, "_log"), f"v$v%020d.json").length()

  private def manifestText(dir: String, v: Long): String =
    new String(Files.readAllBytes(
      new File(new File(dir, "_log"), f"v$v%020d.json").toPath), "UTF-8")

  /** Cold-path snapshot must equal the (cached) writer-in-hand one. */
  private def assertColdEquals(dir: String, v: Long, ctx: String): Unit = {
    val hot = TxnTable.snapshot(dir, v)
    TxnTable.clearSnapshotCache()
    val cold = TxnTable.snapshot(dir, v)
    assert(cold == hot, s"$ctx: cold reconstruction of v$v diverged\n" +
      s"  hot  $hot\n  cold $cold")
  }

  test("incremental manifests: commit bytes are O(new dirs), not O(live); " +
      "cold reconstruction equals the writer's snapshot at every version") {
    val dir = tmp()
    withThreshold(dir, 4) {
      // grow past the threshold: each append adds one dir
      (0 until 16).foreach { i =>
        TxnTable.append(spark.range(i * 10L, (i + 1) * 10L).toDF("k")
          .coalesce(1), dir, statsCol = Some("k"))
        assertColdEquals(dir, i.toLong, s"append $i")
      }
      // v0..v2 self-contained (live < 4 at their publish); v3 carries 4
      // live dirs and crosses the threshold
      assert(!manifestText(dir, 0).contains("\"base\""), "v0 must be classic")
      val head = TxnTable.latestVersion(dir).get
      val selfContained = manifestText(dir, 2)
      val incr = manifestText(dir, head)
      assert(incr.contains("\"base\""), "wide-table commit not incremental")
      assert(!incr.contains("\"live\""), "incremental manifest carries live")
      // byte cost: the same 16 appends with checkpointing disabled produce
      // an O(live)-sized head manifest; the incremental head must be a
      // small fraction of it (it carries ONE dir's entries, not 16)
      val full = {
        val d2 = tmp()
        TxnTable.installCkptThreshold(d2, 1000000)
        (0 until 16).foreach(i =>
          TxnTable.append(spark.range(i * 10L, (i + 1) * 10L).toDF("k")
            .coalesce(1), d2, statsCol = Some("k")))
        manifestBytes(d2, 15L)
      }
      assert(manifestBytes(dir, head) * 3 < full,
        s"delta manifest (${manifestBytes(dir, head)} B) is not O(new dirs) " +
          s"vs the self-contained form ($full B): $incr")
      assert(selfContained.contains("\"live\""), "pre-threshold manifest changed form")
      // the columnar checkpoint landed on the interval cadence
      val ckpts = Option(new File(dir, "_log").listFiles()).get
        .map(_.getName).filter(_.startsWith("ckpt-v")).sorted.toSeq
      assert(ckpts.nonEmpty, "no columnar dir-entry checkpoint materialized")
      // content: reads agree at head and via time travel
      assert(TxnTable.read(spark, dir).count() == 160L)
      assert(TxnTable.read(spark, dir, Some(7L)).count() == 80L)
      // stats survived: manifest-folded bounds still prune (every dir has
      // a disjoint k range, so a point read plans exactly one dir)
      val snap = TxnTable.snapshot(dir, head)
      assert(snap.live.size == 16 && snap.live.forall(snap.stats.contains) &&
        snap.live.forall(snap.kmvs.contains) && snap.live.forall(snap.nrows.contains),
        "incremental carry lost folded stats")
    }
  }

  test("DML through incremental manifests: dv delete, CoW delete, compact, " +
      "restore all reconstruct exactly; a dv-heavy read stays correct") {
    val dir = tmp()
    withThreshold(dir, 3) {
      (0 until 8).foreach(i => TxnTable.append(
        spark.range(i * 10L, (i + 1) * 10L).toDF("k").coalesce(1),
        dir, statsCol = Some("k")))
      // dv (merge-on-read) delete — dv map rides the delta
      TxnTable.deleteRangeDV(spark, dir, "k", 15L, 17L)
      var v = TxnTable.latestVersion(dir).get
      assertColdEquals(dir, v, "dv delete")
      assert(TxnTable.read(spark, dir).count() == 77L)
      // CoW delete — live set shrinks/replaces (rm + add in one delta)
      TxnTable.deleteRange(spark, dir, "k", 25L, 26L)
      v = TxnTable.latestVersion(dir).get
      assertColdEquals(dir, v, "cow delete")
      assert(TxnTable.read(spark, dir).count() == 75L)
      // compaction: live set collapses to one dir (a big rm list)
      TxnTable.compact(spark, dir, targetFiles = 1)
      v = TxnTable.latestVersion(dir).get
      assertColdEquals(dir, v, "compact")
      assert(TxnTable.read(spark, dir).count() == 75L)
      assert(TxnTable.snapshot(dir, v).dvs.isEmpty, "compact left dv debt")
      // restore: the old live set returns wholesale
      TxnTable.restore(spark, dir, 8L)
      v = TxnTable.latestVersion(dir).get
      assertColdEquals(dir, v, "restore")
      assert(TxnTable.read(spark, dir).count() == 77L)
      // CDC across the incremental window
      val ch = TxnTable.changes(spark, dir, 8L, 9L).collect()
      assert(ch.count(_.getAs[String]("_change") == "delete") == 2L,
        "CDC through incremental manifests wrong")
    }
  }

  test("partitioned bulk writes go incremental too: overwritePartitions on a " +
      "wide table swaps partitions through delta manifests") {
    val dir = tmp()
    withThreshold(dir, 3) {
      val df = spark.range(300L).toDF("id")
        .withColumn("p", (col("id") % 8L).cast("string"))
      TxnTable.overwritePartitions(spark, dir, df, "p")
      val v0 = TxnTable.latestVersion(dir).get
      // re-deliver two partitions
      val redo = spark.range(1000L, 1016L).toDF("id")
        .withColumn("p", (col("id") % 2L).cast("string"))
      TxnTable.overwritePartitions(spark, dir, redo, "p")
      val v1 = TxnTable.latestVersion(dir).get
      assert(manifestText(dir, v1).contains("\"base\""),
        "partition swap on a wide table did not publish a delta")
      assertColdEquals(dir, v1, "partition swap")
      // ids 0..299 on id%8: partitions "0".."3" hold 38 rows, "4".."7"
      // hold 37; the redo replaces "0" and "1" with 8 rows each
      assert(TxnTable.read(spark, dir).count() == 300L - 38L - 38L + 16L)
      // partitions 0/1 now hold only the redo rows; others untouched
      assert(TxnTable.readPartition(spark, dir, "p", "2").count() == 38L)
      assert(TxnTable.readPartition(spark, dir, "p", "0").count() == 8L)
      assert(TxnTable.readPartition(spark, dir, "p", "1").count() == 8L)
      assertColdEquals(dir, v0, "pre-swap version")
    }
  }

  test("vacuum keeps the reconstruction chain, hides sub-floor versions as " +
      "RetentionError, and sweeps superseded chain files later") {
    val dir = tmp()
    withThreshold(dir, 2) {
      (0 until 14).foreach(i => TxnTable.append(
        spark.range(i * 5L, (i + 1) * 5L).toDF("k").coalesce(1),
        dir, statsCol = Some("k")))
      val head = TxnTable.latestVersion(dir).get
      TxnTable.vacuum(dir, retain = 2)
      // the retained window still reads, cold
      TxnTable.clearSnapshotCache()
      assert(TxnTable.read(spark, dir).count() == 70L)
      assert(TxnTable.read(spark, dir, Some(head - 1)).count() == 65L)
      // versions() shows exactly the retained window
      assert(TxnTable.versions(dir) == Seq(head - 1, head),
        s"versions leaked chain-kept manifests: ${TxnTable.versions(dir)}")
      // below the floor: the typed retention error, even though chain
      // manifest FILES may survive for reconstruction
      intercept[TxnTable.RetentionError] {
        TxnTable.read(spark, dir, Some(head - 5))
      }
      // history stays within the window
      assert(TxnTable.history(spark, dir).collect().length == 2)
      // a later commit + vacuum supersedes the old chain: old ckpts and
      // chain manifests eventually sweep
      TxnTable.append(spark.range(100L, 105L).toDF("k").coalesce(1),
        dir, statsCol = Some("k"))
      TxnTable.vacuum(dir, retain = 1)
      TxnTable.clearSnapshotCache()
      assert(TxnTable.read(spark, dir).count() == 75L)
    }
  }

  test("DirState round-trips the columnar checkpoint losslessly") {
    val dir = tmp()
    new File(dir, "_log").mkdirs()
    val st = TxnCheckpoint.DirState(
      live = Seq("d2", "d0", "d1"), // order is plan order — must survive
      stats = Map("d0" -> Seq(("k", -5L, 9L), ("z", 0L, 3L)), "d2" -> Seq(("k", 10L, 19L))),
      // d1: single-col value containing '=' (historical charset);
      // d2: a two-level vector (round-13 multi-col specs)
      parts = Map("d1" -> Seq(("p", "a=b=c")),
                  "d2" -> Seq(("p", ""), ("q", "x"))),
      nrows = Map("d0" -> 10L, "d1" -> 7L, "d2" -> 3L, "dv-x" -> 2L),
      dvs = Map("d0" -> "dv-x"),
      nulls = Map("d1" -> Seq(("k", 0L), ("z", 4L))),
      kmvs = Map("d0" -> (("k", Seq(1L, 99L, 12345678901L)))),
      sstats = Map("d0" -> Seq(("s", "YQ==", ""), ("t", "YQ==", "Yg=="))))
    TxnCheckpoint.write(dir, 7L, st)
    assert(TxnCheckpoint.exists(dir, 7L))
    val back = TxnCheckpoint.read(dir, 7L).get
    assert(back == st, s"round trip diverged:\n  in  $st\n  out $back")
    assert(TxnCheckpoint.read(dir, 8L).isEmpty)
  }

  test("small tables are untouched: below the default threshold every " +
      "manifest stays self-contained") {
    val dir = tmp()
    (0 until 5).foreach(i => TxnTable.append(
      spark.range(i * 3L, (i + 1) * 3L).toDF("k").coalesce(1), dir))
    (0L to 4L).foreach(v => assert(!manifestText(dir, v).contains("\"base\""),
      s"small-table manifest v$v went incremental"))
    assert(TxnTable.read(spark, dir).count() == 15L)
  }

  test("eq-delete DELTA encoding (round 14): outstanding equality-delete " +
      "debt no longer forces self-contained manifests — commits stay " +
      "incremental, reads and cold reconstruction identical") {
    import spark.implicits._
    val dir = tmp()
    withThreshold(dir, 1) {
      (0 until 4).foreach(i =>
        TxnTable.append(Seq((i * 10, s"v$i"), (i * 10 + 1, s"w$i"))
          .toDF("id", "v").coalesce(1), dir, statsCol = Some("id")))
      // equality delete: key set {10, 21} — debt now outstanding
      TxnTable.deleteKeysEq(spark, dir, Seq(10, 21).toDF("id"))
      val vDel = TxnTable.latestVersion(dir).get
      assert(manifestText(dir, vDel).contains("\"base\"") &&
        manifestText(dir, vDel).contains("\"eqadd\""),
        "the eq-delete commit itself fell back to self-contained")
      assertColdEquals(dir, vDel, "eq-delete commit")
      // appends WHILE debt is outstanding: incremental, and the delta
      // carries NO eq field at all — O(new dirs), the whole point
      (0 until 3).foreach(i =>
        TxnTable.append(Seq((100 + i, s"x$i")).toDF("id", "v").coalesce(1),
          dir, statsCol = Some("id")))
      val head = TxnTable.latestVersion(dir).get
      ((vDel + 1) to head).foreach { v =>
        val t = manifestText(dir, v)
        assert(t.contains("\"base\""), s"v$v fell back to self-contained")
        assert(!t.contains("\"eqadd\"") && !t.contains("\"eqrm\"") &&
          !t.contains("\"eqs\""),
          s"v$v re-serialized unchanged eq state: $t")
      }
      assertColdEquals(dir, head, "appends over outstanding eq debt")
      // the deleted keys stay deleted through reconstruction (cold read)
      TxnTable.clearSnapshotCache()
      val ids = TxnTable.read(spark, dir).collect().map(_.getInt(0)).sorted.toSeq
      assert(!ids.contains(10) && !ids.contains(21) && ids.size == 9,
        s"eq delete lost through incremental reconstruction: $ids")
      // a compaction materializes the deletes away → eqrm rides the delta
      TxnTable.compact(spark, dir, targetFiles = 1)
      val vc = TxnTable.latestVersion(dir).get
      assert(manifestText(dir, vc).contains("\"eqrm\""),
        "materializing compaction did not emit the eqrm delta")
      assertColdEquals(dir, vc, "post-compaction")
      assert(TxnTable.snapshot(dir, vc).eqs.isEmpty, "eq debt not cleared")
      // and the checkpoint anchor carries eq state: force one mid-debt
      TxnTable.deleteKeysEq(spark, dir, Seq(100).toDF("id"))
      assert(TxnTable.checkpoint(dir).isDefined)
      TxnTable.append(Seq((200, "y")).toDF("id", "v").coalesce(1), dir,
        statsCol = Some("id"))
      TxnTable.clearSnapshotCache() // reconstruct THROUGH the eq-carrying anchor
      val ids2 = TxnTable.read(spark, dir).collect().map(_.getInt(0)).sorted.toSeq
      assert(!ids2.contains(100) && ids2.contains(200),
        s"checkpoint anchor lost eq state: $ids2")
    }
  }

  test("checkpoint OFFLOAD (round 14): committers never write the columnar " +
      "checkpoint inline; the maintenance call materializes it, later " +
      "commits anchor on it, cold reconstruction stays exact") {
    val dir = tmp()
    def ckptFiles(): Seq[String] =
      Option(new File(dir, "_log").listFiles()).getOrElse(Array.empty[File])
        .map(_.getName).filter(n => n.startsWith("ckpt-v")).toSeq.sorted
    withThreshold(dir, 1) {
      TxnTable.installCkptOffload(dir)
      try {
        import spark.implicits._
        // far past the interval (10): inline mode would have written
        // checkpoints; offload mode must write none
        (0 until 16).foreach(i =>
          TxnTable.append(Seq((i, s"v$i")).toDF("id", "v").coalesce(1), dir,
            statsCol = Some("id")))
        assert(ckptFiles().isEmpty,
          s"offload mode wrote inline checkpoints: ${ckptFiles()}")
        // reads are correct without any anchor (longer chain walk)
        assertColdEquals(dir, 15L, "offload, pre-maintenance")
        // the maintenance call materializes exactly one, at the head
        val v = TxnTable.checkpoint(dir)
        assert(v.contains(15L), s"maintenance checkpoint at $v, expected head 15")
        assert(ckptFiles().size == 1)
        assert(TxnTable.checkpoint(dir).isEmpty, "re-checkpointing the head")
        // cold reconstruction THROUGH the maintenance checkpoint is exact
        assertColdEquals(dir, 15L, "offload, post-maintenance")
        // later commits anchor on it: delta chains restart from v15
        (16 until 19).foreach(i =>
          TxnTable.append(Seq((i, s"v$i")).toDF("id", "v").coalesce(1), dir,
            statsCol = Some("id")))
        assertColdEquals(dir, 18L, "offload, post-maintenance commits")
        assert(TxnTable.read(spark, dir).count() == 19L)
        // a new maintenance pass checkpoints the new head — through the
        // SQL verb this time (the OPTIMIZE-adjacent surface)
        val row = graft.plans.GraftSql.sql(spark,
          s"CHECKPOINT graft.`$dir`").collect().head
        assert(row.getBoolean(0) && row.getLong(1) == 18L,
          s"SQL CHECKPOINT wrong: $row")
        assertColdEquals(dir, 18L, "second maintenance pass")
      } finally TxnTable.uninstallCkptOffload(dir)
    }
  }
}
