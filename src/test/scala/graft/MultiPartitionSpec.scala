package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.sources.TxnTable

/** Round-13 native multi-column partition specs: ordered value vectors
  * per dir (`&c1=v1|c2=v2` manifest entries, multi-line `.part`
  * sidecars), tuple-scoped atomic overwrites, partial-spec reads and
  * subtree compaction — without the composite-hidden-transform detour.
  */
class MultiPartitionSpec extends SparkTestBase {

  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-mpart").toString

  private def seed(dir: String): Unit =
    TxnTable.overwritePartitions(spark, dir,
      Seq((1, "a", "x", 10L), (2, "a", "y", 20L),
          (3, "b", "x", 30L), (4, "b", "y", 40L), (5, "b", "y", 41L))
        .toDF("id", "p", "q", "v"),
      Seq("p", "q"), txnId = None)

  test("two-level bulk overwrite: one staged dir per tuple, ordered vectors " +
      "in the manifest, spec reads plan exactly") {
    val dir = tmp()
    seed(dir)
    val snap = TxnTable.snapshot(dir, TxnTable.latestVersion(dir).get)
    assert(snap.live.size == 4, s"expected 4 tuple dirs: ${snap.live.size}")
    assert(snap.partsN.size == 4 &&
      snap.partsN.values.forall(_.map(_._1) == Seq("p", "q")),
      s"vectors wrong: ${snap.partsN.values.toSeq}")
    // exact tuple: 1 dir; partial (level-1) spec: the subtree
    assert(TxnTable.prunePartitionSpec(snap, Map("p" -> "b", "q" -> "y")).size == 1)
    assert(TxnTable.prunePartitionSpec(snap, Map("p" -> "b")).size == 2)
    // level-2-only spec prunes across subtrees
    assert(TxnTable.prunePartitionSpec(snap, Map("q" -> "x")).size == 2)
    val got = TxnTable.readPartition(spark, dir, Map("p" -> "b", "q" -> "y"))
      .collect().map(_.getInt(0)).sorted.toSeq
    assert(got == Seq(4, 5), s"tuple read wrong: $got")
    assert(TxnTable.readPartition(spark, dir, Map("p" -> "a")).count() == 2L)
  }

  test("tuple swap: re-delivering one (p,q) tuple replaces exactly that dir; " +
      "disjoint-tuple racers rebase, overlapping ones conflict") {
    val dir = tmp()
    seed(dir)
    TxnTable.overwritePartitions(spark, dir,
      Seq((99, "b", "y", 99L)).toDF("id", "p", "q", "v"), Seq("p", "q"), None)
    assert(TxnTable.readPartition(spark, dir, Map("p" -> "b", "q" -> "y"))
      .collect().map(_.getInt(0)).toSeq == Seq(99))
    assert(TxnTable.read(spark, dir).count() == 4L) // 3 kept + 1 redelivered
    // same level-1, different level-2 is a DISJOINT tuple — must land
    TxnTable.overwritePartitions(spark, dir,
      Seq((7, "b", "x", 7L)).toDF("id", "p", "q", "v"), Seq("p", "q"), None)
    assert(TxnTable.readPartition(spark, dir, Map("p" -> "b", "q" -> "x"))
      .collect().map(_.getInt(0)).toSeq == Seq(7))
  }

  test("partial-spec subtree compaction: Map(p -> b) packs b's dirs into one " +
      "carrying the exact common level; a, and tuple reads, stay correct") {
    val dir = tmp()
    seed(dir)
    val pre = TxnTable.snapshot(dir, TxnTable.latestVersion(dir).get)
    val aDirs = pre.live.filter(d => pre.partsN(d).head == (("p", "a")))
    TxnTable.compactPartition(spark, dir, Map("p" -> "b"), targetFiles = 1)
    val post = TxnTable.snapshot(dir, TxnTable.latestVersion(dir).get)
    assert(aDirs.forall(post.live.contains), "a's dirs were rewritten")
    val bDirs = post.live.filterNot(aDirs.contains)
    assert(bDirs.size == 1, s"b subtree not packed: $bDirs")
    // the packed dir keeps the exact common level only
    assert(post.partsN.get(bDirs.head).isEmpty &&
      post.parts.get(bDirs.head).contains(("p", "b")),
      s"packed dir's vector wrong: ${post.partsN.get(bDirs.head)} / ${post.parts.get(bDirs.head)}")
    // exact-tuple read on the packed subtree: plans the packed dir
    // (widened level 2 cannot contradict) + residual q filter in-data
    val got = TxnTable.readPartition(spark, dir, Map("p" -> "b", "q" -> "y"))
      .collect().map(_.getInt(0)).sorted.toSeq
    assert(got == Seq(4, 5), s"post-compaction tuple read wrong: $got")
    assert(TxnTable.read(spark, dir).count() == 5L)
  }

  test("SHOW PARTITIONS renders tuples; guards: null tuples, '|' values, " +
      "single-col overwrite on a multi table all reject typed") {
    val dir = tmp()
    seed(dir)
    val rows = graft.plans.GraftSql.sql(spark, s"SHOW PARTITIONS graft.`$dir`")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(3))).toSeq.sorted
    assert(rows == Seq(("p/q", "a/x", 1L), ("p/q", "a/y", 1L),
      ("p/q", "b/x", 1L), ("p/q", "b/y", 2L)), s"SHOW PARTITIONS wrong: $rows")
    intercept[IllegalArgumentException] {
      TxnTable.overwritePartitions(spark, dir,
        Seq((9, "a", null.asInstanceOf[String], 9L)).toDF("id", "p", "q", "v"),
        Seq("p", "q"), None)
    }
    intercept[IllegalArgumentException] {
      TxnTable.overwritePartitions(spark, dir,
        Seq((9, "a", "x|y", 9L)).toDF("id", "p", "q", "v"), Seq("p", "q"), None)
    }
    intercept[IllegalStateException] {
      TxnTable.overwritePartitions(spark, dir,
        Seq((9, "a", "x", 9L)).toDF("id", "p", "q", "v"), "p")
    }
    // the rejected writes left no trace
    assert(TxnTable.read(spark, dir).count() == 5L)
  }

  test("multi-col vectors survive incremental manifests and cold " +
      "checkpoint reconstruction") {
    val dir = tmp()
    TxnTable.installCkptThreshold(dir, 2) // per-table: no global races
    try {
      seed(dir)
      (0 until 12).foreach(i =>
        TxnTable.overwritePartitions(spark, dir,
          Seq((100 + i, "c", s"z$i", 1L)).toDF("id", "p", "q", "v"),
          Seq("p", "q"), None))
      TxnTable.clearSnapshotCache()
      val snap = TxnTable.snapshot(dir, TxnTable.latestVersion(dir).get)
      assert(snap.partsN.size == 16, s"vectors lost cold: ${snap.partsN.size}")
      assert(TxnTable.readPartition(spark, dir, Map("p" -> "c", "q" -> "z7"))
        .collect().map(_.getInt(0)).toSeq == Seq(107))
      assert(TxnTable.prunePartitionSpec(snap, Map("p" -> "c")).size == 12)
    } finally TxnTable.uninstallCkptThreshold(dir)
  }

  test("compact-then-overwrite: a partial-spec packed dir survives DISJOINT " +
      "tuple overwrites and conflicts typed (not bricked) on overlap") {
    val dir = tmp()
    seed(dir)
    // pack the p=b subtree: the packed dir records only [(p,b)]
    TxnTable.compactPartition(spark, dir, Map("p" -> "b"), targetFiles = 1)
    // disjoint tuple (a,x): the packed dir's recorded level (p=b) is
    // disjoint from the incoming tuple — must land, packed dir kept
    TxnTable.overwritePartitions(spark, dir,
      Seq((9, "a", "x", 9L)).toDF("id", "p", "q", "v"), Seq("p", "q"), None)
    assert(TxnTable.readPartition(spark, dir, Map("p" -> "a", "q" -> "x"))
      .collect().map(_.getInt(0)).toSeq == Seq(9), "disjoint overwrite lost")
    assert(TxnTable.readPartition(spark, dir, Map("p" -> "b")).count() == 3L,
      "packed subtree was disturbed by a disjoint overwrite")
    // overlapping tuple (b,x): the packed dir mixes b's deep levels and
    // cannot be carved dir-granularly — a typed conflict with guidance,
    // not a permanent IllegalStateException on the write path
    intercept[TxnTable.CommitConflict] {
      TxnTable.overwritePartitions(spark, dir,
        Seq((8, "b", "x", 8L)).toDF("id", "p", "q", "v"), Seq("p", "q"), None)
    }
    assert(TxnTable.read(spark, dir).count() == 5L,
      "rejected overlapping overwrite left a trace")
    // and the table is NOT bricked: further disjoint tuples still land
    TxnTable.overwritePartitions(spark, dir,
      Seq((10, "a", "y", 10L)).toDF("id", "p", "q", "v"), Seq("p", "q"), None)
    assert(TxnTable.readPartition(spark, dir, Map("p" -> "a", "q" -> "y"))
      .collect().map(_.getInt(0)).toSeq == Seq(10))
  }
}
