package graft

import java.io.File
import java.nio.file.Files

import graft.sources.TxnTable

/** Round-14 in-place data publication — the object-store DATA path:
  * bulk partition loads and clustered compactions publish their Spark-
  * written leaves by NESTED manifest reference (`.bulk-x/leaf`) instead
  * of renaming them into `data/txn-*`. Data dirs were always invisible
  * until referenced, so this changes cost (no O(bytes) copy+delete on a
  * rename-less store), not atomicity. The load-bearing new invariant is
  * VACUUM's: reaping is root-granular, a root with any referenced leaf
  * survives whole, and fully-unreferenced roots reap as orphans.
  */
class InPlaceDataSpec extends SparkTestBase {

  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-inplace").toString

  private def withInPlace[T](dir: String)(body: => T): T = {
    TxnTable.installInPlaceData(dir)
    try body finally TxnTable.uninstallInPlaceData(dir)
  }

  private def topLevel(dir: String): Set[String] =
    Option(new File(dir, "data").listFiles()).getOrElse(Array.empty[File])
      .filter(_.isDirectory).map(_.getName).toSet

  test("bulk partition loads publish nested references (no renames); reads, " +
      "partition pruning and tuple swaps are exact") {
    val dir = tmp()
    withInPlace(dir) {
      TxnTable.overwritePartitions(spark, dir,
        Seq((1, "a", "x", 10L), (2, "a", "y", 20L), (3, "b", "x", 30L))
          .toDF("id", "p", "q", "v"), Seq("p", "q"), None)
      val snap = TxnTable.snapshot(dir, TxnTable.latestVersion(dir).get)
      assert(snap.live.size == 3 && snap.live.forall(_.contains("/")),
        s"expected 3 nested references: ${snap.live}")
      assert(topLevel(dir).forall(_.startsWith(".bulk-")),
        s"a leaf was renamed to a flat name: ${topLevel(dir)}")
      assert(TxnTable.read(spark, dir).count() == 3L)
      assert(TxnTable.readPartition(spark, dir, Map("p" -> "a", "q" -> "y"))
        .collect().map(_.getInt(0)).toSeq == Seq(2))
      // tuple swap: a re-delivered tuple replaces exactly its dir
      TxnTable.overwritePartitions(spark, dir,
        Seq((9, "a", "y", 90L)).toDF("id", "p", "q", "v"), Seq("p", "q"), None)
      assert(TxnTable.readPartition(spark, dir, Map("p" -> "a", "q" -> "y"))
        .collect().map(_.getInt(0)).toSeq == Seq(9))
      assert(TxnTable.read(spark, dir).count() == 3L)
    }
  }

  test("clustered compaction publishes nested bucket references; stats " +
      "sidecars land in the leaves and range pruning works") {
    val dir = tmp()
    withInPlace(dir) {
      TxnTable.append((1 to 40).map(i => (i.toLong, s"r$i")).toDF("id", "v"),
        dir, statsCol = Some("id"))
      TxnTable.compactClustered(spark, dir, "id", targetDirs = 4)
      val snap = TxnTable.snapshot(dir, TxnTable.latestVersion(dir).get)
      assert(snap.live.size == 4 && snap.live.forall(_.contains("/_bucket=")),
        s"expected 4 nested bucket references: ${snap.live}")
      // range-clustered: a narrow range plans a strict subset
      val planned = TxnTable.pruneLive(snap, "id", 1L, 5L)
      assert(planned.size < 4, s"clustered pruning regressed: $planned")
      assert(TxnTable.readRange(spark, dir, "id", 1L, 5L).count() == 5L)
      assert(TxnTable.read(spark, dir).count() == 40L)
    }
  }

  test("vacuum with nested references: referenced roots survive whole; " +
      "fully-unreferenced roots reap as orphans; retention floor holds") {
    val dir = tmp()
    withInPlace(dir) {
      TxnTable.overwritePartitions(spark, dir,
        Seq((1, "a", 10L), (2, "b", 20L)).toDF("id", "p", "v"), "p")
      val root0 = topLevel(dir)
      // replace BOTH partitions: the first bulk root becomes fully
      // unreferenced at the head (still referenced by v0 for time travel)
      TxnTable.overwritePartitions(spark, dir,
        Seq((3, "a", 30L), (4, "b", 40L)).toDF("id", "p", "v"), "p")
      val root1 = topLevel(dir) -- root0
      assert(root0.nonEmpty && root1.nonEmpty)
      // retain both versions: v0's root must survive (time travel works)
      TxnTable.vacuum(dir, retain = 2)
      assert(root0.subsetOf(topLevel(dir)), "vacuum reaped a root v0 references")
      assert(TxnTable.read(spark, dir, Some(0L)).count() == 2L)
      // retain 1: v0's root is now a pure orphan — reaped whole; the
      // live root survives and reads are intact
      TxnTable.vacuum(dir, retain = 1)
      assert((topLevel(dir) & root0).isEmpty,
        s"orphan in-place root survived vacuum: ${topLevel(dir) & root0}")
      assert(root1.subsetOf(topLevel(dir)), "vacuum reaped the LIVE root")
      assert(TxnTable.read(spark, dir).collect().map(_.getInt(0)).sorted.toSeq ==
        Seq(3, 4))
      intercept[TxnTable.RetentionError] { TxnTable.read(spark, dir, Some(0L)) }
    }
  }

  test("leaf-granular vacuum: inside a root with referenced leaves, a " +
      "replaced partition's stale leaf reaps individually; the root " +
      "follows whole once its last reference goes") {
    val dir = tmp()
    withInPlace(dir) {
      TxnTable.overwritePartitions(spark, dir,
        Seq((1, "a", 10L), (2, "b", 20L)).toDF("id", "p", "v"), "p")
      val root0 = topLevel(dir)
      assert(root0.size == 1)
      def leavesUnder(root: String): Set[String] =
        Option(new File(new File(new File(dir, "data"), root).getPath)
          .listFiles()).getOrElse(Array.empty[File])
          .filter(_.isDirectory).map(_.getName).toSet
      assert(leavesUnder(root0.head).size == 2)
      // replace only partition a — b's leaf under root0 stays referenced
      TxnTable.overwritePartitions(spark, dir,
        Seq((5, "a", 50L)).toDF("id", "p", "v"), "p")
      TxnTable.vacuum(dir, retain = 1)
      assert(root0.subsetOf(topLevel(dir)),
        "vacuum reaped a root that still holds a referenced leaf")
      assert(leavesUnder(root0.head).size == 1,
        "the replaced partition's stale leaf did not reap leaf-granularly")
      assert(TxnTable.read(spark, dir).collect().map(_.getInt(0)).sorted.toSeq ==
        Seq(2, 5))
      // replace b too: root0's last reference goes — next vacuum reaps
      // the (now leafless) root wholesale
      TxnTable.overwritePartitions(spark, dir,
        Seq((7, "b", 70L)).toDF("id", "p", "v"), "p")
      TxnTable.vacuum(dir, retain = 1)
      TxnTable.vacuum(dir, retain = 1) // second pass: empty root reaps whole
      assert((topLevel(dir) & root0).isEmpty,
        s"fully-unreferenced root survived two vacuums: ${topLevel(dir) & root0}")
      assert(TxnTable.read(spark, dir).collect().map(_.getInt(0)).sorted.toSeq ==
        Seq(5, 7))
    }
  }
}
