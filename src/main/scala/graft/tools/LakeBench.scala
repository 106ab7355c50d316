package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.TxnTable

/** Scale measurement for the transactional-table read path: does the
  * metadata actually buy what SURVEY claims at data volume?
  *
  * Layout: N rows (long key 0..N-1, ~24-byte payload) written as 16
  * INTERLEAVED commits (key mod 16) — the worst case for min/max
  * bounds (every dir spans the whole keyspace) and the motivating case
  * for clustering and blooms. Measures, with planned-dir/file counts
  * as the scale evidence and wall seconds as the local sanity signal:
  *
  *  1. full-scan aggregate (the baseline every read must beat);
  *  2. range read (1/16 of the keyspace) on the interleaved layout —
  *     stats prune NOTHING (16/16 dirs planned), cost ≈ full scan;
  *  3. compactClustered on the key, then the same range read — planned
  *     dirs collapse to ~1/16, the read touches ~1/16 of the bytes;
  *  4. point probe via bloom sidecars on the INTERLEAVED layout
  *     (pre-clustering, where bounds are helpless): ~1 dir planned;
  *  5. write-side index cost: append WITH stats+bloom vs bare append
  *     (the price of 1-4, paid once per commit).
  *
  * Local-FS caveat (same as ScaleBench): at gigabyte scale Spark's
  * per-job overhead floors small reads, so the dir/file counts carry
  * the 100 TB argument; the seconds just need to move the right way.
  * Emits one JSON file (SPARK_GRAFT_LAKEBENCH_OUT, default
  * ./lakebench_r9.json).
  */
object LakeBench {

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_LAKE_N", "10000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = Files.createTempDirectory("graft-lakebench").toString
    def timed[A](label: String)(body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[lake] $label: $s%.1fs")
      (r, s)
    }

    val base = spark.range(n).toDF("id")
      .withColumn("v", concat(lit("payload-"), pmod(xxhash64(col("id")), lit(99999L))))

    // ---- build: 16 interleaved commits, stats+bloom on the key
    val (_, tBuild) = timed("16 interleaved appends (stats+bloom)") {
      (0L until 16L).foreach(i =>
        TxnTable.append(base.filter(pmod(col("id"), lit(16L)) === i), dir,
          statsCol = Some("id")))
    }
    // write-side index cost: one more slice, bare vs indexed
    val slice = base.filter(pmod(col("id"), lit(16L)) === 3L)
    val bare = Files.createTempDirectory("graft-lakebench-bare").toString
    val (_, tBare) = timed("append 1/16 bare")(TxnTable.append(slice, bare))
    val idx = Files.createTempDirectory("graft-lakebench-idx").toString
    val (_, tIdx) = timed("append 1/16 stats+bloom")(
      TxnTable.append(slice, idx, statsCol = Some("id")))

    val (lo, hi) = (0L, n / 16L - 1L) // one-sixteenth of the keyspace
    def agg(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), sum(col("id"))).head()
      (r.getLong(0), r.getLong(1))
    }

    // ---- 1. full scan
    val ((fullCnt, _), tFull) = timed("full scan agg")(agg(TxnTable.read(spark, dir)))
    require(fullCnt == n, s"full scan lost rows: $fullCnt of $n")

    // ---- 2. range read, interleaved layout: stats prune nothing
    val preSnap = TxnTable.snapshot(dir, TxnTable.latestVersion(dir).get)
    val prePlanned = TxnTable.pruneLive(preSnap, "id", lo, hi).size
    val ((preCnt, _), tPreRange) = timed("range read (interleaved)")(
      agg(TxnTable.readRange(spark, dir, "id", lo, hi)))
    require(preCnt == n / 16L, s"range read wrong count: $preCnt")

    // ---- 4. bloom point probe on the interleaved layout
    val probes = Seq(7L, n / 3L, n - 11L)
    val probePlanned = probes.map(k =>
      TxnTable.pruneLivePoint(dir, preSnap, "id", k).size)
    val (_, tPoint) = timed("3 bloom point probes (interleaved)") {
      probes.foreach(k =>
        require(TxnTable.readPoint(spark, dir, "id", k).count() == 1L))
    }

    // ---- 3. cluster, then the same range read
    val (_, tCluster) = timed("compactClustered(id, 16)")(
      TxnTable.compactClustered(spark, dir, "id", 16))
    val postSnap = TxnTable.snapshot(dir, TxnTable.latestVersion(dir).get)
    val postPlanned = TxnTable.pruneLive(postSnap, "id", lo, hi).size
    val ((postCnt, _), tPostRange) = timed("range read (clustered)")(
      agg(TxnTable.readRange(spark, dir, "id", lo, hi)))
    require(postCnt == n / 16L, s"clustered range read wrong count: $postCnt")

    // ---- merge + delete on the clustered layout: rewrite-set sizes
    val ups = spark.range(lo, lo + 10000L).toDF("id")
      .withColumn("v", lit("updated"))
    val (_, tMerge) = timed("merge 10k updates (clustered)")(
      TxnTable.merge(spark, dir, ups, Seq("id")))
    val mergeSnap = TxnTable.snapshot(dir, TxnTable.latestVersion(dir).get)
    val mergeKept = postSnap.live.count(mergeSnap.live.contains)
    val (_, tDelete) = timed("deleteRange 1/16 (clustered)")(
      TxnTable.deleteRange(spark, dir, "id", lo, hi))
    val delSnap = TxnTable.snapshot(dir, TxnTable.latestVersion(dir).get)
    val delKept = mergeSnap.live.count(delSnap.live.contains)

    // ---- small purge, copy-on-write vs merge-on-read: the GDPR shape.
    // 100 keys out of ~9.4M live rows — CoW rewrites the whole ~600k-row
    // dir the keys live in; the dv form writes a KB-sized position
    // sidecar and leaves the live set byte-identical. Then the rent:
    // a full-scan aggregate pays the broadcast anti-join only while the
    // dv exists; compaction materializes it away.
    val liveBefore = delSnap.live.size
    val (_, tCowPurge) = timed("CoW purge 100 keys")(
      TxnTable.deleteRange(spark, dir, "id", n / 8L, n / 8L + 99L))
    val cowSnap = TxnTable.snapshot(dir, TxnTable.latestVersion(dir).get)
    val cowRewrote = liveBefore - delSnap.live.count(cowSnap.live.contains)
    val (_, tDvPurge) = timed("DV purge 100 keys")(
      TxnTable.deleteRangeDV(spark, dir, "id", n / 4L, n / 4L + 99L))
    val dvSnap = TxnTable.snapshot(dir, TxnTable.latestVersion(dir).get)
    require(dvSnap.live == cowSnap.live, "dv purge must not rewrite data")
    val liveRows = fullCnt - n / 16L - 200L
    val ((dvCnt, _), tScanDV) = timed("full scan agg (through 1 dv)")(
      agg(TxnTable.read(spark, dir)))
    require(dvCnt == liveRows, s"dv scan wrong count: $dvCnt != $liveRows")
    val (_, tMaterialize) = timed("compact materializes the dv")(
      TxnTable.compact(spark, dir, targetFiles = 14))
    require(TxnTable.snapshot(dir, TxnTable.latestVersion(dir).get).dvs.isEmpty,
      "compaction left a dv behind")

    // ---- evolved-table DV rent (round 11): rename + widen mints field
    // ids, which until r10 forced dv'd reads down the broadcast
    // anti-join (the carried 2.3x-class rent). The dv_keep position
    // predicate now fuses into each ERA's raw scan — measure the rent
    // on a renamed+widened table: clean era scan vs scan through 1 dv.
    val evo = Files.createTempDirectory("graft-lakebench-evo").toString
    val (_, tEvoBuild) = timed("evolved table: 4 appends + rename + widen") {
      (0 until 4).foreach { i =>
        TxnTable.append(
          spark.range(i * (n / 4), (i + 1) * (n / 4)).toDF("id0")
            .select(col("id0").cast("int").as("id0"),
              pmod(col("id0") * 2654435761L, lit(1000000L)).as("v")),
          evo, statsCol = Some("id0"))
      }
      TxnTable.renameColumn(spark, evo, "id0", "id")
      TxnTable.widenColumn(spark, evo, "id", "bigint")
    }
    val ((evoClean, _), tEvoClean) = timed("evolved era scan (clean)")(
      agg(TxnTable.read(spark, evo)))
    TxnTable.deleteRangeDV(spark, evo, "id", n / 4L, n / 4L + 99L)
    val evoDvDf = TxnTable.read(spark, evo)
    require(evoDvDf.queryExecution.executedPlan.toString.contains("dv_keep"),
      "evolved dv read fell off the fused-predicate path")
    val ((evoDv, _), tEvoDv) = timed("evolved era scan (through 1 dv)")(
      agg(evoDvDf))
    require(evoDv == evoClean - 100L,
      s"evolved dv scan wrong count: $evoDv != ${evoClean - 100L}")

    // ---- backfill-shaped partition write (round 12): 128 partitions in
    // ONE shuffled job vs the r11 loop shape (one filter+write job per
    // value over a persisted batch + one read-back count per staged dir).
    // The loop is reconstructed here as the baseline — production code
    // no longer contains it.
    val parts = 128
    val bk = spark.range(n / 8L).toDF("id")
      .withColumn("p", pmod(col("id"), lit(parts.toLong)).cast("int"))
      .withColumn("v", concat(lit("pay-"), pmod(xxhash64(col("id")), lit(9999L))))
    val loopRoot = Files.createTempDirectory("graft-lakebench-loop").toString
    val (_, tLoop) = timed(s"r11 loop shape: $parts filter+write jobs") {
      val values = bk.select("p").distinct().collect().map(_.get(0).toString).toSeq
      val cached = bk.persist()
      try values.foreach { v =>
        val d = new java.io.File(loopRoot, s"part-$v")
        cached.filter(col("p").cast("string") === v).write.parquet(d.getPath)
        spark.read.parquet(d.getPath).count(): Unit // the stage() read-back
      } finally { cached.unpersist(); () }
    }
    val bulkDir = Files.createTempDirectory("graft-lakebench-bulk").toString
    val (_, tBulk) = timed(s"bulk overwritePartitions: $parts partitions, one job")(
      TxnTable.overwritePartitions(spark, bulkDir, bk, "p"))
    val bulkSnap = TxnTable.snapshot(bulkDir, TxnTable.latestVersion(bulkDir).get)
    require(bulkSnap.live.size == parts && bulkSnap.nrows.values.sum == n / 8L,
      s"bulk write lost partitions/rows: ${bulkSnap.live.size} dirs, " +
        s"${bulkSnap.nrows.values.sum} rows")

    // ---- planning-time column statistics at 256 dirs (round 12): the
    // manifest-folded KMV path vs 256 per-dir sidecar reads. Planning
    // cost only — zero data reads on either side.
    val many = Files.createTempDirectory("graft-lakebench-stats").toString
    val dirsN = 256
    val (_, tManyBuild) = timed(s"$dirsN stats+kmv appends (1k rows each)") {
      (0 until dirsN).foreach(i =>
        TxnTable.append(spark.range(i * 1000L, (i + 1) * 1000L).toDF("id"), many,
          statsCol = Some("id")))
    }
    val manySnap = TxnTable.snapshot(many, TxnTable.latestVersion(many).get)
    require(manySnap.kmvs.size == dirsN, s"manifest kmvs: ${manySnap.kmvs.size}")
    val (ndvManifest, tNdvManifest) = timed(s"NDV from manifest ($dirsN dirs)") {
      (0 until 100).map(_ =>
        TxnTable.estimateDistinctFromManifest(manySnap, "id", manySnap.live).get).last
    }
    val (ndvSidecar, tNdvSidecar) = timed(s"NDV from sidecars ($dirsN dirs)") {
      (0 until 100).map(_ =>
        TxnTable.estimateDistinct(many, "id", manySnap.live).get).last
    }
    require(ndvManifest == ndvSidecar, s"NDV paths disagree: $ndvManifest/$ndvSidecar")

    // ---- manifest checkpointing at 1k+ dirs (round 13): commit cost on
    // a WIDE table. A self-contained manifest re-serializes every live
    // dir's folded stats per commit — O(live) bytes; an incremental
    // manifest carries one dir's entries — O(delta). Build 1024 dirs in
    // one bulk job (v0 is the self-contained anchor), then time/size the
    // same small appends in both modes. The bytes ratio is the 100 TB
    // argument (a 10k-dir table pays ~10 MB/commit full-fat, ~KB delta);
    // the wall ratio is the local signal. Cold reconstruction cost
    // (checkpoint + ≤10 deltas) is reported against the full parse.
    val wideParts = 1024
    val wideDir = Files.createTempDirectory("graft-lakebench-wide").toString
    val wide = spark.range(wideParts * 200L).toDF("id")
      .withColumn("p", pmod(col("id"), lit(wideParts.toLong)).cast("int"))
    val (_, tWideBuild) = timed(s"bulk build $wideParts-dir table")(
      TxnTable.overwritePartitions(spark, wideDir, wide, "p"))
    def manifestBytes(v: Long): Long =
      new java.io.File(s"$wideDir/_log", f"v$v%020d.json").length()
    val appendRows = () => spark.range(1L).toDF("id")
      .withColumn("p", lit(-1).cast("int"))
    val nCommits = 12
    val thresholdKey = "graft.txn.ckptDirThreshold"
    sys.props(thresholdKey) = Int.MaxValue.toString // force self-contained
    val (_, tFullCommits) = timed(s"$nCommits appends, self-contained manifests") {
      (0 until nCommits).foreach(_ => TxnTable.append(appendRows(), wideDir))
    }
    val fullBytes = manifestBytes(TxnTable.latestVersion(wideDir).get)
    sys.props.remove(thresholdKey) // default: incremental past 512 dirs
    val (_, tIncrCommits) = timed(s"$nCommits appends, incremental manifests") {
      (0 until nCommits).foreach(_ => TxnTable.append(appendRows(), wideDir))
    }
    val headV = TxnTable.latestVersion(wideDir).get
    val incrBytes = manifestBytes(headV)
    // round-14 async checkpoint OFFLOAD: per-commit latency with the
    // inline columnar-checkpoint write vs offload mode (maintenance
    // call pays it instead). The figure that matters is the committer
    // TAIL — inline mode's max commit absorbs the checkpoint write
    // every interval; offload mode's stays flat at any dir count.
    def perCommitMax(n: Int): Double =
      (0 until n).map { _ =>
        val t0 = System.nanoTime()
        TxnTable.append(appendRows(), wideDir)
        (System.nanoTime() - t0) / 1e9
      }.max
    val inlineMax = perCommitMax(nCommits)
    TxnTable.installCkptOffload(wideDir)
    // the maintenance checkpoint runs INSIDE the guarded region — it is
    // part of offload mode's story — and the uninstall lives in the
    // finally, so a throwing leg cannot leak the per-table override
    // into the later bench sections (ADVICE r14)
    val (offloadMax, ckptV, tMaint) =
      try {
        val m = perCommitMax(nCommits)
        val (v, t) = timed("maintenance checkpoint (offload mode)")(
          TxnTable.checkpoint(wideDir))
        (m, v, t)
      } finally TxnTable.uninstallCkptOffload(wideDir)
    require(ckptV.isDefined, "maintenance checkpoint wrote nothing")
    val ckptFiles = Option(new java.io.File(wideDir, "_log").listFiles())
      .getOrElse(Array.empty[java.io.File])
      .count(f => f.getName.startsWith("ckpt-v") && f.getName.endsWith(".parquet"))
    require(ckptFiles > 0, "no columnar checkpoint materialized on the wide table")
    val (_, tColdSnap) = timed("cold snapshot() (ckpt + deltas)") {
      TxnTable.clearSnapshotCache()
      TxnTable.snapshot(wideDir, headV)
    }
    val wideSnap = TxnTable.snapshot(wideDir, headV)
    require(wideSnap.live.size == wideParts + 2 * nCommits,
      s"wide table lost dirs: ${wideSnap.live.size}")
    val ((wideCnt, _), _) = timed("wide-table full scan")(
      agg(TxnTable.read(spark, wideDir)))
    // 2n self-contained+incremental commits + 2n offload-leg commits
    require(wideCnt == wideParts * 200L + 4L * nCommits,
      s"wide table lost rows: $wideCnt")

    val json =
      s"""{"n":$n,"build_sec":$tBuild,""" +
        s""""append_slice_bare_sec":$tBare,"append_slice_indexed_sec":$tIdx,""" +
        s""""full_scan_sec":$tFull,""" +
        s""""range_interleaved":{"planned_dirs":$prePlanned,"of":16,"sec":$tPreRange},""" +
        s""""point_bloom":{"planned_dirs":[${probePlanned.mkString(",")}],"of":16,"sec_3_probes":$tPoint},""" +
        s""""cluster_sec":$tCluster,""" +
        s""""range_clustered":{"planned_dirs":$postPlanned,"of":16,"sec":$tPostRange},""" +
        s""""merge_clustered":{"kept_dirs":$mergeKept,"of":16,"sec":$tMerge},""" +
        s""""delete_clustered":{"kept_dirs":$delKept,"of":${mergeSnap.live.size},"sec":$tDelete},""" +
        s""""purge_100_cow":{"sec":$tCowPurge,"rewrote_dirs":$cowRewrote},""" +
        s""""purge_100_dv":{"sec":$tDvPurge,"rewrote_dirs":0,"dv_dirs":${dvSnap.dvs.size}},""" +
        s""""scan_through_dv_sec":$tScanDV,"full_scan_sec_ref":$tFull,""" +
        s""""dv_materialize_compact_sec":$tMaterialize,""" +
        s""""evolved":{"build_sec":$tEvoBuild,"scan_clean_sec":$tEvoClean,""" +
        s""""scan_through_dv_sec":$tEvoDv,"dv_rent":${
          if (tEvoClean > 0) tEvoDv / tEvoClean else -1.0}},""" +
        s""""backfill_$parts":{"loop_sec":$tLoop,"bulk_sec":$tBulk,""" +
        s""""speedup":${if (tBulk > 0) tLoop / tBulk else -1.0}},""" +
        s""""colstats_$dirsN":{"build_sec":$tManyBuild,""" +
        s""""manifest_sec_100x":$tNdvManifest,"sidecar_sec_100x":$tNdvSidecar,""" +
        s""""ndv":$ndvManifest},""" +
        s""""manifest_ckpt_$wideParts":{"build_sec":$tWideBuild,""" +
        s""""commits":$nCommits,"full_commits_sec":$tFullCommits,""" +
        s""""incr_commits_sec":$tIncrCommits,""" +
        s""""commit_speedup":${if (tIncrCommits > 0) tFullCommits / tIncrCommits else -1.0},""" +
        s""""full_manifest_bytes":$fullBytes,"incr_manifest_bytes":$incrBytes,""" +
        s""""bytes_ratio":${if (incrBytes > 0) fullBytes.toDouble / incrBytes else -1.0},""" +
        s""""ckpt_files":$ckptFiles,"cold_snapshot_sec":$tColdSnap,""" +
        s""""ckpt_offload":{"inline_commit_max_sec":$inlineMax,""" +
        s""""offload_commit_max_sec":$offloadMax,""" +
        s""""maintenance_ckpt_sec":$tMaint}}}"""
    val out = sys.env.getOrElse("SPARK_GRAFT_LAKEBENCH_OUT", "lakebench_r14.json")
    Files.write(java.nio.file.Paths.get(out), json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
