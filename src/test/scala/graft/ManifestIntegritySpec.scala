package graft

import java.io.File
import java.nio.file.Files

import graft.sources.TxnTable

/** Round-14 manifest byte-integrity: every manifest carries a
  * `@graft-manifest crc32:… len:…` header inside the same atomic
  * putIfAbsent object; readers verify-then-strip. The hand-rolled regex
  * parser's missing safety net — a torn, truncated, or bit-rotted
  * manifest must surface as a TYPED [[TxnTable.ManifestCorruption]],
  * never a silent misparse or an unstructured crash; legacy headerless
  * manifests keep parsing unverified.
  */
class ManifestIntegritySpec extends SparkTestBase {

  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-crc").toString

  private def manifest(dir: String, v: Long): File =
    new File(new File(dir, "_log"), f"v$v%020d.json")

  /** Build a table whose log holds BOTH classic and incremental
    * manifests (threshold 2 flips to incremental mode early). */
  private def build(): (String, Seq[Long]) = {
    val dir = tmp()
    TxnTable.installCkptThreshold(dir, 2)
    (0 until 8).foreach(i =>
      TxnTable.append(Seq((i, s"v$i")).toDF("id", "v").coalesce(1), dir,
        statsCol = Some("id")))
    (dir, TxnTable.versions(dir))
  }

  test("corruption injection (seeded): byte flips and truncations at any " +
      "offset surface as typed ManifestCorruption; restore heals the read") {
    val (dir, vs) = build()
    try {
      val rng = new scala.util.Random(7)
      val head = vs.last
      (0 until 40).foreach { round =>
        val v = vs(rng.nextInt(vs.size))
        val f = manifest(dir, v)
        val orig = Files.readAllBytes(f.toPath)
        val mutated: Array[Byte] =
          if (round % 2 == 0) { // single byte flip
            val b = orig.clone()
            val pos = rng.nextInt(b.length)
            val flipped = (b(pos) ^ (1 << rng.nextInt(8))).toByte
            // byte 0 flipping to exactly '{' is the documented residual
            // legacy-misroute — steer the fuzz off it (2^-11 of space)
            b(pos) = if (pos == 0 && flipped == '{'.toByte)
              (flipped ^ 0x40).toByte else flipped
            b
          } else // truncation (possibly to zero bytes)
            java.util.Arrays.copyOf(orig, rng.nextInt(orig.length))
        Files.write(f.toPath, mutated)
        TxnTable.clearSnapshotCache()
        val e = intercept[TxnTable.ManifestCorruption] {
          // head first: reading the head walks the reconstruction chain,
          // so a corrupted base below an incremental head surfaces
          // through chain decode when reachable; the direct read of the
          // corrupted version itself catches the below-anchor cases
          TxnTable.snapshot(dir, head): Unit
          TxnTable.snapshot(dir, v): Unit
        }
        assert(e.getMessage.contains("manifest") ||
          e.getMessage.contains("corrupt"), s"untyped message: ${e.getMessage}")
        // restore: the read heals completely
        Files.write(f.toPath, orig)
        TxnTable.clearSnapshotCache()
        assert(TxnTable.snapshot(dir, head).version == head,
          s"round $round: restored manifest did not heal the read")
      }
      assert(TxnTable.read(spark, dir).count() == 8L)
    } finally TxnTable.uninstallCkptThreshold(dir)
  }

  test("legacy headerless manifests parse unverified (upgrade path), and " +
      "the header is atomic with the body (single object, no sidecar)") {
    val (dir, vs) = build()
    try {
      val head = vs.last
      val before = TxnTable.read(spark, dir).collect()
        .map(r => (r.getInt(0), r.getString(1))).toSeq.sorted
      // strip every header in place — simulating a pre-round-14 log
      vs.foreach { v =>
        val f = manifest(dir, v)
        val bytes = Files.readAllBytes(f.toPath)
        val nl = bytes.indexOf('\n'.toByte)
        assert(nl > 0 && new String(bytes, 0, 16, "UTF-8") == "@graft-manifest ",
          s"v$v was written without an integrity header")
        Files.write(f.toPath,
          java.util.Arrays.copyOfRange(bytes, nl + 1, bytes.length))
      }
      TxnTable.clearSnapshotCache()
      assert(TxnTable.snapshot(dir, head).version == head)
      val after = TxnTable.read(spark, dir).collect()
        .map(r => (r.getInt(0), r.getString(1))).toSeq.sorted
      assert(after == before, "legacy manifests read differently")
      // and a NEW commit on the legacy log writes a checksummed manifest
      TxnTable.append(Seq((99, "z")).toDF("id", "v"), dir)
      val nv = TxnTable.latestVersion(dir).get
      val nb = Files.readAllBytes(manifest(dir, nv).toPath)
      assert(new String(nb, 0, 16, "UTF-8") == "@graft-manifest ",
        "post-upgrade commit missing the integrity header")
    } finally TxnTable.uninstallCkptThreshold(dir)
  }
}
