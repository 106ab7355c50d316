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
          if (round % 2 == 0) { // single byte flip — ANY flip, including
            // byte 0 → '{' (the round-14 residual misroute, closed in
            // round 15 by the integrity floor: post-floor headerless
            // manifests are corrupt by definition)
            val b = orig.clone()
            val pos = rng.nextInt(b.length)
            b(pos) = (b(pos) ^ (1 << rng.nextInt(8))).toByte
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

  test("legacy headerless manifests parse unverified (upgrade path), the " +
      "integrity floor rejects post-floor headerless bytes, and the header " +
      "is atomic with the body (single object, no sidecar)") {
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
      // the table's `_integrity` floor says these versions WERE written
      // with headers — headerless bytes at/above it are corruption
      // (round 15: the byte-0→'{' misroute is closed), NOT legacy
      TxnTable.clearSnapshotCache()
      intercept[TxnTable.ManifestCorruption] {
        TxnTable.snapshot(dir, head): Unit
      }
      // a GENUINE pre-upgrade log has no `_integrity` marker at all —
      // remove it and the same bytes parse as legacy, unverified
      Files.delete(new File(new File(dir, "_log"), "_integrity").toPath)
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

  test("byte 0 flipped to exactly '{' raises the typed error on a " +
      "post-floor manifest (the round-14 residual misroute, closed)") {
    val dir = tmp()
    TxnTable.append(Seq((1, "a")).toDF("id", "v"), dir)
    val f = manifest(dir, 0L)
    val orig = Files.readAllBytes(f.toPath)
    val b = orig.clone()
    assert(b(0) == '@'.toByte)
    b(0) = '{'.toByte // "{graft-manifest …" — starts like legacy JSON
    Files.write(f.toPath, b)
    TxnTable.clearSnapshotCache()
    intercept[TxnTable.ManifestCorruption] {
      TxnTable.snapshot(dir, 0L): Unit
    }
    Files.write(f.toPath, orig) // restore heals
    TxnTable.clearSnapshotCache()
    assert(TxnTable.read(spark, dir).count() == 1L)
  }

  test("protocol feature gates: a manifest requiring an unknown reader " +
      "feature raises typed UnsupportedProtocol, not a silent misread") {
    val dir = tmp()
    TxnTable.append(Seq((1, "a")).toDF("id", "v"), dir)
    val f = manifest(dir, 0L)
    val orig = Files.readAllBytes(f.toPath)
    // synthesize a FUTURE-feature manifest: splice `rf` into the body
    // and re-encode the integrity header (public format)
    val nl = orig.indexOf('\n'.toByte)
    val body = new String(orig, nl + 1, orig.length - nl - 1, "UTF-8")
    val future = body.replaceFirst("\\{",
      java.util.regex.Matcher.quoteReplacement("""{"rf":"dv,timetravel2","""))
    val fb = future.getBytes("UTF-8")
    val crc = new java.util.zip.CRC32(); crc.update(fb)
    Files.write(f.toPath,
      (f"@graft-manifest crc32:${crc.getValue}%08x len:${fb.length}%d\n"
        .getBytes("UTF-8")) ++ fb)
    TxnTable.clearSnapshotCache()
    val e = intercept[TxnTable.UnsupportedProtocol] {
      TxnTable.snapshot(dir, 0L): Unit
    }
    assert(e.getMessage.contains("timetravel2") &&
      !e.getMessage.contains("[dv]"),
      s"gate must name exactly the MISSING feature: ${e.getMessage}")
    Files.write(f.toPath, orig) // restore heals
    TxnTable.clearSnapshotCache()
    assert(TxnTable.read(spark, dir).count() == 1L)
  }

  test("writers auto-derive rf from what the commit carries: plain tables " +
      "emit none (legacy-readable), dv/eq commits declare their features") {
    val dir = tmp()
    TxnTable.append((0 until 4).map(i => (i, s"r$i")).toDF("id", "v"), dir,
      statsCol = Some("id"))
    def rfOf(v: Long): Option[String] = {
      val bytes = Files.readAllBytes(manifest(dir, v).toPath)
      """"rf"\s*:\s*"([^"]*)"""".r
        .findFirstMatchIn(new String(bytes, "UTF-8")).map(_.group(1))
    }
    assert(rfOf(0L).isEmpty,
      "an append-only manifest must require no reader features")
    TxnTable.deleteRangeDV(spark, dir, "id", 0L, 0L) // v1: dv
    assert(rfOf(1L).contains("dv"), s"dv commit rf wrong: ${rfOf(1L)}")
    import spark.implicits._
    TxnTable.deleteKeysEq(spark, dir, Seq(1).toDF("id")) // v2: dv + eq
    assert(rfOf(2L).exists(r => r.contains("dv") && r.contains("eq")),
      s"eq commit rf wrong: ${rfOf(2L)}")
    // compaction materializes dv + eq away — rf drops back to none
    TxnTable.compact(spark, dir, targetFiles = 1) // v3
    assert(rfOf(3L).isEmpty,
      s"a plain compacted manifest must shed its rf: ${rfOf(3L)}")
    assert(TxnTable.read(spark, dir).count() == 2L)
  }
}
