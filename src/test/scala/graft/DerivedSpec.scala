package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Derived

/** The fingerprint sentinel behind every derived dataset (q79's
  * partitioned fact, q81's bucketed tables, q83's dirty CSV): build once
  * per SOURCE BUILD, skip while current, rebuild when the source parquet
  * changes — the staleness rule that replaced the bare "marker exists"
  * check (ADVICE r4: a regenerated testdata dir silently served stale
  * derived copies).
  */
class DerivedSpec extends AnyFunSuite {

  test("ensure builds once, skips while current, rebuilds on source change") {
    val src = java.nio.file.Files.createTempDirectory("graft_src").toFile
    val tbl = new java.io.File(src, "t.parquet")
    java.nio.file.Files.write(tbl.toPath, "v1".getBytes)
    val dir = java.nio.file.Files.createTempDirectory("graft_drv").toString
    var builds = 0

    Derived.ensure(dir, Derived.fingerprint(src.toString, Seq("t"))) { builds += 1 }
    Derived.ensure(dir, Derived.fingerprint(src.toString, Seq("t"))) { builds += 1 }
    assert(builds == 1, "second call with an unchanged source must skip")

    // Regenerate the source (content length changes -> fingerprint changes
    // regardless of mtime granularity).
    java.nio.file.Files.write(tbl.toPath, "v2-regenerated".getBytes)
    Derived.ensure(dir, Derived.fingerprint(src.toString, Seq("t"))) { builds += 1 }
    assert(builds == 2, "a regenerated source must trigger a rebuild")

    // extraCheck vetoes the skip even with a current sentinel — the
    // bucketed-table case, where a fresh session must re-register the
    // catalog entry although the files on disk are current.
    Derived.ensure(dir, Derived.fingerprint(src.toString, Seq("t")),
      extraCheck = false) { builds += 1 }
    assert(builds == 3, "extraCheck=false must force the build")
    Derived.ensure(dir, Derived.fingerprint(src.toString, Seq("t"))) { builds += 1 }
    assert(builds == 3, "after the forced rebuild the sentinel is current again")
  }
}
