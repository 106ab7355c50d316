package graft.sources

/** Sentinel-guarded derived datasets under /tmp/graft_derived.
  *
  * Derived copies (partitioned facts, bucketed tables, synthesized dirty
  * inputs) are written once per SOURCE BUILD, not once per path: the
  * completion sentinel's CONTENT is a fingerprint of the source parquet
  * files, so regenerating testdata under the same directory invalidates
  * every derived copy instead of silently serving stale data. A bare
  * "marker exists" check caused exactly that failure mode (confusing
  * oracle mismatches after a testdata refresh) — and checking the
  * writer's _SUCCESS is wrong too: dynamic partition overwrite commits by
  * moving partition directories and leaves no root marker at all.
  */
object Derived {

  private val lock = new Object

  /** Cheap source fingerprint: (path, length, mtime) of each table's
    * parquet file(s), MD5-hashed. Listing-only — no data read. Walks
    * directories RECURSIVELY (a partitioned source is nested one dir per
    * partition value; a top-level-only listing would miss nested-data
    * changes), and a concurrently-removed directory lists as empty rather
    * than NPE-ing (listFiles returns null on IO error).
    */
  def fingerprint(sfDir: String, tables: Seq[String]): String = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
          .sortBy(_.getName).toSeq.flatMap(walk)
      else Seq(f)
    val desc = tables.map { t =>
      walk(new java.io.File(sfDir, s"$t.parquet"))
        .map(x => s"${x.getPath}:${x.length}:${x.lastModified}").mkString(",")
    }.mkString("|")
    java.security.MessageDigest.getInstance("MD5")
      .digest(desc.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Run `build` once per (dir, fingerprint): skipped while the sentinel
    * under `dir` still holds `fp`, rebuilt (and re-stamped AFTER the build
    * completes) otherwise. Returns `dir`. `extraCheck` lets callers veto
    * the skip when completion needs more than files-on-disk (e.g. a
    * saveAsTable must also exist in the current session's catalog).
    */
  def ensure(dir: String, fp: String, extraCheck: => Boolean = true)
            (build: => Unit): String = {
    val marker = new java.io.File(dir, ".graft_fingerprint")
    lock.synchronized {
      val upToDate = marker.exists() && extraCheck &&
        (try new String(java.nio.file.Files.readAllBytes(marker.toPath), "UTF-8") == fp
         catch { case _: Throwable => false })
      if (!upToDate) {
        build
        java.nio.file.Files.write(marker.toPath, fp.getBytes("UTF-8"))
      }
    }
    dir
  }
}
