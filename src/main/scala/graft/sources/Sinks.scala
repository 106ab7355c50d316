package graft.sources

import java.util.Properties
import org.apache.spark.sql.DataFrame

/** Sink surface (ref: etl/loader.py:34-83 loads the star schema into MySQL
  * via df.write.jdbc in append mode).
  *
  * The engine's native analytical sink is partitioned parquet — columnar,
  * splittable, predicate-pushdown-friendly — with JDBC kept for
  * operational-database parity. At 100 TB the parquet path is the real one:
  * partition columns give partition pruning to every downstream reader, and
  * each task writes its own file (no driver bottleneck). The JDBC path
  * opens one connection per partition (ref behavior), so `repartition` to a
  * sane connection count before calling it on a big frame.
  */
object Sinks {

  /** Partitioned parquet write. `partitionCols` become directory-level
    * partitions (pruning for downstream scans); empty means a plain write.
    */
  def parquet(df: DataFrame, path: String, partitionCols: Seq[String] = Nil,
              mode: String = "append"): Unit = {
    val w = df.write.mode(mode)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(path)
  }

  /** Partitioned ORC write — the second columnar format Spark ships
    * natively (no extra jars). Same pruning/pushdown properties as
    * [[parquet]]; useful when the downstream consumer is Hive/ORC-native.
    */
  def orc(df: DataFrame, path: String, partitionCols: Seq[String] = Nil,
          mode: String = "append"): Unit = {
    val w = df.write.mode(mode)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).orc(path)
  }

  /** Bucketed + sorted parquet table (session catalog). Both sides of a
    * recurring equi-join written with the same bucket count and keys join
    * WITHOUT a shuffle exchange — the hash partitioning is baked into the
    * files. At 100 TB this turns every fact×fact co-key join from the
    * dominant exchange into a local merge; SinksSpec asserts the plan is
    * exchange-free.
    */
  def parquetBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                      buckets: Int, mode: String = "overwrite"): Unit =
    df.write.mode(mode).format("parquet")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)

  /** Z-ordered parquet write: range-partition + sort by the Morton
    * interleave of two columns, so each output file covers a compact
    * rectangle in BOTH dimensions. Parquet's per-file/row-group min-max
    * stats then prune scans filtered on EITHER column — single-column
    * sorting buys pruning on one dimension only; Z-order buys it on both
    * at a modest cost to each (the data-layout idea behind Delta/Iceberg
    * OPTIMIZE ZORDER, here as plain Spark over plain parquet). Columns
    * must be non-negative integers (quantize/rank first otherwise);
    * SinksSpec measures per-file value spans of both dims vs a plain
    * write.
    */
  def zorderedParquet(df: DataFrame, c1: String, c2: String, path: String,
                      files: Int, mode: String = "overwrite"): Unit = {
    import org.apache.spark.sql.functions.col
    val z = graft.functions.NativeText.morton2(col(c1).cast("long"), col(c2).cast("long"))
    df.repartitionByRange(files, z)
      .sortWithinPartitions(z)
      .write.mode(mode).parquet(path)
  }

  /** Dynamic partition overwrite: replace ONLY the partitions present in
    * `df`, leaving all others untouched — the standard incremental-load
    * ("partition-level upsert") pattern for plain parquet, where a full
    * `overwrite` would wipe the table and an `append` would duplicate the
    * reloaded slice. This is what a daily re-run of one day's data needs;
    * row-level MERGE needs a table format (Delta/Iceberg — absent here,
    * see SURVEY), partition-level replace does not. The conf is set per
    * write and restored (it is session-wide in Spark).
    */
  def overwritePartitions(df: DataFrame, path: String,
                          partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty, "dynamic overwrite needs partition columns")
    val spark = df.sparkSession
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "dynamic")
      df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  /** Per-leaf compaction statistics from [[compactParquet]]. */
  final case class CompactStats(filesBefore: Int, bytesBefore: Long,
                                filesAfter: Int, bytesAfter: Long)

  /** Small-file compaction / layout maintenance — the 100 TB lake chore:
    * a partitioned dataset accumulating drip appends degrades into
    * thousands of KB-sized files per partition, and scan cost becomes
    * file-open cost (plus the NameNode/object-store listing tax). This
    * bin-packs every partition LEAF directory back to `targetFileBytes`
    * per file, preserving partition values (files are rewritten inside
    * their own leaf dir — partition columns live in the directory name,
    * never in the files) and preserving Z-ORDER when asked: a compaction
    * that merely concatenates z-ordered fragments interleaves their key
    * ranges and silently destroys min-max pruning, so with `zorder` set
    * the rewrite re-runs the Morton range-partition + sort at the new
    * file count (the [[zorderedParquet]] layout, maintained).
    *
    * Leaves already at-or-below the target file count are untouched
    * (idempotent; a nightly run is a no-op on quiet partitions). The
    * rewrite stages into a hidden sibling dir, then swaps — this is
    * MAINTENANCE for quiesced tables; concurrent readers of a live table
    * get atomic compaction through [[graft.sources.TxnTable.compact]],
    * which publishes the packed files as a new snapshot instead of
    * touching the old ones. Content equality is the caller-checkable
    * invariant (the q117 order-independent checksum; asserted in
    * SinksSpec).
    */
  def compactParquet(spark: org.apache.spark.sql.SparkSession, path: String,
                     targetFileBytes: Long,
                     zorder: Option[(String, String)] = None): CompactStats = {
    import java.io.File
    import org.apache.spark.sql.functions.col
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    def leaves(f: File): Seq[File] = {
      val kids = Option(f.listFiles()).getOrElse(Array.empty[File])
      val partDirs = kids.filter(d => d.isDirectory && d.getName.contains("="))
      if (partDirs.isEmpty) Seq(f) else partDirs.toSeq.flatMap(leaves)
    }
    def dataFiles(dir: File): Array[File] =
      Option(dir.listFiles()).getOrElse(Array.empty[File])
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    def deleteRec(f: File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty[File]).foreach(deleteRec)
      f.delete(): Unit
    }
    var (fb, bb, fa, ba) = (0, 0L, 0, 0L)
    leaves(new File(path)).foreach { dir =>
      val files = dataFiles(dir)
      if (files.nonEmpty) {
        val bytes = files.map(_.length).sum
        fb += files.length; bb += bytes
        val nOut = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
        if (files.length > nOut) {
          val df = spark.read.parquet(dir.getPath)
          val packed = zorder match {
            case Some((c1, c2)) =>
              val z = graft.functions.NativeText.morton2(
                col(c1).cast("long"), col(c2).cast("long"))
              df.repartitionByRange(nOut, z).sortWithinPartitions(z)
            case None => df.coalesce(nOut)
          }
          val staged = new File(dir.getParentFile,
            s".compact-${java.util.UUID.randomUUID()}")
          packed.write.mode("overwrite").parquet(staged.getPath)
          files.foreach(f => { f.delete(): Unit })
          dataFiles(staged).foreach { f =>
            java.nio.file.Files.move(f.toPath, new File(dir, f.getName).toPath): Unit
          }
          deleteRec(staged)
        }
        val after = dataFiles(dir)
        fa += after.length; ba += after.map(_.length).sum
      }
    }
    CompactStats(fb, bb, fa, ba)
  }

  /** Console sink (ref S6: the debugging `df.show()` surface). Formats a
    * bounded number of rows on the DRIVER — deliberately capped because
    * rendering is a collect of `numRows` rows; it is a debugging sink, not
    * a data path (use [[parquet]]/[[jdbc]] for data). Streaming queries get
    * the same surface via `format("console")` on writeStream.
    */
  def console(df: DataFrame, numRows: Int = 20, truncate: Boolean = true): Unit =
    df.show(numRows, truncate)

  /** JDBC append (ref: loader.py:50-83 — url/user/password/driver props,
    * mode append; the reference's FK-disable side-channel is dead code there
    * and intentionally not reproduced). Executors each open a connection and
    * batch-insert their partition.
    *
    * Tuning passthrough (the knobs loader.py's MySQL target cares about):
    *  - `batchSize`: rows per addBatch/executeBatch flush (Spark default
    *    1000). For MySQL pair it with `rewriteBatchedStatements=true` ON THE
    *    URL — that is a driver-protocol flag, not a writer option.
    *  - `isolationLevel`: transaction isolation for the per-partition
    *    writes; "NONE" skips transactions entirely (fastest; matches an
    *    append-only bulk load where partial-partition retries are
    *    acceptable).
    *  - `truncate` (with mode=overwrite): TRUNCATE TABLE instead of
    *    DROP+CREATE, preserving DDL, indexes, and FK definitions — the
    *    overwrite the reference's FK-ordered star schema would need.
    *
    * MySQL-dialect specifics (exact batch wire format, FK append ordering,
    * rewriteBatchedStatements behavior) are environment-blocked here — no
    * MySQL server, zero egress — so the contract is proven on embedded
    * Derby (SinksSpec) and the MySQL-only flags are documented, not tested.
    */
  def jdbc(df: DataFrame, url: String, table: String,
           user: String, password: String, driver: String,
           mode: String = "append",
           batchSize: Option[Int] = None,
           isolationLevel: Option[String] = None,
           truncate: Boolean = false): Unit = {
    val props = new Properties()
    props.setProperty("user", user)
    props.setProperty("password", password)
    props.setProperty("driver", driver)
    batchSize.foreach(b => props.setProperty("batchsize", b.toString))
    isolationLevel.foreach(l => props.setProperty("isolationLevel", l))
    if (truncate) props.setProperty("truncate", "true")
    df.write.mode(mode).jdbc(url, table, props)
  }
}
