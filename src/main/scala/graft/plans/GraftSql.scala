package graft.plans

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.TxnTable

/** SQL MAINTENANCE surface for graft tables: `VACUUM`, `OPTIMIZE`,
  * `DESCRIBE HISTORY` and `ALTER TABLE … ADD/DROP CONSTRAINT` as plain
  * SQL text — the statements a pure-SQL operator needs beyond DML
  * (q230/q231 cover SELECT/MERGE/UPDATE/DELETE).
  *
  * Dispatch boundary (documented, not incidental): Spark's parser has
  * NO grammar for `VACUUM` / `OPTIMIZE` / `DESCRIBE HISTORY` — Delta
  * adds them via `injectParser`, which only applies to sessions built
  * with the extension and cannot be retrofitted into an already-built
  * session (`sessionState.sqlParser` is resolved once; the declared
  * queries receive the driver's session). [[GraftSql.sql]] is therefore
  * the CALL-style escape: it parses exactly the graft maintenance
  * grammar below and DELEGATES EVERYTHING ELSE verbatim to
  * `spark.sql`, so it is a drop-in `spark.sql` replacement — the same
  * boundary Delta draws for pre-extension sessions with its
  * `DeltaTable.vacuum/optimize/history` escape hatches.
  * `ALTER TABLE … ADD CONSTRAINT … CHECK` DOES parse (Spark 4's ANSI
  * constraint grammar) and dispatches through [[GraftDmlStrategy]] like
  * the DML verbs; it is accepted here too so one entry point covers the
  * whole maintenance vocabulary.
  *
  * Grammar (case-insensitive; `<tbl>` is a session-catalog table name,
  * a `graft.`/path/`` literal, or a quoted path):
  * {{{
  *   DESCRIBE HISTORY <tbl>
  *   VACUUM <tbl> [RETAIN <n> HOURS] [DRY RUN]
  *   OPTIMIZE <tbl> [WHERE <partCol> = '<value>']
  *                  [ZORDER BY (c1[, c2])] [TARGET <n> FILES]
  * }}}
  * `OPTIMIZE … WHERE` is partition-scoped ([[TxnTable.compactPartition]]
  * — compact today's partition after the load, pay proportional to the
  * partition, never the table).
  * `VACUUM` defaults to RETAIN 168 HOURS (the Delta default); DRY RUN
  * returns the reap list without deleting (the production pre-flight).
  * `OPTIMIZE` bin-packs to TARGET files (default 16); ZORDER BY
  * clusters on 1–2 integral keys ([[TxnTable.compactClustered]]).
  * Round-12 additions to the vocabulary:
  * {{{
  *   RESTORE [TABLE] <tbl> TO VERSION [AS OF] <n>   -- metadata-only undo
  *   DESCRIBE DETAIL <tbl>                          -- one-row table profile
  * }}}
  * Round-14 addition:
  * {{{
  *   CHECKPOINT <tbl>   -- materialize the columnar dir-entry checkpoint
  *                      -- at the head (async-offload maintenance verb)
  * }}}
  * Round-15 additions (manifest-carried TBLPROPERTIES — see
  * [[TxnTable.setProperties]] for the engine-honored keys — and
  * Iceberg-style TAGS that pin retention until dropped):
  * {{{
  *   ALTER TABLE <tbl> SET TBLPROPERTIES('k'='v'[, ...])
  *   ALTER TABLE <tbl> UNSET TBLPROPERTIES('k'[, ...])
  *   SHOW TBLPROPERTIES <tbl>
  *   ALTER TABLE <tbl> CREATE TAG <name> [AS OF VERSION <n>]
  *   ALTER TABLE <tbl> DROP TAG <name>
  *   SHOW TAGS <tbl>
  * }}}
  * `RESTORE` re-commits the target version's live set
  * ([[TxnTable.restore]] — one manifest write, the 3am-bad-job
  * recovery; the bad versions stay auditable until vacuumed).
  * `DESCRIBE DETAIL` is the Delta surface: location, current version,
  * file/row counts, constraint and partition-spec metadata — all from
  * ONE manifest fetch plus a local file listing, zero data reads.
  */
object GraftSql {

  private val describeHistory =
    """(?is)\s*DESCRIBE\s+HISTORY\s+(.+?)\s*;?\s*""".r
  private val describeDetail =
    """(?is)\s*DESCRIBE\s+DETAIL\s+(.+?)\s*;?\s*""".r
  private val vacuum =
    """(?is)\s*VACUUM\s+(.+?)(?:\s+RETAIN\s+(\d+)\s+HOURS?)?(\s+DRY\s+RUN)?\s*;?\s*""".r
  private val optimize =
    """(?is)\s*OPTIMIZE\s+(.+?)(?:\s+WHERE\s+([A-Za-z_][A-Za-z0-9_]*)\s*=\s*'([^']*)')?(?:\s+ZORDER\s+BY\s*\(([^)]+)\))?(?:\s+TARGET\s+(\d+)\s+FILES?)?\s*;?\s*""".r
  private val restore =
    """(?is)\s*RESTORE\s+(?:TABLE\s+)?(.+?)\s+TO\s+VERSION\s+(?:AS\s+OF\s+)?(\d+)\s*;?\s*""".r
  private val checkpointTbl =
    """(?is)\s*CHECKPOINT\s+(.+?)\s*;?\s*""".r
  private val showPartitions =
    """(?is)\s*SHOW\s+PARTITIONS\s+(.+?)\s*;?\s*""".r
  private val createTag =
    """(?is)\s*ALTER\s+TABLE\s+(.+?)\s+CREATE\s+TAG\s+([A-Za-z_][A-Za-z0-9._-]*)(?:\s+AS\s+OF\s+VERSION\s+(\d+))?\s*;?\s*""".r
  private val dropTag =
    """(?is)\s*ALTER\s+TABLE\s+(.+?)\s+DROP\s+TAG\s+([A-Za-z_][A-Za-z0-9._-]*)\s*;?\s*""".r
  private val showTags =
    """(?is)\s*SHOW\s+TAGS\s+(.+?)\s*;?\s*""".r
  private val setTblProps =
    """(?is)\s*ALTER\s+TABLE\s+(.+?)\s+SET\s+TBLPROPERTIES\s*\((.+?)\)\s*;?\s*""".r
  private val unsetTblProps =
    """(?is)\s*ALTER\s+TABLE\s+(.+?)\s+UNSET\s+TBLPROPERTIES\s*\(([^)]+)\)\s*;?\s*""".r
  private val showTblProps =
    """(?is)\s*SHOW\s+TBLPROPERTIES\s+(.+?)\s*;?\s*""".r

  /** Run `text`: graft maintenance statements execute against the
    * table's TxnTable log; anything else delegates to `spark.sql`. */
  def sql(spark: SparkSession, text: String): DataFrame = text match {
    case describeHistory(ref) =>
      TxnTable.history(spark, locate(spark, ref))

    case describeDetail(ref) =>
      import spark.implicits._
      val dir = locate(spark, ref)
      val v = TxnTable.latestVersion(dir)
        .getOrElse(throw new IllegalStateException(s"no commits at $dir"))
      val snap = TxnTable.snapshot(dir, v)
      val dvDirs = snap.live.flatMap(snap.dvs.get).distinct
      val numRows: Option[Long] =
        if (snap.live.forall(snap.nrows.contains) && dvDirs.forall(snap.nrows.contains))
          Some(snap.live.map(snap.nrows).sum - dvDirs.map(snap.nrows).sum)
        else None
      // num_files/size_bytes from ONE walk of the live dirs' parquet
      // part-files — the same definition OPTIMIZE and SHOW PARTITIONS
      // use (round 13: all three surfaces agree about one layout)
      val partFiles = snap.live.map(d =>
        Option(new File(new File(new File(dir, "data"), d).getPath).listFiles())
          .getOrElse(Array.empty[File])
          .filter(_.getName.endsWith(".parquet")))
      val numFiles = partFiles.map(_.length.toLong).sum
      val sizeBytes = partFiles.map(_.map(_.length()).sum).sum
      Seq((
        "graft", dir, v, snap.action, numFiles, numRows, sizeBytes,
        snap.dvs.size.toLong, snap.constraints.keys.toSeq.sorted.mkString(","),
        snap.ptrans.map { case (a, e) => s"$a = $e" }.getOrElse(""),
        snap.schema.orElse {
          // pre-evolution tables record their DDL in `_schema`, not
          // the manifest (evolution commits carry it forward)
          val f = new File(dir, "_schema")
          if (f.exists())
            Some(new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
          else None
        }.getOrElse(""),
        snap.props.toSeq.sortBy(_._1)
          .map { case (k, pv) => s"$k=$pv" }.mkString(",")))
        .toDF("format", "location", "version", "last_action", "num_files",
          "num_rows", "size_bytes", "num_dvs", "constraints",
          "partition_spec", "schema_ddl", "properties")

    case restore(ref, version) =>
      import spark.implicits._
      val dir = locate(spark, ref)
      val v = TxnTable.restore(spark, dir, version.toLong)
      Seq((v, version.toLong)).toDF("version", "restored_to")

    // round-14 async-offload maintenance verb: materialize the columnar
    // dir-entry checkpoint at the current head (the counterpart of
    // -Dgraft.txn.ckptOffload=true; also a read-burst pre-warm on any
    // table). Metadata-only — one snapshot read, one parquet write.
    case checkpointTbl(ref) if locateIfGraft(spark, ref).isDefined =>
      import spark.implicits._
      val dir = locateIfGraft(spark, ref).get
      val v = TxnTable.checkpoint(dir)
      Seq((v.isDefined, v.getOrElse(TxnTable.latestVersion(dir).getOrElse(-1L))))
        .toDF("written", "version")

    // round-15 TAG verbs (Iceberg refs): named, immutable pointers to a
    // committed version that PIN retention until dropped; read back via
    // `VERSION AS OF '<name>'` / the versionAsOf option
    case createTag(ref, name, version) =>
      import spark.implicits._
      val dir = locate(spark, ref)
      val v = TxnTable.createTag(dir, name,
        Option(version).map(_.toLong))
      Seq((name, v)).toDF("tag", "version")

    case dropTag(ref, name) =>
      import spark.implicits._
      val dir = locate(spark, ref)
      val existed = TxnTable.deleteTag(dir, name)
      Seq((name, existed)).toDF("tag", "dropped")

    case showTags(ref) if locateIfGraft(spark, ref).isDefined =>
      import spark.implicits._
      TxnTable.listTags(locateIfGraft(spark, ref).get)
        .toSeq.sortBy(_._1).toDF("tag", "version")

    // round-15 TBLPROPERTIES verbs: properties persist IN the manifest
    // (TxnTable.setProperties — inherited forward like constraints, so
    // two writer JVMs can never disagree about a table's object-store
    // mode). ALTER/SHOW TBLPROPERTIES are ALSO Spark grammar — only
    // graft tables are intercepted, everything else passes through.
    case setTblProps(ref, kvs) if locateIfGraft(spark, ref).isDefined =>
      import spark.implicits._
      val dir = locateIfGraft(spark, ref).get
      val props = """'([^']+)'\s*=\s*'([^']*)'""".r.findAllMatchIn(kvs)
        .map(m => m.group(1) -> m.group(2)).toMap
      require(props.nonEmpty,
        s"SET TBLPROPERTIES needs 'key'='value' pairs, got: $kvs")
      val v = TxnTable.setProperties(dir, props)
      Seq((v, props.size)).toDF("version", "properties_set")

    case unsetTblProps(ref, ks) if locateIfGraft(spark, ref).isDefined =>
      import spark.implicits._
      val dir = locateIfGraft(spark, ref).get
      val keys = """'([^']+)'""".r.findAllMatchIn(ks).map(_.group(1)).toSeq
      require(keys.nonEmpty, s"UNSET TBLPROPERTIES needs 'key' names, got: $ks")
      val v = TxnTable.unsetProperties(dir, keys)
      Seq((v, keys.size)).toDF("version", "properties_unset")

    case showTblProps(ref) if locateIfGraft(spark, ref).isDefined =>
      import spark.implicits._
      val dir = locateIfGraft(spark, ref).get
      val v = TxnTable.latestVersion(dir)
        .getOrElse(throw new IllegalStateException(s"no commits at $dir"))
      TxnTable.snapshot(dir, v).props.toSeq.sortBy(_._1).toDF("key", "value")

    // SHOW PARTITIONS is ALSO valid Spark grammar (hive-partitioned
    // tables) — only graft tables are intercepted; everything else
    // passes through to spark.sql untouched
    case showPartitions(ref) if locateIfGraft(spark, ref).isDefined =>
      import spark.implicits._
      val dir = locateIfGraft(spark, ref).get
      val v = TxnTable.latestVersion(dir)
        .getOrElse(throw new IllegalStateException(s"no commits at $dir"))
      val snap = TxnTable.snapshot(dir, v)
      // near-metadata-only: the manifest's parts map IS the partition
      // listing (one fetch, zero data READS); num_files counts actual
      // parquet part-files per dir — the same definition OPTIMIZE's
      // files_before/files_after uses, so the two surfaces agree about
      // one layout (a bulk-staged dir holds up to 8 part-files; counting
      // dirs here used to under-report by that factor). The listing is
      // driver-side over live dirs only — metadata-proportional.
      def partFiles(d: String): Long =
        Option(new File(new File(new File(dir, "data"), d).getPath).listFiles())
          .getOrElse(Array.empty[File])
          .count(_.getName.endsWith(".parquet")).toLong
      // multi-column layouts (round 13) render each level-vector as
      // "c1/c2" + "v1/v2" — one row per distinct tuple
      def vecOf(d: String): Seq[(String, String)] =
        snap.partsN.getOrElse(d, snap.parts.get(d).toSeq)
      snap.live.filter(d => vecOf(d).nonEmpty)
        .map { d =>
          val vec = vecOf(d)
          (vec.map(_._1).mkString("/"), vec.map(_._2).mkString("/"),
            partFiles(d), snap.nrows.get(d): Option[Long]) }
        .groupBy(t => (t._1, t._2))
        .map { case ((c, pv), xs) =>
          val rows = if (xs.forall(_._4.isDefined)) Some(xs.flatMap(_._4).sum) else None
          (c, pv, xs.map(_._3).sum, rows)
        }.toSeq.sortBy(t => (t._1, t._2))
        .toDF("partition_column", "value", "num_files", "num_rows")

    case vacuum(ref, hours, dry) =>
      import spark.implicits._
      val dir = locate(spark, ref)
      val retainMs = Option(hours).map(_.toLong).getOrElse(168L) * 3600L * 1000L
      val cutoff = System.currentTimeMillis() - retainMs
      // age → newest-N translation (the vacuumOlderThan fold): keep
      // every version at or after the cutoff, always at least the head
      val vs = TxnTable.versions(dir)
      require(vs.nonEmpty, s"no commits at $dir")
      val keepFrom = vs.indexWhere(v => TxnTable.snapshot(dir, v).ts >= cutoff) match {
        case -1 => vs.length - 1
        case i  => i
      }
      val retain = math.max(1, vs.length - keepFrom)
      val (drop, reap) = TxnTable.vacuumDryRun(dir, retain)
      if (dry == null || dry.isEmpty) TxnTable.vacuum(dir, retain)
      drop.map(v => ("version", s"v$v")).toDF("kind", "target")
        .unionByName(reap.map(d => ("data_dir", d)).toDF("kind", "target"))
        .withColumn("executed",
          org.apache.spark.sql.functions.lit(dry == null || dry.isEmpty))

    case optimize(ref, whereCol, whereVal, zorder, target) =>
      import spark.implicits._
      val dir = locate(spark, ref)
      val targetFiles = Option(target).map(_.toInt).getOrElse(16)
      require(whereCol == null || zorder == null,
        "OPTIMIZE … WHERE is partition-scoped bin-packing; combine with " +
          "ZORDER BY by clustering the whole table instead")
      // physical parquet part-files over the live set (compact packs N
      // files into ONE dir; clustering makes one dir per bucket — the
      // file count is the layout truth either way). Driver listing of
      // live dirs only: metadata-proportional, like the commit itself.
      def fileCount(v: Long): Long =
        TxnTable.snapshot(dir, v).live.map(d =>
          Option(new File(new File(new File(dir, "data"), d).getPath).listFiles())
            .getOrElse(Array.empty[File])
            .count(f => f.getName.endsWith(".parquet"))).sum.toLong
      val base = TxnTable.latestVersion(dir)
        .getOrElse(throw new IllegalStateException(s"no commits at $dir"))
      val before = fileCount(base)
      val v = (Option(whereCol), Option(zorder).map(_.split(",").map(_.trim).toSeq)) match {
        case (Some(c), _) =>
          // partition-scoped: default to ONE packed file per partition
          TxnTable.compactPartition(spark, dir, c, whereVal,
            Option(target).map(_.toInt).getOrElse(1))
        case (_, Some(cols)) => TxnTable.compactClustered(spark, dir, cols, targetFiles)
        case _               => TxnTable.compact(spark, dir, targetFiles)
      }
      Seq((v, before, fileCount(v)))
        .toDF("version", "files_before", "files_after")

    case other => spark.sql(other)
  }

  /** [[locate]] that answers None (instead of throwing) when the
    * reference is a catalog table of a DIFFERENT provider — the guard
    * that keeps statements with overlapping Spark grammar (SHOW
    * PARTITIONS) passing through for non-graft tables. */
  private[plans] def locateIfGraft(spark: SparkSession, ref: String): Option[String] =
    try Some(locate(spark, ref)) catch { case _: Exception => None }

  /** Resolve a statement's table reference to its TxnTable location:
    * `graft.`/path/`` (the Delta path-table convention), a quoted path
    * literal, or a session-catalog name CREATEd `USING graft`. */
  private[plans] def locate(spark: SparkSession, ref: String): String = {
    val r = ref.trim
    if (r.startsWith("graft.`") && r.endsWith("`"))
      r.substring("graft.`".length, r.length - 1)
    else if ((r.startsWith("'") && r.endsWith("'")) ||
             (r.startsWith("\"") && r.endsWith("\"")))
      r.substring(1, r.length - 1)
    else {
      val ti = spark.sessionState.sqlParser.parseTableIdentifier(r)
      val meta = spark.sessionState.catalog.getTableMetadata(ti)
      require(meta.provider.exists(_.equalsIgnoreCase("graft")),
        s"$r is not a graft table (provider: ${meta.provider.getOrElse("none")})")
      val raw = meta.location.toString
      if (raw.startsWith("file:")) new File(java.net.URI.create(raw)).getPath
      else raw
    }
  }
}
