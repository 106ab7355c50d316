package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{Identifier, StagedTable, StagingTableCatalog, SupportsWrite, Table, TableCapability, TableCatalog, TableChange, TableInfo}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** PATH-BASED DSv2 catalog for graft tables — what makes SQL TIME
  * TRAVEL native:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
  *   spark.sql("SELECT * FROM graft.`/data/events` VERSION AS OF 3")
  *   spark.sql("SELECT * FROM graft.`/data/events` TIMESTAMP AS OF '…'")
  * }}}
  *
  * Spark's time-travel resolution calls `TableCatalog.loadTable(ident,
  * version|timestamp)`; the SESSION catalog hard-fails both overloads
  * for its tables (`V2SessionCatalog.failTimeTravel` — verified against
  * the shipped bytecode), so `VERSION AS OF` on a `USING graft` session
  * table is structurally unreachable for any third-party format. This
  * named catalog is the supported path — the same boundary Delta draws
  * with `delta.`/path/``. The identifier's name IS the table directory
  * (backquote it; namespaces are rejected — paths don't nest in a
  * metastore). Reader-option time travel
  * (`spark.read.format("graft").option("versionAsOf", …)`) remains the
  * non-SQL equivalent; both pin the SAME snapshot semantics
  * ([[GraftDataSource.resolve]] — one resolver, three front doors).
  *
  * The catalog is conf-registered (runtime-settable — CatalogManager
  * instantiates lazily on first reference, so an already-built session
  * can adopt it; [[graft.plans.GraftDml.install]] does), and the loaded
  * tables are ordinary [[GraftTable]]s: scans prune through the
  * manifest, writes commit through TxnTable, and the DML/constraint
  * strategies match them exactly as they match session-catalog tables.
  *
  * DDL (CREATE/DROP/ALTER) is intentionally not routed here: a graft
  * table IS its directory — creation is the first commit
  * (`df.write.format("graft")`), deletion is removing the directory,
  * schema changes are TxnTable evolution commits. The catalog is a
  * RESOLVER, not a metastore.
  */
final class GraftCatalog extends TableCatalog with StagingTableCatalog {

  private var catName: String = "graft"

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catName = name

  override def name(): String = catName

  private def dirOf(ident: Identifier): String = {
    require(ident.namespace().isEmpty,
      s"graft catalog tables are paths — use $catName.`/abs/path`, got " +
        s"namespace [${ident.namespace().mkString(".")}]")
    GraftDataSource.normalize(ident.name())
  }

  private def load(ident: Identifier, extra: Map[String, String]): Table = {
    val props = new util.HashMap[String, String]()
    props.put("path", dirOf(ident))
    extra.foreach { case (k, v) => props.put(k, v) }
    val (dir, version, schema) = GraftDataSource.resolve(props)
    new GraftTable(dir, version, schema)
  }

  override def loadTable(ident: Identifier): Table = load(ident, Map.empty)

  /** `VERSION AS OF v` — the DSv2 time-travel hook. */
  override def loadTable(ident: Identifier, version: String): Table =
    load(ident, Map("versionAsOf" -> version.trim))

  /** `TIMESTAMP AS OF ts` — Spark hands MICROseconds since epoch;
    * the resolver speaks commit-manifest milliseconds. */
  override def loadTable(ident: Identifier, timestamp: Long): Table =
    load(ident, Map("timestampAsOf" -> (timestamp / 1000L).toString))

  override def tableExists(ident: Identifier): Boolean =
    TxnTable.latestVersion(dirOf(ident)).isDefined

  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array.empty // paths are not enumerable from a metastore

  /** `CREATE TABLE graft.`/p` (cols…)` — a schema-only v0 commit
    * ([[TxnTable.create]]); CTAS appends on top as v1 (Spark's
    * non-staging CTAS protocol: createTable, then AppendData, with
    * [[dropTable]] as the failure cleanup). Partition transforms are
    * rejected: graft partition layout is a WRITE-time decision
    * (`overwritePartitions` / hidden transforms carried in the
    * manifest), not a DDL-time one. */
  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "graft DDL takes no PARTITIONED BY — partition layout is a write-time " +
        "decision (overwritePartitions / hidden transforms); see SURVEY L171/L188")
    val dir = dirOf(ident)
    GraftCatalog.requireNoRecoverableOrphan(dir)
    TxnTable.create(dir, schema)
    new GraftTable(dir, 0L, schema)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "ALTER on the path catalog is not supported — graft schema/constraint " +
        "evolution commits through TxnTable (or SQL ALTER on a session-catalog " +
        "graft table, dispatched by GraftDmlStrategy)")

  /** `DROP TABLE graft.`/p``: a graft table IS its directory — drop
    * deletes it, but ONLY a directory that provably is a graft table
    * (`_log` present), so a mistyped path can never recursively delete
    * arbitrary data. Also the CTAS-failure cleanup hook. */
  override def dropTable(ident: Identifier): Boolean = {
    val dir = new java.io.File(dirOf(ident))
    if (!new java.io.File(dir, "_log").isDirectory) false
    else {
      def rec(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(rec)
        f.delete(): Unit
      }
      rec(dir)
      TxnTable.invalidateSnapshotCache(dir.getPath) // a recreated table
      true                                          // must not see ghosts
    }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "a graft table IS its directory; move the directory to rename it")

  // ------- ATOMIC CTAS (round 13): StagingTableCatalog -------
  // With the staging hooks implemented, Spark routes CREATE TABLE … AS
  // SELECT through AtomicCreateTableAsSelectExec: the query writes into
  // a HIDDEN SIBLING graft table (`<dest>.ctas-staging-<uuid>`), and
  // only commitStagedChanges makes it visible — ONE atomic directory
  // rename into the destination path. A failing CTAS (write error,
  // constraint rejection, kill) aborts: the staging dir deletes and the
  // destination path was never touched — no createTable+append window
  // in which a racing reader sees a half-written table, and no
  // drop-then-recreate cleanup. Losing a creation race surfaces as the
  // rename's EEXIST, mapped to a typed conflict.

  private def stagingFor(dest: String): String =
    s"$dest.ctas-staging-${java.util.UUID.randomUUID()}"

  /** A staged graft table: reads/writes delegate to an ordinary
    * [[GraftTable]] over the staging dir; commit is the atomic rename. */
  private final class StagedGraftTable(stagingDir: String, destDir: String,
                                       inner: GraftTable)
      extends StagedTable with SupportsWrite {
    override def name(): String = s"graft.`$destDir` (staged)"
    override def schema(): StructType = inner.schema()
    override def capabilities(): util.Set[TableCapability] = inner.capabilities()
    override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
      inner.newWriteBuilder(info)
    override def commitStagedChanges(): Unit = {
      val dest = new java.io.File(destDir)
      Option(dest.getParentFile).foreach(_.mkdirs())
      // the swap replaces a whole table under an unchanged path — purge
      // any per-version snapshot cache entries for the destination
      TxnTable.invalidateSnapshotCache(destDir)
      try java.nio.file.Files.move(new java.io.File(stagingDir).toPath,
        dest.toPath, java.nio.file.StandardCopyOption.ATOMIC_MOVE): Unit
      catch {
        case e: java.nio.file.FileSystemException =>
          abortStagedChanges()
          throw new TxnTable.CommitConflict(
            s"CTAS lost the creation race for $destDir (or the move failed): " +
              s"${e.getMessage}")
      }
    }
    override def abortStagedChanges(): Unit = {
      def rec(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(rec)
        f.delete(): Unit
      }
      rec(new java.io.File(stagingDir))
    }
  }

  override def stageCreate(ident: Identifier, info: TableInfo): StagedTable = {
    require(info.partitions().isEmpty,
      "graft DDL takes no PARTITIONED BY — partition layout is a write-time " +
        "decision (overwritePartitions / hidden transforms); see SURVEY L171/L188")
    val dest = dirOf(ident)
    if (tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(
        Array(ident.name()))
    // a stranded `.rtas-old-*` sibling means a previous RTAS crashed in
    // its two-rename window: the REAL table data sits displaced beside
    // an empty destination. Creating fresh here would silently shadow
    // it — refuse toward recovery instead.
    GraftCatalog.requireNoRecoverableOrphan(dest)
    val staging = stagingFor(dest)
    TxnTable.create(staging, info.schema())
    new StagedGraftTable(staging, dest, new GraftTable(staging, 0L, info.schema()))
  }

  /** RTAS: stage like CTAS; commit swaps the old directory out and the
    * staged one in (two renames — the read-visible gap is the pair of
    * metadata ops, not the query's whole write as in the non-staging
    * protocol; a reader in the gap sees a missing table, never a torn
    * one). The displaced table is deleted after the swap lands.
    *
    * CRASH WINDOW (documented contract): a crash BETWEEN the two
    * renames leaves the destination path missing with the original
    * table stranded under `<dest>.rtas-old-<uuid>` (and the staged
    * result under `<dest>.ctas-staging-<uuid>`). Nothing is torn or
    * lost — [[GraftCatalog.recoverOrphans]] restores the displaced
    * table and reaps staging leftovers, and the create paths refuse to
    * shadow a recoverable orphan ([[GraftCatalog.requireNoRecoverableOrphan]]). */
  override def stageReplace(ident: Identifier, info: TableInfo): StagedTable = {
    require(info.partitions().isEmpty,
      "graft DDL takes no PARTITIONED BY — partition layout is a write-time " +
        "decision (overwritePartitions / hidden transforms)")
    val dest = dirOf(ident)
    if (!tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        Array(ident.name()))
    stageSwap(dest, info)
  }

  override def stageCreateOrReplace(ident: Identifier, info: TableInfo): StagedTable = {
    require(info.partitions().isEmpty,
      "graft DDL takes no PARTITIONED BY — partition layout is a write-time " +
        "decision (overwritePartitions / hidden transforms)")
    stageSwap(dirOf(ident), info)
  }

  private def stageSwap(dest: String, info: TableInfo): StagedTable = {
    val staging = stagingFor(dest)
    TxnTable.create(staging, info.schema())
    // swap-on-commit variant: displace any existing dir, then rename in
    new StagedTable with SupportsWrite {
      private val inner = new GraftTable(staging, 0L, info.schema())
      override def name(): String = s"graft.`$dest` (staged replace)"
      override def schema(): StructType = inner.schema()
      override def capabilities(): util.Set[TableCapability] = inner.capabilities()
      override def newWriteBuilder(i: LogicalWriteInfo): WriteBuilder =
        inner.newWriteBuilder(i)
      override def commitStagedChanges(): Unit = {
        val destF = new java.io.File(dest)
        Option(destF.getParentFile).foreach(_.mkdirs())
        // same-path whole-table replacement: purge the snapshot cache
        TxnTable.invalidateSnapshotCache(dest)
        val displaced = new java.io.File(s"$dest.rtas-old-${java.util.UUID.randomUUID()}")
        val hadOld = destF.isDirectory &&
          new java.io.File(destF, "_log").isDirectory
        if (hadOld)
          java.nio.file.Files.move(destF.toPath, displaced.toPath,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE): Unit
        try java.nio.file.Files.move(new java.io.File(staging).toPath,
          destF.toPath, java.nio.file.StandardCopyOption.ATOMIC_MOVE): Unit
        catch {
          case e: java.nio.file.FileSystemException =>
            // restore the displaced table before surfacing the conflict
            if (hadOld)
              java.nio.file.Files.move(displaced.toPath, destF.toPath,
                java.nio.file.StandardCopyOption.ATOMIC_MOVE): Unit
            abortStagedChanges()
            throw new TxnTable.CommitConflict(
              s"RTAS swap for $dest failed: ${e.getMessage}")
        }
        if (hadOld) {
          def rec(f: java.io.File): Unit = {
            Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(rec)
            f.delete(): Unit
          }
          rec(displaced)
        }
      }
      override def abortStagedChanges(): Unit = {
        def rec(f: java.io.File): Unit = {
          Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(rec)
          f.delete(): Unit
        }
        rec(new java.io.File(staging))
      }
    }
  }
}

/** RTAS/CTAS orphan bookkeeping — the recovery side of the staged-swap
  * crash window documented on [[GraftCatalog.stageReplace]]. */
object GraftCatalog {

  private def isGraftTable(f: java.io.File): Boolean =
    new java.io.File(f, "_log").isDirectory

  /** Siblings of `dest` stranded by a crashed staged swap:
    * (`.rtas-old-*` displaced tables, `.ctas-staging-*` staging dirs). */
  private[sources] def orphansOf(dest: String): (Seq[java.io.File], Seq[java.io.File]) = {
    val f = new java.io.File(dest)
    val sibs = Option(f.getParentFile).flatMap(p => Option(p.listFiles()))
      .getOrElse(Array.empty[java.io.File])
    (sibs.filter(_.getName.startsWith(s"${f.getName}.rtas-old-")).toSeq,
     sibs.filter(_.getName.startsWith(s"${f.getName}.ctas-staging-")).toSeq)
  }

  /** True iff `dest` is currently NOT a graft table while a displaced
    * `.rtas-old-*` sibling IS one — the state a crash between the RTAS
    * swap's two renames leaves behind. Creating over it would shadow
    * the real data; [[recoverOrphans]] restores it. */
  private[sources] def hasRecoverableOrphan(dest: String): Boolean =
    !isGraftTable(new java.io.File(dest)) && orphansOf(dest)._1.exists(isGraftTable)

  private[sources] def requireNoRecoverableOrphan(dest: String): Unit =
    if (hasRecoverableOrphan(dest))
      throw new IllegalStateException(
        s"$dest has a displaced table stranded by an interrupted REPLACE " +
          s"(${orphansOf(dest)._1.map(_.getName).mkString(", ")}) — run " +
          "GraftCatalog.recoverOrphans(dest) before creating over this path")

  /** MAINTENANCE: repair the staged-swap crash window at `dest`.
    *
    *  - destination missing + exactly one displaced `.rtas-old-*` graft
    *    table → move it back (the RTAS never committed; its result, if
    *    staged, is deleted as garbage);
    *  - destination present → any `.rtas-old-*` siblings are leftovers
    *    of a swap that LANDED but crashed before its cleanup → deleted;
    *  - `.ctas-staging-*` siblings are reaped unconditionally.
    *
    * Caller contract: no CTAS/RTAS on `dest` may be in flight (a live
    * staging dir is indistinguishable from a crashed one — this is an
    * explicit maintenance call, not an automatic sweep, for exactly
    * that reason). Returns a human-readable action summary. */
  def recoverOrphans(dest: String): String = {
    val (rtasOld, staging) = orphansOf(dest)
    val destF = new java.io.File(dest)
    val actions = Seq.newBuilder[String]
    if (!isGraftTable(destF)) {
      rtasOld.filter(isGraftTable) match {
        case Seq(one) =>
          TxnTable.invalidateSnapshotCache(dest)
          java.nio.file.Files.move(one.toPath, destF.toPath,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE): Unit
          actions += s"restored ${one.getName} -> $dest"
        case Seq() => ()
        case many => throw new IllegalStateException(
          s"$dest has ${many.size} displaced candidates " +
            s"(${many.map(_.getName).mkString(", ")}) — restore manually")
      }
    }
    def rec(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(rec)
      f.delete(): Unit
    }
    // after a restore (or with dest live) every remaining sibling is garbage
    orphansOf(dest) match { case (ro, st) =>
      (ro ++ st).foreach { f => rec(f); actions += s"reaped ${f.getName}" }
    }
    val done = actions.result()
    if (done.isEmpty) "no orphans" else done.mkString("; ")
  }
}
