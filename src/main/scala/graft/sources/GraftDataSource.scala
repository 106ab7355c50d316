package graft.sources

import java.util
import java.util.OptionalLong

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, Statistics, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsOverwrite, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 front-end for [[TxnTable]] — the layer that turns the
  * lake-table library (q196–q223: manifest stats, partitions, blooms,
  * DVs, equality deletes, schema evolution) into an ENGINE a SQL user
  * can reach:
  *
  * {{{
  *   spark.read.format("graft").load(tableDir)                   // latest
  *   spark.read.format("graft")
  *     .option("versionAsOf", 3).load(tableDir)                  // time travel
  *   spark.read.format("graft")
  *     .option("timestampAsOf", ms).load(tableDir)               // by commit ts
  *   df.createOrReplaceTempView("t"); spark.sql("SELECT … FROM t")
  * }}}
  *
  * Pushdown composes with Spark's own planning (the Delta/Iceberg DSv2
  * `TableProvider` + `SupportsPushDownFilters` +
  * `SupportsPushDownRequiredColumns` shape):
  *  - a plain `.filter($"k" between (lo, hi))` prunes the planned DIRS
  *    through the manifest's min/max stats ([[TxnTable.pruneLive]]) —
  *    no more hand-passing (column, lo, hi) to `readRange`;
  *  - a point equality additionally consults the per-dir `.bloom`
  *    sidecars ([[TxnTable.pruneLivePoint]]) and the manifest `parts`
  *    map ([[TxnTable.prunePartition]]), so partition reads prune too;
  *  - pruned columns and translated predicates are pushed into the
  *    INNER parquet scan, so parquet row-group skipping (the second
  *    tier) and `ReadSchema` pruning still happen;
  *  - every filter stays residual at the Spark layer (dir skipping is
  *    file-granular), so correctness never depends on the pruning.
  *
  * Reads go THROUGH deletion vectors and equality deletes
  * ([[TxnTable.readDirsDV]]) and honor the manifest-carried evolved
  * schema — the full MoR read stack, automatically.
  *
  * Version pinning: the version is resolved ONCE at `getTable` time, so
  * a DataFrame handle is a SNAPSHOT — re-evaluating it after concurrent
  * commits re-reads the SAME version (repeatable reads, the TxnTable
  * reader-isolation contract surfaced through DSv2).
  *
  * Execution uses the public [[V1Scan]] bridge (the same mechanism as
  * Spark's own JDBC source): DSv2 does the planning/pushdown, then the
  * scan hands Spark a `BaseRelation` whose RDD is the INNER DataFrame's
  * physical plan with `needConversion = false` — the inner vectorized
  * parquet read, DV anti-joins, and evolved-schema backfill all execute
  * unchanged, with zero row-format conversion at the boundary.
  *
  * At 100 TB: planning is one manifest fetch; a BI tool issuing
  * `WHERE k BETWEEN …` over SQL gets the same 1-of-N dir plan the
  * hand-written `readRange` call gets, plus parquet row-group skipping,
  * without knowing the table format exists.
  */
class GraftDataSource extends TableProvider with DataSourceRegister
    with StreamSourceProvider with StreamSinkProvider {

  override def shortName(): String = "graft"

  override def supportsExternalMetadata(): Boolean = false

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftDataSource.resolve(options.asCaseSensitiveMap())._3

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val (dir, version, resolved) = GraftDataSource.resolve(properties)
    new GraftTable(dir, version, resolved)
  }

  // ---- streaming read: spark.readStream.format("graft").load(dir) ----
  // V1 StreamSourceProvider (the stable Source.getBatch API): commit
  // versions are the offsets, each batch is a CDC window — see
  // [[GraftStreamSource]].

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) =
    (shortName(), GraftStreamSource.feedSchema(
      ctx.sparkSession, GraftDataSource.dirOf(parameters)))

  override def createSource(ctx: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): org.apache.spark.sql.execution.streaming.Source = {
    val maxV = parameters.collectFirst {
      case (k, v) if k.equalsIgnoreCase("maxVersionsPerTrigger") => v.trim.toLong
    }
    maxV.foreach(n => require(n >= 1, s"maxVersionsPerTrigger must be >= 1, got $n"))
    // startingVersion = n skips the snapshot bootstrap: the first batch
    // is the CDC window from commit n (the Delta option; the consumer
    // already holds the snapshot). n >= 1 — the full-history feed is
    // the default bootstrap, not startingVersion = 0.
    val startV = parameters.collectFirst {
      case (k, v) if k.equalsIgnoreCase("startingVersion") => v.trim.toLong
    }
    startV.foreach(n => require(n >= 1,
      s"startingVersion must be >= 1 (omit it for the snapshot bootstrap), got $n"))
    new GraftStreamSource(ctx.sparkSession, GraftDataSource.dirOf(parameters),
      maxV, startV)
  }

  // ---- streaming write: df.writeStream.format("graft").start(dir) ----
  // V1 StreamSinkProvider (the DataFrame-granular addBatch API): each
  // micro-batch is one atomic TxnTable commit, idempotent per
  // <appId>-<batchId> — see [[GraftStreamSink]]. Implementing this
  // interface routes DataStreamWriter down the V1 sink path (GraftTable
  // deliberately does not claim STREAMING_WRITE: the DSv2 per-partition
  // writer protocol would only reimplement the staged-write + atomic
  // manifest publish TxnTable already provides).

  override def createSink(ctx: SQLContext, parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: org.apache.spark.sql.streaming.OutputMode):
      org.apache.spark.sql.execution.streaming.Sink =
    GraftStreamSink.create(parameters, partitionColumns, outputMode)
}

object GraftDataSource {

  /** The session catalog hands a CREATE TABLE ... LOCATION through as a
    * `file:` URI; TxnTable speaks local paths. */
  private[graft] def normalize(raw: String): String =
    if (raw.startsWith("file:")) new java.io.File(java.net.URI.create(raw)).getPath
    else raw

  /** Table dir from a streaming reader's parameters map. */
  private[sources] def dirOf(parameters: Map[String, String]): String =
    normalize(parameters.map { case (k, v) => k.toLowerCase -> v }
      .getOrElse("path", throw new IllegalArgumentException(
        "graft stream needs a path: spark.readStream.format(\"graft\").load(tableDir)")))

  /** Resolve (tableDir, pinned version, effective schema) from reader
    * options. `versionAsOf` / `timestampAsOf` mirror Delta's reader
    * options; absent both, the then-latest version pins. */
  private[sources] def resolve(props: util.Map[String, String]): (String, Long, StructType) = {
    def opt(k: String): Option[String] = {
      // CaseInsensitiveStringMap lower-cases keys; plain maps may not
      val it = props.entrySet().iterator()
      var r = Option.empty[String]
      while (it.hasNext && r.isEmpty) {
        val e = it.next()
        if (e.getKey.equalsIgnoreCase(k)) r = Option(e.getValue)
      }
      r
    }
    val raw = opt("path").getOrElse(
      throw new IllegalArgumentException(
        "graft source needs a path: spark.read.format(\"graft\").load(tableDir)"))
    val dir = normalize(raw)
    // `versionAsOf` accepts a version number OR a tag name (round 15 —
    // Iceberg refs): SQL's `VERSION AS OF 'release-x'` arrives here as
    // the same string option
    val versionOpt = opt("versionAsOf").map { v0 =>
      val v = v0.trim
      v.toLongOption.getOrElse(TxnTable.resolveTag(dir, v).getOrElse(
        throw new IllegalArgumentException(
          s"versionAsOf '$v' is neither a version number nor a tag of $dir " +
            s"(tags: ${TxnTable.listTags(dir).keys.toSeq.sorted.mkString(", ")})")))
    }
      .orElse(opt("timestampAsOf").map { t =>
        val ts = t.trim.toLong
        val vs = TxnTable.versions(dir)
        require(vs.nonEmpty, s"no commits at $dir")
        vs.map(v => (v, TxnTable.snapshot(dir, v).ts)).filter(_._2 <= ts)
          .lastOption.map(_._1).getOrElse(throw new TxnTable.RetentionError(
            s"no retained commit at or before ts=$ts at $dir"))
      })
      .orElse(TxnTable.latestVersion(dir))
    versionOpt match {
      // a commit-less location resolves to an EMPTY table handle so the
      // WRITE path can create it (df.write.format("graft") on a fresh
      // dir = first commit, like Delta); scans of it throw at build time
      case None => (dir, -1L, new StructType())
      case Some(version) =>
        val snap = TxnTable.snapshot(dir, version)
        val schema = TxnTable.effectiveSchema(dir, snap).getOrElse {
          // pre-_schema table: the live files' footers are the truth
          require(snap.live.nonEmpty, s"version $version has no schema record and no data")
          SparkSession.active.read.parquet(snap.live.map(d =>
            new java.io.File(new java.io.File(dir, "data"), d).getPath): _*).schema
        }
        (dir, version, schema)
    }
  }
}

/** One pinned-version graft table; writable. Reads pin `version` (a
  * DataFrame handle is a snapshot); writes always commit on top of the
  * table's CURRENT head via the TxnTable conflict-rebase machinery, so
  * a stale handle never silently clobbers a concurrent commit. */
final class GraftTable(val tableDir: String, version: Long, tableSchema: StructType)
    extends Table with SupportsRead with SupportsWrite {
  private def dir: String = tableDir

  override def name(): String = s"graft.`$dir`@v$version"

  override def schema(): StructType = tableSchema

  override def capabilities(): util.Set[TableCapability] = {
    // V1_BATCH_WRITE selects the V1Write fallback exec (AppendDataExecV1
    // / OverwriteByExpressionExecV1) — the path that hands the whole
    // DataFrame to our InsertableRelation; BATCH_WRITE is additionally
    // required by DataFrameWriter.save's V2-branch gate (without it the
    // writer falls back to the V1 CreatableRelationProvider path we
    // don't implement)
    val caps = util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.OVERWRITE_BY_FILTER)
    // a commit-less location has no schema to validate against — the
    // FIRST write defines it (TxnTable records `_schema` at commit 0);
    // existing tables keep Spark's strict by-name output resolution,
    // the analysis-time face of schema-on-write
    if (tableSchema.isEmpty) caps.add(TableCapability.ACCEPT_ANY_SCHEMA)
    caps
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    require(version >= 0L, s"no commits at $dir — nothing to read")
    new GraftScanBuilder(dir, version, tableSchema)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftWriteBuilder(dir, info)
}

/** DSv2 write path: append / INSERT INTO, full overwrite (TRUNCATE /
  * INSERT OVERWRITE), and dynamic-partition overwrite (writer option
  * `overwritePartitions=<col>`), each landing as ONE atomic TxnTable
  * commit — schema-on-write, CHECK constraints, generated columns, and
  * concurrent-commit conflict rebase all enforced by the same `stage`/
  * `tryPublish` gates the Scala API goes through. Uses the public
  * [[V1Write]] bridge (as Spark's JDBC source does): the physical plan
  * hands the whole DataFrame to the relation, and TxnTable's own staged
  * write + atomic manifest publish provides exactly-once semantics the
  * per-partition DSv2 writer protocol would only reimplement. Writer
  * option `statsCol=<col>` records min/max+bloom+null-count pruning
  * sidecars, `txnId=<id>` makes the commit idempotent for retries. */
final class GraftWriteBuilder(dir: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsOverwrite {

  private var truncateFirst = false

  override def truncate(): WriteBuilder = { truncateFirst = true; this }

  override def overwrite(filters: Array[Filter]): WriteBuilder = {
    // dir-granular storage: only the full-table overwrite is expressible
    // as one commit (Spark sends AlwaysTrue for INSERT OVERWRITE /
    // SaveMode.Overwrite); a filtered overwrite must go through
    // TxnTable.deleteWhere + append (or MERGE) where the rewrite set is
    // manifest-pruned
    require(filters.isEmpty || filters.forall(_.isInstanceOf[AlwaysTrue]),
      s"graft supports only full-table overwrite, got [${filters.mkString(", ")}]")
    truncateFirst = true
    this
  }

  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation =
      new InsertableRelation {
        override def insert(data: DataFrame, overwrite: Boolean): Unit = {
          def opt(k: String): Option[String] = Option(info.options.get(k))
          val statsCol = opt("statscol").orElse(opt("statsCol"))
          val txnId = opt("txnid").orElse(opt("txnId"))
          val partCol = opt("overwritepartitions").orElse(opt("overwritePartitions"))
          partCol match {
            case Some(c) =>
              TxnTable.overwritePartitions(data.sparkSession, dir, data, c, txnId): Unit
            case None if truncateFirst || overwrite =>
              TxnTable.overwrite(data, dir, txnId, statsCol): Unit
            case None =>
              TxnTable.append(data, dir, txnId, statsCol): Unit
          }
        }
      }
  }
}

/** Collects Spark's pushed filters and pruned columns, then builds the
  * manifest-planned scan. ALL filters are returned as residual
  * (dir-level skipping is file-granular — Spark re-applies row-level),
  * while the translatable subset is reported via `pushedFilters` (it
  * shows in `.explain` as `PushedFilters: […]`) and reused inside the
  * inner parquet read for row-group skipping. */
final class GraftScanBuilder(dir: String, version: Long, tableSchema: StructType)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = tableSchema
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(f => GraftScan.toColumn(f).isDefined)
    filters // everything stays residual — pruning is dir-granular
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new GraftScan(dir, version, tableSchema, required, pushed)
}

/** The planned scan: dir-level skipping happens HERE, once, at plan
  * time — one manifest fetch, zero data reads ([[GraftScan.prune]]) —
  * and the result is visible to Spark as row-count/size statistics (so
  * a pruned graft table can be broadcast in a join). */
final class GraftScan(dir: String, version: Long, tableSchema: StructType,
                      required: StructType, pushed: Array[Filter])
    extends V1Scan with SupportsReportStatistics {

  private lazy val snap = TxnTable.snapshot(dir, version)
  private lazy val planned: Seq[String] =
    GraftScan.prune(dir, snap, pushed, tableSchema)

  override def readSchema(): StructType = required

  override def description(): String =
    s"GraftScan $dir v$version dirs=${planned.size}/${snap.live.size} " +
      s"filters=[${pushed.mkString(", ")}]"

  override def estimateStatistics(): Statistics = new Statistics {
    // manifest-carried row counts over the PLANNED dirs only: pruning
    // shrinks the estimate, which is what lets a filtered graft table
    // qualify for a broadcast join upstream
    private val rows: Option[Long] =
      if (planned.forall(snap.nrows.contains))
        Some(planned.map(snap.nrows).sum) else None
    override def sizeInBytes(): OptionalLong =
      rows.map(r => OptionalLong.of(r * math.max(1,
        required.map(_.dataType.defaultSize).sum))).getOrElse(OptionalLong.empty())
    override def numRows(): OptionalLong =
      rows.map(OptionalLong.of).getOrElse(OptionalLong.empty())
    // COLUMN statistics: NDV from the KMV sketches merged over exactly
    // the planned subset, null counts from the manifest — the
    // cardinality CBO's filter/join estimation consumes (nrows sizes a
    // relation; rows/NDV is what an equality predicate selects).
    // Sketches come from the MANIFEST (`kmvs`, folded at publish since
    // round 12) — zero per-dir reads at thousand-dir scale; pre-r12
    // manifests fall back to the per-dir `.kmv` sidecars, computed
    // lazily ONCE per scan and only when Spark asks for column stats.
    override def columnStats(): util.Map[
        org.apache.spark.sql.connector.expressions.NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = colStatsMap
  }

  private lazy val colStatsMap = {
    import org.apache.spark.sql.connector.expressions.Expressions
    import org.apache.spark.sql.connector.read.colstats.ColumnStatistics
    val m = new util.HashMap[
      org.apache.spark.sql.connector.expressions.NamedReference, ColumnStatistics]()
    val manifestCovers = planned.nonEmpty && planned.forall(snap.kmvs.contains)
    val sketched =
      if (manifestCovers) planned.flatMap(d => snap.kmvs.get(d).map(_._1)).distinct
      else planned.flatMap(d => TxnTable.kmvOf(dir, d).map(_._1)).distinct
    sketched.foreach { c =>
      (if (manifestCovers) TxnTable.estimateDistinctFromManifest(snap, c, planned)
       else TxnTable.estimateDistinct(dir, c, planned)).foreach { ndv =>
        val nullCnt: Option[Long] = {
          val per = planned.map(d =>
            snap.nulls.get(d).flatMap(_.find(_._1 == c)).map(_._2))
          if (per.forall(_.isDefined)) Some(per.flatten.sum) else None
        }
        m.put(Expressions.column(c), new ColumnStatistics {
          override def distinctCount(): OptionalLong = OptionalLong.of(ndv)
          override def nullCount(): OptionalLong =
            nullCnt.map(OptionalLong.of).getOrElse(OptionalLong.empty())
        })
      }
    }
    m
  }

  override def toV1TableScan[T <: BaseRelation with TableScan](context: SQLContext): T = {
    val scanSchema = required
    val df = buildDf(context.sparkSession)
    GraftScanMeta.record(dir, version, snap.live, planned, pushed)
    new BaseRelation with TableScan {
      override def sqlContext: SQLContext = context
      override def schema: StructType = scanSchema
      // the rows ARE InternalRows (the inner plan's physical output):
      // zero conversion at the V1 boundary
      override def needConversion: Boolean = false
      override def buildScan(): RDD[Row] =
        df.queryExecution.toRdd.asInstanceOf[RDD[Row]]
    }.asInstanceOf[T]
  }

  /** The inner read: planned dirs through DVs/eq-deletes with the
    * evolved schema, translated predicates re-applied (parquet
    * row-group tier), columns pruned to the required set. */
  private def buildDf(spark: SparkSession): DataFrame = {
    val base =
      if (planned.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], tableSchema)
      else TxnTable.readDirsDV(spark, dir, snap, planned)
    val filtered = pushed.flatMap(GraftScan.toColumn).foldLeft(base)(_ filter _)
    if (required.isEmpty) filtered.select()
    else filtered.select(required.fieldNames.map(filtered.col).toSeq: _*)
  }
}

object GraftScan {

  import org.apache.spark.sql.functions.{col, lit, not}

  /** Dir-level skipping from the pushed conjuncts: every top-level
    * conjunct independently narrows the planned set, so the result is
    * the INTERSECTION of what each predicate proves. Sound by
    * construction — each prune keeps every dir it cannot disprove. */
  private[graft] def prune(dir: String, snap: TxnTable.Snapshot,
                           filters: Array[Filter],
                           schema: StructType = new StructType()): Seq[String] = {
    var dirs = snap.live
    def narrow(kept: Seq[String]): Unit = dirs = dirs.filter(kept.contains)
    // integral/date/timestamp values translate from the VALUE alone
    // (longOf); decimals additionally need the column's schema scale —
    // the unscaled-long translation mirroring TxnTable.longProj's
    // write-side projection, with direction-aware rounding for literals
    // the scale cannot represent (x <= 9.995 prunes as x <= 9.99 on a
    // scale-2 column; x > 9.995 as x >= 10.00 — INCLUSIVE, the strict
    // +1 applies only to exactly-representable values)
    def typeOf(a: String): Option[org.apache.spark.sql.types.DataType] =
      schema.find(_.name == a).map(_.dataType)
    // TYPE-GATED translation (ADVICE r14): against a DECIMAL column the
    // raw longOf path is never sound — an integral-typed pushed literal
    // (mixed-type In lists, a promoted comparison) read as an unscaled
    // long would be off by 10^scale and prune live rows. Decimal
    // columns translate ONLY through the scaled path (which also
    // accepts integral literals exactly, scaling them itself).
    def isDecimal(a: String): Boolean =
      typeOf(a).exists(_.isInstanceOf[org.apache.spark.sql.types.DecimalType])
    def eqOf(a: String, v: Any): Option[Long] =
      if (isDecimal(a)) typeOf(a).flatMap(scaledLongOf(v, _))
      else longOf(v)
    // lower bound as an inclusive [x, ∞) start; strict handled per-arm
    def lowerOf(a: String, v: Any, strict: Boolean): Option[Long] =
      if (!isDecimal(a))
        longOf(v).map(x => if (strict) math.min(x, Long.MaxValue - 1) + 1L else x)
      else typeOf(a).flatMap { dt =>
        scaledLongOf(v, dt) match {
          case Some(x) => Some(if (strict) math.min(x, Long.MaxValue - 1) + 1L else x)
          case None    => scaledLongOf(v, dt, DecMode.Ceil) // non-repr: > and >= coincide
        }
      }
    def upperOf(a: String, v: Any, strict: Boolean): Option[Long] =
      if (!isDecimal(a))
        longOf(v).map(x => if (strict) math.max(x, Long.MinValue + 1) - 1L else x)
      else typeOf(a).flatMap { dt =>
        scaledLongOf(v, dt) match {
          case Some(x) => Some(if (strict) math.max(x, Long.MinValue + 1) - 1L else x)
          case None    => scaledLongOf(v, dt, DecMode.Floor) // non-repr: < and <= coincide
        }
      }
    filters.flatMap(conjuncts).foreach {
      case EqualTo(a, v) =>
        eqOf(a, v).foreach(x => narrow(TxnTable.pruneLivePoint(dir, snap, a, x)))
        if (typeOf(a).exists(decimalNeverEqual(v, _)))
          narrow(Nil) // no scale-s value equals this literal: zero dirs
        stringOf(v).foreach(s => narrow(TxnTable.pruneLiveString(snap, a, s, s)))
        stableRender(v).foreach(s => narrow(TxnTable.prunePartition(snap, a, s)))
      case EqualNullSafe(a, v) if v != null =>
        eqOf(a, v).foreach(x => narrow(TxnTable.pruneLivePoint(dir, snap, a, x)))
        if (typeOf(a).exists(decimalNeverEqual(v, _)))
          narrow(Nil)
        stringOf(v).foreach(s => narrow(TxnTable.pruneLiveString(snap, a, s, s)))
        stableRender(v).foreach(s => narrow(TxnTable.prunePartition(snap, a, s)))
      case GreaterThan(a, v) =>
        lowerOf(a, v, strict = true)
          .foreach(x => narrow(TxnTable.pruneLive(snap, a, x, Long.MaxValue)))
        // strict string bound prunes via the inclusive one: a dir whose
        // recorded range tops out below s cannot hold anything > s (a
        // dir with max == s survives — kept extra, sound)
        stringOf(v).foreach(s =>
          narrow(TxnTable.pruneLiveStringBounds(snap, a, Some(s), None)))
      case GreaterThanOrEqual(a, v) =>
        lowerOf(a, v, strict = false)
          .foreach(x => narrow(TxnTable.pruneLive(snap, a, x, Long.MaxValue)))
        stringOf(v).foreach(s =>
          narrow(TxnTable.pruneLiveStringBounds(snap, a, Some(s), None)))
      case LessThan(a, v) =>
        upperOf(a, v, strict = true)
          .foreach(x => narrow(TxnTable.pruneLive(snap, a, Long.MinValue, x)))
        stringOf(v).foreach(s =>
          narrow(TxnTable.pruneLiveStringBounds(snap, a, None, Some(s))))
      case LessThanOrEqual(a, v) =>
        upperOf(a, v, strict = false)
          .foreach(x => narrow(TxnTable.pruneLive(snap, a, Long.MinValue, x)))
        stringOf(v).foreach(s =>
          narrow(TxnTable.pruneLiveStringBounds(snap, a, None, Some(s))))
      case StringStartsWith(a, p) =>
        // any string with prefix p is >= p under the byte order the
        // `.sstats` bounds use — the lower bound alone prunes dirs
        // entirely below the prefix (an exclusive upper would need raw
        // byte bounds; kept-extra dirs are sound)
        narrow(TxnTable.pruneLiveStringBounds(snap, a, Some(p), None))
      case In(a, vs) if vs.nonEmpty =>
        // values a decimal scale cannot represent match no row — drop
        // them from the translated set (all dropped ⇒ zero dirs)
        val candidates = vs.filterNot(v => typeOf(a).exists(decimalNeverEqual(v, _)))
        if (candidates.isEmpty) narrow(Nil)
        else {
          val ls = candidates.flatMap(eqOf(a, _))
          if (ls.length == candidates.length) // all translatable → bounds prune
            narrow(TxnTable.pruneLive(snap, a, ls.min, ls.max))
        }
        // string IN: union of per-value prunes against the `.sstats`
        // bounds — a dir survives if ANY value could live in it
        val ss = vs.flatMap(stringOf)
        if (ss.length == vs.length) {
          val perString = ss.map(s => TxnTable.pruneLiveString(snap, a, s, s))
          narrow(dirs.filter(d => perString.exists(_.contains(d))))
        }
        // partition prune: keep dirs whose recorded value is IN the set
        // (union of per-value prunes — a dir survives if ANY value
        // matches); only when EVERY value has a rendering proven equal
        // to the write-time Row.toString — otherwise a rendering drift
        // (e.g. Timestamp "… 00:00:00.0" vs "…T00:00:00Z") would prune
        // a matching dir and silently lose rows
        val rendered = vs.flatMap(stableRender)
        if (rendered.length == vs.length) {
          val perValue = rendered.map(s => TxnTable.prunePartition(snap, a, s))
          narrow(dirs.filter(d => perValue.exists(_.contains(d))))
        }
      case IsNull(a)    => narrow(TxnTable.pruneLiveNull(snap, a, wantNull = true))
      case IsNotNull(a) => narrow(TxnTable.pruneLiveNull(snap, a, wantNull = false))
      case _ => () // Or/Not/unknown shapes prune nothing — always sound
    }
    dirs
  }

  private def conjuncts(f: Filter): Seq[Filter] = f match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other     => Seq(other)
  }

  /** Renderings PROVEN to match the write-time `Row.get(_).toString`
    * the `.part` sidecar recorded: strings verbatim, integrals and
    * booleans (canonical toString on both sides). Dates/timestamps/
    * decimals are excluded — their pushed-value rendering depends on
    * `spark.sql.datetime.java8API.enabled` / scale normalization and
    * can differ from the write-time one, which would prune a MATCHING
    * dir (silent row loss — the residual filter cannot recover rows
    * from unplanned files). Excluded types stay planned: sound. */
  private def stableRender(v: Any): Option[String] = v match {
    case s: String  => Some(s)
    case i: Int     => Some(i.toString)
    case l: Long    => Some(l.toString)
    case s: Short   => Some(s.toString)
    case b: Byte    => Some(b.toString)
    case b: Boolean => Some(b.toString)
    case _          => None
  }

  /** Pushed filter values the integral `.stats` bounds cover. DATE and
    * TIMESTAMP values translate through Spark's OWN external↔internal
    * converters (DateTimeUtils — the exact inverse of the `unix_date`/
    * `unix_micros` projections the write side records bounds with, see
    * TxnTable.longProj, including the Julian↔Gregorian rebase), so the
    * comparison is engine-controlled on BOTH sides. Which external
    * class arrives depends on `spark.sql.datetime.java8API.enabled` —
    * all four are handled. */
  private def longOf(v: Any): Option[Long] = v match {
    case i: Int   => Some(i.toLong)
    case l: Long  => Some(l)
    case s: Short => Some(s.toLong)
    case b: Byte  => Some(b.toLong)
    case d: java.sql.Date =>
      Some(org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaDate(d).toLong)
    case d: java.time.LocalDate =>
      Some(org.apache.spark.sql.catalyst.util.DateTimeUtils.localDateToDays(d).toLong)
    case t: java.sql.Timestamp =>
      Some(org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(t))
    case i: java.time.Instant =>
      Some(org.apache.spark.sql.catalyst.util.DateTimeUtils.instantToMicros(i))
    // TIMESTAMP_NTZ literals arrive as LocalDateTime — the exact inverse
    // of the identity reinterpret the write side records bounds with
    // (graft.functions.NtzMicros): both sides timezone-free local micros
    case l: java.time.LocalDateTime =>
      Some(org.apache.spark.sql.catalyst.util.DateTimeUtils.localDateTimeToMicros(l))
    case _ => None
  }

  /** String filter values — the `.sstats` truncated-bounds tier
    * (byte-order comparison, exactly pruneLiveString's contract). */
  private def stringOf(v: Any): Option[String] = v match {
    case s: String => Some(s)
    case _         => None
  }

  /** DECIMAL filter values → the unscaled long the write side records
    * bounds with (value × 10^scale, see TxnTable.longProj). Translation
    * requires the COLUMN's scale. `mode` picks the sound direction for
    * a literal that is NOT representable at that scale:
    *  - Exact (equality/IN): None — but note the CALLER may instead
    *    conclude "no column value can equal this" (see prune's arms);
    *  - Floor (upper bounds): round DOWN — `x <= 9.995` over a scale-2
    *    column is exactly `x <= 9.99`;
    *  - Ceil (lower bounds): round UP — `x >= 9.995` is exactly
    *    `x >= 10.00`.
    * Overflow past a long (or a column wider than 18 digits) returns
    * None: the predicate prunes nothing, sound. */
  private object DecMode extends Enumeration { val Exact, Floor, Ceil = Value }
  private def scaledLongOf(v: Any, dt: org.apache.spark.sql.types.DataType,
                           mode: DecMode.Value = DecMode.Exact): Option[Long] = {
    def unscaled(b: java.math.BigDecimal, scale: Int): Option[Long] =
      try {
        val r = mode match {
          case DecMode.Exact => b.setScale(scale)
          case DecMode.Floor => b.setScale(scale, java.math.RoundingMode.FLOOR)
          case DecMode.Ceil  => b.setScale(scale, java.math.RoundingMode.CEILING)
        }
        Some(r.unscaledValue().longValueExact())
      } catch { case _: ArithmeticException => None }
    dt match {
      case d: org.apache.spark.sql.types.DecimalType if d.precision <= 18 =>
        v match {
          case b: java.math.BigDecimal  => unscaled(b, d.scale)
          case b: scala.math.BigDecimal => unscaled(b.underlying, d.scale)
          // integral literals scale EXACTLY (5 against DECIMAL(18,2) is
          // unscaled 500) — the sound translation for mixed-type pushes
          case n: java.lang.Long        => unscaled(java.math.BigDecimal.valueOf(n), d.scale)
          case n: java.lang.Integer     => unscaled(java.math.BigDecimal.valueOf(n.longValue), d.scale)
          case n: java.lang.Short       => unscaled(java.math.BigDecimal.valueOf(n.longValue), d.scale)
          case n: java.lang.Byte        => unscaled(java.math.BigDecimal.valueOf(n.longValue), d.scale)
          case _                        => None
        }
      case _ => None
    }
  }

  /** True iff `v` is a decimal value for a decimal column that CANNOT
    * be represented at the column's scale — no column value can ever
    * equal it, so an equality on it matches zero rows (the caller may
    * plan zero dirs; the residual filter agrees). */
  private def decimalNeverEqual(v: Any, dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case d: org.apache.spark.sql.types.DecimalType =>
        val b = v match {
          case x: java.math.BigDecimal  => Some(x)
          case x: scala.math.BigDecimal => Some(x.underlying)
          case _                        => None
        }
        b.exists(x =>
          try { x.setScale(d.scale); false }
          catch { case _: ArithmeticException => true })
      case _ => false
    }

  /** Translate a source filter back to a Column for the INNER read —
    * this is what lets parquet row-group skipping fire inside the V1
    * bridge. None = untranslated (it stays residual at the Spark layer,
    * so skipping it costs correctness nothing). */
  private[sources] def toColumn(f: Filter): Option[Column] = f match {
    case EqualTo(a, v)            => Some(col(a) === lit(v))
    case EqualNullSafe(a, v)      => Some(col(a) <=> lit(v))
    case GreaterThan(a, v)        => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v)           => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v)    => Some(col(a) <= lit(v))
    case In(a, vs)                => Some(col(a).isin(vs.toSeq: _*))
    case IsNull(a)                => Some(col(a).isNull)
    case IsNotNull(a)             => Some(col(a).isNotNull)
    case StringStartsWith(a, p)   => Some(col(a).startsWith(p))
    case StringEndsWith(a, p)     => Some(col(a).endsWith(p))
    case StringContains(a, p)     => Some(col(a).contains(p))
    case And(l, r) => for { lc <- toColumn(l); rc <- toColumn(r) } yield lc && rc
    case Or(l, r)  => for { lc <- toColumn(l); rc <- toColumn(r) } yield lc || rc
    case Not(c)    => toColumn(c).map(not)
    case _         => None
  }
}

/** Diagnostic record of the most recent graft scan's PLANNING decision
  * (driver-side, volatile — a test/audit hook, not a data path): which
  * dirs the manifest pruning planned out of the live set, and which
  * filters drove it. PlanAuditSpec pins dir-level skipping through this
  * — `df.inputFiles` cannot see through the V1 bridge. */
object GraftScanMeta {
  final case class PlannedScan(tableDir: String, version: Long,
                               live: Seq[String], planned: Seq[String],
                               pushed: Seq[String])
  @volatile var last: Option[PlannedScan] = None
  // keyed records: `last` is a single global slot, so a CONCURRENT
  // graft scan (parallel query, another planning thread) can overwrite
  // it between a query's scan and its audit read — an audit that must
  // describe its OWN scan reads the per-table slot instead
  private val byTable =
    new java.util.concurrent.ConcurrentHashMap[String, PlannedScan]()
  /** Most recent planning record for `tableDir` (race-free across
    * concurrent scans of DIFFERENT tables; same-table concurrent scans
    * of one immutable version record identical content). */
  def forTable(tableDir: String): Option[PlannedScan] =
    Option(byTable.get(tableDir))
  private[sources] def record(dir: String, version: Long, live: Seq[String],
                              planned: Seq[String], pushed: Array[Filter]): Unit = {
    val rec = PlannedScan(dir, version, live, planned, pushed.map(_.toString).toSeq)
    byTable.put(dir, rec)
    last = Some(rec)
  }
}
