package graft.sources

import java.io.File
import java.nio.file.{Files, StandardCopyOption}
import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport}
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.schema.MessageTypeParser

/** COLUMNAR DIR-ENTRY CHECKPOINTS for the graft transaction log — the
  * Delta `checkpoint.parquet` shape that makes commit cost O(new dirs)
  * instead of O(live dirs) on wide tables.
  *
  * A self-contained JSON manifest re-lists every live dir with its
  * folded stats on EVERY commit (~1 KB/dir with kmv/null/bound stats) —
  * a 10k-dir table pays ~10 MB of manifest write per commit and every
  * reader fetches it. Past a dir-count threshold, [[TxnTable]] instead
  * publishes INCREMENTAL manifests (table-wide metadata in full — it is
  * O(columns) — plus only the per-dir delta: `add`/`rm` dir lists and
  * stat entries for added dirs) and periodically materializes the full
  * per-dir state here as one parquet file, `_log/ckpt-v<N>.parquet`.
  * Readers reconstruct a snapshot from the nearest anchor (a columnar
  * checkpoint or a self-contained manifest) plus at most
  * checkpoint-interval small deltas; the in-JVM snapshot cache makes the
  * sequential case one delta-apply.
  *
  * One row per dir. `live=true` rows are the live set IN ORDER (live
  * order is plan order and must survive the round trip); `live=false`
  * rows carry row counts for deletion-vector dirs (manifest `nrows`
  * covers them too — history stays metadata-only). Stat columns reuse
  * the manifest string encodings verbatim, so one set of
  * formatters/parsers covers both carriers. Written with the plain
  * parquet-java example writer: the checkpoint is driver-side metadata
  * I/O (KB–MB), not a Spark job — planning must not schedule tasks.
  *
  * Atomicity: write to a `.tmp-*` name, then ATOMIC_MOVE into place.
  * Checkpoint content for a version is a pure function of that
  * version's immutable snapshot, so racing writers producing the same
  * file may safely REPLACE each other.
  */
private[graft] object TxnCheckpoint {

  private val schemaDdl =
    """message graft_ckpt {
      |  required binary dir (STRING);
      |  required boolean live;
      |  optional binary stats (STRING);
      |  optional binary part (STRING);
      |  optional int64 nrows;
      |  optional binary dv (STRING);
      |  optional binary nulls (STRING);
      |  optional binary kmv (STRING);
      |  optional binary sstats (STRING);
      |  optional binary eq (STRING);
      |}""".stripMargin
  private lazy val messageType = MessageTypeParser.parseMessageType(schemaDdl)

  def file(tableDir: String, v: Long): File =
    new File(new File(tableDir, "_log"), f"ckpt-v$v%020d.parquet")

  def exists(tableDir: String, v: Long): Boolean = file(tableDir, v).exists()

  /** Per-dir state reconstructed from (or destined for) a checkpoint —
    * exactly the Snapshot fields that scale with the dir count. `parts`
    * is the ORDERED partition-value vector per dir (round 13 multi-col
    * specs; single-col dirs hold a one-element vector). */
  final case class DirState(live: Seq[String],
                            stats: Map[String, Seq[(String, Long, Long)]],
                            parts: Map[String, Seq[(String, String)]],
                            nrows: Map[String, Long],
                            dvs: Map[String, String],
                            nulls: Map[String, Seq[(String, Long)]],
                            kmvs: Map[String, (String, Seq[Long])],
                            sstats: Map[String, Seq[(String, String, String)]] =
                              Map.empty,
                            eqs: Map[String, (Seq[String], Seq[String])] =
                              Map.empty)

  // --- the manifest string encodings, shared by both carriers ---
  def fmtStats(xs: Seq[(String, Long, Long)]): String =
    xs.map { case (c, lo, hi) => s"$c:$lo:$hi" }.mkString(";")
  def parseStats(s: String): Seq[(String, Long, Long)] =
    s.split(";").toSeq.flatMap(_.split(":") match {
      case Array(c, lo, hi) => Some((c, lo.toLong, hi.toLong))
      case _                => None
    })
  def fmtNulls(xs: Seq[(String, Long)]): String =
    xs.map { case (c, n) => s"$c:$n" }.mkString(";")
  def parseNulls(s: String): Seq[(String, Long)] =
    s.split(";").toSeq.flatMap(_.split(":") match {
      case Array(c, n) => Some((c, n.toLong))
      case _           => None
    })
  def fmtKmv(x: (String, Seq[Long])): String = s"${x._1}:${x._2.mkString(",")}"
  def parseKmv(s: String): Option[(String, Seq[Long])] =
    s.split(":", 2) match {
      case Array(c, vs) if vs.nonEmpty =>
        Some((c, vs.split(",").toSeq.flatMap(_.trim.toLongOption)))
      case _ => None
    }
  // partition-value vectors: single-col dirs keep the historical "c=v"
  // form; multi-col dirs (round 13) serialize "&c1=v1|c2=v2" — the '&'
  // sentinel makes the forms unambiguous (partition COLUMN names are
  // barred from starting with '&'; multi VALUES are barred from '|'),
  // and '=' stays legal inside single-col values as it always was
  def fmtParts(vec: Seq[(String, String)]): String = vec match {
    case Seq((c, v)) => s"$c=$v"
    case many => "&" + many.map { case (c, v) => s"$c=$v" }.mkString("|")
  }
  def parseParts(s: String): Seq[(String, String)] =
    if (s.startsWith("&"))
      s.drop(1).split("\\|", -1).toSeq.flatMap(_.split("=", 2) match {
        case Array(c, v) => Some((c, v))
        case _           => None
      })
    else s.split("=", 2) match {
      case Array(c, v) => Seq((c, v))
      case _           => Nil
    }

  // string/date bounds ride as base64(UTF-8 bytes) — charset-safe in the
  // JSON manifest AND byte-order-faithful (Spark compares strings by
  // unsigned UTF-8 byte order; see TxnTable.truncatedStringBounds). The
  // third field is the truncated-upper bound, "" = unbounded above.
  def fmtSstats(xs: Seq[(String, String, String)]): String =
    xs.map { case (c, lo, hi) => s"$c:$lo:$hi" }.mkString(";")
  def parseSstats(s: String): Seq[(String, String, String)] =
    s.split(";").toSeq.flatMap(_.split(":", -1) match {
      case Array(c, lo, hi) => Some((c, lo, hi))
      case _                => None
    })

  /** Materialize `st` as the version-`v` checkpoint. Idempotent; best
    * caller policy is fire-and-retry-next-commit (the checkpoint is an
    * anchor OPTIMIZATION — reconstruction falls back to walking to the
    * previous anchor if it is missing). */
  def write(tableDir: String, v: Long, st: DirState): Unit = {
    val logDir = new File(tableDir, "_log"); logDir.mkdirs()
    val tmp = new File(logDir, s".tmp-ckpt-${UUID.randomUUID()}.parquet")
    val conf = new Configuration(false)
    conf.set("fs.file.impl", classOf[org.apache.hadoop.fs.LocalFileSystem].getName)
    val w = ExampleParquetWriter.builder(new Path(tmp.getAbsolutePath))
      .withType(messageType)
      .withConf(conf)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
    val fac = new SimpleGroupFactory(messageType)
    try {
      val liveSet = st.live.toSet
      def row(d: String, live: Boolean): Group = {
        val g = fac.newGroup()
        g.append("dir", d).append("live", live)
        if (live) {
          st.stats.get(d).filter(_.nonEmpty).foreach(x => g.append("stats", fmtStats(x)))
          st.parts.get(d).filter(_.nonEmpty).foreach(v => g.append("part", fmtParts(v)))
          st.dvs.get(d).foreach(g.append("dv", _))
          st.nulls.get(d).filter(_.nonEmpty).foreach(x => g.append("nulls", fmtNulls(x)))
          st.kmvs.get(d).foreach(x => g.append("kmv", fmtKmv(x)))
          st.sstats.get(d).filter(_.nonEmpty).foreach(x => g.append("sstats", fmtSstats(x)))
        }
        st.nrows.get(d).foreach(n => g.append("nrows", n))
        g
      }
      st.live.foreach(d => w.write(row(d, live = true)))
      // row-count carriers outside the live set (deletion-vector dirs)
      (st.nrows.keySet -- liveSet).toSeq.sorted.foreach(d => w.write(row(d, live = false)))
      // equality-delete entries (round 14 — anchors must carry them now
      // that eq debt no longer forces self-contained manifests): one
      // non-live row per eq dir, the manifest "cols|applies" encoding
      st.eqs.toSeq.sortBy(_._1).foreach { case (e, (cols, ds)) =>
        val g = fac.newGroup()
        g.append("dir", e).append("live", false)
          .append("eq", s"${cols.mkString(",")}|${ds.mkString(",")}")
        w.write(g)
      }
    } finally w.close()
    try Files.move(tmp.toPath, file(tableDir, v).toPath,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    catch { case _: Exception => Files.deleteIfExists(tmp.toPath); () }
  }

  /** Read the version-`v` checkpoint back. None if absent or unreadable
    * (callers fall back to the manifest walk). */
  def read(tableDir: String, v: Long): Option[DirState] = {
    val f = file(tableDir, v)
    if (!f.exists()) return None
    val conf = new Configuration(false)
    conf.set("fs.file.impl", classOf[org.apache.hadoop.fs.LocalFileSystem].getName)
    try {
      val r = ParquetReader.builder(new GroupReadSupport(), new Path(f.getAbsolutePath))
        .withConf(conf).build()
      val live = Seq.newBuilder[String]
      var stats = Map.empty[String, Seq[(String, Long, Long)]]
      var parts = Map.empty[String, Seq[(String, String)]]
      var nrows = Map.empty[String, Long]
      var dvs = Map.empty[String, String]
      var nulls = Map.empty[String, Seq[(String, Long)]]
      var kmvs = Map.empty[String, (String, Seq[Long])]
      var sstats = Map.empty[String, Seq[(String, String, String)]]
      var eqs = Map.empty[String, (Seq[String], Seq[String])]
      try {
        var g: Group = r.read()
        while (g != null) {
          val d = g.getString("dir", 0)
          // pre-round-14 checkpoints lack the eq column entirely — guard
          // by schema membership, not just repetition count
          def has(fld: String): Boolean =
            g.getType.containsField(fld) && g.getFieldRepetitionCount(fld) > 0
          if (g.getBoolean("live", 0)) {
            live += d
            if (has("stats")) stats += d -> parseStats(g.getString("stats", 0))
            if (has("part")) {
              val vec = parseParts(g.getString("part", 0))
              if (vec.nonEmpty) parts += d -> vec
            }
            if (has("dv")) dvs += d -> g.getString("dv", 0)
            if (has("nulls")) nulls += d -> parseNulls(g.getString("nulls", 0))
            if (has("kmv")) parseKmv(g.getString("kmv", 0)).foreach(kmvs += d -> _)
            if (has("sstats")) sstats += d -> parseSstats(g.getString("sstats", 0))
          }
          if (has("nrows")) nrows += d -> g.getLong("nrows", 0)
          if (has("eq")) g.getString("eq", 0).split("\\|", 2) match {
            case Array(cols, ds) => eqs += d ->
              ((cols.split(",").toSeq, ds.split(",").filter(_.nonEmpty).toSeq))
            case _ => ()
          }
          g = r.read()
        }
      } finally r.close()
      Some(DirState(live.result(), stats, parts, nrows, dvs, nulls, kmvs,
        sstats, eqs))
    } catch { case _: Exception => None }
  }
}
