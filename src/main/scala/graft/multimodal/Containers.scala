package graft.multimodal

import org.apache.spark.sql.Row

/** Pure-JVM *container* parsers for the media formats the JDK has no codec
  * for: MP4/MOV (ISO BMFF box tree), WebM/MKV (EBML element tree), and MP3
  * (frame-header walk). Metadata extraction at 100 TB must not shell out to
  * ffmpeg per row — and it does not need to: the facts a curation pipeline
  * filters on (dimensions, duration, track/frame counts, declared format)
  * live in container headers that are plain byte structures. No sample/pixel
  * data is ever decoded here.
  *
  * Results use [[Binary.MetaSchema]] under a documented mapping:
  *  - video (MP4/MOV, WebM/MKV): width/height = pixel dimensions from the
  *    track header; n_frames = container duration in MILLISECONDS (the
  *    per-frame count is not in the header without walking sample tables);
  *  - MP3: width = bitrate (kbps) of the first frame, height = channels,
  *    n_frames = audio frame count from the frame walk.
  */
object Containers {

  // ---- byte readers (big-endian, as all three containers use) ----
  private def u16(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)
  private def u32(b: Array[Byte], p: Int): Long =
    ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
      ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)
  private def u64(b: Array[Byte], p: Int): Long =
    (u32(b, p) << 32) | u32(b, p + 4)
  private def fourcc(b: Array[Byte], p: Int): String =
    new String(b, p, 4, "ISO-8859-1")

  // =========================== MP4 / MOV ===============================

  /** ISO BMFF sniff: 'ftyp' box at offset 4. */
  def isMp4(b: Array[Byte]): Boolean =
    b.length >= 12 && fourcc(b, 4) == "ftyp"

  /** Walk the direct children of [start, end): calls f(boxType, payloadStart,
    * payloadEnd). Handles 64-bit largesize and size==0 (extends to end).
    */
  private def walkBoxes(b: Array[Byte], start: Int, end: Int)
                       (f: (String, Int, Int) => Unit): Unit = {
    var p = start
    while (p + 8 <= end) {
      val size32 = u32(b, p)
      val typ = fourcc(b, p + 4)
      val (payload, boxEnd) =
        if (size32 == 1L && p + 16 <= end) (p + 16L, p + u64(b, p + 8))
        else if (size32 == 0L) (p + 8L, end.toLong)
        else (p + 8L, p + size32)
      if (boxEnd < payload || boxEnd > end) return // malformed: stop cleanly
      f(typ, payload.toInt, boxEnd.toInt)
      p = boxEnd.toInt
    }
  }

  /** MP4/MOV metadata: moov/mvhd for timescale+duration, each trak/tkhd for
    * pixel dimensions (16.16 fixed point; audio tracks carry 0×0 so the max
    * across tracks is the video size). Returns None unless a sane moov/mvhd
    * is present.
    */
  def decodeMp4(b: Array[Byte]): Option[Row] = {
    if (!isMp4(b)) return None
    var durationMs = -1L
    var width = 0
    var height = 0
    var tracks = 0
    walkBoxes(b, 0, b.length) { (typ, s, e) =>
      if (typ == "moov") walkBoxes(b, s, e) { (t2, s2, e2) =>
        if (t2 == "mvhd" && e2 - s2 >= 24) {
          val version = b(s2) & 0xff
          val (timescale, duration) =
            if (version == 1 && e2 - s2 >= 32) (u32(b, s2 + 20), u64(b, s2 + 24))
            else (u32(b, s2 + 12), u32(b, s2 + 16))
          if (timescale > 0) durationMs = duration * 1000L / timescale
        } else if (t2 == "trak") {
          tracks += 1
          walkBoxes(b, s2, e2) { (t3, s3, e3) =>
            if (t3 == "tkhd" && e3 - s3 >= 80) {
              val version = b(s3) & 0xff
              // offset of the 16.16 width/height pair past version+flags:
              // v0 layout = 4+4+4+4+4+8+2+2+2+2+36 = 72; v1 has 8-byte
              // times and duration = 84.
              val off = s3 + (if (version == 1) 4 + 84 else 4 + 72)
              if (off + 8 <= e3) {
                width = math.max(width, u16(b, off))       // integer part of 16.16
                height = math.max(height, u16(b, off + 4))
              }
            }
          }
        }
      }
    }
    if (durationMs < 0) None
    else {
      val brand = fourcc(b, 8)
      val fmt = if (brand.startsWith("qt")) "video/quicktime" else "video/mp4"
      Some(Row(width, height, clampInt(durationMs), fmt))
    }
  }

  // =========================== WebM / MKV ==============================

  /** EBML sniff: magic 0x1A45DFA3. */
  def isEbml(b: Array[Byte]): Boolean =
    b.length >= 4 && (b(0) & 0xff) == 0x1a && (b(1) & 0xff) == 0x45 &&
      (b(2) & 0xff) == 0xdf && (b(3) & 0xff) == 0xa3

  /** Variable-length integer. IDs keep the length-marker bit (matching the
    * spec's notation, e.g. Segment = 0x18538067); sizes strip it. Returns
    * (value, bytesConsumed) or null-equivalent (-1, 0) on malformed input.
    */
  private def readVint(b: Array[Byte], p: Int, keepMarker: Boolean): (Long, Int) = {
    if (p >= b.length) return (-1L, 0)
    val first = b(p) & 0xff
    if (first == 0) return (-1L, 0)
    val len = java.lang.Integer.numberOfLeadingZeros(first) - 23 // 1..8
    if (p + len > b.length) return (-1L, 0)
    var v: Long = if (keepMarker) first.toLong else (first & (0xff >>> len)).toLong
    var i = 1
    while (i < len) { v = (v << 8) | (b(p + i) & 0xff); i += 1 }
    (v, len)
  }

  /** Walk the direct children of [start, end): calls f(id, payloadStart,
    * payloadEnd). An all-ones size (unknown, streamed files) extends to end.
    */
  private def walkEbml(b: Array[Byte], start: Int, end: Int)
                      (f: (Long, Int, Int) => Unit): Unit = {
    var p = start
    while (p < end) {
      val (id, idLen) = readVint(b, p, keepMarker = true)
      if (idLen == 0) return
      val (size, szLen) = readVint(b, p + idLen, keepMarker = false)
      if (szLen == 0) return
      val payload = p + idLen + szLen
      val unknownSize = size == (1L << (7 * szLen)) - 1
      // Compute the end in Long BEFORE narrowing: a 64-bit EBML size above
      // Int.MaxValue would wrap under `payload + size.toInt` and could land
      // back in range, silently misparsing — decline it instead (the walk
      // operates on in-memory byte arrays, so a >2 GiB payload can never
      // be valid here anyway). Mirrors walkBoxes' Long bounds check.
      val payloadEndL = if (unknownSize) end.toLong else payload.toLong + size
      if (payloadEndL < payload || payloadEndL > end) return
      val payloadEnd = payloadEndL.toInt
      f(id, payload, payloadEnd)
      p = payloadEnd
    }
  }

  private def ebmlFloat(b: Array[Byte], s: Int, e: Int): Double = (e - s) match {
    case 4 => java.lang.Float.intBitsToFloat(u32(b, s).toInt).toDouble
    case 8 => java.lang.Double.longBitsToDouble(u64(b, s))
    case _ => -1.0
  }
  private def ebmlUint(b: Array[Byte], s: Int, e: Int): Long = {
    var v = 0L; var i = s
    while (i < e && i - s < 8) { v = (v << 8) | (b(i) & 0xff); i += 1 }
    v
  }

  /** WebM/MKV metadata: Segment → Info (TimestampScale ns/tick + Duration in
    * ticks) and Tracks → TrackEntry → Video (PixelWidth/PixelHeight). Format
    * from the EBML header's DocType ("webm" | "matroska").
    */
  def decodeMkv(b: Array[Byte]): Option[Row] = {
    if (!isEbml(b)) return None
    var docType = "matroska"
    var tsScale = 1000000L // spec default: ns per tick
    var durationTicks = -1.0
    var width = 0
    var height = 0
    var sawSegment = false
    walkEbml(b, 0, b.length) { (id, s, e) =>
      if (id == 0x1a45dfa3L) walkEbml(b, s, e) { (id2, s2, e2) =>
        if (id2 == 0x4282L) docType = new String(b, s2, e2 - s2, "ISO-8859-1").trim
      }
      else if (id == 0x18538067L) { // Segment
        sawSegment = true
        walkEbml(b, s, e) { (id2, s2, e2) =>
          if (id2 == 0x1549a966L) walkEbml(b, s2, e2) { (id3, s3, e3) => // Info
            if (id3 == 0x2ad7b1L) tsScale = ebmlUint(b, s3, e3)
            else if (id3 == 0x4489L) durationTicks = ebmlFloat(b, s3, e3)
          }
          else if (id2 == 0x1654ae6bL) walkEbml(b, s2, e2) { (id3, s3, e3) => // Tracks
            if (id3 == 0xaeL) walkEbml(b, s3, e3) { (id4, s4, e4) =>          // TrackEntry
              if (id4 == 0xe0L) walkEbml(b, s4, e4) { (id5, s5, e5) =>        // Video
                if (id5 == 0xb0L) width = math.max(width, ebmlUint(b, s5, e5).toInt)
                else if (id5 == 0xbaL) height = math.max(height, ebmlUint(b, s5, e5).toInt)
              }
            }
          }
        }
      }
    }
    if (!sawSegment) None
    else {
      val durationMs =
        if (durationTicks < 0) 0L else (durationTicks * tsScale / 1e6).toLong
      Some(Row(width, height, clampInt(durationMs), "video/" + docType))
    }
  }

  // ============================== MP3 ==================================

  private val Mpeg1BitratesL3 = // kbps, index 1..14
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val Mpeg2BitratesL3 =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
  private val SampleRates = Map( // by version bits
    3 -> Array(44100, 48000, 32000), // MPEG1
    2 -> Array(22050, 24000, 16000), // MPEG2
    0 -> Array(11025, 12000, 8000))  // MPEG2.5

  /** Skip an ID3v2 tag if present: "ID3" + version(2) + flags(1) +
    * syncsafe-28-bit size at bytes 6..9.
    */
  private def mp3Start(b: Array[Byte]): Int =
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3')
      10 + ((b(6) & 0x7f) << 21 | (b(7) & 0x7f) << 14 | (b(8) & 0x7f) << 7 | (b(9) & 0x7f))
    else 0

  /** Parse one MPEG audio Layer III frame header at p. Returns
    * (frameLengthBytes, bitrateKbps, sampleRate, channels, samplesPerFrame)
    * or None if p does not hold a valid header.
    */
  private def mp3Frame(b: Array[Byte], p: Int): Option[(Int, Int, Int, Int, Int)] = {
    if (p + 4 > b.length) return None
    if ((b(p) & 0xff) != 0xff || (b(p + 1) & 0xe0) != 0xe0) return None
    val version = (b(p + 1) >> 3) & 3   // 3=MPEG1, 2=MPEG2, 0=MPEG2.5, 1=reserved
    val layer = (b(p + 1) >> 1) & 3     // 1 = Layer III
    if (version == 1 || layer != 1) return None
    val bitrateIdx = (b(p + 2) >> 4) & 0xf
    val srIdx = (b(p + 2) >> 2) & 3
    if (bitrateIdx == 0 || bitrateIdx == 15 || srIdx == 3) return None
    val bitrate = (if (version == 3) Mpeg1BitratesL3 else Mpeg2BitratesL3)(bitrateIdx)
    val sampleRate = SampleRates(version)(srIdx)
    val padding = (b(p + 2) >> 1) & 1
    val channels = if (((b(p + 3) >> 6) & 3) == 3) 1 else 2
    val samplesPerFrame = if (version == 3) 1152 else 576
    val frameLen = samplesPerFrame / 8 * bitrate * 1000 / sampleRate + padding
    if (frameLen <= 4) None else Some((frameLen, bitrate, sampleRate, channels, samplesPerFrame))
  }

  /** MP3 metadata via a full frame walk (so VBR files count correctly):
    * requires ≥2 consecutive valid frame headers at the start (or after an
    * ID3v2 tag) to avoid false positives on arbitrary bytes with a 0xFFEx
    * pair. width = first-frame bitrate kbps, height = channels,
    * n_frames = frame count.
    */
  def decodeMp3(b: Array[Byte]): Option[Row] = {
    val start = mp3Start(b)
    mp3Frame(b, start).flatMap { case (len0, bitrate, sampleRate, channels, spf) =>
      // demand a second in-sync header (or exact end-of-data) before trusting
      if (start + len0 < b.length && mp3Frame(b, start + len0).isEmpty) None
      else {
        var frames = 0L
        var samples = 0L
        var p = start
        var ok = true
        while (ok && p + 4 <= b.length) {
          mp3Frame(b, p) match {
            case Some((len, _, _, _, s)) => frames += 1; samples += s; p += len
            case None => ok = false
          }
        }
        if (frames == 0) None
        else Some(Row(bitrate, channels, clampInt(frames), "audio/mpeg"))
      }
    }
  }

  private def clampInt(v: Long): Int =
    if (v > Int.MaxValue) Int.MaxValue else if (v < 0) 0 else v.toInt

  /** Container dispatch: MP4/MOV, then WebM/MKV, then MP3. */
  def decode(bytes: Array[Byte]): Option[Row] =
    decodeMp4(bytes).orElse(decodeMkv(bytes)).orElse(decodeMp3(bytes))
}
