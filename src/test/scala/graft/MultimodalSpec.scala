package graft

import graft.multimodal.Binary

/** Binary-column plumbing: schema, digest metadata, per-partition decode
  * batching (the codec itself is a deterministic stub — see Binary.scala).
  */
class MultimodalSpec extends SparkTestBase {

  import org.apache.spark.sql.functions._

  private lazy val docs = {
    import spark.implicits._
    Seq((1L, "tiny payload"), (2L, "a somewhat longer opaque media payload"),
      (3L, "x")).toDF("doc_id", "text")
  }

  test("withBinaryMeta: byte length and md5 over the binary column") {
    val out = Binary.withBinaryMeta(docs, "text").orderBy("doc_id").collect()
    assert(out.map(_.getAs[Long]("n_bytes")).toSeq == Seq(12L, 38L, 1L))
    // md5 of utf8 bytes matches Spark's string md5 (ascii content)
    val md5s = docs.select(md5(col("text"))).orderBy("doc_id").collect().map(_.getString(0))
    assert(out.map(_.getAs[String]("content_md5")).toSeq sameElements md5s)
  }

  test("decodeMeta: per-partition decode appends deterministic metadata") {
    val out = Binary.decodeMeta(
      Binary.withBinaryMeta(docs, "text").repartition(2), "content")
    val rows = out.orderBy("doc_id").collect()
    rows.foreach { r =>
      val n = r.getAs[Long]("n_bytes").toInt
      assert(r.getAs[Int]("width") == n % 640 + 1)
      assert(r.getAs[Int]("height") == n % 480 + 1)
      assert(r.getAs[Int]("n_frames") == n % 24 + 1)
      assert(r.getAs[String]("format") == "fake/deterministic")
    }
    // decode ran per-partition without reshuffling: partition count preserved
    assert(out.rdd.getNumPartitions == 2)
  }

  /** Real encoded image bytes, generated in-memory with the JDK encoder. */
  private def imageBytes(w: Int, h: Int, format: String): Array[Byte] = {
    import java.awt.image.BufferedImage
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, (x * 31 + y * 7) & 0xffffff)
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, format, baos), s"no $format encoder")
    baos.toByteArray
  }

  test("decodeMeta: REAL javax.imageio decode of PNG/JPEG/GIF dimensions") {
    import spark.implicits._
    val media = Seq(
      (1L, imageBytes(7, 5, "png")),
      (2L, imageBytes(64, 48, "jpg")),
      (3L, imageBytes(3, 9, "gif")),
      (4L, "not an image at all".getBytes("UTF-8"))) // audio/video stand-in
      .toDF("doc_id", "content")
    val rows = Binary.decodeMeta(media.repartition(2), "content")
      .orderBy("doc_id").collect()
    // true decoded dimensions, not byte-length fakes
    assert(rows(0).getAs[Int]("width") == 7 && rows(0).getAs[Int]("height") == 5)
    assert(rows(0).getAs[String]("format") == "image/png")
    assert(rows(1).getAs[Int]("width") == 64 && rows(1).getAs[Int]("height") == 48)
    assert(rows(1).getAs[String]("format").startsWith("image/jp"))
    assert(rows(2).getAs[Int]("width") == 3 && rows(2).getAs[Int]("height") == 9)
    assert(rows(2).getAs[String]("format") == "image/gif")
    assert(rows.take(3).forall(_.getAs[Int]("n_frames") == 1))
    // non-image bytes fall back to the documented audio/video stub
    assert(rows(3).getAs[String]("format") == "fake/deterministic")
  }

  /** Real WAV bytes: PCM silence encoded with the JDK's own writer. */
  private def wavBytes(sampleRate: Int, channels: Int, frames: Int): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream}
    val fmt = new AudioFormat(sampleRate.toFloat, 16, channels, true, false)
    val data = new Array[Byte](frames * fmt.getFrameSize)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais, AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  test("decodeAudio: REAL WAV header parse (rate/channels/frames)") {
    val r = Binary.decodeAudio(wavBytes(sampleRate = 8000, channels = 2, frames = 1600))
    assert(r.isDefined)
    assert(r.get.getInt(0) == 8000, "sample rate in the width slot")
    assert(r.get.getInt(1) == 2, "channels in the height slot")
    assert(r.get.getInt(2) == 1600, "frame count")
    assert(r.get.getString(3) == "audio/wav")
    // dispatch order: audio bytes reach the audio decoder through decode()
    assert(Binary.decode(wavBytes(44100, 1, 10)).getString(3) == "audio/wav")
  }

  test("imageFeatures: grid luminance from real pixels, not byte counts") {
    import java.awt.image.BufferedImage
    def solid(rgb: Int): Array[Byte] = {
      val img = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 8; y <- 0 until 8) img.setRGB(x, y, rgb)
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val black = Binary.imageFeatures(solid(0x000000)).get
    val white = Binary.imageFeatures(solid(0xffffff)).get
    assert(black.length == Binary.FeatureDim && white.length == Binary.FeatureDim)
    assert(black.forall(v => math.abs(v - (-1.0f)) < 1e-3), black.toSeq.toString)
    assert(white.forall(v => math.abs(v - 1.0f) < 0.02), white.toSeq.toString)
  }

  test("resize: images get a REAL scale — output decodes at target size") {
    val in = imageBytes(16, 12, "png")
    val out = Binary.resizeImage(in, 4, 3).get
    val meta = Binary.decodeImage(out).get
    assert(meta.getInt(0) == 4 && meta.getInt(1) == 3)
    // the Spark-side dispatch picks the real path for image bytes
    import spark.implicits._
    val df = Seq((1L, in)).toDF("doc_id", "content")
    val resized = Binary.resize(df, "content", 4, 3).collect().head
      .getAs[Array[Byte]]("content_resized")
    assert(Binary.decodeImage(resized).get.getInt(0) == 4)
  }

  test("decodeImage: header-only read survives truncated pixel data") {
    // Keep the PNG signature + IHDR (dimensions live in the first 33 bytes)
    // but drop the pixel chunks: metadata extraction must not need them.
    val full = imageBytes(11, 13, "png")
    val header = full.take(40)
    val r = Binary.decodeImage(header)
    assert(r.isDefined && r.get.getInt(0) == 11 && r.get.getInt(1) == 13)
  }

  test("extractFeatures: embedding column has the similarity-pipeline schema") {
    val out = Binary.extractFeatures(Binary.withBinaryMeta(docs, "text"), "content")
    val field = out.schema("emb")
    assert(field.dataType.simpleString == "array<float>")
    val rows = out.orderBy("doc_id").collect()
    rows.foreach { r =>
      val emb = r.getSeq[Float](r.fieldIndex("emb"))
      assert(emb.length == Binary.FeatureDim)
      assert(emb.forall(v => v >= -1.0f && v <= 1.0f))
    }
    // deterministic: same bytes -> same embedding
    assert(Binary.featureStub("abc".getBytes).toSeq == Binary.featureStub("abc".getBytes).toSeq)
  }

  test("resize: output is exactly w*h bytes regardless of input size") {
    val out = Binary.resize(Binary.withBinaryMeta(docs, "text"), "content", 4, 3)
    out.collect().foreach { r =>
      assert(r.getAs[Array[Byte]]("content_resized").length == 12)
    }
    // empty input stays all-zero but correctly sized
    assert(Binary.resizeStub(Array.empty[Byte], 2, 2).length == 4)
  }

  // ---- hand-crafted container fixtures (pure bytes, no codec needed) ----

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def mp4Box(typ: String, payload: Array[Byte]): Array[Byte] =
    be32(payload.length + 8L) ++ typ.getBytes("ISO-8859-1") ++ payload

  /** Minimal valid MP4: ftyp + moov(mvhd v0 + trak(tkhd v0)). */
  private def mp4Bytes(w: Int, h: Int, timescale: Int, duration: Int): Array[Byte] = {
    val ftyp = mp4Box("ftyp", "isom".getBytes ++ be32(512) ++ "isom".getBytes)
    // mvhd v0: version/flags, ctime, mtime, timescale, duration (24 bytes)
    val mvhd = mp4Box("mvhd",
      be32(0) ++ be32(0) ++ be32(0) ++ be32(timescale.toLong) ++ be32(duration.toLong) ++ be32(0))
    // tkhd v0: version/flags + 72 bytes of fixed fields, then 16.16 w/h
    val tkhd = mp4Box("tkhd",
      be32(0) ++ new Array[Byte](72) ++ be32(w.toLong << 16) ++ be32(h.toLong << 16))
    ftyp ++ mp4Box("moov", mvhd ++ mp4Box("trak", tkhd))
  }

  test("Containers: MP4 box-tree walk yields dimensions + duration, no codec") {
    import graft.multimodal.Containers
    // 90210 ticks at timescale 1000 = 90210 ms
    val r = Containers.decodeMp4(mp4Bytes(640, 360, 1000, 90210)).get
    assert(r.getInt(0) == 640 && r.getInt(1) == 360)
    assert(r.getInt(2) == 90210, "duration ms in the n_frames slot")
    assert(r.getString(3) == "video/mp4")
    // timescale division: 7 ticks at timescale 1 = 7000 ms
    assert(Containers.decodeMp4(mp4Bytes(16, 16, 1, 7)).get.getInt(2) == 7000)
    // dispatch: container bytes reach the MP4 parser through Binary.decode
    assert(Binary.decode(mp4Bytes(640, 360, 1000, 1000)).getString(3) == "video/mp4")
    // garbage never parses as MP4
    assert(Containers.decodeMp4("XXXXftypnope".getBytes).isEmpty)
    assert(Containers.decodeMp4(Array[Byte](1, 2, 3)).isEmpty)
  }

  /** Minimal EBML/WebM: header(DocType) + Segment(Info + Tracks(Video)). */
  private def webmBytes(w: Int, h: Int, durationTicks: Float): Array[Byte] = {
    def el(id: Array[Byte], payload: Array[Byte]): Array[Byte] = {
      require(payload.length < 127)
      id ++ Array((0x80 | payload.length).toByte) ++ payload
    }
    def uint(v: Long): Array[Byte] =
      if (v < 256) Array(v.toByte)
      else if (v < 65536) Array((v >> 8).toByte, v.toByte)
      else be32(v)
    val header = el(Array(0x1a.toByte, 0x45.toByte, 0xdf.toByte, 0xa3.toByte),
      el(Array(0x42.toByte, 0x82.toByte), "webm".getBytes))
    val info = el(Array(0x15.toByte, 0x49.toByte, 0xa9.toByte, 0x66.toByte),
      el(Array(0x2a.toByte, 0xd7.toByte, 0xb1.toByte), uint(1000000L)) ++
        el(Array(0x44.toByte, 0x89.toByte), be32(java.lang.Float.floatToIntBits(durationTicks).toLong & 0xffffffffL)))
    val video = el(Array(0xe0.toByte),
      el(Array(0xb0.toByte), uint(w.toLong)) ++ el(Array(0xba.toByte), uint(h.toLong)))
    val tracks = el(Array(0x16.toByte, 0x54.toByte, 0xae.toByte, 0x6b.toByte),
      el(Array(0xae.toByte), video))
    header ++ el(Array(0x18.toByte, 0x53.toByte, 0x80.toByte, 0x67.toByte), info ++ tracks)
  }

  test("Containers: WebM/MKV EBML walk yields dimensions + duration") {
    import graft.multimodal.Containers
    val r = Containers.decodeMkv(webmBytes(1920, 1080, durationTicks = 12345f)).get
    assert(r.getInt(0) == 1920 && r.getInt(1) == 1080)
    // 12345 ticks * 1,000,000 ns/tick = 12345 ms
    assert(r.getInt(2) == 12345)
    assert(r.getString(3) == "video/webm")
    assert(Binary.decode(webmBytes(2, 2, 1f)).getString(3) == "video/webm")
    assert(Containers.decodeMkv("random bytes".getBytes).isEmpty)
  }

  /** Minimal MP3: ID3v2 tag + n CBR frames (MPEG1 Layer III 128kbps 44.1k). */
  private def mp3Bytes(nFrames: Int): Array[Byte] = {
    val id3 = "ID3".getBytes ++ Array[Byte](3, 0, 0, 0, 0, 0, 10) ++ new Array[Byte](10)
    // 0xFFFB: MPEG1 Layer III no-CRC; 0x90: bitrate idx 9 (128k), sr idx 0
    // (44100), no padding; 0x00: stereo. frameLen = 144*128000/44100 = 417.
    val frame = Array(0xff.toByte, 0xfb.toByte, 0x90.toByte, 0x00.toByte) ++ new Array[Byte](413)
    id3 ++ Array.fill(nFrames)(frame).flatten
  }

  test("Containers: MP3 frame walk yields bitrate/channels/frame count") {
    import graft.multimodal.Containers
    val r = Containers.decodeMp3(mp3Bytes(3)).get
    assert(r.getInt(0) == 128, "bitrate kbps in the width slot")
    assert(r.getInt(1) == 2, "channels in the height slot")
    assert(r.getInt(2) == 3, "frame count")
    assert(r.getString(3) == "audio/mpeg")
    assert(Binary.decode(mp3Bytes(2)).getString(3) == "audio/mpeg")
    // a lone 0xFFEx pair in arbitrary data is NOT accepted (needs 2 in-sync
    // frames or exact end-of-data)
    val junk = Array(0xff.toByte, 0xfb.toByte, 0x90.toByte, 0x00.toByte) ++
      Array.fill(500)(0x55.toByte)
    assert(Containers.decodeMp3(junk).isEmpty)
  }

  test("sampleFrames + explode: per-frame rows with bounded fan-out") {
    import spark.implicits._
    val vids = Seq((1L, Array.fill[Byte](40)(7)), (2L, Array.fill[Byte](7)(1)),
      (3L, Array.empty[Byte])).toDF("vid", "content")
    val sampled = Binary.sampleFrames(vids, "content", frameBytes = 10, n = 3)
    val perVid = sampled.select(col("vid"), size(col("frames")).as("nf"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(perVid == Map(1L -> 3, 2L -> 0, 3L -> 0))  // 40B/10B = 4 frames, capped at 3
    val frames = sampled.select(col("vid"), explode(col("frames")).as("frame"))
      .collect()
    assert(frames.length == 3)
    assert(frames.forall(_.getAs[Array[Byte]]("frame").length == 10))
  }
}
