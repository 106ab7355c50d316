package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.AudioSystem

/** Multimodal (image/audio/video) column handling: content travels as an
  * opaque BINARY column next to typed metadata columns, and media-specific
  * work happens in a per-partition decode step.
  *
  * The Spark-side plumbing here — schema, batch iteration, partitioning —
  * is real and tested, and so are the JDK-reachable codecs:
  *  - images: [[decodeImage]] header-only metadata, [[imageFeatures]]
  *    pixel-grid descriptors, [[resizeImage]] Graphics2D scaling — all via
  *    javax.imageio (PNG/JPEG/GIF/BMP);
  *  - audio containers: [[decodeAudio]] header parse via
  *    javax.sound.sampled (WAV/AIFF/AU);
  *  - video/compressed-audio containers: [[Containers]] pure-byte header
  *    parsers for MP4/MOV (ISO BMFF box tree), WebM/MKV (EBML), and MP3
  *    (frame walk) — container metadata needs no codec.
  * Only bytes NONE of those recognize fall back to the deterministic
  * [[decodeStub]]; swap that one function for ffmpeg/JNI bindings without
  * touching anything else.
  *
  * Scale notes: decode is embarrassingly parallel and CPU-heavy, so the
  * frame should be repartitioned to ~cores before [[decodeMeta]] (no
  * shuffle otherwise — mapPartitions preserves partitioning); metadata-only
  * queries never touch the binary column thanks to Parquet column pruning.
  */
object Binary {

  /** Decoded-media metadata produced per row by the decode step. */
  val MetaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)))

  /** STUB for bytes no parser here recognizes (raw elementary streams,
    * exotic containers): derives deterministic fake dimensions from the
    * byte content. A real deployment replaces ONLY this function
    * (ffmpeg/JNI bindings). MP4/MOV, WebM/MKV and MP3 no longer reach it —
    * [[Containers]] parses those headers in pure JVM bytes.
    */
  def decodeStub(bytes: Array[Byte]): Row = {
    val n = bytes.length
    Row(n % 640 + 1, n % 480 + 1, n % 24 + 1, "fake/deterministic")
  }

  // In-memory ImageInputStreams by default spill through a temp-FILE cache;
  // per-record temp files on an executor are pure overhead for header reads.
  ImageIO.setUseCache(false)

  /** REAL image decode via the JDK's javax.imageio: sniffs the registered
    * reader from the byte signature and reads width/height/frame-count from
    * the container header WITHOUT decoding pixels (`ImageReader.getWidth`
    * parses only the header) — at 100 TB, metadata extraction must not pay
    * full pixel decode. Returns None for non-image bytes.
    */
  def decodeImage(bytes: Array[Byte]): Option[Row] = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis, true, true)
          // allowSearch: counts frames in multi-frame containers (GIF);
          // single-frame formats return 1 immediately.
          val frames = try math.max(reader.getNumImages(true), 1)
                       catch { case _: Exception => 1 }
          Some(Row(reader.getWidth(0), reader.getHeight(0), frames,
            "image/" + reader.getFormatName.toLowerCase))
        } catch { case _: Exception => None }
        finally reader.dispose()
      }
    } finally iis.close()
  }

  /** REAL audio metadata via the JDK's javax.sound.sampled: WAV/AIFF/AU
    * container headers parsed without decoding samples. The image-shaped
    * [[MetaSchema]] fields carry the audio facts under a documented
    * mapping: width := sample rate (Hz), height := channels,
    * n_frames := sample-frame count. Returns None for non-audio bytes.
    */
  def decodeAudio(bytes: Array[Byte]): Option[Row] =
    try {
      val fmt = AudioSystem.getAudioFileFormat(new ByteArrayInputStream(bytes))
      Some(Row(fmt.getFormat.getSampleRate.toInt, fmt.getFormat.getChannels,
        math.max(fmt.getFrameLength, 0), "audio/" + fmt.getType.getExtension))
    } catch { case _: Exception => None }

  /** The codec dispatch used by [[decodeMeta]]: real javax.imageio decode
    * for image bytes, real javax.sound.sampled header parse for audio
    * containers the JDK knows (WAV/AIFF/AU), real pure-byte *container*
    * parsers for MP4/MOV + WebM/MKV + MP3 ([[Containers]] — header
    * metadata needs no codec), deterministic stub only for bytes none of
    * those recognize.
    */
  def decode(bytes: Array[Byte]): Row =
    decodeImage(bytes).orElse(decodeAudio(bytes))
      .orElse(Containers.decode(bytes)).getOrElse(decodeStub(bytes))

  /** Attach an opaque binary column (here: utf8 of a text column — stands
    * in for real media bytes) plus its size and digest metadata. Pure
    * column expressions: map-only, codegen-friendly.
    */
  def withBinaryMeta(df: DataFrame, contentCol: String): DataFrame = {
    val bin = col(contentCol).cast("binary")
    df.withColumn("content", bin)
      .withColumn("n_bytes", length(bin).cast("long"))
      .withColumn("content_md5", md5(bin))
  }

  /** Per-partition decode: iterates rows, calls the codec once per row,
    * appends the metadata struct fields. The iterator-in/iterator-out shape
    * is the JVM analogue of mapInPandas batch processing — constant memory
    * per partition, no driver involvement.
    */
  def decodeMeta(df: DataFrame, binaryCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ MetaSchema.fields)
    val binIdx = df.schema.fieldIndex(binaryCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val decoded = decode(r.getAs[Array[Byte]](binIdx))
        Row.fromSeq(r.toSeq ++ decoded.toSeq)
      }
    }
    df.sparkSession.createDataFrame(rdd, outSchema)
  }

  /** Embedding dimensionality produced by [[featureStub]] — matches the
    * testdata `embeddings` table so extracted features flow directly into
    * the similarity operators (q36-q44). */
  val FeatureDim = 16

  /** REAL image features: mean luminance over a 4x4 spatial grid,
    * normalized to [-1, 1] — FeatureDim floats from actual decoded pixels
    * (the classic pre-neural "tiny thumbnail" visual descriptor; a model
    * deployment swaps this for an ONNX/JNI encoder without touching the
    * plumbing). Returns None for non-image bytes.
    */
  def imageFeatures(bytes: Array[Byte]): Option[Array[Float]] = {
    val img = try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
              catch { case _: Exception => None }
    img.map { im =>
      val grid = 4 // 4x4 = FeatureDim cells
      val out = new Array[Float](FeatureDim)
      val counts = new Array[Int](FeatureDim)
      var y = 0
      while (y < im.getHeight) {
        var x = 0
        while (x < im.getWidth) {
          val rgb = im.getRGB(x, y)
          val luma = ((rgb >> 16 & 0xff) * 299 + (rgb >> 8 & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
          val cell = math.min(y * grid / im.getHeight, grid - 1) * grid +
            math.min(x * grid / im.getWidth, grid - 1)
          out(cell) += luma
          counts(cell) += 1
          x += 1
        }
        y += 1
      }
      var c = 0
      while (c < FeatureDim) {
        out(c) = if (counts(c) == 0) -1.0f else out(c) / counts(c) / 127.5f - 1.0f
        c += 1
      }
      out
    }
  }

  /** STUB feature extractor for non-image media: a deterministic
    * byte-histogram projection to FeatureDim floats in [-1, 1].
    */
  def featureStub(bytes: Array[Byte]): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    var i = 0
    while (i < bytes.length) {
      out(java.lang.Byte.toUnsignedInt(bytes(i)) % FeatureDim) += 1.0f
      i += 1
    }
    val n = math.max(bytes.length, 1).toFloat
    var j = 0
    while (j < FeatureDim) { out(j) = out(j) * 2.0f / n - 1.0f; j += 1 }
    out
  }

  /** Feature dispatch: real pixel-grid features for images, byte-histogram
    * stub otherwise. */
  def features(bytes: Array[Byte]): Array[Float] =
    imageFeatures(bytes).getOrElse(featureStub(bytes))

  /** Per-partition feature extraction: appends an array<float> embedding
    * column. Same iterator shape as [[decodeMeta]]; the output column is
    * exactly the `embeddings.emb` schema, so `Exact.microQuantize` /
    * the ANN queries consume it unchanged.
    */
  def extractFeatures(df: DataFrame, binaryCol: String,
                      outCol: String = "emb"): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField(outCol, ArrayType(FloatType, containsNull = false), nullable = false))
    val binIdx = df.schema.fieldIndex(binaryCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map(r => Row.fromSeq(r.toSeq :+ features(r.getAs[Array[Byte]](binIdx)).toSeq))
    }
    df.sparkSession.createDataFrame(rdd, outSchema)
  }

  /** REAL image resize: decode → bilinear-ish Graphics2D scale to exactly
    * w×h → re-encode PNG. JDK-only. Returns None for non-image bytes.
    */
  def resizeImage(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] = {
    val img = try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
              catch { case _: Exception => None }
    img.map { im =>
      val dst = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(im, 0, 0, w, h, null)
      } finally g.dispose()
      val baos = new ByteArrayOutputStream()
      ImageIO.write(dst, "png", baos)
      baos.toByteArray
    }
  }

  /** STUB resize for non-image media: deterministic byte down/up-sampling
    * to exactly w*h bytes — preserves the real operator's contract (output
    * size is a function of the TARGET, not the input) so downstream
    * batch-shape logic is testable.
    */
  def resizeStub(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val target = w * h
    val out = new Array[Byte](target)
    if (bytes.nonEmpty) {
      var i = 0
      while (i < target) { out(i) = bytes((i.toLong * bytes.length / target).toInt); i += 1 }
    }
    out
  }

  /** Per-partition resize: binary-in/binary-out, constant memory. Images
    * get the real Graphics2D scale (output = PNG at w×h); other media fall
    * back to the byte-resampling stub. */
  def resize(df: DataFrame, binaryCol: String, w: Int, h: Int,
             outCol: String = "content_resized"): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType, nullable = false))
    val binIdx = df.schema.fieldIndex(binaryCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val b = r.getAs[Array[Byte]](binIdx)
        Row.fromSeq(r.toSeq :+ resizeImage(b, w, h).getOrElse(resizeStub(b, w, h)))
      }
    }
    df.sparkSession.createDataFrame(rdd, outSchema)
  }

  /** STUB frame sampler (the "video → every k-th frame" codec call):
    * treats the binary as fixed-size frames and returns n evenly-spaced
    * slices. Real deployment: ffmpeg keyframe extraction.
    */
  def frameSampleStub(bytes: Array[Byte], frameBytes: Int, n: Int): Seq[Array[Byte]] = {
    val frames = bytes.length / math.max(frameBytes, 1)
    if (frames == 0) return Seq.empty
    (0 until math.min(n, frames)).map { i =>
      val f = (i.toLong * frames / math.min(n, frames)).toInt
      bytes.slice(f * frameBytes, (f + 1) * frameBytes)
    }
  }

  /** Per-partition frame sampling: one row in → array<binary> of sampled
    * frames out. Pair with `explode` for a per-frame frame — the explode
    * happens AFTER the narrow decode stage, so frame fan-out parallelism
    * is recovered by the next shuffle, not paid during decode.
    */
  def sampleFrames(df: DataFrame, binaryCol: String, frameBytes: Int, n: Int,
                   outCol: String = "frames"): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField(outCol, ArrayType(BinaryType, containsNull = false), nullable = false))
    val binIdx = df.schema.fieldIndex(binaryCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map(r => Row.fromSeq(r.toSeq :+ frameSampleStub(r.getAs[Array[Byte]](binIdx), frameBytes, n)))
    }
    df.sparkSession.createDataFrame(rdd, outSchema)
  }
}
