package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling: content travels as an
  * opaque BINARY column next to typed metadata columns, and media-specific
  * work happens in a per-partition decode step.
  *
  * The Spark-side plumbing here — schema, batch iteration, partitioning —
  * is real and tested; the codec call itself is STUBBED with a
  * deterministic fake (this environment has no image/audio libraries).
  * Swap `decodeStub` for a real codec (javax.imageio, ffmpeg bindings, or
  * a Python mapInPandas stage in a PySpark deployment) without touching
  * anything else.
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

  /** STUB for the real codec: derives deterministic fake dimensions from
    * the byte content. A real deployment replaces ONLY this function.
    */
  def decodeStub(bytes: Array[Byte]): Row = {
    val n = bytes.length
    Row(n % 640 + 1, n % 480 + 1, n % 24 + 1, "fake/deterministic")
  }

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
        val decoded = decodeStub(r.getAs[Array[Byte]](binIdx))
        Row.fromSeq(r.toSeq ++ decoded.toSeq)
      }
    }
    df.sparkSession.createDataFrame(rdd, outSchema)
  }
}
