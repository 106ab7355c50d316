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
