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
}
