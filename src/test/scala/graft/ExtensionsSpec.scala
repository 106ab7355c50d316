package graft

import org.apache.spark.sql.functions._

import graft.functions.{NativeText, Text}

/** The SQL function surface registered by [[GraftExtensions]]: installed
  * into an isolated child session (newSession → own FunctionRegistry), SQL
  * text must resolve every graft_* function and agree with the Column API.
  */
class ExtensionsSpec extends SparkTestBase {

  test("installed SQL functions match the Column-API native expressions") {
    val s = spark.newSession()
    GraftExtensions.install(s)
    import s.implicits._
    Seq("the quick brown fox jumps over the lazy dog", "a b", "")
      .toDF("text").createOrReplaceTempView("t")
    val viaSql = s.sql(
      """SELECT graft_simhash20(graft_shingle_hashes(text)) AS sh,
        |       graft_rolling_minhash8(text) AS fp
        |FROM t""".stripMargin).collect().map(r => (r.getLong(0), r.getLong(1)))
    val viaCol = s.table("t").select(
        NativeText.simhash20(NativeText.shingleHashesOfText(col("text"))).as("sh"),
        NativeText.rollingMinHash8(col("text")).as("fp"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaSql.toSeq == viaCol.toSeq)
  }

  test("graft_word_ngrams/graft_word_chunks/graft_morton2 resolve in SQL") {
    val s = spark.newSession()
    GraftExtensions.install(s)
    import s.implicits._
    Seq(("a b c d e", 3L, 5L)).toDF("text", "x", "y").createOrReplaceTempView("wt")
    val row = s.sql(
      """SELECT graft_word_ngrams(text, 2) AS g,
        |       graft_word_chunks(text, 2) AS c,
        |       graft_morton2(x, y) AS z
        |FROM wt""".stripMargin).head()
    assert(row.getSeq[String](0) == Seq("a b", "b c", "c d", "d e"))
    assert(row.getSeq[String](1) == Seq("a b", "c d"))
    // morton2(3=0b11, 5=0b101) = interleave x at even bits, y at odd:
    // x bits 1,1 -> bits 0,2; y bits 1,0,1 -> bits 1,3,5 => 0b100111 = 39
    assert(row.getLong(2) == 39L)
  }

  test("graft_dot_long and graft_micro_quantize resolve in SQL") {
    val s = spark.newSession()
    GraftExtensions.install(s)
    val out = s.sql(
      """SELECT graft_dot_long(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d,
        |       graft_micro_quantize(array(CAST(0.5 AS FLOAT))) AS q""".stripMargin)
      .collect().head
    assert(out.getLong(0) == 32L)
    assert(out.getSeq[Long](1) == Seq(500000L))
  }

  test("graft_topk_longs works as a SQL aggregate") {
    val s = spark.newSession()
    GraftExtensions.install(s)
    import s.implicits._
    Seq((1, 10L, 100L), (1, 30L, 101L), (1, 20L, 102L), (2, 5L, 103L))
      .toDF("g", "score", "id").createOrReplaceTempView("t")
    val rows = s.sql(
      """SELECT g, item.score, item.id
        |FROM (SELECT g, graft_topk_longs(score, id, 2) AS tk FROM t GROUP BY g)
        |LATERAL VIEW explode(tk) ex AS item
        |ORDER BY g, item.score DESC""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq((1, 30L, 101L), (1, 20L, 102L), (2, 5L, 103L)))
  }

  test("functions stay session-scoped until injected (extensions registrations exist)") {
    // The parent test session never ran install(): resolution must fail
    // there, proving injectFunction/install is what adds the surface.
    val err = intercept[Exception] {
      spark.sql("SELECT graft_simhash20(array(1L))").collect()
    }
    assert(err.getMessage.toLowerCase.contains("graft_simhash20"))
    assert(GraftExtensions.registrations.map(_._1.funcName).toSet.size == 12)
  }

  test("SQL-surface misuse fails at analysis, not mid-job") {
    val s = spark.newSession()
    GraftExtensions.install(s)
    // n <= 0 for the n-gram kernels: rejected at expression construction
    intercept[Exception](s.sql("SELECT graft_word_ngrams('a b c', 0)").collect())
    intercept[Exception](s.sql("SELECT graft_word_chunks('a b c', -3)").collect())
    // non-BIGINT CMS input: rejected by checkInputDataTypes at analysis
    intercept[Exception](
      s.sql("SELECT graft_countmin_longs(x, 4, 256) FROM (SELECT 'str' AS x)").collect())
    // unbounded d*w: rejected before any buffer allocation
    intercept[Exception](
      s.sql("SELECT graft_countmin_longs(x, 100000, 100000) FROM (SELECT 1L AS x)").collect())
    // the happy path still works in the same session
    val ok = s.sql("SELECT graft_word_ngrams('a b c', 2)").collect()
    assert(ok.head.getSeq[String](0) == Seq("a b", "b c"))
  }
}
