package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.MultiQueryTopK

/** The batched multi-query top-k scan must be a pure plan rewrite of the
  * pair-join formulation: exact mode's output must EQUAL the
  * crossJoin+window top-k (any partitioning), union mode's shortlist must
  * CONTAIN the exact global top-k per query (an element of the global
  * top-k is in its partition's top-k by pigeonhole), and ADC mode must
  * reproduce hand-computed lookup sums. A wrong merge or heap order here
  * would silently cost recall, which no oracle catches.
  */
class MultiQueryTopKSpec extends SparkTestBase {

  import spark.implicits._

  private val dim = 8
  // Deterministic integer vectors; ids 0..59, values in [-50, 50].
  private def corpus: DataFrame = spark.range(60).toDF("id")
    .withColumn("em", transform(sequence(lit(1), lit(dim)), i =>
      pmod(xxhash64(col("id") * 31L + i.cast("long")), lit(101L)) - 50L))
    .withColumn("nsq", aggregate(transform(col("em"), x => x * x), lit(0L), (a, v) => a + v))

  private def qtabsOf(q: DataFrame): DataFrame =
    q.agg(collect_list(struct(col("id").as("qid"), col("em").as("tab"),
      col("nsq").as("qnsq"))).as("qtabs"))

  private def windowTopK(k: Int): Set[(Long, Long, Long)] = {
    val pairs = corpus.crossJoin(broadcast(corpus.filter(col("id") < 4)
        .select(col("id").as("qid"), col("em").as("qem"), col("nsq").as("qnsq"))))
      .select(col("qid"), col("id"),
        aggregate(zip_with(col("em"), col("qem"), (a, b) => a * b), lit(0L), (a, v) => a + v).as("dot"),
        col("nsq"), col("qnsq"))
      .withColumn("cos", col("dot").cast("double") /
        sqrt(col("nsq").cast("double") * col("qnsq").cast("double")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("id"))).cast("long"))
      .filter(col("rnk") <= k)
    pairs.select("qid", "rnk", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  private def batched(k: Int, parts: Int, exact: Boolean): DataFrame = {
    val c = corpus.repartition(parts)
    // the production input form: query tables as a broadcast
    val qt = corpus.filter(col("id") < 4).select(col("id"), col("em"), col("nsq"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2))).toSeq
    val agg = if (exact)
      MultiQueryTopK.dotTopK(col("id"), col("em"), col("nsq"), qt, k)
    else
      MultiQueryTopK.dotShortlist(col("id"), col("em"), col("nsq"), qt, k)
    c.groupBy()
      .agg(agg.as("res"))
      .select(explode(col("res")).as("r"))
      .select(col("r.qid").as("qid"), posexplode(col("r.tk")).as(Seq("pos", "e")))
      .select(col("qid"), (col("pos") + 1).cast("long").as("rnk"),
        col("e.id").as("id"), col("e.cos").as("cos"))
  }

  test("exact mode equals crossJoin+window top-k under multiple partitionings") {
    val expected = windowTopK(5)
    for (parts <- Seq(1, 7)) {
      val got = batched(5, parts, exact = true)
        .select("qid", "rnk", "id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expected, s"parts=$parts")
    }
  }

  test("exact mode emits the same cos doubles as the declarative plan") {
    val cosB = batched(5, 7, exact = true)
      .select("qid", "id", "cos").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val c = corpus
    val pairs = c.crossJoin(broadcast(c.filter(col("id") < 4)
        .select(col("id").as("qid"), col("em").as("qem"), col("nsq").as("qnsq"))))
      .select(col("qid"), col("id"),
        (aggregate(zip_with(col("em"), col("qem"), (a, b) => a * b), lit(0L), (a, v) => a + v)
          .cast("double") /
          sqrt(col("nsq").cast("double") * col("qnsq").cast("double"))).as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    cosB.foreach { case (key, v) =>
      assert(java.lang.Double.doubleToRawLongBits(pairs(key)) ==
        java.lang.Double.doubleToRawLongBits(v), s"cos mismatch at $key")
    }
  }

  test("union shortlist contains the exact global top-k for every query") {
    val exact = windowTopK(3).map { case (qid, _, id) => (qid, id) }
    val got = batched(3, 7, exact = false)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.subsetOf(got),
      s"missing: ${exact.diff(got)}")
    // bounded: at most parts x k per query
    val perQ = got.groupBy(_._1).map(_._2.size)
    assert(perQ.forall(_ <= 7 * 3))
  }

  test("adc mode reproduces hand-computed lookup sums") {
    val m = 4; val subK = 4
    // corpus: 6 rows of codes in [0,subK); nsq fixed 25
    val codes = Seq(
      (0L, Seq(0L, 1L, 2L, 3L)), (1L, Seq(3L, 2L, 1L, 0L)), (2L, Seq(0L, 0L, 0L, 0L)),
      (3L, Seq(1L, 1L, 1L, 1L)), (4L, Seq(2L, 3L, 0L, 1L)), (5L, Seq(3L, 3L, 3L, 3L)))
    val enc = codes.toDF("id", "codes").withColumn("nsq", lit(25L))
    // one query, table slot = m*subK + code; tab(s) = (s+1)^2, qnsq = 16
    val tab = (0 until m * subK).map(s => ((s + 1).toLong * (s + 1)))
    val qt = Seq((7L, tab, 16L)).toDF("qid", "tab", "qnsq")
      .agg(collect_list(struct(col("qid"), col("tab"), col("qnsq"))).as("qtabs"))
    val got = enc.repartition(3).crossJoin(broadcast(qt))
      .groupBy()
      .agg(MultiQueryTopK.adcTopK(col("id"), col("codes"), col("nsq"), col("qtabs"),
        3, subK).as("res"))
      .select(explode(col("res")).as("r"))
      .select(col("r.qid").as("qid"), posexplode(col("r.tk")).as(Seq("pos", "e")))
      .select(col("qid"), (col("pos") + 1).as("rnk"),
        col("e.id").as("id"), col("e.cos").as("cos"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._2)
    val expected = codes.map { case (id, cs) =>
      val dot = cs.zipWithIndex.map { case (c, i) => tab(i * subK + c.toInt) }.sum
      (id, dot.toDouble / math.sqrt(25.0 * 16.0))
    }.sortBy { case (id, cos) => (-cos, id) }.take(3)
    assert(got.length == 3)
    expected.zipWithIndex.foreach { case ((id, cos), i) =>
      val (gq, grnk, gid, gcos) = got(i)
      assert(gq == 7L && grnk == i + 1 && gid == id && gcos == cos)
    }
  }

  test("grouped aggregation decodes query tables PER GROUP (the IVF " +
      "composition): each cell scores against exactly its own queries") {
    // cells 0/1/2 partition the corpus by id % 3; each cell is probed by
    // its own query (ids 0, 1, 2 — which live in their own cells). An
    // instance-level table cache would score every cell against the
    // FIRST cell's queries; per-group decode must keep them apart.
    val cells = corpus.withColumn("cell", pmod(col("id"), lit(3L)))
    val byCell = cells.filter(col("id") < 3)
      .select(col("cell"), col("id"), col("em"), col("nsq")).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getSeq[Long](2), r.getLong(3))))
      .groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).toSeq }
    val got = cells.repartition(4)
      .groupBy(col("cell"))
      .agg(MultiQueryTopK.dotTopKGrouped(col("id"), col("em"), col("nsq"),
        col("cell"), byCell, 5).as("res"))
      .select(explode(col("res")).as("r"))
      .select(col("r.qid").as("qid"), posexplode(col("r.tk")).as(Seq("pos", "e")))
      .select(col("qid"), (col("pos") + 1).cast("long").as("rnk"),
        col("e.id").as("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // reference: per-query window top-5 restricted to the query's own cell
    val ref = cells.as("c").join(
        broadcast(cells.filter(col("id") < 3).select(col("id").as("qid"),
          col("em").as("qem"), col("nsq").as("qnsq"), col("cell").as("qcell"))),
        col("c.cell") === col("qcell"))
      .select(col("qid"), col("c.id").as("id"),
        aggregate(zip_with(col("c.em"), col("qem"), (a, b) => a * b),
          lit(0L), (a, v) => a + v).as("dot"),
        col("c.nsq").as("nsq"), col("qnsq"))
      .withColumn("cos", col("dot").cast("double") /
        sqrt(col("nsq").cast("double") * col("qnsq").cast("double")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("id"))).cast("long"))
      .filter(col("rnk") <= 5)
      .select("qid", "rnk", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == ref,
      s"per-group tables diverged from per-cell window top-k:\n got=$got\n ref=$ref")
  }
}
