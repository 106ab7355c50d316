package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.{Exact, MultiQueryTopK, NativeText}

/** Similarity-search / vector queries over the `embeddings` table
  * (vec_id BIGINT, embedding ARRAY<FLOAT> x64, label INT) — the ANN side of
  * an LLM-data pipeline (builder brief §LLM-ops; no counterpart in the
  * reference, which is pure relational ETL).
  *
  * Numeric design: every vector is quantized once to exact integer
  * micro-units (graft.functions.Exact.micro — deterministic, local), all
  * dot products / norms are exact BIGINT arithmetic, and the only floating
  * ops (one divide + sqrt for cosine) run over exact integer inputs — so
  * the values are bit-identical in any engine at any parallelism, and the
  * DuckDB oracle reproduces them exactly.
  *
  * Scale design:
  *  - brute-force kNN (q36) is the correctness baseline: a BROADCAST of the
  *    (tiny) query set against a linear scan of the corpus — no shuffle of
  *    the big side, scales to any corpus size at O(corpus x queries).
  *  - hyperplane LSH (q38/q39) is the scale path: bucket = sign pattern of
  *    8 (resp. 4) fixed pseudo-random hyperplanes; candidate generation is
  *    an EQUI-join on the bucket id — a plain hash join, never all-pairs.
  *    The planes are a deterministic LCG so both engines derive identical
  *    buckets from constants alone.
  */
object VectorQueries {

  val Dim = 64

  /** Deterministic pseudo-random hyperplane coefficient (plane p, dim d):
    * a classic LCG step over the flattened index, centered to +-2^30.
    * coef in [-2^30, 2^30); |coef * micro| <= 2^30 * ~2e5 ~ 2^48, and a
    * 64-term sum stays well under 2^63.
    */
  def coef(p: Int, d: Int): Long =
    ((1103515245L * (p * Dim + d) + 12345L) % 2147483648L) - 1073741824L

  private def planeCoefs(p: Int): Seq[Long] = (0 until Dim).map(d => coef(p, d))

  // ---- Spark-side kernels (over a pre-quantized `em` micro-int array) ----

  private val em = col("em")

  /** Exact integer dot — native codegen kernel (the interpreted
    * zip_with+aggregate form is the spec; see Exact.dotMicro + EngineProps).
    */
  private def dotCols(a: Column, b: Column): Column = NativeText.dotLong(a, b)

  private def planeDot(p: Int): Column =
    dotCols(em, typedlit(planeCoefs(p)))

  /** LSH bucket id from the sign pattern of `nPlanes` hyperplane dots. */
  private def bucket(nPlanes: Int): Column =
    (0 until nPlanes).map(p =>
      when(planeDot(p) > 0, lit(1L << p)).otherwise(lit(0L))).reduce(_ + _)

  /** vec_id, em (micro ints), nsq (exact squared norm). Repartitioned for
    * COMPUTE: the embeddings parquet is one small file -> one byte-sized
    * partition, but the dot/norm kernels are CPU-bound interpreted
    * higher-order functions — without the repartition one task serializes
    * every vector stage (same rule as TextQueries.docs).
    */
  private def quantized(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.embeddings(s, d)
      .repartition(col("vec_id"))
      .select(col("vec_id"), col("label"),
        NativeText.microQuantize(col("embedding")).as("em"))
      .withColumn("nsq", NativeText.dotLong(em, em))

  // ---- shared oracle SQL fragments --------------------------------------

  private val emCte =
    """em_t AS (
      |  SELECT vec_id, label,
      |         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS em
      |  FROM embeddings),
      |n_t AS (SELECT vec_id, label, em,
      |        CAST(list_sum(list_transform(em, m -> m * m)) AS BIGINT) AS nsq FROM em_t)""".stripMargin

  private def planeDotSql(p: Int): String = {
    val lst = planeCoefs(p).mkString("[", ", ", "]")
    s"list_sum(list_transform(generate_series(1, $Dim), i -> em[i] * ($lst)[i]))"
  }

  private def bucketSql(nPlanes: Int): String =
    (0 until nPlanes).map(p =>
      s"CASE WHEN ${planeDotSql(p)} > 0 THEN ${1L << p} ELSE 0 END").mkString("(", " + ", ")")

  private val cosSql = "CAST(dot AS DOUBLE) / sqrt(CAST(qn AS DOUBLE) * CAST(cn AS DOUBLE))"

  /** One Lloyd round as oracle CTEs: assign every vector to its nearest
    * cell from `prevCent` (exact integer L2, tie-break on cell id), then
    * recompute floored-mean centroids + norms. Emits a{r}_t, cell{r}_t,
    * s{r}_t (per-(cell, dim) cv and member count), c{r}_t, cn{r}_t.
    */
  private def lloydRoundSql(r: Int, prevCent: String): String =
    s"""a${r}_t AS (
       |  SELECT vec_id, em, nsq, cell,
       |         row_number() OVER (PARTITION BY vec_id ORDER BY
       |           nsq + cnorm - 2 * CAST(list_sum(list_transform(generate_series(1, $Dim),
       |             i -> em[i] * cvec[i])) AS BIGINT), cell) AS rnk_c
       |  FROM n_t CROSS JOIN $prevCent),
       |cell${r}_t AS (SELECT vec_id, em, nsq, cell FROM a${r}_t WHERE rnk_c = 1),
       |s${r}_t AS (
       |  SELECT cell, i AS dim,
       |         CAST(FLOOR(CAST(SUM(em[i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv,
       |         COUNT(*) AS n
       |  FROM cell${r}_t, generate_series(1, $Dim) t(i) GROUP BY 1, 2),
       |c${r}_t AS (SELECT cell, list(cv ORDER BY dim) AS cvec FROM s${r}_t GROUP BY 1),
       |cn${r}_t AS (SELECT cell, cvec,
       |             CAST(list_sum(list_transform(cvec, c -> c * c)) AS BIGINT) AS cnorm
       |             FROM c${r}_t)""".stripMargin

  // ---- shared Lloyd building blocks (q88 refinement, q89 SemDeDup) ----

  /** Floored-mean centroid array + exact norm per cell of an assigned
    * frame (vec_id, em, nsq, `key`): the k-means "update" step.
    */
  private def centFrom(assigned: org.apache.spark.sql.DataFrame, key: String) = assigned
    .select(col(key).as("cell"), posexplode(col("em")).as(Seq("dim0", "v")))
    .groupBy(col("cell"), (col("dim0") + 1).as("dim"))
    .agg(sum(col("v")).as("sv"), count(lit(1)).as("cnt"))
    .withColumn("cv", floor(col("sv").cast("double") / col("cnt")).cast("long"))
    .groupBy(col("cell"))
    .agg(transform(array_sort(collect_list(struct(col("dim"), col("cv")))),
      x => x.getField("cv")).as("cvec"))
    .withColumn("cnorm", NativeText.dotLong(col("cvec"), col("cvec")))

  /** Nearest-cell assignment of the quantized frame `n`: broadcast the
    * (tiny) centroid table, exact integer L2 via nsq + cnorm - 2*dot,
    * cell-id tie-break — the k-means "assign" step.
    */
  private def assign(n: org.apache.spark.sql.DataFrame,
                     cent: org.apache.spark.sql.DataFrame) = {
    val dist = col("nsq") + col("cnorm") -
      NativeText.dotLong(col("em"), col("cvec")) * 2L
    n.join(broadcast(cent))
      .withColumn("rnk_c", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(dist, col("cell"))))
      .filter(col("rnk_c") === 1)
      .select(col("vec_id"), col("em"), col("nsq"), col("cell"))
  }

  /** Two-round-Lloyd cell assignment from per-label seeds — q88's
    * refined coarse quantizer, reused as q89's clustering.
    */
  private def lloyd2Cells(s: org.apache.spark.sql.SparkSession, d: String) = {
    val n = quantized(s, d)
    assign(n, centFrom(assign(n, centFrom(n, "label")), "cell"))
  }

  /** Shared PQ oracle CTEs (q197/q199): sub-vector split, label-seeded +
    * one-Lloyd-round per-sub-space codebooks, corpus encode, ADC distance
    * table, approximate scores r_t(qid, vec_id, dot, cos). */
  private val pqAdcCtes: String =
    s"""ms AS (SELECT unnest(generate_series(0, 3)) AS m),
       |sn_t AS (
       |  SELECT vec_id, label, nsq, m, em[m*16+1 : m*16+16] AS sv,
       |         CAST(list_sum(list_transform(em[m*16+1 : m*16+16], x -> x * x)) AS BIGINT) AS snsq
       |  FROM n_t CROSS JOIN ms),
       |s0 AS (SELECT m, label AS code, i AS dim,
       |         CAST(FLOOR(CAST(SUM(sv[i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv
       |       FROM sn_t, generate_series(1, 16) t(i) GROUP BY 1, 2, 3),
       |cb0 AS (SELECT m, code, list(cv ORDER BY dim) AS cvec FROM s0 GROUP BY 1, 2),
       |cb0n AS (SELECT m, code, cvec,
       |         CAST(list_sum(list_transform(cvec, c -> c * c)) AS BIGINT) AS cnorm FROM cb0),
       |a1 AS (SELECT vec_id, m, sv, snsq, nsq, code,
       |         row_number() OVER (PARTITION BY vec_id, m ORDER BY
       |           snsq + cnorm - 2 * CAST(list_sum(list_transform(generate_series(1, 16),
       |             i -> sv[i] * cvec[i])) AS BIGINT), code) AS rnk
       |       FROM sn_t JOIN cb0n USING (m)),
       |asg1 AS (SELECT vec_id, m, sv, snsq, nsq, code FROM a1 WHERE rnk = 1),
       |s1 AS (SELECT m, code, i AS dim,
       |         CAST(FLOOR(CAST(SUM(sv[i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv
       |       FROM asg1, generate_series(1, 16) t(i) GROUP BY 1, 2, 3),
       |cb1 AS (SELECT m, code, list(cv ORDER BY dim) AS cvec FROM s1 GROUP BY 1, 2),
       |cb1n AS (SELECT m, code, cvec,
       |         CAST(list_sum(list_transform(cvec, c -> c * c)) AS BIGINT) AS cnorm FROM cb1),
       |a2 AS (SELECT vec_id, m, snsq, nsq, code,
       |         row_number() OVER (PARTITION BY vec_id, m ORDER BY
       |           snsq + cnorm - 2 * CAST(list_sum(list_transform(generate_series(1, 16),
       |             i -> sv[i] * cvec[i])) AS BIGINT), code) AS rnk
       |       FROM sn_t JOIN cb1n USING (m)),
       |enc AS (SELECT vec_id, m, code, nsq FROM a2 WHERE rnk = 1),
       |dt AS (SELECT q.vec_id AS qid, q.m, c.code,
       |         CAST(list_sum(list_transform(generate_series(1, 16),
       |           i -> q.sv[i] * c.cvec[i])) AS BIGINT) AS pdot
       |       FROM sn_t q JOIN cb1n c ON q.m = c.m WHERE q.vec_id < 10),
       |adc AS (SELECT dt.qid, e.vec_id, CAST(SUM(dt.pdot) AS BIGINT) AS dot,
       |               MAX(e.nsq) AS cn
       |        FROM enc e JOIN dt ON e.m = dt.m AND e.code = dt.code AND e.vec_id <> dt.qid
       |        GROUP BY 1, 2),
       |r_t AS (SELECT adc.qid, adc.vec_id, dot, $cosSql AS cos
       |        FROM adc JOIN (SELECT vec_id AS qid, nsq AS qn FROM n_t WHERE vec_id < 10) qt
       |               USING (qid))""".stripMargin

  val all: Seq[Q] = Seq(

    // ---- q36: brute-force cosine top-k — the exact-ANN baseline. The
    // query set (vec_id < 5) is broadcast; the corpus side is a single
    // linear scan with no shuffle of the vectors themselves; only the
    // (queries x k) result rows hit the window.
    Q("q36_embed_knn_brute",
      Some(
        s"""WITH $emCte,
           |p_t AS (
           |  SELECT q.vec_id AS qid, c.vec_id AS vid,
           |         CAST(list_sum(list_transform(generate_series(1, $Dim), i -> q.em[i] * c.em[i])) AS BIGINT) AS dot,
           |         q.nsq AS qn, c.nsq AS cn
           |  FROM n_t q JOIN n_t c ON q.vec_id < 5 AND c.vec_id <> q.vec_id),
           |r_t AS (SELECT qid, vid, dot, $cosSql AS cos FROM p_t),
           |k_t AS (SELECT qid, vid, dot, cos,
           |               row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rnk
           |        FROM r_t)
           |SELECT qid, vid AS vec_id, CAST(rnk AS BIGINT) AS rnk, dot, cos
           |FROM k_t WHERE rnk <= 10 ORDER BY qid, rnk""".stripMargin),
      (s, d) => {
        val n = quantized(s, d)
        val q = n.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("em").as("qm"), col("nsq").as("qn"))
        val pairs = n.join(broadcast(q), col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"),
            dotCols(col("em"), col("qm")).as("dot"), col("qn"), col("nsq").as("cn"))
        val cos = Exact.cosineMicro(col("dot"), col("qn"), col("cn"))
        pairs.withColumn("cos", cos)
          .withColumn("rnk", row_number().over(
            Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))).cast("long"))
          .filter(col("rnk") <= 10)
          .select(col("qid"), col("vec_id"), col("rnk"), col("dot"), col("cos"))
          .orderBy("qid", "rnk")
      }),

    // ---- q37: per-label centroid sums — posexplode to (label, dim, x),
    // exact micro-int sums per cell. Partial aggregation makes the shuffle
    // carry one row per (label, dim) per partition: labels x 64 rows, not
    // corpus-sized. (Centroids are the building block of IVF indexing.)
    Q("q37_embed_centroid",
      Some(
        s"""SELECT label, CAST(i - 1 AS BIGINT) AS dim,
           |       CAST(SUM(CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT)) AS BIGINT) AS sum_micro,
           |       COUNT(*) AS n
           |FROM embeddings, generate_series(1, $Dim) t(i)
           |GROUP BY 1, 2
           |ORDER BY label, dim""".stripMargin),
      (s, d) => Tables.embeddings(s, d)
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .groupBy(col("label"), col("dim").cast("long").as("dim"))
        .agg(sum(Exact.micro(col("x"))).as("sum_micro"),
          count(lit(1)).as("n"))
        .orderBy("label", "dim")),

    // ---- q38: LSH-bucketed ANN — 8 hyperplanes -> 256 buckets; query
    // vectors (vec_id < 20) only compare against SAME-BUCKET candidates via
    // an equi-join on bucket id, then exact cosine top-3. The approximate
    // counterpart of q36: candidate cost is corpus/256 per query instead of
    // the whole corpus, at the price of recall — the standard ANN tradeoff.
    Q("q38_embed_lsh_ann",
      Some(
        s"""WITH $emCte,
           |b_t AS (SELECT vec_id, em, nsq, ${bucketSql(8)} AS bucket FROM n_t),
           |c_t AS (
           |  SELECT q.vec_id AS qid, c.vec_id AS vid, q.em AS qm, c.em AS cm,
           |         q.nsq AS qn, c.nsq AS cn
           |  FROM b_t q JOIN b_t c ON c.bucket = q.bucket AND q.vec_id < 20 AND c.vec_id <> q.vec_id),
           |d_t AS (
           |  SELECT qid, vid,
           |         CAST(list_sum(list_transform(generate_series(1, $Dim), i -> qm[i] * cm[i])) AS BIGINT) AS dot,
           |         qn, cn
           |  FROM c_t),
           |r_t AS (SELECT qid, vid, dot, $cosSql AS cos FROM d_t),
           |k_t AS (SELECT qid, vid, dot, cos,
           |               row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rnk
           |        FROM r_t)
           |SELECT qid, vid AS vec_id, CAST(rnk AS BIGINT) AS rnk, dot, cos
           |FROM k_t WHERE rnk <= 3 ORDER BY qid, rnk""".stripMargin),
      (s, d) => {
        val b = quantized(s, d).withColumn("bucket", bucket(8))
        val q = b.filter(col("vec_id") < 20)
          .select(col("vec_id").as("qid"), col("em").as("qm"),
            col("nsq").as("qn"), col("bucket").as("qbucket"))
        val pairs = b.join(broadcast(q),
          col("bucket") === col("qbucket") && col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"),
            dotCols(col("em"), col("qm")).as("dot"), col("qn"), col("nsq").as("cn"))
        pairs
          .withColumn("cos", Exact.cosineMicro(col("dot"), col("qn"), col("cn")))
          .withColumn("rnk", row_number().over(
            Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))).cast("long"))
          .filter(col("rnk") <= 3)
          .select(col("qid"), col("vec_id"), col("rnk"), col("dot"), col("cos"))
          .orderBy("qid", "rnk")
      }),

    // ---- q44: IVF-style ANN — the inverted-file index shape: a coarse
    // quantizer (here: per-label centroids, i.e. the cells a k-means would
    // produce) assigns every vector to its nearest cell by exact integer
    // L2; queries probe ONLY their own cell (nprobe=1) and rank candidates
    // by exact cosine. At 100 TB the centroid table stays tiny (broadcast)
    // while the corpus is scanned once for assignment and then searched
    // per-cell — the classic IVF cost model, all equality joins.
    Q("q44_embed_ivf_ann",
      Some(
        s"""WITH $emCte,
           |s_t AS (
           |  SELECT label, i AS dim,
           |         CAST(FLOOR(CAST(SUM(em[i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv
           |  FROM n_t, generate_series(1, $Dim) t(i) GROUP BY 1, 2),
           |c_t AS (
           |  SELECT label AS clabel, list(cv ORDER BY dim) AS cvec FROM s_t GROUP BY 1),
           |cn_t AS (
           |  SELECT clabel, cvec,
           |         CAST(list_sum(list_transform(cvec, c -> c * c)) AS BIGINT) AS cnorm
           |  FROM c_t),
           |a_t AS (
           |  SELECT vec_id, em, nsq, clabel,
           |         row_number() OVER (PARTITION BY vec_id ORDER BY
           |           nsq + cnorm - 2 * CAST(list_sum(list_transform(generate_series(1, $Dim),
           |             i -> em[i] * cvec[i])) AS BIGINT), clabel) AS rnk_c
           |  FROM n_t CROSS JOIN cn_t),
           |cell_t AS (SELECT vec_id, em, nsq, clabel AS cell FROM a_t WHERE rnk_c = 1),
           |p_t AS (
           |  SELECT q.vec_id AS qid, c.vec_id AS vid,
           |         CAST(list_sum(list_transform(generate_series(1, $Dim), i -> q.em[i] * c.em[i])) AS BIGINT) AS dot,
           |         q.nsq AS qn, c.nsq AS cn
           |  FROM cell_t q JOIN cell_t c ON c.cell = q.cell AND q.vec_id < 10 AND c.vec_id <> q.vec_id),
           |r_t AS (SELECT qid, vid, dot, $cosSql AS cos FROM p_t),
           |k_t AS (SELECT qid, vid, dot, cos,
           |               row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rnk
           |        FROM r_t)
           |SELECT qid, vid AS vec_id, CAST(rnk AS BIGINT) AS rnk, dot, cos
           |FROM k_t WHERE rnk <= 3 ORDER BY qid, rnk""".stripMargin),
      (s, d) => {
        val n = quantized(s, d)
        // coarse quantizer: per-cell centroid micros (exact sums, floored mean)
        val cent = n
          .select(col("label"), posexplode(col("em")).as(Seq("dim0", "v")))
          .groupBy(col("label"), (col("dim0") + 1).as("dim"))
          .agg(sum(col("v")).as("sv"), count(lit(1)).as("cnt"))
          .withColumn("cv", floor(col("sv").cast("double") / col("cnt")).cast("long"))
          .groupBy(col("label").as("clabel"))
          .agg(transform(array_sort(collect_list(struct(col("dim"), col("cv")))),
            x => x.getField("cv")).as("cvec"))
          .withColumn("cnorm", NativeText.dotLong(col("cvec"), col("cvec")))
        // assignment: nearest cell by exact integer L2 (tie-break on label)
        val dist = col("nsq") + col("cnorm") -
          NativeText.dotLong(col("em"), col("cvec")) * 2L
        val assigned = n.join(broadcast(cent))
          .withColumn("rnk_c", row_number().over(
            Window.partitionBy(col("vec_id")).orderBy(dist, col("clabel"))))
          .filter(col("rnk_c") === 1)
          .select(col("vec_id"), col("em"), col("nsq"), col("clabel").as("cell"))
        // probe: same-cell candidates only, exact cosine top-3
        val q = assigned.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("em").as("qm"),
            col("nsq").as("qn"), col("cell").as("qcell"))
        val pairs = assigned.join(broadcast(q),
          col("cell") === col("qcell") && col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"),
            dotCols(col("em"), col("qm")).as("dot"), col("qn"), col("nsq").as("cn"))
        pairs
          .withColumn("cos", Exact.cosineMicro(col("dot"), col("qn"), col("cn")))
          .withColumn("rnk", row_number().over(
            Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))).cast("long"))
          .filter(col("rnk") <= 3)
          .select(col("qid"), col("vec_id"), col("rnk"), col("dot"), col("cos"))
          .orderBy("qid", "rnk")
      }),

    // ---- q65: IVF ANN with nprobe=2 — q44 with the recall knob turned:
    // each query probes its TWO nearest cells instead of one, softening the
    // recall cliff for queries near a cell boundary at exactly 2x the q44
    // probe cost (still equality joins on cell id; cells are disjoint so no
    // duplicate candidates). Measured at sf0.01 against the exact top-3
    // (q36-style brute force, vec_id < 10): nprobe=1 (q44) recall = 7/30,
    // nprobe=2 recall = 13/30 — near-doubled recall for doubled probe cost.
    // Both are low in absolute terms because the coarse quantizer is the 10
    // label centroids of a high-dim synthetic corpus (cells barely align
    // with cosine neighborhoods); a real deployment trains k-means cells
    // and raises nprobe until recall targets are met — the knob, not the
    // quantizer, is what this query adds.
    Q("q65_embed_ivf_nprobe2",
      Some(
        s"""WITH $emCte,
           |s_t AS (
           |  SELECT label, i AS dim,
           |         CAST(FLOOR(CAST(SUM(em[i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv
           |  FROM n_t, generate_series(1, $Dim) t(i) GROUP BY 1, 2),
           |c_t AS (
           |  SELECT label AS clabel, list(cv ORDER BY dim) AS cvec FROM s_t GROUP BY 1),
           |cn_t AS (
           |  SELECT clabel, cvec,
           |         CAST(list_sum(list_transform(cvec, c -> c * c)) AS BIGINT) AS cnorm
           |  FROM c_t),
           |a_t AS (
           |  SELECT vec_id, em, nsq, clabel,
           |         row_number() OVER (PARTITION BY vec_id ORDER BY
           |           nsq + cnorm - 2 * CAST(list_sum(list_transform(generate_series(1, $Dim),
           |             i -> em[i] * cvec[i])) AS BIGINT), clabel) AS rnk_c
           |  FROM n_t CROSS JOIN cn_t),
           |cell_t AS (SELECT vec_id, em, nsq, clabel AS cell FROM a_t WHERE rnk_c = 1),
           |probe_t AS (
           |  SELECT vec_id AS qid, em AS qm, nsq AS qn, clabel AS pcell
           |  FROM a_t WHERE vec_id < 10 AND rnk_c <= 2),
           |p_t AS (
           |  SELECT q.qid, c.vec_id AS vid,
           |         CAST(list_sum(list_transform(generate_series(1, $Dim), i -> q.qm[i] * c.em[i])) AS BIGINT) AS dot,
           |         q.qn, c.nsq AS cn
           |  FROM probe_t q JOIN cell_t c ON c.cell = q.pcell AND c.vec_id <> q.qid),
           |r_t AS (SELECT qid, vid, dot, CAST(dot AS DOUBLE) / sqrt(CAST(qn AS DOUBLE) * CAST(cn AS DOUBLE)) AS cos FROM p_t),
           |k_t AS (SELECT qid, vid, dot, cos,
           |               row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rnk
           |        FROM r_t)
           |SELECT qid, vid AS vec_id, CAST(rnk AS BIGINT) AS rnk, dot, cos
           |FROM k_t WHERE rnk <= 3 ORDER BY qid, rnk""".stripMargin),
      (s, d) => {
        val n = quantized(s, d)
        val cent = n
          .select(col("label"), posexplode(col("em")).as(Seq("dim0", "v")))
          .groupBy(col("label"), (col("dim0") + 1).as("dim"))
          .agg(sum(col("v")).as("sv"), count(lit(1)).as("cnt"))
          .withColumn("cv", floor(col("sv").cast("double") / col("cnt")).cast("long"))
          .groupBy(col("label").as("clabel"))
          .agg(transform(array_sort(collect_list(struct(col("dim"), col("cv")))),
            x => x.getField("cv")).as("cvec"))
          .withColumn("cnorm", NativeText.dotLong(col("cvec"), col("cvec")))
        val dist = col("nsq") + col("cnorm") -
          NativeText.dotLong(col("em"), col("cvec")) * 2L
        // one centroid-ranked frame serves both corpus assignment (rnk_c=1)
        // and query probe lists (rnk_c<=2)
        val ranked = n.join(broadcast(cent))
          .withColumn("rnk_c", row_number().over(
            Window.partitionBy(col("vec_id")).orderBy(dist, col("clabel"))))
        val assigned = ranked.filter(col("rnk_c") === 1)
          .select(col("vec_id"), col("em"), col("nsq"), col("clabel").as("cell"))
        val probes = ranked.filter(col("vec_id") < 10 && col("rnk_c") <= 2)
          .select(col("vec_id").as("qid"), col("em").as("qm"),
            col("nsq").as("qn"), col("clabel").as("pcell"))
        val pairs = assigned.join(broadcast(probes),
          col("cell") === col("pcell") && col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id"),
            dotCols(col("em"), col("qm")).as("dot"), col("qn"), col("nsq").as("cn"))
        pairs
          .withColumn("cos", Exact.cosineMicro(col("dot"), col("qn"), col("cn")))
          .withColumn("rnk", row_number().over(
            Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))).cast("long"))
          .filter(col("rnk") <= 3)
          .select(col("qid"), col("vec_id"), col("rnk"), col("dot"), col("cos"))
          .orderBy("qid", "rnk")
      }),

    // ---- q39: embedding-cosine near-duplicate pairs — the vector-space
    // dedup screen. 4 hyperplanes -> 16 coarse buckets; only same-bucket
    // pairs (i < j) are compared (a self-equi-join on bucket, shuffle
    // partitioned by bucket id), then exact cosine >= 0.4 keeps the
    // near-dups. At 100 TB the bucket count scales up (more planes) to keep
    // per-bucket pair counts bounded.
    Q("q39_embed_neardup_cos",
      Some(
        s"""WITH $emCte,
           |b_t AS (SELECT vec_id, em, nsq, ${bucketSql(4)} AS bucket FROM n_t),
           |p_t AS (
           |  SELECT a.vec_id AS i, b.vec_id AS j,
           |         CAST(list_sum(list_transform(generate_series(1, $Dim), k -> a.em[k] * b.em[k])) AS BIGINT) AS dot,
           |         a.nsq AS qn, b.nsq AS cn
           |  FROM b_t a JOIN b_t b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
           |r_t AS (SELECT i, j, dot, $cosSql AS cos FROM p_t)
           |SELECT i, j, dot, cos FROM r_t WHERE cos >= 0.4 ORDER BY i, j""".stripMargin),
      (s, d) => {
        // r15: b feeds both sides of the bucket self-join — persist so
        // the quantize + norm + 4 hyperplane-dot kernels run once
        graft.operators.CacheScope.release("q39")
        val b = graft.operators.CacheScope.persist("q39",
          quantized(s, d).withColumn("bucket", bucket(4))
            .select(col("vec_id"), col("em"), col("nsq"), col("bucket")))
        val pairs = b.as("a").join(b.as("b"),
          col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
          .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"),
            dotCols(col("a.em"), col("b.em")).as("dot"),
            col("a.nsq").as("qn"), col("b.nsq").as("cn"))
        pairs
          .withColumn("cos", Exact.cosineMicro(col("dot"), col("qn"), col("cn")))
          .filter(col("cos") >= 0.4)
          .select(col("i"), col("j"), col("dot"), col("cos"))
          .orderBy("i", "j")
      }),

    // ---- q88: Lloyd-refined coarse quantizer — the k-means step the IVF
    // family (q44/q65) was missing: their cells are raw per-label means,
    // and ScaleBench r5 measured the cost of unrefined seeds directly
    // (nprobe=1 recall decaying 0.82 -> 0.53 at Q=10k). Two Lloyd rounds,
    // each = ONE broadcast of the (tiny, cells x 64) centroid table
    // against a corpus scan for assignment + ONE per-(cell, dim)
    // partial-agg shuffle for the floored-mean update — at 100 TB the
    // corpus never shuffles, only (cells x dims)-sized partials do, and
    // rounds are a constant (2-3 suffice for a coarse quantizer; the knob
    // a deployment turns). Every step is exact integer arithmetic (L2 via
    // nsq + cnorm - 2*dot on micros, floored means, cell-id tie-break),
    // so DuckDB reproduces the full iteration bit-for-bit — an
    // oracle-checkable k-means, which float k-means can never be. An
    // emptied cell simply vanishes from the output in both engines.
    // Output: final per-(cell, dim) centroid micros + member count.
    Q("q88_kmeans_lloyd",
      Some(
        s"""WITH $emCte,
           |s0_t AS (
           |  SELECT label AS cell, i AS dim,
           |         CAST(FLOOR(CAST(SUM(em[i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv
           |  FROM n_t, generate_series(1, $Dim) t(i) GROUP BY 1, 2),
           |c0_t AS (SELECT cell, list(cv ORDER BY dim) AS cvec FROM s0_t GROUP BY 1),
           |cn0_t AS (SELECT cell, cvec,
           |          CAST(list_sum(list_transform(cvec, c -> c * c)) AS BIGINT) AS cnorm
           |          FROM c0_t),
           |${lloydRoundSql(1, "cn0_t")},
           |${lloydRoundSql(2, "cn1_t")}
           |SELECT cell, CAST(dim AS BIGINT) AS dim, cv, CAST(n AS BIGINT) AS n
           |FROM s2_t
           |ORDER BY cell, dim""".stripMargin),
      (s, d) => {
        val a2 = lloyd2Cells(s, d)
        a2.select(col("cell"), posexplode(col("em")).as(Seq("dim0", "v")))
          .groupBy(col("cell"), (col("dim0") + 1).cast("long").as("dim"))
          .agg(floor(sum(col("v")).cast("double") / count(lit(1))).cast("long").as("cv"),
            count(lit(1)).as("n"))
          .orderBy("cell", "dim")
      }),

    // ---- q89: semantic dedup (SemDeDup, Abbas et al. 2023 shape) — the
    // embedding-space dedup modality the text family can't see: documents
    // that SAY the same thing in different words have distant shingle
    // fingerprints but near-identical embeddings. Cluster with the
    // Lloyd-refined coarse quantizer (q88's exact-integer k-means — the
    // composition is the point: the quantizer IS the dedup's blocking
    // structure), then compare pairs WITHIN a cell only and drop the
    // higher vec_id of any pair with exact cosine >= 0.4 (greedy
    // keep-lowest-id, the deterministic survivor rule). At 100 TB the
    // quadratic term is bounded per cell: cells scale with corpus count
    // (more centroids, same per-cell population), the centroid table
    // stays broadcastable, and the pair join is an equi-join on cell id —
    // never all-pairs (the same cost model as q44's probe; a vector's
    // semantic duplicates land in its own cell because near-identical
    // embeddings get identical nearest-centroid assignments except
    // exactly at cell boundaries — the recall knob is nprobe-style
    // neighbor-cell comparison, not a wider join).
    // Output: every vector with its cell and whether it survives.
    Q("q89_semdedup",
      Some(
        s"""WITH $emCte,
           |s0_t AS (
           |  SELECT label AS cell, i AS dim,
           |         CAST(FLOOR(CAST(SUM(em[i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv
           |  FROM n_t, generate_series(1, $Dim) t(i) GROUP BY 1, 2),
           |c0_t AS (SELECT cell, list(cv ORDER BY dim) AS cvec FROM s0_t GROUP BY 1),
           |cn0_t AS (SELECT cell, cvec,
           |          CAST(list_sum(list_transform(cvec, c -> c * c)) AS BIGINT) AS cnorm
           |          FROM c0_t),
           |${lloydRoundSql(1, "cn0_t")},
           |${lloydRoundSql(2, "cn1_t")},
           |p_t AS (
           |  SELECT a.vec_id AS i, b.vec_id AS j,
           |         CAST(list_sum(list_transform(generate_series(1, $Dim), k -> a.em[k] * b.em[k])) AS BIGINT) AS dot,
           |         a.nsq AS qn, b.nsq AS cn
           |  FROM cell2_t a JOIN cell2_t b ON a.cell = b.cell AND a.vec_id < b.vec_id),
           |d_t AS (SELECT DISTINCT j FROM p_t WHERE $cosSql >= 0.4)
           |SELECT c.vec_id, c.cell, (d.j IS NULL) AS kept
           |FROM cell2_t c LEFT JOIN d_t d ON c.vec_id = d.j
           |ORDER BY c.vec_id""".stripMargin),
      (s, d) => {
        // one Lloyd pipeline serves three consumers (both pair sides +
        // the final flag join): persist, scoped like q80/q63
        graft.operators.CacheScope.release("q89")
        val cells = graft.operators.CacheScope.persist("q89", lloyd2Cells(s, d))
        val dups = cells.as("a").join(cells.as("b"),
          col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
          .select(col("b.vec_id").as("j"),
            dotCols(col("a.em"), col("b.em")).as("dot"),
            col("a.nsq").as("qn"), col("b.nsq").as("cn"))
          .filter(Exact.cosineMicro(col("dot"), col("qn"), col("cn")) >= 0.4)
          .select(col("j").as("vec_id")).distinct()
          .withColumn("dup", lit(true))
        cells.select(col("vec_id"), col("cell"))
          .join(dups, Seq("vec_id"), "left")
          .select(col("vec_id"), col("cell"), col("dup").isNull.as("kept"))
          .orderBy("vec_id")
      }),

    // ---- q190: embedding hygiene audit — the vector-data-quality pass
    // run BEFORE any index build trusts the column: per label, the
    // vector count, the number of DISTINCT dimensionalities observed
    // (anything but 1 means a broken producer — ANN math silently
    // degrades on mixed dims), zero vectors (cosine-undefined), and the
    // mean L2 norm in exact micro units (the corrected integer sqrt per
    // row, summed then floored — un-normalized embeddings show up here
    // as a mean far from 1e6). Map-side per-row math + one labels-sized
    // rollup.
    Q("q190_embedding_hygiene",
      Some(s"""WITH $emCte,
              |i0 AS (SELECT label, len(em) AS d, nsq,
              |         CAST(floor(sqrt(CAST(nsq AS DOUBLE))) AS BIGINT) AS s0 FROM n_t),
              |i1 AS (SELECT label, d, nsq,
              |         s0 + (CASE WHEN (s0 + 1) * (s0 + 1) <= nsq THEN 1 ELSE 0 END) AS s1 FROM i0),
              |i2 AS (SELECT label, d, nsq,
              |         s1 - (CASE WHEN s1 * s1 > nsq THEN 1 ELSE 0 END) AS nrm FROM i1)
              |SELECT CAST(label AS BIGINT) AS label,
              |       CAST(COUNT(*) AS BIGINT) AS n_vecs,
              |       CAST(COUNT(DISTINCT d) AS BIGINT) AS n_dims,
              |       CAST(SUM(CASE WHEN nsq = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
              |       CAST(SUM(nrm) // COUNT(*) AS BIGINT) AS mean_norm_micro
              |FROM i2 GROUP BY 1 ORDER BY label""".stripMargin),
      (s, d) => {
        def isqrtCorrected(v: Column) = {
          val s0 = floor(sqrt(v.cast("double"))).cast("long")
          val s1 = s0 + when((s0 + 1L) * (s0 + 1L) <= v, 1L).otherwise(0L)
          s1 - when(s1 * s1 > v, 1L).otherwise(0L)
        }
        quantized(s, d)
          .select(col("label").cast("long").as("label"),
            size(col("em")).cast("long").as("d"), col("nsq"))
          .withColumn("nrm", isqrtCorrected(col("nsq")))
          .groupBy("label")
          .agg(count(lit(1)).as("n_vecs"),
            countDistinct(col("d")).as("n_dims"),
            sum(when(col("nsq") === 0L, 1L).otherwise(0L)).as("n_zero"),
            expr("sum(nrm) div count(1)").as("mean_norm_micro"))
          .orderBy("label")
      }),

    // ---- q197: product-quantization ANN (Jégou et al. 2011 shape, exact
    // integer arithmetic throughout) — the compressed-domain scoring path
    // IVF alone doesn't give: the 64-dim vector splits into M=4 16-dim
    // sub-vectors, each sub-space trains its own 10-code codebook (label
    // seeds + one Lloyd refinement round — the q88 machinery per
    // sub-space), and every corpus vector is ENCODED as 4 small codes.
    // Query scoring is asymmetric distance computation: the query stays
    // exact, a (queries × M × codes) distance TABLE is precomputed, and
    // each candidate's approximate dot is 4 table lookups + a sum instead
    // of 64 multiplies. What that FLOP cut buys was MEASURED, not
    // assumed (rounds 9-10, 2M×128-dim, M=16): through per-pair join
    // machinery the cut is invisible (~20-25 ns/pair floors both
    // kernels), but through the batched MultiQueryTopK scan (r11:
    // row-block/query-outer tiling — each query's 4 KB table stays
    // L1-resident across a 1024-row block) the kernel win is measured
    // at 5.3× vs the batched exact dot (adc scan 12.3 s vs dot 65.7 s,
    // 2M×128d, Q=2000, scalebench_r11), compounded by the 8× scan-byte
    // cut (16 codes + norm vs 128 longs/row: the working set that
    // decides whether a 100 TB pass is memory- or disk-bound). The
    // honest caveats, both MEASURED: (1) at LOW dims the comparison
    // inverts — a SIMD-vectorized 16-mult dot beats 8 serial gathers,
    // so the dims=16 composition keeps the exact kernel; (2) shortlist
    // volume — on corpora whose true-neighbor sets scale with N, the
    // re-rank eats the kernel win, so the production composition is
    // IVFADC proper: RESIDUAL encoding + per-(query,cell) tables
    // through the grouped kernel, which at 2M×128d beats the composed
    // exact dot 1.56× at IDENTICAL 0.928 recall (4.5 s vs 7.1 s,
    // Q=200, R=128 constant in corpus size — scalebench_r11
    // pq128.ivf_np4_*).
    // Everything is equality joins: encode is a
    // broadcast of the 40-row codebook, ADC is a broadcast of the
    // 400-row distance table; the corpus is never shuffled on anything
    // but its own id. Recall vs the exact q36 baseline is measured in
    // ScaleBench (the q189 audit discipline).
    Q("q197_pq_ann",
      Some(
        s"""WITH $emCte,
           |$pqAdcCtes,
           |k_t AS (SELECT qid, vec_id, dot, cos,
           |          row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rnk
           |        FROM r_t)
           |SELECT qid, vec_id, CAST(rnk AS BIGINT) AS rnk, dot AS adc_dot, cos
           |FROM k_t WHERE rnk <= 3 ORDER BY qid, rnk""".stripMargin),
      (s, d) => pqTop3(s, d, "q197")),

    // ---- q199: PQ shortlist + exact re-rank (the ADC+R composition,
    // Jégou et al. §IV) — q197's approximate scores decide only a
    // top-20 SHORTLIST per query; the final top-3 comes from exact
    // integer dots on those ≤20 candidates. This is the production
    // answer to "PQ ranks are approximate": the compressed scan prunes
    // 99.999% of the corpus at 4 lookups/vector, the exact math runs on
    // a per-query constant. ScaleBench measures the effect at 2M
    // vectors (re-rank recovers recall 1.0 from raw-ADC ~0.7); this
    // declares the composition itself as an oracle-checked operator —
    // the shortlist, the re-rank join shape, and the tie-breaks all
    // reproduce bit-for-bit in DuckDB.
    Q("q199_pq_rerank",
      Some(
        s"""WITH $emCte,
           |$pqAdcCtes,
           |k_t AS (SELECT qid, vec_id, cos,
           |          row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rnk
           |        FROM r_t),
           |sl AS (SELECT qid, vec_id FROM k_t WHERE rnk <= 20),
           |ex AS (SELECT sl.qid, sl.vec_id,
           |         CAST(list_sum(list_transform(generate_series(1, $Dim),
           |           i -> q.em[i] * cd.em[i])) AS BIGINT) AS dot,
           |         q.nsq AS qn, cd.nsq AS cn
           |       FROM sl JOIN n_t q ON q.vec_id = sl.qid
           |              JOIN n_t cd ON cd.vec_id = sl.vec_id),
           |rr AS (SELECT qid, vec_id, dot, $cosSql AS cos FROM ex),
           |f AS (SELECT qid, vec_id, dot, cos,
           |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rnk
           |      FROM rr)
           |SELECT qid, vec_id, CAST(rnk AS BIGINT) AS rnk, dot, cos
           |FROM f WHERE rnk <= 3 ORDER BY qid, rnk""".stripMargin),
      (s, d) => {
        val short = pqAdcScores(s, d, "q199")
          .withColumn("rnk", row_number().over(
            Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))))
          .filter(col("rnk") <= 20)
          .select(col("qid"), col("vec_id"))
        val n = quantized(s, d)
        val q = n.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("em").as("qm"), col("nsq").as("qn"))
        n.select(col("vec_id"), col("em"), col("nsq").as("cn"))
          .join(broadcast(short), Seq("vec_id"))
          .join(broadcast(q), Seq("qid"))
          .select(col("qid"), col("vec_id"),
            dotCols(col("em"), col("qm")).as("dot"), col("qn"), col("cn"))
          .withColumn("cos", Exact.cosineMicro(col("dot"), col("qn"), col("cn")))
          .withColumn("rnk", row_number().over(
            Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))).cast("long"))
          .filter(col("rnk") <= 3)
          .select(col("qid"), col("vec_id"), col("rnk"), col("dot"), col("cos"))
          .orderBy("qid", "rnk")
      }),

    // ---- q204: BATCHED brute kNN — q36's exact semantics re-planned as
    // ONE corpus pass. The pair-join form (q36) materializes corpus x Q
    // join rows and pays Spark's per-row machinery (~20-25 ns/pair) per
    // SCORE; here the whole query set rides in as a single broadcast row
    // of (qid, vector, norm) structs, MultiQueryTopK loads each corpus
    // vector once into a primitive scratch buffer and scores all queries
    // in a tight JIT'd loop, and partial aggregation ships only k rows
    // per query per partition. Same bit-exact cosine, same (cos DESC, id)
    // order, self-inclusive (rank 1 is the query itself at cos 1.0) —
    // the oracle is the plain window formulation.
    Q("q204_knn_batch_scan",
      Some(
        s"""WITH $emCte,
           |p_t AS (
           |  SELECT q.vec_id AS qid, c.vec_id AS vid,
           |         CAST(list_sum(list_transform(generate_series(1, $Dim), i -> q.em[i] * c.em[i])) AS BIGINT) AS dot,
           |         q.nsq AS qn, c.nsq AS cn
           |  FROM n_t q JOIN n_t c ON q.vec_id < 8),
           |r_t AS (SELECT qid, vid, $cosSql AS cos FROM p_t),
           |k_t AS (SELECT qid, vid, cos,
           |               row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rnk
           |        FROM r_t)
           |SELECT qid, vid AS vec_id, CAST(rnk AS BIGINT) AS rnk, cos
           |FROM k_t WHERE rnk <= 10 ORDER BY qid, rnk""".stripMargin),
      (s, d) => {
        val n = quantized(s, d)
        // the query set travels as a real BROADCAST, not a joined column
        // (which would copy the whole table into every corpus row at the
        // aggregate boundary) and not a plan literal (which ships it in
        // every task binary): once per executor, primitive arrays
        val qt = n.filter(col("vec_id") < 8)
          .select(col("vec_id"), col("em"), col("nsq")).collect()
          .map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2))).toSeq
        n.groupBy()
          .agg(MultiQueryTopK.dotTopK(col("vec_id"), col("em"), col("nsq"),
            qt, 10).as("res"))
          .select(explode(col("res")).as("r"))
          .select(col("r.qid").as("qid"), posexplode(col("r.tk")).as(Seq("pos", "e")))
          .select(col("qid"), col("e.id").as("vec_id"),
            (col("pos") + 1).cast("long").as("rnk"), col("e.cos").as("cos"))
          .orderBy("qid", "rnk")
      }),

    // ---- q225: IVF × the batched kernel — the 100 TB ANN plan the two
    // halves were each missing (VERDICT r9 #2): q44 probes the right
    // cells but scores them through the pair-join machinery (~20-25
    // ns/pair floor); q204 scores through the batched kernel but scans
    // the WHOLE corpus. Composed: corpus rows keep only the PROBED
    // cells (a broadcast semi-join on cell id — at scale, a partition-
    // pruned read), each cell's own probing queries ride in as that
    // cell's broadcast query-table row, and groupBy(cell) +
    // MultiQueryTopK scores every cell against exactly its probers in
    // one tight pass — per-group table decode (the buffer-held tables
    // this round added) is what makes heterogeneous per-cell query
    // sets correct. Exact q44 semantics (nprobe=1, top-3 by exact
    // cosine, self excluded): the kernel returns top-4 including self,
    // the final 10×4-row re-rank drops self — identical oracle. Scan
    // cost: probed cells only × (queries in that cell), never
    // cells × all queries and never corpus × Q join rows.
    Q("q225_ivf_batch",
      Some(
        s"""WITH $emCte,
           |s_t AS (
           |  SELECT label, i AS dim,
           |         CAST(FLOOR(CAST(SUM(em[i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv
           |  FROM n_t, generate_series(1, $Dim) t(i) GROUP BY 1, 2),
           |c_t AS (
           |  SELECT label AS clabel, list(cv ORDER BY dim) AS cvec FROM s_t GROUP BY 1),
           |cn_t AS (
           |  SELECT clabel, cvec,
           |         CAST(list_sum(list_transform(cvec, c -> c * c)) AS BIGINT) AS cnorm
           |  FROM c_t),
           |a_t AS (
           |  SELECT vec_id, em, nsq, clabel,
           |         row_number() OVER (PARTITION BY vec_id ORDER BY
           |           nsq + cnorm - 2 * CAST(list_sum(list_transform(generate_series(1, $Dim),
           |             i -> em[i] * cvec[i])) AS BIGINT), clabel) AS rnk_c
           |  FROM n_t CROSS JOIN cn_t),
           |cell_t AS (SELECT vec_id, em, nsq, clabel AS cell FROM a_t WHERE rnk_c = 1),
           |p_t AS (
           |  SELECT q.vec_id AS qid, c.vec_id AS vid,
           |         CAST(list_sum(list_transform(generate_series(1, $Dim), i -> q.em[i] * c.em[i])) AS BIGINT) AS dot,
           |         q.nsq AS qn, c.nsq AS cn
           |  FROM cell_t q JOIN cell_t c ON c.cell = q.cell AND q.vec_id < 10 AND c.vec_id <> q.vec_id),
           |r_t AS (SELECT qid, vid, $cosSql AS cos FROM p_t),
           |k_t AS (SELECT qid, vid, cos,
           |               row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rnk
           |        FROM r_t)
           |SELECT qid, vid AS vec_id, CAST(rnk AS BIGINT) AS rnk, cos
           |FROM k_t WHERE rnk <= 3 ORDER BY qid, rnk""".stripMargin),
      (s, d) => {
        import graft.operators.CacheScope
        CacheScope.release("q225")
        val n = quantized(s, d)
        val cent = n
          .select(col("label"), posexplode(col("em")).as(Seq("dim0", "v")))
          .groupBy(col("label"), (col("dim0") + 1).as("dim"))
          .agg(sum(col("v")).as("sv"), count(lit(1)).as("cnt"))
          .withColumn("cv", floor(col("sv").cast("double") / col("cnt")).cast("long"))
          .groupBy(col("label").as("clabel"))
          .agg(transform(array_sort(collect_list(struct(col("dim"), col("cv")))),
            x => x.getField("cv")).as("cvec"))
          .withColumn("cnorm", NativeText.dotLong(col("cvec"), col("cvec")))
        val dist = col("nsq") + col("cnorm") -
          NativeText.dotLong(col("em"), col("cvec")) * 2L
        // persisted: the byCell collect below AND the corpus pass both
        // read the assignment — without the persist each re-runs the
        // centroid broadcast-join (one redundant pass per query)
        val assigned = CacheScope.persist("q225", n.join(broadcast(cent))
          .withColumn("rnk_c", row_number().over(
            Window.partitionBy(col("vec_id")).orderBy(dist, col("clabel"))))
          .filter(col("rnk_c") === 1)
          .select(col("vec_id"), col("em"), col("nsq"), col("clabel").as("cell")))
        // per-cell query tables as a BROADCAST MAP (cell → its probers):
        // each group's buffer decodes exactly its own query set, keyed
        // by the group column — zero per-row table bytes (q204's note)
        val byCell = assigned.filter(col("vec_id") < 10)
          .select(col("cell").cast("long"), col("vec_id"), col("em"), col("nsq"))
          .collect()
          .map(r => (r.getLong(0), (r.getLong(1), r.getSeq[Long](2), r.getLong(3))))
          .groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).toSeq }
        // corpus keeps only PROBED cells (at scale: partition pruning),
        // then ONE batched pass per cell: k=4 covers top-3 + self
        val perCell = assigned
          .filter(col("cell").cast("long").isin(byCell.keys.toSeq: _*))
          .groupBy(col("cell"))
          .agg(MultiQueryTopK.dotTopKGrouped(col("vec_id"), col("em"), col("nsq"),
            col("cell").cast("long"), byCell, 4).as("res"))
          .select(explode(col("res")).as("r"))
          .select(col("r.qid").as("qid"), explode(col("r.tk")).as("e"))
          .select(col("qid"), col("e.id").as("vec_id"), col("e.cos").as("cos"))
        // drop self, re-rank the ≤4 survivors per query, keep top-3
        perCell.filter(col("vec_id") =!= col("qid"))
          .withColumn("rnk", row_number().over(
            Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))).cast("long"))
          .filter(col("rnk") <= 3)
          .select(col("qid"), col("vec_id"), col("rnk"), col("cos"))
          .orderBy("qid", "rnk")
      })
  )

  /** q197's full ADC pipeline: sub-vector split, label-seeded + one-round
    * Lloyd per-sub-space codebooks, corpus encode, broadcast distance
    * table, approximate (qid, vec_id, dot, cn, qn, cos) scores.
    */
  private def pqAdcScores(s: org.apache.spark.sql.SparkSession, d: String,
                          scope: String): org.apache.spark.sql.DataFrame = {
        import org.apache.spark.sql.DataFrame
        import graft.functions.PqCodebook
        import graft.operators.CacheScope
        val M = 4; val SubDim = 16
        CacheScope.release(scope)
        val n = quantized(s, d)
        // sub-vector frame: one row per (vec_id, sub-space) — persisted:
        // codebook seed, both Lloyd passes, and the query side all read it
        val sub = CacheScope.persist(scope, n
          .select(col("vec_id"), col("label"), col("nsq"),
            explode(array((0 until M).map(m => struct(lit(m).as("m"),
              slice(col("em"), m * SubDim + 1, SubDim).as("sv"))): _*)).as("x"))
          .select(col("vec_id"), col("label"), col("nsq"),
            col("x.m").as("m"), col("x.sv").as("sv"))
          .withColumn("snsq", NativeText.dotLong(col("sv"), col("sv"))))
        // r16 (guide §1.2/§2.3/§2.4): the codebook is bounded by
        // construction (M × codes = 40 rows), so each Lloyd step COLLECTS
        // it — one map-side-partial aggregation (SubDim element_at sums +
        // count over 40 groups, no posexplode fan-out, no second agg) and
        // the floored-mean finalize runs on the driver with the identical
        // arithmetic (Long→Double division + floor). The 40-row collect
        // is the q204 bounded-metadata pattern, not a driver data loop.
        def cbCollect(assigned: DataFrame, key: Column): (PqCodebook, Seq[(Int, Long, Seq[Long])]) = {
          val aggs = (0 until SubDim).map(i =>
            sum(element_at(col("sv"), i + 1)).as(s"s$i")) :+ count(lit(1)).as("cnt")
          val entries = assigned
            .groupBy(col("m"), key.cast("long").as("code"))
            .agg(aggs.head, aggs.tail: _*)
            .collect()
            .map { r =>
              val cnt = r.getLong(SubDim + 2)
              val cvec = (0 until SubDim).map(i =>
                math.floor(r.getLong(2 + i).toDouble / cnt).toLong)
              (r.getInt(0), r.getLong(1), cvec)
            }.sortBy(e => (e._1, e._2)).toSeq
          val mOff = new Array[Int](M + 1)
          entries.foreach(e => mOff(e._1 + 1) += 1)
          (1 to M).foreach(m => mOff(m) += mOff(m - 1))
          (new PqCodebook(SubDim, mOff, entries.map(_._2).toArray,
            entries.map(_._3.map(v => v * v).sum).toArray,
            entries.flatMap(_._3).toArray), entries)
        }
        // Lloyd chain: label-seeded codebook → map-side re-assign →
        // rebuilt codebook. The assignment is the PqArgminExpr kernel
        // evaluated per (vec, m) row — the former broadcast-join ×codes
        // fan-out and its (vec_id, m) min-struct aggregation exchange
        // (corpus×M rows carrying 16-long arrays) are gone entirely; the
        // kernel computes the identical (l2, code)-ordered argmin (snsq
        // is constant per row, so (cnorm − 2·dot, code) ordering is the
        // same — see PqCodebook).
        val (cb0, _) = cbCollect(sub, col("label"))
        val (cb1, cb1Entries) = cbCollect(
          sub.withColumn("code", NativeText.pqArgmin(col("m"), col("sv"), cb0)),
          col("code"))
        val enc = sub.select(col("vec_id"), col("m"),
          NativeText.pqArgmin(col("m"), col("sv"), cb1).as("code"), col("nsq"))
        // ADC distance table: queries stay exact; 10 × 4 × 10 rows. The
        // codebook side is the collected cb1 as a local relation.
        val cbDf = s.createDataFrame(cb1Entries).toDF("m", "code", "cvec")
        val dt = sub.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("m"), col("sv").as("qv"))
          .join(broadcast(cbDf), Seq("m"))
          .select(col("qid"), col("m"), col("code"),
            NativeText.dotLong(col("qv"), col("cvec")).as("pdot"))
        val qn = n.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("nsq").as("qn"))
        enc.join(broadcast(dt), Seq("m", "code"))
          .filter(col("vec_id") =!= col("qid"))
          .groupBy(col("qid"), col("vec_id"))
          .agg(sum(col("pdot")).as("dot"), max(col("nsq")).as("cn"))
          .join(broadcast(qn), Seq("qid"))
          .withColumn("cos", Exact.cosineMicro(col("dot"), col("qn"), col("cn")))
  }

  /** q197's declared shape: approximate ADC top-3 per query. */
  private def pqTop3(s: org.apache.spark.sql.SparkSession, d: String,
                     scope: String): org.apache.spark.sql.DataFrame =
    pqAdcScores(s, d, scope)
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("qid"), col("vec_id"), col("rnk"), col("dot").as("adc_dot"), col("cos"))
      .orderBy("qid", "rnk")
}
