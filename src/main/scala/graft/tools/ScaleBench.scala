package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{NativeText, Text}

/** Scale stress for the dedup family: a SYNTHESIZED corpus orders of
  * magnitude past sf0.1 (default 2M docs ≈ 30× the sf0.1 documents table by
  * rows × tokens), with duplicates injected BY CONSTRUCTION so recall is
  * checkable without an oracle:
  *
  *  - ids ≡ 5 (mod 10) repeat the text of id-1 → N/10 exact-dup pairs;
  *  - ids ≡ 9 (mod 10) copy id-1 and flip the LAST token → N/10 near-dup
  *    pairs at Jaccard ≈ (k-2)/(k+2) for k-token docs (≈ 0.87 at k=28).
  *
  * Corpus text is generated distributively (spark.range → hash-derived
  * tokens; no driver-side data), so N scales to whatever the box holds.
  * Three pipelines run over it, each the declared-query shape:
  *
  *  1. exact dedup  — md5 groupBy (q28 shape);
  *  2. MinHash LSH  — 8 minhashes, 4 bands, band equi-join + exact
  *     shingle-Jaccard ≥ 0.5 verify (q34 shape);
  *  3. SimHash      — 20-bit fingerprint, 4×5-bit band equi-join,
  *     Hamming ≤ 3 verify (q35 shape).
  *
  * Each reports wall seconds, docs/sec, and found-vs-expected pair counts
  * (exact must be EQUAL; LSH/SimHash are probabilistic recalls, reported
  * as fractions). One JSON line at the end for the record.
  *
  * Run: SPARK_GRAFT_SCALE_N=2000000 sbt "runMain graft.tools.ScaleBench"
  */
object ScaleBench {

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "2000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      // The bounded-heap top-k aggregate (ObjectHashAggregate) falls back
      // to SORT-BASED aggregation past 128 distinct groups per partition
      // (spark.sql.objectHashAggregate.sortBased.fallbackThreshold) — at
      // Q=10k query groups that silently turns the brute-force kNN's
      // partial aggregate into a full external sort of N*Q pair rows
      // (measured: filled the disk at 2M x 10k). The heap state is what
      // makes top-k bounded — Q heaps x 10 entries ≈ 1.6 MB at Q=10k —
      // so the threshold, not the algorithm, is the scale knob here.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "131072")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // ---- corpus synthesis: 28 body tokens drawn uniformly from a 50k
    // vocab by hashing (doc, position), one trailing token that the
    // near-dup variant flips.
    val k = 28
    val vocab = 50000L
    def bodyFor(idCol: org.apache.spark.sql.Column) =
      concat_ws(" ", transform(sequence(lit(1), lit(k)), i =>
        concat(lit("t"), pmod(xxhash64(idCol * 37L + i.cast("long")), lit(vocab)))))
    val base = spark.range(n).toDF("doc_id")
      .withColumn("eff", when(pmod(col("doc_id"), lit(10)) === 5, col("doc_id") - 1)
        .when(pmod(col("doc_id"), lit(10)) === 9, col("doc_id") - 1)
        .otherwise(col("doc_id")))
      .withColumn("tail", when(pmod(col("doc_id"), lit(10)) === 9,
        concat(lit("z"), col("doc_id"))).otherwise(concat(lit("t"), pmod(xxhash64(col("eff") * 991L), lit(vocab)))))
      .select(col("doc_id"), concat_ws(" ", bodyFor(col("eff")), col("tail")).as("text"))
    val docs = base.repartition(cpus.toInt * 2).persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nd = docs.count() // materialize: generation cost excluded from op timings

    val expectExact = n / 10
    val expectNear = n / 10

    def timed[A](label: String)(body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[scale] $label: $s%.1fs")
      (r, s)
    }

    // ---- 1. exact dedup (q28 shape): one shuffle on content hash.
    val (exactPairs, tExact) = timed("exact dedup") {
      docs.groupBy(md5(col("text")).as("h"))
        .agg(count(lit(1)).as("copies"))
        .where(col("copies") > 1)
        .agg(sum(col("copies") - 1)).head.getLong(0)
    }

    // ---- 2. MinHash LSH (q34 shape): 8 hashes, 4 bands of 2 → band
    // equi-join on (band, h1, h2); verify exact Jaccard >= 0.5 on shingle
    // hash sets, candidates only.
    val (lshFound, tLsh) = timed("minhash lsh + verify") {
      // Shingle sets are persisted and joined back AFTER candidate
      // generation (q74's shape): the band exchange and the pair-distinct
      // must carry bare (doc_id, band, h1, h2) rows, NOT the ~230-byte
      // shingle arrays — carrying arrays through those shuffles measured
      // 3x slower at 2M docs.
      val sets = docs.select(col("doc_id"),
        NativeText.shingleHashesOfText(col("text")).as("sh"))
        .where(size(col("sh")) > 0)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val bands = sets.select(col("doc_id"),
        NativeText.minhash8(col("sh")).as("mh"))
        .select(col("doc_id"), explode(
          transform(sequence(lit(0), lit(3)), b => struct(b.as("band"),
            element_at(col("mh"), b * 2 + 1).as("h1"),
            element_at(col("mh"), b * 2 + 2).as("h2")))).as("bk"))
        .select(col("doc_id"), col("bk.band").as("band"),
          col("bk.h1").as("h1"), col("bk.h2").as("h2"))
      val cands = bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.h1") === col("b.h1") &&
            col("a.h2") === col("b.h2") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .distinct()
      val found = cands
        .join(sets.select(col("doc_id").as("d1"), col("sh").as("s1")), "d1")
        .join(sets.select(col("doc_id").as("d2"), col("sh").as("s2")), "d2")
        .select(size(array_intersect(col("s1"), col("s2"))).as("inter"),
          size(col("s1")).as("n1"), size(col("s2")).as("n2"))
        .where(col("inter") * 3 >= col("n1") + col("n2")) // jac >= 0.5
        .count()
      sets.unpersist(blocking = false)
      found
    }

    // ---- 3. SimHash (q35 shape): 20-bit fingerprint, 4 bands of 5 bits,
    // band equi-join, Hamming <= 3 verify. Run on a <=100k-doc slice: a
    // 20-bit fingerprint space saturates beyond ~10^5 docs (measured:
    // 6.4M Hamming-<=3 pairs at 100k docs, overwhelmingly birthday
    // collisions, not near-dups) — corpus-scale SimHash needs fingerprint
    // width grown with corpus size, exactly like q39's hyperplane count.
    // The saturated number is REPORTED, not hidden: it is the measured
    // argument for that design rule.
    val simSlice = math.max(n / 100000L, 1L)
    val (shFound, tSim) = timed("simhash + verify (<=100k slice)") {
      val fp = docs.where(pmod(col("doc_id"), lit(simSlice)) === 0)
        .select(col("doc_id"),
          NativeText.simhash20(NativeText.shingleHashesOfText(col("text"))).as("fp"))
      val bands = fp.select(col("doc_id"), col("fp"), explode(
        transform(sequence(lit(0), lit(3)), b => struct(b.as("band"),
          floor(col("fp") / pow(lit(2.0), (b * 5).cast("double"))).cast("long")
            .bitwiseAND(lit(31L)).as("bits")))).as("bk"))
        .select(col("doc_id"), col("fp"), col("bk.band").as("band"), col("bk.bits").as("bits"))
      bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.bits") === col("b.bits") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
          col("a.fp").as("f1"), col("b.fp").as("f2")).distinct()
        .where(bit_count(col("f1").bitwiseXOR(col("f2"))) <= 3)
        .count()
    }

    // ---- 3b. 64-bit SimHash (q82 shape) at FULL corpus size — the
    // round-4 measurement showed the 20-bit fingerprint saturating at
    // ~10^5 docs; this is the fix, run at the scale that broke it.
    // Round 6: the banding/verify is now the SAME code path as the
    // declared q82 (graft.operators.SimHashBands, auto-sized band width
    // from the corpus count — 16-bit here: fan-in n/65536 ≈ 30 docs at
    // 2M, where 8-bit buckets would hold ~8k docs and the candidate join
    // would be ~6e10 pairs; pigeonhole keeps full recall at Hamming ≤ 3
    // for both widths). Band WIDTH, not fingerprint width, is the
    // corpus-size knob: width ≈ log2(n) + slack, like q39's hyperplanes.
    import graft.operators.SimHashBands
    val sh64Bits = SimHashBands.bandBitsFor(nd)
    val (sh64Found, tSim64) = timed(s"simhash64 (auto ${sh64Bits}-bit bands) + verify, full corpus") {
      val fp = docs.select(col("doc_id"),
        NativeText.simhash64(NativeText.shingleHashesOfText(col("text"))).as("f"))
        .select(col("doc_id"),
          element_at(col("f"), 1).as("lo"), element_at(col("f"), 2).as("hi"))
      val bands = SimHashBands.bandsOf(fp, sh64Bits)
      SimHashBands.verifiedPairs(bands, bands, col("a.doc_id") < col("b.doc_id"))
        .count()
    }

    // ---- 4. similarity search at the same scale: N 16-dim vectors
    // (hash-synthesized, exact integer micros), swept over QUERY COUNT
    // (SPARK_GRAFT_ANN_QS, default 100,1000,10000) to MEASURE the
    // brute-vs-IVF crossover instead of asserting it. Brute-force exact
    // cosine top-10 via the bounded-heap TopKLongs aggregate (the q36/q49
    // shapes) is the baseline AND the ground truth at each Q; IVF with 64
    // seed cells and nprobe=1 (the q44 shape) pays its index build ONCE
    // (persisted) and a per-Q probe — brute scales linearly with Q while
    // the probe touches ~n/64 docs per query, so total-cost curves cross
    // where build amortizes.
    import graft.functions.TopKLongs
    val dims = 16
    val annQs = sys.env.getOrElse("SPARK_GRAFT_ANN_QS", "100,1000,10000")
      .split(",").map(_.trim.toLong).filter(_ > 0).sorted
    val emb = spark.range(n).toDF("id")
      .withColumn("em", NativeText.microQuantize(
        transform(sequence(lit(1), lit(dims)), i =>
          ((pmod(xxhash64(col("id") * 17L + i.cast("long")), lit(2001L)) - 1000L)
            .cast("double") / 1000.0).cast("float"))))
      .withColumn("nsq", NativeText.dotLong(col("em"), col("em")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    emb.count()
    def cosMicro(dot: Column, nsqA: Column, nsqB: Column): Column =
      floor(dot.cast("double") / sqrt(nsqA.cast("double") * nsqB.cast("double")) * 1e6)
        .cast("long")
    def queriesOf(q: Long) = emb.where(col("id") < q)
      .select(col("id").as("qid"), col("em").as("qem"), col("nsq").as("qnsq"))
    def topkOf(scored: DataFrame): DataFrame = scored
      .groupBy("qid").agg(TopKLongs.topK(col("s"), col("id"), 10).as("tk"))
      .select(col("qid"), explode(col("tk")).as("e"))
      .select(col("qid"), col("e.id").as("id"))

    // IVF index build, paid once: nearest of 64 cells by exact integer
    // L2, one broadcast pass; the assigned corpus is persisted so every
    // probe below reuses it (that amortization IS the thing measured).
    val cents = emb.where(col("id") < 64)
      .select(col("id").as("cell"), col("em").as("cvec"), col("nsq").as("cnorm"))
    val (docsInCell, tIvfBuild) = timed("IVF(64 cells) index build") {
      val assign = emb.crossJoin(broadcast(cents))
        .select(col("id"), struct(
          (col("nsq") + col("cnorm") - NativeText.dotLong(col("em"), col("cvec")) * 2L).as("l2"),
          col("cell")).as("dc"))
        .groupBy("id").agg(min(col("dc")).as("dc"))
        .select(col("id"), col("dc.cell").as("cell"))
      val dic = emb.join(assign, "id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      dic.count()
      dic
    }

    case class AnnPoint(q: Long, bruteSec: Double, probeSec: Double,
                        hits: Long, truthRows: Long)
    val annPoints = annQs.map { q =>
      val queries = queriesOf(q)
      val (bruteTop, tBrute) = timed(s"brute-force exact kNN (Q=$q)") {
        val top = topkOf(emb.crossJoin(broadcast(queries))
          .select(col("qid"),
            cosMicro(NativeText.dotLong(col("em"), col("qem")), col("nsq"), col("qnsq")).as("s"),
            col("id")))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        top.count()
        top
      }
      val truthRows = bruteTop.count() // actual ground-truth rows: ties or
      // tiny corpora can yield < 10 per query; recall divides by THIS.
      val ((hits, tProbe)) = timed(s"IVF probe (Q=$q, nprobe=1)") {
        val qCell = queries.crossJoin(broadcast(cents))
          .select(col("qid"), col("qem"), col("qnsq"), struct(
            (col("qnsq") + col("cnorm") - NativeText.dotLong(col("qem"), col("cvec")) * 2L).as("l2"),
            col("cell")).as("dc"))
          .groupBy(col("qid"), col("qem"), col("qnsq")).agg(min(col("dc")).as("dc"))
          .select(col("qid"), col("qem"), col("qnsq"), col("dc.cell").as("cell"))
        val ivfTop = topkOf(docsInCell.join(broadcast(qCell), "cell")
          .select(col("qid"),
            cosMicro(NativeText.dotLong(col("em"), col("qem")), col("nsq"), col("qnsq")).as("s"),
            col("id")))
        ivfTop.join(bruteTop, Seq("qid", "id")).count()
      }
      bruteTop.unpersist(blocking = false)
      AnnPoint(q, tBrute, tProbe, hits, truthRows)
    }
    docsInCell.unpersist(blocking = false)
    emb.unpersist(blocking = false)

    def rate(t: Double): Long = (nd.toDouble / t).toLong
    val annJson = annPoints.map { p =>
      val recall = if (p.truthRows == 0) 0.0 else p.hits.toDouble / p.truthRows
      s"""{"q":${p.q},"brute_sec":${p.bruteSec},"ivf_probe_sec":${p.probeSec},""" +
        s""""ivf_total_sec":${tIvfBuild + p.probeSec},"recall_at_10":$recall}"""
    }.mkString("[", ",", "]")
    val json =
      s"""{"n_docs":$nd,"exact":{"sec":$tExact,"pairs":$exactPairs,"expected":$expectExact},""" +
      s""""lsh":{"sec":$tLsh,"verified_pairs":$lshFound,"expected_min":$expectNear},""" +
      s""""simhash":{"sec":$tSim,"verified_pairs":$shFound,"slice_docs":${nd / simSlice}},""" +
      s""""simhash64":{"sec":$tSim64,"verified_pairs":$sh64Found,"exact_floor":$expectExact,"near_target":$expectNear},""" +
      s""""ann":{"ivf_build_sec":$tIvfBuild,"points":$annJson},""" +
      s""""docs_per_sec":{"exact":${rate(tExact)},"lsh":${rate(tLsh)},"simhash":${rate(tSim)},"simhash64":${rate(tSim64)}}}"""
    spark.stop()
    println(json)
  }
}
