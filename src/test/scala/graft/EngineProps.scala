package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.functions.{NativeText, Text}
import graft.operators.Windows

/** ScalaCheck properties over the engine operators (SURVEY.md §5.3):
  * dedup idempotence, union-by-name alignment, surrogate-key density.
  * Sample count kept low — every sample runs real Spark jobs.
  */
object EngineProps extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.session
  import spark.implicits._

  private val rows: Gen[List[(Int, String)]] =
    Gen.listOfN(30, Gen.zip(Gen.choose(0, 5), Gen.oneOf("a", "b", "c")))

  property("distinct is idempotent") = forAll(rows) { xs =>
    val df = xs.toDF("k", "v")
    df.distinct().count() == df.distinct().distinct().count()
  }

  property("unionByName(allowMissing) null-fills exactly the absent column") = forAll(rows) { xs =>
    val a = xs.toDF("k", "v")
    val b = xs.toDF("k", "v").withColumn("extra", lit(1))
    val u = a.unionByName(b, allowMissingColumns = true)
    u.count() == 2L * xs.size &&
      u.filter(col("extra").isNull).count() == xs.size
  }

  property("denseIdsScalable yields dense unique 1..N ids") = forAll(rows) { xs =>
    val df = xs.zipWithIndex.map { case ((k, v), i) => (k, v, i) }.toDF("k", "v", "uniq")
    val ids = Windows.denseIdsScalable(df,
        Seq(col("k"), col("v"), col("uniq")), "sk")
      .select("sk").as[Long].collect().sorted.toSeq
    ids == (1L to xs.size.toLong)
  }

  // ---- native codegen kernels vs the declarative spec -------------------
  // The NativeHash expressions are drop-in replacements for the Text
  // higher-order-function kernels (which mirror the DuckDB oracles), so
  // they must agree value-for-value on arbitrary inputs.

  private val token: Gen[String] =
    Gen.choose(1, 10).flatMap(n => Gen.stringOfN(n, Gen.alphaNumChar))

  private val text: Gen[String] =
    Gen.choose(0, 30).flatMap(n => Gen.listOfN(n, token)).map(_.mkString(" "))

  property("native shingle/simhash/rolling kernels match the declarative spec") =
    forAll(Gen.listOfN(8, text)) { texts =>
      val df = texts.toDF("text")
      val cmp = df.select(
        NativeText.shingleHashesOfText(col("text")).as("n_sh"),
        Text.shingleHashes(Text.tokens(col("text"))).as("d_sh"),
        NativeText.simhash20(NativeText.shingleHashesOfText(col("text"))).as("n_sim"),
        Text.simhash20(Text.shingleHashes(Text.tokens(col("text")))).as("d_sim"),
        NativeText.rollingMinHash8(col("text")).as("n_roll"),
        Text.rollingMinHash8(col("text")).as("d_roll"))
      cmp.collect().forall { r =>
        r.getSeq[Long](0) == r.getSeq[Long](1) &&
          r.getLong(2) == r.getLong(3) && r.getLong(4) == r.getLong(5)
      }
    }

  property("native n-gram/chunk kernels match the declarative spec") =
    forAll(Gen.listOfN(8, text), Gen.choose(1, 6)) { (texts, n) =>
      val df = texts.toDF("text")
      val cmp = df.select(
        NativeText.wordNgrams(col("text"), n).as("n_g"),
        Text.wordNgrams(Text.tokens(col("text")), n).as("d_g"),
        NativeText.wordChunks(col("text"), n).as("n_c"),
        Text.wordChunks(Text.tokens(col("text")), n).as("d_c"))
      cmp.collect().forall { r =>
        r.getSeq[String](0) == r.getSeq[String](1) &&
          r.getSeq[String](2) == r.getSeq[String](3)
      }
    }

  property("native sorted-pairs kernel matches the interpreted HOF pair explode") =
    forAll(Gen.listOfN(6, Gen.choose(0, 12)
        .flatMap(n => Gen.listOfN(n, Gen.choose(0L, 50L))))) { lists =>
      val df = lists.map(l => Tuple1(l.distinct.sorted)).toDF("ps")
      val cmp = df.select(
        NativeText.sortedPairs(col("ps")).as("n_p"),
        expr("flatten(transform(ps, (x, i) -> transform(slice(ps, i + 2, size(ps)), y -> struct(x AS p1, y AS p2))))").as("d_p"))
      cmp.collect().forall { r =>
        def pairs(i: Int) = r.getSeq[org.apache.spark.sql.Row](i)
          .map(x => (x.getLong(0), x.getLong(1)))
        pairs(0) == pairs(1)
      }
    }

  property("native deletion-variants kernel matches the declarative substr form") =
    forAll(Gen.listOfN(6, Gen.choose(0, 12).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf(Gen.alphaNumChar, Gen.const(' '), Gen.const('é')))
          .map(_.mkString)))) { names =>
      val df = names.toDF("name")
      val cmp = df.select(
        NativeText.deletionVariants(col("name")).as("n_v"),
        array_distinct(concat(
          array(col("name")),
          transform(sequence(lit(1), length(col("name"))), i =>
            concat(col("name").substr(lit(1), i - 1),
              col("name").substr(i + 1, length(col("name"))))))).as("d_v"))
      cmp.collect().forall(r => r.getSeq[String](0) == r.getSeq[String](1))
    }

  property("native sorted-intersect-count matches size(array_intersect) on sorted distinct arrays") =
    forAll(Gen.listOfN(6, Gen.zip(
        Gen.listOf(Gen.choose(0, 40).map(i => s"g$i")),
        Gen.listOf(Gen.choose(0, 40).map(i => s"g$i"))))) { pairs =>
      val df = pairs.map { case (a, b) =>
        (a.distinct.sorted, b.distinct.sorted) }.toDF("a", "b")
      val cmp = df.select(
        NativeText.sortedIntersectCount(col("a"), col("b")).as("n_i"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("d_i"))
      cmp.collect().forall(r => r.getLong(0) == r.getLong(1))
    }

  private val pqVec: Gen[Seq[Long]] =
    Gen.listOfN(4, Gen.choose(-2L, 2L)).map(_.toSeq)

  private val pqCase: Gen[(List[Seq[Long]], List[(Int, Long, Seq[Long])])] =
    for {
      svs <- Gen.listOfN(8, pqVec)
      n0 <- Gen.choose(1, 3)
      n1 <- Gen.choose(1, 3)
      cv0 <- Gen.listOfN(n0, pqVec)
      cv1 <- Gen.listOfN(n1, pqVec)
    } yield (svs,
      cv0.zipWithIndex.map { case (v, i) => (0, i.toLong, v) } ++
        cv1.zipWithIndex.map { case (v, i) => (1, i.toLong, v) })

  property("native pq-argmin matches the declarative min(struct(l2, code)) assignment") =
    forAll(pqCase) { case (svs, entries) =>
      // tiny value range (-2..2) on purpose: distance ties are common, so
      // the smallest-code tie-break is exercised, not just the argmin
      val mOff = new Array[Int](3)
      entries.foreach(e => mOff(e._1 + 1) += 1)
      (1 to 2).foreach(m => mOff(m) += mOff(m - 1))
      val cb = new graft.functions.PqCodebook(4, mOff,
        entries.map(_._2).toArray,
        entries.map(_._3.map(v => v * v).sum).toArray,
        entries.flatMap(_._3).toArray)
      val sv = svs.zipWithIndex
        .flatMap { case (v, i) => Seq(0, 1).map(m => (i.toLong, m, v)) }
        .toDF("id", "m", "sv")
      val cbDf = entries.toDF("m", "code", "cvec")
        .withColumn("cnorm", NativeText.dotLong(col("cvec"), col("cvec")))
      val dist = NativeText.dotLong(col("sv"), col("sv")) + col("cnorm") -
        NativeText.dotLong(col("sv"), col("cvec")) * 2L
      val decl = sv.join(cbDf, Seq("m"))
        .select(col("id"), col("m"), struct(dist.as("l2"), col("code")).as("dc"))
        .groupBy("id", "m").agg(min(col("dc")).as("dc"))
        .select(col("id"), col("m"), col("dc.code"))
        .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2))).toMap
      val nat = sv.select(col("id"), col("m"),
        NativeText.pqArgmin(col("m"), col("sv"), cb).as("code"))
        .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2))).toMap
      nat == decl
    }

  property("topk aggregate equals sort-take per group") = forAll(rows) { xs =>
    val df = xs.zipWithIndex.map { case ((k, v), i) => (k, v.hashCode.toLong % 7, i.toLong) }
      .toDF("k", "score", "id")
    val agg = df.groupBy("k")
      .agg(graft.functions.TopKLongs.topK(col("score"), col("id"), 3).as("tk"))
      .select(col("k"), explode(col("tk")).as("e"))
      .select(col("k"), col("e.score"), col("e.id"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val expect = xs.zipWithIndex
      .map { case ((k, v), i) => (k, v.hashCode.toLong % 7, i.toLong) }
      .groupBy(_._1).toSeq.flatMap { case (_, g) =>
        g.sortBy(t => (-t._2, t._3)).take(3)
      }.toSet
    agg == expect
  }

  property("as-of join equals the naive latest-at-or-before lookup") = forAll(rows) { xs =>
    val lefts = xs.zipWithIndex.map { case ((k, v), i) =>
      (k, i.toLong, ((v.hashCode.toLong % 13) + 13) % 13) }
    val rights = xs.map { case (k, v) => (k, (((v.hashCode * 31).toLong % 13) + 13) % 13) }
      .distinct.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong + 100) }
    val got = graft.operators.AsOf.joinAsOfLeft(
        lefts.toDF("k", "lid", "t"), rights.toDF("k", "rt", "pay"),
        key = "k", leftTime = "t", rightTime = "rt")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), Option(r.get(4)).map(_.asInstanceOf[Long])))
      .toSet
    val expect = lefts.map { case (k, lid, t) =>
      val cand = rights.filter(r => r._1 == k && r._2 <= t)
      (k, lid, if (cand.isEmpty) None else Some(cand.maxBy(_._2)._3))
    }.toSet
    got == expect
  }

  property("bucketed range join equals the theta join") = forAll(rows) { xs =>
    val vals = xs.zipWithIndex.map { case ((k, v), i) =>
      (i.toLong, ((k * 31 + v.hashCode).toLong % 100 + 100) % 100) }
    // overlapping and gapped bands over [0, 100)
    val bandRows = Seq((0L, 30L, "a"), (20L, 55L, "b"), (70L, 100L, "c"))
    val got = graft.operators.RangeJoin.bucketedInner(
        vals.toDF("id", "v"), "v", bandRows.toDF("lo", "hi", "label"),
        "lo", "hi", width = 7L)
      .select("id", "label").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val expect = (for {
      (id, v) <- vals
      (lo, hi, lab) <- bandRows if v >= lo && v < hi
    } yield (id, lab)).toSet
    got == expect
  }

  property("salted join equals the plain join") = forAll(rows) { xs =>
    val big = xs.zipWithIndex.map { case ((k, _), i) => (k, i.toLong) }.toDF("k", "uniq")
    val small = xs.map(_._1).distinct.filter(_ % 2 == 0)
      .map(k => (k, s"d$k")).toDF("k", "payload")
    val got = graft.operators.Skew.saltedJoin(big, small, "k", col("uniq"), 4)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2))).toSet
    val plain = big.join(small, Seq("k"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2))).toSet
    got == plain
  }

  property("min-label components equal union-find") = forAll(rows) { xs =>
    val n = 12
    val edges = xs.map { case (k, v) => ((k * 31 + v.hashCode).abs % n, (v.hashCode * 7 + k).abs % n) }
      .filter(e => e._1 != e._2).distinct
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) => val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb }
    val expect = (0 until n).map { i =>
      i.toLong -> (0 until n).filter(j => find(j) == find(i)).min.toLong
    }.toMap
    val got = graft.operators.Components.minLabel(
        (0 until n).map(_.toLong).toDF("id"), "id",
        if (edges.isEmpty) Seq((0L, 0L)).toDF("s", "t").limit(0) else edges.map(e => (e._1.toLong, e._2.toLong)).toDF("s", "t"),
        "s", "t")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got == expect
  }

  property("alt-star components equal union-find") = forAll(rows) { xs =>
    val n = 12
    val edges = xs.map { case (k, v) => ((k * 31 + v.hashCode).abs % n, (v.hashCode * 7 + k).abs % n) }
      .filter(e => e._1 != e._2).distinct
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) => val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb }
    val expect = (0 until n).map { i =>
      i.toLong -> (0 until n).filter(j => find(j) == find(i)).min.toLong
    }.toMap
    val got = graft.operators.Components.altStar(
        (0 until n).map(_.toLong).toDF("id"), "id",
        if (edges.isEmpty) Seq((0L, 0L)).toDF("s", "t").limit(0) else edges.map(e => (e._1.toLong, e._2.toLong)).toDF("s", "t"),
        "s", "t")._1
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got == expect
  }

  property("salted aggregation equals the plain group-by sum") = forAll(rows) { xs =>
    val df = xs.zipWithIndex.map { case ((k, v), i) => (k, v, i.toLong, (k * 7 + 1).toLong) }
      .toDF("k", "v", "uniq", "val")
    val salted = graft.operators.Skew.saltedSum(df, Seq("k"), col("val"),
        saltBy = col("uniq"), salts = 4, outCol = "s")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val plain = df.groupBy("k").agg(sum(col("val")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    salted == plain
  }

  private val vec: Gen[List[Float]] =
    Gen.listOfN(16, Gen.choose(-1.0f, 1.0f))

  property("native micro-quantize + dot match the declarative Exact spec") =
    forAll(Gen.listOfN(6, Gen.zip(vec, vec))) { vs =>
      val df = vs.toDF("a", "b")
      val cmp = df.select(
        NativeText.microQuantize(col("a")).as("n_ma"),
        transform(col("a"), x => graft.functions.Exact.micro(x)).as("d_ma"),
        NativeText.dotLong(
          NativeText.microQuantize(col("a")), NativeText.microQuantize(col("b"))).as("n_dot"),
        graft.functions.Exact.dotMicro(col("a"), col("b")).as("d_dot"))
      cmp.collect().forall { r =>
        r.getSeq[Long](0) == r.getSeq[Long](1) && r.getLong(2) == r.getLong(3)
      }
    }

  property("native adcSum matches the unrolled element_at lookup chain") =
    forAll(Gen.listOfN(6, Gen.zip(
      Gen.listOfN(4, Gen.choose(0L, 7L)),              // M=4 codes in [0, K)
      Gen.listOfN(32, Gen.choose(-1000L, 1000L))))) {  // dense M*K table, K=8
      vs =>
        val df = vs.toDF("codes", "dtq")
        val k = 8
        val chain = (0 until 4).map { m =>
          element_at(col("dtq"), (lit(m * k + 1L) + element_at(col("codes"), m + 1)).cast("int"))
        }.reduce(_ + _)
        df.select(NativeText.adcSum(col("codes"), col("dtq"), k).as("native"),
            chain.as("decl"))
          .collect().forall(r => r.getLong(0) == r.getLong(1))
    }

  property("native simhash64 halves match the declarative per-bit-hash spec") =
    forAll(Gen.listOfN(6, text)) { texts =>
      val df = texts.toDF("text")
        .select(NativeText.shingleHashesOfText(col("text")).as("sh"))
      val cmp = df.select(
        NativeText.simhash64(col("sh")).as("native"),
        array(Text.simhash64Half(col("sh"), 0),
          Text.simhash64Half(col("sh"), 32)).as("decl"))
      cmp.collect().forall(r => r.getSeq[Long](0) == r.getSeq[Long](1))
    }

  property("native one-pass minhash8 matches the 8 declarative minhash walks") =
    forAll(Gen.listOfN(6, Gen.alphaLowerStr.map(_.take(40)))) { texts =>
      val df = texts.toDF("text")
        .select(NativeText.shingleHashesOfText(col("text")).as("sh"))
        .where(size(col("sh")) > 0)
      val cmp = df.select(
        NativeText.minhash8(col("sh")).as("native"),
        array((0 until 8).map(k => Text.minhash(col("sh"), k)): _*).as("decl"))
      cmp.collect().forall(r => r.getSeq[Long](0) == r.getSeq[Long](1))
    }

  // ---- container-parser fuzz: a 100 TB corpus WILL contain corrupt media
  // bytes; the metadata parsers must classify or decline, never throw.
  private val rawBytes: Gen[Array[Byte]] =
    Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)
  private val magicPrefixed: Gen[Array[Byte]] = for {
    tail <- rawBytes
    magic <- Gen.oneOf(
      Array[Byte](0, 0, 0, 16, 'f', 't', 'y', 'p'),                  // ISO BMFF
      Array(0x1a, 0x45, 0xdf, 0xa3).map(_.toByte),                   // EBML
      Array(0xff, 0xfb, 0x90, 0x00).map(_.toByte),                   // MP3 frame
      "ID3".getBytes ++ Array[Byte](3, 0, 0, 0, 0, 0, 50))           // ID3v2
  } yield magic ++ tail

  property("container parsers never throw on arbitrary or truncated bytes") =
    forAll(Gen.oneOf(rawBytes, magicPrefixed)) { b =>
      graft.multimodal.Containers.decode(b) // Option result or nothing at all
      graft.multimodal.Binary.decode(b)     // full dispatch incl. stub
      true
    }

  property("valid-container prefixes never crash the parsers when truncated") =
    forAll(Gen.choose(0, 400)) { n =>
      // structurally valid MP4 truncated at every possible length
      val full = mp4Fixture(640, 360, 1000, 5000)
      graft.multimodal.Containers.decode(full.take(n min full.length))
      true
    }

  property("q97's corrected floor(sqrt(double)) is the exact integer sqrt") =
    forAll(Gen.oneOf(
      Gen.choose(0L, 1L << 40),                       // the q97 domain (y <= 2^40)
      Gen.choose(0L, 1L << 20).map(s => s * s),       // perfect squares
      Gen.choose(1L, 1L << 20).map(s => s * s - 1))) { y =>
      // the exact construction both engines run: one +/-1 correction around
      // the IEEE sqrt seed makes the result independent of its rounding
      val s0 = math.floor(math.sqrt(y.toDouble)).toLong
      val s1 = s0 + (if ((s0 + 1) * (s0 + 1) <= y) 1L else 0L)
      val s = s1 - (if (s1 * s1 > y) 1L else 0L)
      s * s <= y && (s + 1) * (s + 1) > y
    }

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def mp4Fixture(w: Int, h: Int, timescale: Int, duration: Int): Array[Byte] = {
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      be32(payload.length + 8L) ++ typ.getBytes("ISO-8859-1") ++ payload
    val ftyp = box("ftyp", "isom".getBytes ++ be32(512) ++ "isom".getBytes)
    val mvhd = box("mvhd",
      be32(0) ++ be32(0) ++ be32(0) ++ be32(timescale.toLong) ++ be32(duration.toLong) ++ be32(0))
    val tkhd = box("tkhd",
      be32(0) ++ new Array[Byte](72) ++ be32(w.toLong << 16) ++ be32(h.toLong << 16))
    ftyp ++ box("moov", mvhd ++ box("trak", tkhd))
  }
}
