package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the late round-6 operators (q137-q152):
  * each test asserts the property that makes the operator CORRECT, by an
  * independent in-test computation — not by re-running the same plan.
  */
class RoundSixOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private val sf01 = "/root/testdata/sf0.01"

  private def run(q: String, dir: String = sf) =
    SparkEntry.queries(q)(spark, dir)

  test("q145: largest-remainder allocations reconcile EXACTLY to the budget") {
    val rows = run("q145_budget_allocation").collect()
    val total = rows.map(_.getAs[Long]("alloc")).sum
    assert(total == 1000000L, s"allocations sum to $total, not the budget")
    // every allocation is the floor quota or floor+1 — Hamilton never
    // moves more than one unit per participant
    val revs = rows.map(_.getAs[Long]("rev_kd"))
    val revTot = revs.sum
    rows.foreach { r =>
      val fl = 1000000L * r.getAs[Long]("rev_kd") / revTot
      val alloc = r.getAs[Long]("alloc")
      assert(alloc == fl || alloc == fl + 1,
        s"${r.getAs[String]("n_name")}: alloc $alloc not in {$fl, ${fl + 1}}")
    }
  }

  test("q140: CMS prune is lossless — output equals the naive exact count") {
    import graft.functions.{NativeText, Text}
    val naive = sources.Tables.documents(spark, sf)
      .select(explode(Text.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
    val totalN = naive.agg(sum("n")).head().getLong(0)
    val expected = naive.filter(col("n") >= totalN / 30)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = run("q140_sketch_heavy_hitters").collect()
      .map(r => r.getAs[String]("token") -> r.getAs[Long]("exact_n")).toMap
    assert(got == expected, s"pruned result diverged: got=$got expected=$expected")
    // one-sidedness: every emitted estimate dominates its exact count
    run("q140_sketch_heavy_hitters").collect().foreach { r =>
      assert(r.getAs[Long]("cms_n") >= r.getAs[Long]("exact_n"),
        s"CMS under-estimated ${r.getAs[String]("token")}")
    }
  }

  test("q137: sweep-line peaks equal brute-force interval-overlap counts") {
    // independent truth: sessionize the same way, then for every
    // boundary instant count sessions covering it (O(sessions^2), fine
    // at sf0.001) — with starts-before-ends tie handling identical to
    // the sweep's (delta DESC at equal tsu: touching counts as overlap)
    val gap = queries.MiscQueries.SessionGapUs
    val ev = sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("tsu"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val sessions = ev.groupBy(_._1).values.flatMap { rows =>
      val ts = rows.map(_._3).sorted
      val bounds = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var start = ts.head; var prev = ts.head
      ts.tail.foreach { t =>
        if (t - prev > gap) { bounds += ((start, prev)); start = t }
        prev = t
      }
      bounds += ((start, prev))
      bounds
    }.toSeq
    val boundaries = sessions.flatMap { case (s0, e0) => Seq(s0, e0) }.distinct
    val brutePeak = boundaries.groupBy(_ / 86400000000L).map { case (day, bs) =>
      day -> bs.map(t => sessions.count { case (s0, e0) => s0 <= t && t <= e0 }).max
    }
    val got = run("q137_session_concurrency").collect()
      .map(r => r.getAs[Long]("day") -> r.getAs[Long]("peak").toInt).toMap
    assert(got == brutePeak, s"sweep diverged from brute overlap count")
  }

  test("q147: per-doc nearest neighbor equals brute force over fingerprints") {
    import graft.functions.NativeText
    val fps = sources.Tables.documents(spark, sf)
      .select(col("doc_id"),
        NativeText.simhash64(NativeText.shingleHashesOfText(col("text"))).as("fp"))
      .select(col("doc_id"), element_at(col("fp"), 1).as("lo"),
        element_at(col("fp"), 2).as("hi"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = fps.flatMap { case (i, lo, hi) =>
      val cands = fps.filter(_._1 != i).map { case (j, lo2, hi2) =>
        (j, java.lang.Long.bitCount(lo ^ lo2) + java.lang.Long.bitCount(hi ^ hi2))
      }.filter(_._2 <= 3)
      if (cands.isEmpty) None
      else Some(i -> cands.minBy(c => (c._2, c._1)))
    }.toMap
    val got = run("q147_nearest_neighbor").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("nn_id"), r.getAs[Long]("hamming").toInt))).toMap
    assert(got == brute, "band-candidate argmin diverged from global argmin")
  }

  test("q151: nearest-rank percentiles match an in-memory sort") {
    val vals = sources.Tables.events(spark, sf)
      .select(col("event_type"), round(col("value") * 100).cast("long").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (t, vs) => t -> vs.map(_._2).sorted }
    val got = run("q151_slo_percentiles").collect()
    got.foreach { r =>
      val sorted = vals(r.getAs[String]("event_type"))
      val n = sorted.length
      assert(r.getAs[Long]("n") == n.toLong)
      def nr(p: Int) = sorted((p * n + 99) / 100 - 1)
      assert(r.getAs[Long]("p50_c") == nr(50))
      assert(r.getAs[Long]("p95_c") == nr(95))
      assert(r.getAs[Long]("p99_c") == nr(99))
    }
  }

  test("q150: exactly the bucket holding the corrupted key differs") {
    val rows = run("q150_bucket_diff", sf01).collect()
    assert(rows.length == 1, s"expected 1 differing bucket, got ${rows.length}")
    assert(rows.head.getAs[Long]("bucket") == 997L / 64L)
    // counts agree (the corruption changed a value, not cardinality)
    assert(rows.head.getAs[Long]("n_a") == rows.head.getAs[Long]("n_b"))
  }

  test("q157: rolling 7-day distinct equals brute-force per-day recount") {
    // independent truth: distinct (user, day) in memory, then for every
    // spine day count distinct users active in [day-6, day] — the exact
    // quadratic definition the interval-delta algebra replaces
    val ad = sources.Tables.events(spark, sf)
      .select(col("user_id"),
        expr("unix_micros(cast(ts as timestamp)) div 86400000000").as("day"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val lo = ad.map(_._2).min; val hi = ad.map(_._2).max
    val brute = (lo to hi).map { d =>
      d -> ad.filter { case (_, ud) => ud >= d - 6 && ud <= d }
        .map(_._1).distinct.length.toLong
    }.toMap
    val got = run("q157_rolling_dau").collect()
      .map(r => r.getAs[Long]("day") -> r.getAs[Long]("dau7")).toMap
    assert(got == brute, "interval-delta rolling count diverged from brute force")
  }

  test("q159: quantile normalization maps each group onto the global quantiles") {
    // the defining property: group g's normalized multiset is exactly
    // {global_sorted[ceil(r*N/n_g)] : r = 1..n_g} — verified from an
    // independent in-memory sort, per group
    val e = sources.Tables.events(spark, sf)
      .select(col("event_type"), round(col("value") * 100).cast("long").as("v"),
        col("event_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val globalSorted = e.map(x => (x._2, x._3)).sortBy(identity).map(_._1)
    val n = globalSorted.length.toLong
    val rows = run("q159_quantile_normalize").collect()
    assert(rows.length == e.length, "normalization must preserve row count")
    val gotByGroup = rows.groupBy(_.getAs[String]("t"))
      .map { case (t, rs) => t -> rs.map(_.getAs[Long]("vq")).sorted.toSeq }
    e.groupBy(_._1).foreach { case (t, vs) =>
      val ng = vs.length.toLong
      val expected = (1L to ng)
        .map(r => globalSorted(((r * n + ng - 1) / ng - 1).toInt)).sorted
      assert(gotByGroup(t) == expected, s"group $t not mapped onto global quantiles")
    }
  }

  test("q160: integer correlation matches float corr to ppm rounding") {
    val daily = sources.Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority").as("prio"),
        datediff(col("o_orderdate").cast("date"),
          lit("1970-01-01").cast("date")).as("day"))
      .agg(count(lit(1)).cast("double").as("x"),
        expr("sum(cast(round(o_totalprice * 100) as bigint)) div 100000")
          .cast("double").as("y"))
      .collect().map(r => (r.getAs[String]("prio"), r.getDouble(2), r.getDouble(3)))
    val got = run("q160_metric_correlation").collect()
      .map(r => r.getAs[String]("prio") -> r.getAs[Long]("r_ppm")).toMap
    daily.groupBy(_._1).foreach { case (prio, pts) =>
      val xs = pts.map(_._2.toLong); val ys = pts.map(_._3.toLong)
      val m = pts.length.toLong
      val sx = xs.sum; val sy = ys.sum
      val num = m * pts.map(p => p._2.toLong * p._3.toLong).sum - sx * sy
      val a = m * xs.map(x => x * x).sum - sx * sx
      val b = m * ys.map(y => y * y).sum - sy * sy
      def isqrt(v: Long) =
        java.math.BigInteger.valueOf(v).sqrt().longValueExact()
      val sa = isqrt(a); val sb = isqrt(b)
      // exact mirror of the operator's documented definition
      val ref = if (num >= 0) num * 1000000L / math.max(sa * sb, 1L)
                else -(-num * 1000000L / math.max(sa * sb, 1L))
      val r = got(prio)
      assert(r == ref, s"$prio: r_ppm $r != integer-definition $ref")
      // sanity vs float corr: the floored two-isqrt denominator costs at
      // most ~(1/sa + 1/sb) relative — bound the drift by that, not ±2
      val den = math.sqrt(a.toDouble) * math.sqrt(b.toDouble)
      val float = if (den == 0) 0L else math.round(num / den * 1e6)
      val tol = 1000000L / math.max(sa, 1L) + 1000000L / math.max(sb, 1L) + 2L
      assert(math.abs(r - float) <= tol && math.abs(r) <= 1000000L + tol,
        s"$prio: r_ppm $r vs float $float beyond tol $tol")
    }
  }

  test("q161: vocabulary Jaccard matches in-memory set arithmetic") {
    val vocab = sources.Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1)
      .map { case (src, ds) => src -> ds.flatMap(_._2.split(" ")).toSet }
    val got = run("q161_source_vocab_jaccard").collect()
    assert(got.length == vocab.size * (vocab.size - 1) / 2,
      "matrix must cover every unordered source pair")
    got.foreach { r =>
      val a = vocab(r.getAs[String]("s_a")); val b = vocab(r.getAs[String]("s_b"))
      val inter = (a & b).size.toLong
      assert(r.getAs[Long]("n_inter") == inter)
      assert(r.getAs[Long]("jaccard_ppm") == inter * 1000000L / (a | b).size)
    }
  }

  test("q163: every z-prefix cell is a <=64x64 rectangle") {
    val rows = run("q163_zorder_cells").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("max_x") - r.getAs[Long]("min_x") < 64L &&
        r.getAs[Long]("max_y") - r.getAs[Long]("min_y") < 64L,
        s"cell ${r.getAs[Long]("cell")} exceeds the 6-bit-per-dim extent")
    }
    // cells partition the row count
    val n = rows.map(_.getAs[Long]("n")).sum
    assert(n == sources.Tables.orders(spark, sf).count())
  }

  test("q162: bisection quantiles are bracketed by the value multiset") {
    // the oracle already brute-forces the values; here pin the invariant
    // that makes the two-scan plan valid: each returned value's rank
    // interval covers the nearest-rank target
    val vals = sources.Tables.orders(spark, sf)
      .select(round(col("o_totalprice") * 100).cast("long").as("v"))
      .collect().map(_.getLong(0)).sorted
    val n = vals.length.toLong
    run("q162_quantile_bisect").collect().foreach { r =>
      val p = r.getAs[Long]("p"); val v = r.getAs[Long]("value")
      val target = (p * n + 99) / 100
      val lo = vals.indexWhere(_ == v) + 1L      // first rank holding v
      val hi = vals.lastIndexWhere(_ == v) + 1L  // last rank holding v
      assert(lo <= target && target <= hi,
        s"p$p: value $v occupies ranks [$lo,$hi], target $target outside")
    }
  }

  test("q165: weighted percentiles match an in-memory weighted scan") {
    val ev = sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("event_id"),
        expr("unix_micros(cast(ts as timestamp))").as("tsu"),
        round(col("value") * 100).cast("long").as("v"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // hold duration = gap to the same user's next event, floored seconds
    val weighted = ev.groupBy(_._1).values.flatMap { rows =>
      val s = rows.sortBy(r => (r._4, r._3))
      s.zip(s.tail).map { case (cur, nxt) => (cur._2, cur._5, cur._3, (nxt._4 - cur._4) / 1000000L) }
    }.toSeq
    val got = run("q165_weighted_percentiles").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("p")) -> r.getAs[Long]("value")).toMap
    weighted.groupBy(_._1).foreach { case (t, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3)) // (v, event_id) total order
      val tw = sorted.map(_._4).sum
      Seq(50L, 95L).foreach { p =>
        val target = (p * tw + 99) / 100
        var cum = 0L
        val pick = sorted.find { r => cum += r._4; cum >= target }.get._2
        assert(got((t, p)) == pick, s"$t p$p: got ${got((t, p))}, expected $pick")
      }
    }
  }

  test("q167: post-stratification closes most of the induced bias") {
    val r = run("q167_post_stratification", sf01).collect().head
    val pop = r.getAs[Long]("pop_c"); val naive = r.getAs[Long]("naive_c")
    val ps = r.getAs[Long]("pstrat_c")
    assert(math.abs(naive - pop) > 10L * math.abs(ps - pop),
      s"calibration did not beat naive: pop=$pop naive=$naive pstrat=$ps")
  }

  test("q168: clamped fold equals a sequential in-memory replay") {
    val ev = sources.Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(cast(ts as timestamp))").as("tsu"),
        col("event_id"),
        when(col("event_type") === "purchase", round(col("value") * 100))
          .otherwise(-round(col("value") * 100)).cast("long").as("delta"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = ev.groupBy(_._1).map { case (u, rows) =>
      u -> rows.sortBy(r => (r._2, r._3)).map(_._4)
        .foldLeft(0L)((a, d) => math.max(a + d, 0L))
    }
    val got = run("q168_clamped_balance").collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("balance_c")).toMap
    assert(got == expected, "distributed fold diverged from sequential replay")
  }

  test("q166: every stratum fills its quota or is exhausted") {
    val avail = sources.Tables.documents(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = run("q166_stratified_quota").collect()
      .groupBy(_.getAs[String]("lang"))
    assert(got.keySet == avail.keySet)
    got.foreach { case (lang, rows) =>
      assert(rows.length.toLong == math.min(10L, avail(lang)))
      assert(rows.map(_.getAs[Long]("rank")).sorted.toSeq ==
        (1L to rows.length.toLong), s"$lang ranks not contiguous from 1")
    }
  }

  test("q170: KM curve matches an in-memory survival replay") {
    val delays = sources.Tables.lineitem(spark, sf)
      .join(sources.Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .select(datediff(col("l_shipdate").cast("date"),
        col("o_orderdate").cast("date")).cast("long").as("d"))
      .collect().map(_.getLong(0)).filter(_ >= 1L)
    val cens = delays.count(_ > 60L).toLong
    val deaths = (1L to 60L).map(t => t -> delays.count(_ == t).toLong).toMap
    // the DuckDB oracle packs (n, d) as n*2^20 + d — valid only while the
    // max per-day death count stays under 2^20 (see the q170 query comment)
    assert(deaths.values.max < (1L << 20),
      "oracle packing bound violated: per-day deaths >= 2^20")
    val got = run("q170_km_shipping").collect()
    assert(got.length == 60)
    var s = 1000000L
    (1L to 60L).foreach { t =>
      val n = (t to 60L).map(deaths).sum + cens
      val r = got((t - 1).toInt)
      assert(r.getAs[Long]("n_events") == deaths(t) && r.getAs[Long]("n_risk") == n)
      s = s * (n - deaths(t)) / math.max(n, 1L)
      assert(r.getAs[Long]("s_ppm") == s, s"day $t survival diverged")
    }
    // survival is monotone non-increasing and censoring kept it > 0
    assert(got.last.getAs[Long]("s_ppm") > 0L)
  }

  test("q169: HHI matches in-memory token accounting") {
    val texts = sources.Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val got = run("q169_source_concentration").collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_distinct"),
          r.getAs[Long]("hhi_ppm"), r.getAs[Long]("gini_ppm"))).toMap
    texts.groupBy(_._1).foreach { case (src, ds) =>
      val counts = ds.flatMap(_._2.split(" ")).groupBy(identity).map(_._2.length.toLong)
      val n = counts.sum
      val hhi = counts.map(c => c * c).sum * 1000000L / (n * n)
      assert(got(src) == ((n, counts.size.toLong, hhi, 1000000L - hhi)), s"$src diverged")
    }
  }

  test("q172: mode winner beats or ties every other type, ties broken by name") {
    val counts = sources.Tables.events(spark, sf)
      .groupBy("user_id", "event_type").count().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
    run("q172_group_mode").collect().foreach { r =>
      val u = r.getAs[Long]("user_id"); val t = r.getAs[String]("top_type")
      val n = r.getAs[Long]("n")
      val best = counts(u).minBy(x => (-x._3, x._2))
      assert((best._2, best._3) == ((t, n)), s"user $u: got ($t,$n) want $best")
    }
  }

  test("q173: deciles partition customers; lift ends at exactly 1.0") {
    val rows = run("q173_decile_lift").collect().sortBy(_.getAs[Long]("decile"))
    assert(rows.map(_.getAs[Long]("decile")).toSeq == (1L to 10L))
    val nCust = rows.map(_.getAs[Long]("n_cust")).sum
    assert(nCust == sources.Tables.orders(spark, sf)
      .select("o_custkey").distinct().count())
    // the last cumulative row covers everyone -> lift is the base rate
    assert(rows.last.getAs[Long]("cum_lift_ppm") == 1000000L)
    // lift is monotone non-increasing down the ranking
    rows.map(_.getAs[Long]("cum_lift_ppm")).sliding(2).foreach {
      case Array(a, b) => assert(a >= b, "cumulative lift must not increase")
      case _ => ()
    }
  }

  test("q174: lateness reconciles with a sequential arrival replay") {
    val ev = sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("event_id"),
        expr("unix_micros(cast(ts as timestamp))").as("tsu"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val perType = scala.collection.mutable.Map.empty[String, (Long, Long, Long)]
    ev.groupBy(_._1).values.foreach { rows =>
      var runmax = Long.MinValue
      rows.sortBy(_._3).foreach { r =>
        val late = if (runmax > r._4) (runmax - r._4) / 1000000L else -1L
        val (n, nl, mx) = perType.getOrElse(r._2, (0L, 0L, 0L))
        perType(r._2) = (n + 1, nl + (if (late >= 0) 1L else 0L),
          math.max(mx, math.max(late, 0L)))
        runmax = math.max(runmax, r._4)
      }
    }
    run("q174_lateness_audit").collect().foreach { r =>
      val (n, nl, mx) = perType(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n_events") == n && r.getAs[Long]("n_late") == nl &&
        r.getAs[Long]("max_late_s") == mx)
    }
  }

  test("q176: every gap lands in its exact log2 bucket") {
    run("q176_interarrival_profile").collect().foreach { r =>
      val b = r.getAs[Long]("bucket")
      val lo = (1L << b) - 1        // smallest g with floor(log2(g+1)) = b
      val hi = (1L << (b + 1)) - 2  // largest
      assert(r.getAs[Long]("min_gap_s") >= lo && r.getAs[Long]("max_gap_s") <= hi,
        s"bucket $b bounds violated")
    }
  }

  test("q179: token-bucket fold equals a sequential limiter replay") {
    val ev = sources.Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(cast(ts as timestamp)) div 1000000").as("ts_s"),
        col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = ev.groupBy(_._1).map { case (u, rows) =>
      var tok = 100L; var last = 0L; var rej = 0L
      rows.sortBy(r => (r._2, r._3)).foreach { r =>
        tok = math.min(tok + (r._2 - last) / 36L, 100L)
        last = r._2
        if (tok >= 1L) tok -= 1L else rej += 1L
      }
      u -> rej
    }
    val got = run("q179_rate_limiter").collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n_rejected")).toMap
    assert(got == expected, "packed-state fold diverged from sequential replay")
  }

  test("q177: coverage curve matches in-memory token mass accounting") {
    val counts = sources.Tables.documents(spark, sf)
      .select(col("text")).collect().flatMap(_.getString(0).split(" "))
      .groupBy(identity).map { case (t, xs) => (t, xs.length.toLong) }.toSeq
    val sorted = counts.sortBy { case (t, c) => (-c, t) }
    val n = counts.map(_._2).sum
    val cums = sorted.scanLeft(0L)(_ + _._2).tail
    val got = run("q177_vocab_coverage").collect()
      .map(r => r.getAs[Long]("p") -> (r.getAs[Long]("k_tokens"), r.getAs[Long]("cov_ppm"))).toMap
    Seq(50L, 90L, 99L).foreach { p =>
      val k = cums.indexWhere(_ * 100 >= p * n) + 1
      assert(got(p) == ((k.toLong, cums(k - 1) * 1000000L / n)), s"p$p diverged")
    }
  }

  test("q178: deadline funnel stages match a brute per-user replay") {
    val ev = sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(cast(ts as timestamp))").as("tsu"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    val got = run("q178_deadline_funnel").collect()
    got.foreach { r =>
      val u = r.getAs[Long]("user_id"); val rows = byUser(u)
      val v1 = rows.filter(_._2 == "view").map(_._3).min
      val c1 = rows.filter(x => x._2 == "click" && x._3 >= v1 && x._3 <= v1 + 3600000000L)
        .map(_._3).minOption
      val p1 = c1.flatMap(c => rows.filter(x =>
        x._2 == "purchase" && x._3 >= c && x._3 <= c + 86400000000L).map(_._3).minOption)
      assert(r.getAs[Long]("v1") == v1)
      assert(Option(r.getAs[Any]("c1")).map(_.asInstanceOf[Long]) == c1)
      assert(Option(r.getAs[Any]("p1")).map(_.asInstanceOf[Long]) == p1)
    }
    assert(got.map(_.getAs[Long]("user_id")).toSet ==
      byUser.filter(_._2.exists(_._2 == "view")).keySet)
  }

  test("q182: sort-identity Gini equals the literal pairwise definition") {
    val spends = sources.Tables.orders(spark, sf)
      .groupBy("o_custkey")
      .agg(expr("sum(cast(round(o_totalprice * 100) as bigint)) div 100000").as("s"))
      .collect().map(_.getAs[Long]("s"))
    val n = spends.length.toLong
    val tot = spends.sum
    // G = Σ_i Σ_j |x_i − x_j| / (2 n Σx) — the O(n²) definition, fine at 150
    val pairSum = (for (a <- spends; b <- spends) yield math.abs(a - b)).sum
    val giniPair = pairSum * 1000000L / (2L * n * tot)
    val r = run("q182_gini_spend").collect().head
    assert(r.getAs[Long]("n_cust") == n && r.getAs[Long]("total_kd") == tot)
    // the sort identity truncates once; pairwise truncates once — allow 1 ulp
    assert(math.abs(r.getAs[Long]("gini_ppm") - giniPair) <= 1L,
      s"sort identity ${r.getAs[Long]("gini_ppm")} vs pairwise $giniPair")
  }

  test("q183: Lorenz curve is monotone, dominated by equality, ends at 1e6") {
    val rows = run("q183_lorenz_curve").collect().sortBy(_.getAs[Long]("decile"))
    assert(rows.map(_.getAs[Long]("decile")).toSeq == (1L to 10L))
    val shares = rows.map(_.getAs[Long]("cum_spend_ppm"))
    shares.sliding(2).foreach {
      case Array(a, b) => assert(a <= b, "Lorenz must be non-decreasing")
      case _ => ()
    }
    assert(shares.last == 1000000L)
    // Lorenz lies on or below the equality diagonal (give 10-row
    // decile-boundary rounding 2% slack at sf0.001's 150 customers)
    rows.foreach { r =>
      assert(r.getAs[Long]("cum_spend_ppm") <=
        r.getAs[Long]("decile") * 100000L + 20000L)
    }
  }

  test("q181: reconciliation diffs match in-memory integer billing math") {
    val li = sources.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"),
        (round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long")) *
          (lit(100L) + round(col("l_tax") * 100).cast("long"))).as("net"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, xs) => k -> (xs.length.toLong, xs.map(_._2).sum / 10000L) }
    val heads = sources.Tables.orders(spark, sf)
      .select(col("o_orderkey"), round(col("o_totalprice") * 100).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expectedTop = li.map { case (k, (nl, lc)) => (k, nl, heads(k), lc, lc - heads(k)) }
      .toSeq.sortBy(x => (-math.abs(x._5), x._1)).take(20)
    val got = run("q181_order_reconciliation").collect()
      .map(r => (r.getAs[Long]("o_orderkey"), r.getAs[Long]("n_lines"),
        r.getAs[Long]("o_total_c"), r.getAs[Long]("lines_total_c"),
        r.getAs[Long]("diff_c"))).toSeq
    assert(got == expectedTop, "top-20 discrepancies diverged")
  }

  test("q188: distributed greedy equals an in-memory set-cover replay") {
    val docs = sources.Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val grams = docs.groupBy(_._1).map { case (src, ds) =>
      src -> ds.flatMap { case (_, t) =>
        val ts = t.split(" "); ts.zip(ts.tail).map { case (a, b) => s"$a $b" }
      }.toSet
    }
    var covered = Set.empty[String]
    var remaining = grams
    val picks = (1 to 3).map { round =>
      val (src, gain) = remaining.map { case (s0, g) => (s0, (g -- covered).size) }
        .toSeq.minBy { case (s0, g) => (-g, s0) }
      covered ++= grams(src)
      remaining -= src
      (round.toLong, src, gain.toLong)
    }
    val got = run("q188_greedy_set_cover").collect()
      .map(r => (r.getAs[Long]("round"), r.getAs[String]("source"), r.getAs[Long]("gain")))
      .sortBy(_._1).toSeq
    assert(got == picks, s"greedy diverged: $got vs $picks")
  }

  test("q186: CUSUM top-5 matches an in-memory prefix scan") {
    val daily = sources.Tables.events(spark, sf)
      .groupBy(expr("unix_micros(cast(ts as timestamp)) div 86400000000").as("day"))
      .count().collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val n = daily.length.toLong
    val s0 = daily.map(_._2).sum
    var acc = 0L
    val cusums = daily.map { case (day, y) => acc += y * n - s0; (day, y, acc) }
    // the full prefix telescopes to zero — the identity that makes the
    // scaled-deviation form exact
    assert(cusums.last._3 == 0L)
    val expected = cusums.sortBy { case (day, _, c) => (-math.abs(c), day) }.take(5).toSeq
    val got = run("q186_cusum_changepoint").collect()
      .map(r => (r.getAs[Long]("day"), r.getAs[Long]("y"), r.getAs[Long]("cusum"))).toSeq
    assert(got == expected)
  }

  test("q185: eta-squared is a valid variance share") {
    val r = run("q185_seasonality_strength").collect().head
    val num = r.getAs[Long]("num"); val den = r.getAs[Long]("den")
    assert(num >= 0L && den > 0L && num <= den,
      s"between-group SS must be within total SS: $num / $den")
    val eta = r.getAs[Long]("eta2_ppm")
    assert(eta >= 0L && eta <= 1000000L + 1L)
  }

  test("q191: session profile reconciles with the q43 sessionization") {
    val sessions = run("q43_sessionize").collect()
    val byDay = sessions.groupBy(_.getAs[Long]("start_us") / 86400000000L)
    val got = run("q191_session_profile").collect()
      .map(r => r.getAs[Long]("day") ->
        (r.getAs[Long]("n_sessions"), r.getAs[Long]("n_bounce"))).toMap
    assert(got.keySet == byDay.keySet)
    byDay.foreach { case (day, ss) =>
      assert(got(day) == ((ss.length.toLong,
        ss.count(_.getAs[Long]("n_events") == 1L).toLong)), s"day $day diverged")
    }
  }

  test("q189: audit counters are internally consistent") {
    val r = run("q189_lsh_audit", sf01).collect().head
    val (t, c, tp) = (r.getAs[Long]("n_truth"), r.getAs[Long]("n_cand"), r.getAs[Long]("tp"))
    assert(tp <= math.min(t, c) && t > 0L && c > 0L)
    assert(r.getAs[Long]("recall_ppm") == tp * 1000000L / t)
    assert(r.getAs[Long]("precision_ppm") == tp * 1000000L / c)
  }

  test("q146: growth-accounting series reconcile (DAU identity)") {
    val rows = run("q146_growth_accounting").collect()
      .map(r => (r.getAs[Long]("day"), r.getAs[Long]("n_new"),
        r.getAs[Long]("n_retained"), r.getAs[Long]("n_resurrected"),
        r.getAs[Long]("n_churned")))
      .sortBy(_._1)
    val dau = rows.map { case (d, nw, rt, rs, _) => d -> (nw + rt + rs) }.toMap
    rows.sliding(2).foreach {
      case Array((d0, _, _, _, _), (d1, nw, rt, rs, ch)) if d1 == d0 + 1 =>
        // retained(d) = DAU(d-1) - churned(d) on consecutive days
        assert(rt == dau(d0) - ch,
          s"day $d1: retained $rt != DAU(${d0}) ${dau(d0)} - churned $ch")
      case _ => ()
    }
  }
}
