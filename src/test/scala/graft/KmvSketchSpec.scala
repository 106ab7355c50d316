package graft

/** KMV distinct-count sketch (q58): exactness below k, accuracy above it. */
class KmvSketchSpec extends SparkTestBase {

  private def run(sf: String) =
    SparkEntry.queries("q58_kmv_sketch")(spark, s"/root/testdata/sf$sf").collect().head

  test("under k distinct keys the sketch is exact") {
    val r = run("0.001") // 15 distinct users < k=64
    assert(r.getAs[Long]("n_seen") == 15L)
    assert(r.getAs[Long]("est") == 15L)
  }

  test("above k the estimate lands within the sketch's error bound") {
    val r = run("0.01") // 150 distinct users, k=64 -> ~13% std error
    val exact = 150.0
    val est = r.getAs[Long]("est").toDouble
    assert(r.getAs[Long]("n_seen") == 64L)
    assert(math.abs(est - exact) / exact < 0.35, s"est=$est exact=$exact")
  }

  // approx_count_distinct (HLL++) is the built-in 100 TB alternative the
  // KMV query documents; its sketch bytes are implementation-specific so
  // no DuckDB oracle can check it — self-consistency is the provable part.
  test("approx_count_distinct: within rsd of exact and partitioning-invariant") {
    import org.apache.spark.sql.functions._
    val li = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.01")
    val exact = li.select(countDistinct(col("l_partkey"))).head.getLong(0).toDouble
    val est = li.select(approx_count_distinct(col("l_partkey"), 0.02)).head.getLong(0).toDouble
    assert(math.abs(est - exact) / exact < 0.06, s"est=$est exact=$exact")
    // HLL merge is commutative/associative: a different partitioning must
    // produce the IDENTICAL estimate, or partial merges aren't sound
    val est2 = li.repartition(17, col("l_suppkey"))
      .select(approx_count_distinct(col("l_partkey"), 0.02)).head.getLong(0).toDouble
    assert(est2 == est, s"partitioning changed the sketch: $est2 vs $est")
  }
}
