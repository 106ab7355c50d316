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
}
