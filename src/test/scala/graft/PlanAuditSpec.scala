package graft

/** CI-pinned plan invariants (SURVEY.md §8): the properties that make the
  * declared queries scale are asserted on the PHYSICAL plan, so a
  * regression that silently un-pushes a filter, widens a scan, or drops a
  * broadcast fails the suite — not just a bench run someone has to read.
  */
class PlanAuditSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("q01: column pruning reaches the parquet scan (4-column ReadSchema)") {
    val p = plan("q01_scan_project")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int," +
      "l_quantity:double,l_returnflag:string>"), p.linesIterator.take(30).mkString("\n"))
  }

  test("q02: predicates are pushed into the scan (PushedFilters non-empty)") {
    val p = plan("q02_filter_pred")
    assert(p.contains("PushedFilters: [IsNotNull"), p.linesIterator.take(30).mkString("\n"))
    assert(p.contains("GreaterThan(o_totalprice"), "range predicate not pushed")
  }

  test("q24: top-k plans as TakeOrdered, not a global sort") {
    val p = plan("q24_sort_limit_topk")
    assert(p.contains("TakeOrderedAndProject"), p.linesIterator.take(10).mkString("\n"))
  }

  test("q49: top-k aggregate partial-merges before the exchange") {
    val p = plan("q49_topk_agg")
    // formatted mode names the map-side stage's aggregate partial_*
    assert(p.contains("partial_topk_longs"),
      "no partial top-k aggregation before the shuffle")
    assert(p.contains("topk_longs") && p.contains("ObjectHashAggregate"))
  }

  test("q11: small dimension join is broadcast, not shuffled") {
    val p = plan("q11_join_left")
    assert(p.contains("BroadcastHashJoin"), p.linesIterator.take(10).mkString("\n"))
  }

  test("q50: as-of join uses ONE window pass, no nested-loop join") {
    val p = plan("q50_asof_join")
    assert(!p.contains("NestedLoop"), "as-of degraded to a nested-loop join")
    assert("Window".r.findAllIn(p).size >= 1 && !p.contains("CartesianProduct"))
  }

  test("q51: range join is a hash join on the bucket, not a nested loop") {
    val p = plan("q51_range_join")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      p.linesIterator.take(12).mkString("\n"))
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      "range join degraded to per-row band comparison")
  }
}
