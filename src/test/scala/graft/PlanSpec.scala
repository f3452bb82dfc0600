package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regressions: the scale-critical physical-plan properties
  * (pushdown, pruning, broadcast) must not silently rot as queries
  * evolve — the same checks `graft.Explain` surfaces interactively.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString

  test("q02: predicates and projection reach the parquet scan") {
    val p = plan("q02_selective_scan")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity)"),
      s"missing pushdown:\n$p")
    assert(!p.contains("l_shipdate"), "column pruning lost")
  }

  test("q04/q05: dimension joins broadcast") {
    assert(plan("q04_brand_volume").contains("BroadcastHashJoin"))
    val star = plan("q05_star_revenue")
    assert("BroadcastHashJoin".r.findAllIn(star).size >= 3,
      s"star dims must broadcast:\n$star")
  }

  test("q03: top-k plans as TakeOrderedAndProject, not a full sort") {
    val p = plan("q03_topk_orders")
    assert(p.contains("TakeOrderedAndProject"), s"no top-k pushdown:\n$p")
  }

  test("q01: aggregation is two-phase (partial + final)") {
    val p = plan("q01_pricing_summary")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final hash agg:\n$p")
  }

  test("whole-stage codegen covers the scan→agg pipeline") {
    // AQE finalizes the plan lazily — execute first, then inspect
    val df = SparkEntry.queries("q01_pricing_summary")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // "*(n)" operator prefixes mark whole-stage-codegen stages
    assert(p.contains("*(1)") && p.contains("*(2)"),
      s"codegen stages absent:\n$p")
  }
}
