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

  test("q54: sequence packing is a pure generator — no shuffle") {
    // the registered query sorts for the oracle; the OPERATOR itself must
    // be scan→project→generate with no Exchange (the 100 TB contract:
    // chunking never reshuffles the corpus)
    val p = ops.Corpus
      .packChunks(Tables.documents(spark, sf), 16)
      .queryExecution.executedPlan.toString
    assert(p.contains("Generate explode"), s"no generator:\n$p")
    assert(!p.contains("Exchange"), s"chunking must not shuffle:\n$p")
  }

  test("q55/q56: blocked pair joins are equi-joins, never nested-loop") {
    Seq("q55_embed_neardup", "q56_fuzzy_brand").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"$q degenerated to all-pairs:\n$p")
    }
  }

  test("q59: grouping sets plan one Expand, not a union of scans") {
    val p = plan("q59_grouping_sets")
    assert(p.contains("Expand"), s"no Expand:\n$p")
    assert("Scan parquet".r.findAllIn(p).size == 1,
      s"grouping sets must share one scan:\n$p")
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
