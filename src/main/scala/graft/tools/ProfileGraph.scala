package graft.tools

import graft.Tables
import graft.ops.Graph
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Repeat-timing for the PageRank query: separates steady-state sweep
  * cost from first-run costs (scan, codegen, cache fill) by running the
  * whole operator N times in one session. Same honest-measurement
  * discipline as [[ProfileDedup]] — the result is materialized through
  * count() (tiny: 25 rows after limit upstream, full ranks here).
  *
  * Usage: runMain graft.tools.ProfileGraph [sfDir] [reps] [iters]
  */
object ProfileGraph {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps  = args.lift(1).map(_.toInt).getOrElse(4)
    val iters = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def edges = Tables
      .lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey").as("src"), col("o_custkey").as("dst"))

    // stage timings, twice: cold (scan+codegen) vs steady edge build
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val nEdges = edges.distinct().count()
      val tEdges = (System.nanoTime() - t0) / 1e9
      println(f"[profile] edge build+distinct #$i: $tEdges%.2f s ($nEdges edges)")
    }

    // slope over sweep count isolates per-sweep cost from the fixed
    // edge-build + cache-fill part that every run repays
    for {
      ck <- Seq(1, iters)
      it <- Seq(0, 1, iters, 2 * iters)
      r  <- 1 to reps
    } {
      val t = System.nanoTime()
      val n = Graph.pageRank(edges, it, checkpointEvery = ck).count()
      val dt = (System.nanoTime() - t) / 1e9
      println(f"[profile] run $r @ $it sweeps ck=$ck: $dt%.2f s ($n nodes)")
    }
    spark.stop()
  }
}
