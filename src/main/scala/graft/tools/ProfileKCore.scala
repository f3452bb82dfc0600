package graft.tools

import graft.Tables
import graft.ops.Graph
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Repeat-timing for the k-core peel (q287): how many sweeps does the
  * sf0.1 cascade actually run, and what does each cost? Same honest
  * repeat-measurement discipline as [[ProfileGraph]].
  *
  * Usage: runMain graft.tools.ProfileKCore [sfDir] [reps] [k]
  */
object ProfileKCore {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps  = args.lift(1).map(_.toInt).getOrElse(3)
    val k     = args.lift(2).map(_.toInt).getOrElse(80)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val li = Tables
      .lineitem(spark, sfDir)
      .select($"l_orderkey".as("ok"), $"l_partkey".as("pk"))
    def und = li
      .as("x")
      .join(li.as("y"), $"x.ok" === $"y.ok" && $"x.pk" < $"y.pk")
      .select($"x.pk".as("a"), $"y.pk".as("b"))
      .distinct()
    def edges = und
      .select($"a".as("src"), $"b".as("dst"))
      .unionAll(und.select($"b".as("src"), $"a".as("dst")))

    val t0 = System.nanoTime()
    val n0 = edges.count()
    println(f"[profile] edge build: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n0 rows)")

    for {
      sweeps <- Seq(19, 10, 5)
      r <- 1 to reps
    } {
      val t = System.nanoTime()
      val n = Graph.kCore(edges, k, maxSweeps = sweeps).count()
      println(f"[profile] run $r maxSweeps=$sweeps: ${(System.nanoTime() - t) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
