package graft.tools

import graft.Tables
import graft.ops.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level profiler for the near-dup queries (q35/q36) — answers
  * "where does the wall-clock go" with HONEST probes: every stage is
  * materialized through the `noop` sink (full evaluation, no driver
  * collect, nothing for Catalyst to prune — probes that only consume
  * `size()` of a computed array measure nothing because the optimizer
  * deletes the computation).
  *
  * Usage: runMain graft.tools.ProfileDedup [sfDir] [reps]
  */
object ProfileDedup {

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  private def sink(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps  = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.expressions.Window

    val docs = Tables.documents(spark, sfDir)
    // JVM/codegen warm-up so stage timings are not dominated by the
    // first-query compilation cost.
    sink(docs)

    def report(name: String)(f: => Unit): Unit = {
      val ts = (1 to reps).map(_ => time(f))
      println(f"PROFILE $name%-28s min=${ts.min}%6.3f s  runs=" +
        ts.map(t => f"$t%.3f").mkString(","))
    }

    // ---- q35 minhash stages (mirrors Dedup.minhashPairs internals) ----
    val numHashes = 32; val bands = 8; val rows = numHashes / bands
    def sketched = docs.select(
      col("doc_id").as("doc"),
      Dedup.shingleHashes(col("text")).as("sh"),
    ).withColumn("sig", Dedup.minhashSignature(col("sh"), numHashes))

    report("m1_shingle_only_HOF")(sink(docs.select(
      Dedup.shingleHashes(col("text")).as("sh"))))
    report("m1b_shingle_native")(sink(docs.select(
      graft.functions.TextHashExprs
        .shingleHashes(spark, col("text"), 3).as("sh"))))
    report("m2_shingle+sig_HOF")(sink(sketched))
    report("m2b_sketch_native")(sink(docs.select(
      col("doc_id").as("doc"),
      graft.functions.TextHashExprs
        .shingleHashes(spark, col("text"), 3).as("sh"),
    ).withColumn("sig",
      graft.functions.TextHashExprs.minhashSig(spark, col("sh"), numHashes))))
    def banded = sketched.select(
      col("doc"),
      explode(array((0 until bands).map(b => struct(
        lit(b).as("band"),
        xxhash64(lit(b), slice(col("sig"), b * rows + 1, rows)).as("bkey"),
      )): _*)).as("bk"),
    ).select(col("doc"), col("bk.band"), col("bk.bkey"))
    report("m3_sketch+band")(sink(banded))
    report("m4_band+bucketjoin") {
      val bucketed = banded.withColumn("bsize",
        count(lit(1)).over(Window.partitionBy("band", "bkey")))
        .filter(col("bsize") <= 64)
      val l = bucketed.select(col("band"), col("bkey"), col("doc").as("a"))
      val r = bucketed.select(col("band"), col("bkey"), col("doc").as("b"))
      sink(l.join(r, Seq("band", "bkey")).filter(col("a") < col("b"))
        .select(col("a"), col("b")).dropDuplicates("a", "b"))
    }
    report("m5_full_minhashPairs")(sink(
      Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.5)))

    // ---- q36 simhash stages ----
    report("s1_sketch_only")(sink(docs.select(
      Dedup.simhash64(col("text")).as("sim"))))
    report("s2_full_simhashPairs")(sink(
      Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)))

    spark.stop()
  }
}
