package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-20 optimization gates: the layout-adaptive compute spread
  * (`Scale.spreadIfNarrow`) that parallelizes per-row-expensive stages
  * over single-split bench inputs without changing any result — and
  * without firing at production split counts.
  */
class Round20bSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("spreadIfNarrow widens a narrow scan to defaultParallelism, keyed") {
    val docs = Tables.documents(spark, sf)
    val spread = ops.Scale.spreadIfNarrow(docs, col("doc_id"))
    // the spread must be a real hash repartition (deterministic under
    // task retries), at the session's parallelism
    assert(spread.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism,
      "narrow scan was not spread to defaultParallelism")
    val plan = spread.queryExecution.optimizedPlan.toString
    assert(plan.contains("doc_id"),
      s"spread is not keyed by the requested column:\n$plan")
    // row multiset unchanged — the helper is a layout hint, never a
    // semantic operator
    assert(spread.count() == docs.count())
  }

  test("spreadIfNarrow is the identity when the scan already has enough splits") {
    val key = "spark.sql.files.maxPartitionBytes"
    val saved = spark.conf.get(key)
    try {
      // shrink the split size so even the tiny test file counts as
      // >= cores splits — the helper must then return the frame AS IS
      spark.conf.set(key, "1024")
      val docs = Tables.documents(spark, sf)
      val spread = ops.Scale.spreadIfNarrow(docs, col("doc_id"))
      assert(spread eq docs,
        "spread fired on a wide layout — at production split counts " +
          "this would add a payload-sized exchange")
    } finally spark.conf.set(key, saved)
  }

  test("spreadIfNarrow is the identity on a non-file source (ExistingRDD)") {
    import spark.implicits._
    // an unlistable input (no file scan behind it) must resolve to
    // identity — the conservative default when the layout is unknowable
    // is "assume wide", never a payload-sized exchange (r20 verdict
    // item 7: the old fail-narrow default would repartition exactly the
    // frames whose layout the helper cannot see)
    val rdd = spark.sparkContext.parallelize(Seq((1L, "a"), (2L, "b")), 2)
    val df = rdd.toDF("doc_id", "text")
    assert(df.inputFiles.isEmpty, "fixture must be a non-file source")
    val spread = ops.Scale.spreadIfNarrow(df, col("doc_id"))
    assert(spread eq df,
      "spread fired on an unlistable source — estimation failure must " +
        "default to identity (assume wide)")
  }

  test("sweepStaleSiblings is scoped to the source dir (r21 fix)") {
    // the pre-r21 any-sibling sweep made a verify at sf0.01 destroy the
    // sf0.1 erasure stores (and vice versa): every SF-alternating run
    // paid a full store rebuild. The sweep must delete (a) same-dir
    // stale freshness siblings and (b) pre-migration single-tag roots,
    // and must KEEP other source dirs' live stores.
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_sweep20b").toString
    val d1 = "/root/testdata/sf0.001"
    val d2 = "/root/testdata/sf0.01"
    val t1 = ops.StoreGuard.dirTag(d1)
    val t2 = ops.StoreGuard.dirTag(d2)
    def mk(name: String): Unit =
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(tmp, name))
    val live = s"p_${t1}_aaaa"
    Seq(live, s"p_${t1}_bbbb", s"p_${t2}_cccc", "p_deadbeef01",
      "q_other").foreach(mk)
    ops.StoreGuard.sweepStaleSiblings(spark, tmp, "p", d1, Set(live))
    def exists(n: String): Boolean =
      java.nio.file.Files.exists(java.nio.file.Paths.get(tmp, n))
    assert(exists(live), "the live root must survive")
    assert(!exists(s"p_${t1}_bbbb"), "same-dir stale sibling must die")
    assert(!exists("p_deadbeef01"), "pre-migration root must die")
    assert(exists(s"p_${t2}_cccc"),
      "ANOTHER source dir's live store must survive the sweep")
    assert(exists("q_other"), "other prefixes untouched")
    graft.streaming.Streams.deleteStaged(java.nio.file.Paths.get(tmp))
  }

  test("q132/q264/q301/q343/q344 stay row-identical under the spread") {
    // the spread sites' results must not depend on the layout hint:
    // compare each against itself computed with the spread suppressed
    // (wide-layout conf), row multiset equality
    val names = Seq("q132_top_ngram", "q264_dup_spans",
      "q301_fuzzy_decontam", "q343_corpus_bleu", "q344_rouge_n")
    val key = "spark.sql.files.maxPartitionBytes"
    val saved = spark.conf.get(key)
    for (n <- names) {
      val withSpread = SparkEntry.queries(n)(spark, sf).collect()
        .map(_.toString).sorted.toSeq
      val without =
        try {
          spark.conf.set(key, "1024") // helper sees a wide layout -> no-op
          SparkEntry.queries(n)(spark, sf).collect()
            .map(_.toString).sorted.toSeq
        } finally spark.conf.set(key, saved)
      assert(withSpread == without, s"$n rows changed under the spread")
    }
  }
}
