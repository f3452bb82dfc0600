package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-19 gates: the cross-run dedup-store compaction drill
  * (q356/q357/q358 — fragment into the nightly-append layout, compact,
  * serve the SAME readout), the Gorilla null-element rejection, the
  * q348 ledger's zero-new-chunk batch row, and the empty-table
  * broadcast-advice verdict (r18 advice items).
  */
class Round19Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  // ---- q356/q357/q358: store compaction serves identical state ---------

  test("q357: sig-store readout identical before and after compaction") {
    val store = spark.read.parquet(
      s"${ops.Dedup.sigStore(spark, sf)}/sigs")
    val direct = ops.Dedup.sigStoreReadout(spark, store).collect()
    val served = SparkEntry.queries("q357_sig_store_compaction")(spark, sf)
      .collect()
    assert(served.toSeq == direct.toSeq,
      "compacted sig store served a different readout")
    assert(direct.map(_.getAs[Long]("n_docs")).sum ==
      store.count(), "readout must cover every stored signature row")
  }

  test("q358: chunk-store ledger identical before and after compaction") {
    val direct = SparkEntry.queries("q348_cdc_chunk_store")(spark, sf)
      .collect()
    val served = SparkEntry.queries("q358_chunk_store_compaction")(
      spark, sf).collect()
    assert(served.toSeq == direct.toSeq,
      "compacted chunk store served a different batch ledger")
    assert(served.length == 2, "the 2-row batch ledger contract")
  }

  test("q356: compacted passage store is row-identical to the original") {
    // the oracle certifies the SERVED readout externally; this pins the
    // stronger internal claim — the compacted store holds exactly the
    // original winner rows (and the byte-carry/skip/collapse proofs ran
    // in-plan via fragmentCompactServe's requires)
    val original = spark.read.parquet(
      s"${ops.Text.passageStore(spark, sf)}/store")
    SparkEntry.queries("q356_passage_store_compaction")(spark, sf).count()
    val tag = sf.replaceAll("[^A-Za-z0-9]", "_")
    val compacted = spark.read.parquet(
      s"target/graft_text_store/q356_compact_$tag/compacted").drop("pb")
      .select(original.columns.map(col): _*)
    assert(compacted.except(original).isEmpty &&
      original.except(compacted).isEmpty,
      "compaction changed the passage-store row set")
    assert(compacted.count() == original.count(),
      "compaction changed the passage-store row count (dup check)")
  }

  test("store compaction: fragmented layout actually collapsed and pb=0 byte-carried") {
    val tag = sf.replaceAll("[^A-Za-z0-9]", "_")
    val root = s"target/graft_text_store/q356_compact_$tag"
    // q356 above already ran the drill; read both layouts
    val before = ops.Corpus.storeLayout(s"$root/fragmented")
    val after = ops.Corpus.storeLayout(s"$root/compacted")
    assert(before.dirs.keySet == after.dirs.keySet)
    // buckets 1..7 took 3 sprayed writes — over-fragmented by
    // construction — and must collapse; bucket 0 is right-sized by
    // construction and must carry over exactly
    assert(after.files < before.files,
      s"no collapse: ${before.files} -> ${after.files}")
    assert(before.dirs("pb=0") == after.dirs("pb=0"),
      "right-sized pb=0 must be skipped and hard-copied")
    assert(before.dirs("pb=0")._1 == 1, "pb=0 staged as a single file")
    // at least one fragmented dir existed (files > size-derived target)
    assert(before.files > before.dirs.size,
      "staging produced no fragmentation — the drill tests nothing")
  }

  // ---- r18 advice regressions ------------------------------------------

  test("gorilla_encode rejects null elements instead of corrupting") {
    import spark.implicits._
    Gorilla19Fixtures.register(spark)
    val ok = Seq((Array(1L, 2L, 3L), Array(1.0, 2.0, 3.0)))
      .toDF("ts", "vs")
      .select(expr("gorilla_decode(gorilla_encode(ts, vs))").as("d"))
      .select(expr("d.ts").as("ts"), expr("d.vs").as("vs"))
      .collect().head
    assert(ok.getSeq[Long](0) == Seq(1L, 2L, 3L))
    val e = intercept[Exception] {
      spark.sql(
        "SELECT gorilla_encode(array(1L, NULL, 3L), " +
          "array(double(1.0), double(2.0), double(3.0)))")
        .collect()
    }
    def rootMsg(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | "))
    assert(rootMsg(e).contains("null element"),
      s"expected the loud null rejection, got: ${rootMsg(e)}")
  }

  test("q348 ledger keeps a row for a fully-deduplicated batch") {
    import spark.implicits._
    // batch 1 (doc_id % 10 >= 8) duplicates batch-0 text exactly →
    // zero new chunk winners; the ledger must still carry its row with
    // n_new_chunks = 0, not drop it (r18 advice: left join + coalesce)
    val base = (0L to 7L).map(i =>
      (i, s"alpha bravo charlie delta echo foxtrot golf hotel " * 8 +
        s"tail$i"))
    val dup = Seq((8L, base(0)._2), (9L, base(1)._2))
    val docs = (base ++ dup).toDF("doc_id", "text")
    val tmp = "target/stage_test/q348_fulldup"
    graft.streaming.Streams.deleteStaged(java.nio.file.Paths.get(tmp))
    // single-FILE staging: StoreGuard.storeRoot edge-fingerprints the
    // named source file (the Round18bSpec pattern)
    val stage = s"$tmp/documents_tmp"
    docs.coalesce(1).write.mode("overwrite").parquet(stage)
    val part = scala.util.Using.resource(
      java.nio.file.Files.list(java.nio.file.Paths.get(stage))) { l =>
      import scala.jdk.CollectionConverters._
      l.iterator().asScala.find(_.toString.endsWith(".parquet")).get
    }
    java.nio.file.Files.move(part,
      java.nio.file.Paths.get(tmp, "documents.parquet"))
    graft.streaming.Streams.deleteStaged(java.nio.file.Paths.get(stage))
    val ledger = SparkEntry.queries("q348_cdc_chunk_store")(spark, tmp)
      .collect()
    assert(ledger.length == 2, s"expected 2 ledger rows, got ${ledger.length}")
    val b1 = ledger.find(_.getAs[Long]("batch") == 1L).get
    assert(b1.getAs[Long]("n_new_chunks") == 0L,
      "fully-duplicated batch must read n_new_chunks = 0")
    assert(b1.getAs[Long]("stored_bytes") == 0L)
    assert(b1.getAs[Long]("saved_bytes") == b1.getAs[Long]("chunk_bytes"))
  }

  // ---- q359: incremental ANALYZE ----------------------------------------

  test("q359: merge == recompute on exact stats; KMV NDV bounded") {
    val got = SparkEntry.queries("q359_incremental_analyze")(spark, sf)
      .collect()
    val full = ops.Analyze.tableStats(Tables.lineitem(spark, sf))
      .collect().map(r => r.getAs[String]("col_name") -> r).toMap
    assert(got.length == full.size, "one merged row per column")
    for (r <- got) {
      val name = r.getAs[String]("col_name")
      val f = full(name)
      // exact arms: merging per-batch partials must equal the one-scan
      // recompute EXACTLY (additive moments, min/max composition)
      assert(r.getAs[Long]("n_rows") == f.getAs[Long]("n_rows"), name)
      assert(r.getAs[Long]("n_null") == f.getAs[Long]("n_null"), name)
      assert(r.getAs[String]("min_v") == f.getAs[String]("min_v"), name)
      assert(r.getAs[String]("max_v") == f.getAs[String]("max_v"), name)
      assert(r.getAs[Long]("sum_len") == f.getAs[Long]("sum_len"), name)
      // sketch arm: below k the KMV is exhaustive (= exact NDV); at k
      // the estimate is bounded (k=64 ⇒ ~12.7% 1σ; 50% is a 4σ gate —
      // deterministic here, md5 has no seed)
      val ndv = f.getAs[Long]("ndv").toDouble
      val est = r.getAs[Double]("ndv_est")
      if (r.getAs[Long]("n_sketch") < ops.Analyze.KmvK)
        assert(est == ndv, s"$name: sub-k sketch must be exact")
      else assert(math.abs(est - ndv) / ndv <= 0.5,
        s"$name: ndv=$ndv est=$est")
    }
    // the store really is per-batch partials (the delta never re-scans
    // the base): both batches present, each with one row per column
    val parts = spark.read.parquet(
      s"${ops.Analyze.incrStatsStore(spark, sf)}/partials")
    assert(parts.select("batch").distinct().count() == 2)
    assert(parts.count() == 2L * full.size)
  }

  test("adviseBroadcast returns a verdict for an empty table") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("k", "v")
    assert(ops.Analyze.adviseBroadcast(empty),
      "an empty build side is trivially broadcastable")
  }
}

/** q349's SQL registration is session-global but test order is not —
  * register-on-demand for the Gorilla SQL surface this spec exercises.
  */
private object Gorilla19Fixtures {
  def register(s: org.apache.spark.sql.SparkSession): Unit =
    graft.functions.Gorilla.register(s)
}
