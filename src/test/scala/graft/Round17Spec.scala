package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-17 gates. Headline item from the r16 verdict: the q299
  * single-partition-window lock GENERALIZED — the q306/q314/q316
  * collation family's corpus-sized `row_number().over(Window.orderBy)`
  * is replaced by [[ops.Rank]]'s two-pass prefix-sum device (shared
  * with q319's resumableSchedule), and BOTH layers are now audited
  * codebase-wide: every registered query's physical plan is walked for
  * partition-less `WindowExec`s, and every `Window.orderBy`/
  * `Window.rowsBetween` source site must sit on the bounded-frame
  * allowlist below with its bound stated.
  */
class Round17Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** The driver's tables are single parquet FILES (StoreGuard
    * fingerprints them directly) — stage the dir write, keep the part.
    */
  private def writeSingleParquet(
      df: org.apache.spark.sql.DataFrame, dest: String): Unit = {
    val tmp = dest + "_tmp"
    df.coalesce(1).write.parquet(tmp)
    val part = scala.util.Using.resource(
      java.nio.file.Files.list(java.nio.file.Paths.get(tmp))) { l =>
      import scala.jdk.CollectionConverters._
      l.iterator().asScala.find(_.toString.endsWith(".parquet")).get
    }
    java.nio.file.Files.move(part, java.nio.file.Paths.get(dest))
    streaming.Streams.deleteStaged(java.nio.file.Paths.get(tmp))
  }

  // ---- layer 1: source audit of global-window constructors -----------

  test("source audit: global windows only at audited bounded-frame sites") {
    // Every partition-less window constructor in src/main must be on
    // this allowlist, each with the bound that justifies it. A global
    // window moves its WHOLE input through one task, so the bound must
    // be a DOMAIN bound (types, hours, days, top-K, bins), never a
    // corpus bound. Corpus-sized ranks/cumulations use ops.Rank's
    // two-pass prefix sum (q306/q314/q316 collation, q268 threshold,
    // q319 schedule) or a broadcast 1-row aggregate (q258/q287/q299).
    val allow = Map(
      // q262/q272 rank fusion + IR metrics: every window input is a
      // TakeOrderedAndProject top-K (K=20) or the graded-truth top-K;
      // q148's two empty partitionBy() frames and q334's/q340's
      // remainder ranks run on the |langs|-row language histogram
      // (q340's corpus-sized FILL cumulation is Rank.runningSum, not
      // a window)
      "src/main/scala/graft/ops/Corpus.scala" -> 9,
      // q241 cents-histogram CDF (distinct price cents — a price
      // DOMAIN bound), q247 isotonic bins, q234's 5-type frequency CDF,
      // q243's 5 p-values, q252's treated/control cents histogram
      "src/main/scala/graft/ops/Eval.scala" -> 8,
      // q283 binary segmentation + q284 ACF run on per-DAY / per-HOUR
      // series (calendar-bounded); the q204 incident window at :1992
      // is hourly too; q345's rank orders the 47-row candidate-period
      // table (a period-grid DOMAIN bound)
      "src/main/scala/graft/ops/Events.scala" -> 10,
      // q311's event-type marginal back-off: |types| = 5 rows
      "src/main/scala/graft/ops/Sequence.scala" -> 1,
      // q157's above-average cut over the |types|-row totals — kept a
      // real Filter node deliberately so DPP attaches its subquery
      "src/main/scala/graft/ops/Sources.scala" -> 1,
      // q185/q194 variant pairs and q195's type histogram: group-count
      // bounded (variants × metrics, 5 types); +1 r19: q367's MG rank
      // over a top-(k+1) = 17-row limited frame
      "src/main/scala/graft/ops/Stats.scala" -> 3,
      // q151/q183's token-count frontier: distinct n_tokens values — a
      // max DOC-LENGTH domain bound, not a corpus bound
      "src/main/scala/graft/ops/Text.scala" -> 1,
      // r19 q364: the cumulative walk over the VALUE-grain merged
      // histogram (distinct prices, never rows — the two-level
      // coarse/refine swap is the documented extreme-cardinality
      // path) and the 9-row boundary lead()
      "src/main/scala/graft/ops/Analyze.scala" -> 2,
    )
    val pat = ("(?<![A-Za-z0-9_])Window\\s*\\.\\s*" +
      "(orderBy|rowsBetween|rangeBetween|partitionBy\\(\\s*\\))").r
    val found = scala.collection.mutable.Map.empty[String, Int]
    val base = java.nio.file.Paths.get("src/main/scala")
    java.nio.file.Files.walk(base).forEach { p =>
      if (p.toString.endsWith(".scala")) {
        val body = new String(java.nio.file.Files.readAllBytes(p),
            java.nio.charset.StandardCharsets.UTF_8)
          .linesIterator
          .filterNot { l =>
            val t = l.trim
            t.startsWith("*") || t.startsWith("//")
          }
          .mkString(" ")
        val n = pat.findAllIn(body).size
        if (n > 0) found(p.toString) = n
      }
    }
    assert(found.toMap == allow,
      s"global-window sites drifted from the audited allowlist:\n" +
        s"found  = ${found.toMap}\nallow  = $allow\n" +
        "New partition-less windows must either use ops.Rank / a " +
        "broadcast 1-row aggregate, or be added here WITH their bound.")
  }

  // ---- layer 2: physical plans of ALL registered queries -------------

  test("plan audit: no registered query plans an unaudited global WindowExec") {
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    // Queries whose final plans legitimately carry a partition-less
    // WindowExec — each traced to a source-audit site above and
    // bounded by a DOMAIN (types, langs, hours/days, price cents,
    // top-K, doc-length), never the corpus. (A bounded global window
    // that runs EAGERLY behind a localCheckpoint never shows in the
    // final plan; the source audit above is the layer covering those.)
    val allow = Set(
      "q148_temp_mixture",      // |langs|-row temperature histogram
      "q151_pareto_skyline",    // per-x frontier: doc-length DOMAIN
      "q157_dynamic_prune",     // |types|-row totals (Filter, for DPP)
      "q194_cuped",             // variant-pair covariance rows
      "q195_chi2_srm",          // 5-type histogram
      "q204_interval_overlap",  // hourly incident table
      "q241_gains_table",       // cents-histogram CDF (price domain)
      "q243_bh_fdr",            // 5 p-values
      "q247_isotonic_calibration", // score bins (2^40-key bounded)
      "q252_qini_uplift",       // treated/control cents histogram
      "q262_hybrid_rrf",        // two top-K (K=20) rank lists
      "q272_ir_metrics",        // top-K system/ideal rank lists
      "q283_changepoints",      // per-day series
      "q284_periodicity",       // per-hour series + maxLag
      "q345_epoch_folding",     // 47-row candidate-period grid
      "q311_next_event_serving", // 5-row type marginal back-off
      "q364_range_selectivity", // value-grain histogram walk + 9-row
                                // boundary lead (see the source audit)
      "q366_boundary_store",    // the same 9-row boundary lead, served
                                // from the persisted artifact
      "q367_heavy_hitters_mg",  // MG ranks over 17-row limited frames
      // (q334's |langs|-row remainder rank runs EAGERLY behind its
      // localCheckpoint, so it never reaches the final plan — the
      // SOURCE audit above is the layer covering it)
    )
    // same skips as PlanSpec's cartesian audit: streaming entries whose
    // construction RUNS a query (q315/q323 run complete streaming
    // pipelines at plan time — their batch tails are their own gates),
    // and the gen_ generator family (locked by GenSpec/ScheduleSpec +
    // the source audit above)
    val skip = Set("q73_stream_hourly", "q92_stream_enrich",
      "q315_stream_foldin", "q323_serving_cutover",
      "q327_live_compaction", "q330_stream_erasure")
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(_.startsWith("gen_")).filterNot(skip)
      .flatMap { q =>
        val plan = SparkEntry.queries(q)(spark, sf).queryExecution.sparkPlan
        // main-plan walk; subquery plans are still LOGICAL at this
        // stage so they can't be walked for WindowExec here — the
        // SOURCE audit above is the layer that covers window
        // construction everywhere, including inside subqueries
        val global = plan.collect {
          case w: WindowExec if w.partitionSpec.isEmpty => w.nodeName
          case w: WindowGroupLimitExec if w.partitionSpec.isEmpty =>
            w.nodeName
        }
        if (global.nonEmpty) Some(q) else None
      }.toSet
    assert(offenders == allow,
      "partition-less WindowExec set drifted from the audited " +
        s"allowlist:\nfound = $offenders\nallow = $allow")
  }

  // the collation family specifically must be clean — it is the r16
  // verdict's one plan defect and must never regress back
  test("q306/q314/q316 plans carry NO partition-less window") {
    import org.apache.spark.sql.execution.window.WindowExec
    for (q <- Seq("q306_clip_collation", "q314_crossmodal_recall",
        "q316_crossmodal_alignment")) {
      val plan = SparkEntry.queries(q)(spark, sf).queryExecution.sparkPlan
      val bad = plan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      assert(bad.isEmpty, s"$q regressed to a global window:\n$plan")
    }
  }

  // ---- q321: index-store compaction -----------------------------------

  test("q321: compaction collapses files per dir, keeps layout pruned") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    // run the registered query (it builds fragmented + compacted and
    // carries its own require gates); then inspect the layouts
    assert(SparkEntry.queries("q321_index_compaction")(spark, sf)
      .count() == 10)
    val tag = sf.replaceAll("[^A-Za-z0-9]", "_")
    val root = s"target/stage_corpus/q321_compact_$tag"
    val before = ops.Corpus.storeLayout(s"$root/fragmented")
    val after = ops.Corpus.storeLayout(s"$root/compacted")
    // same partition directories, strictly fewer files in each touched
    // dir (the 3 appends put >= 3 files everywhere; at this SF each
    // bucket is far under the 256 KB target, so the plan is 1 file/dir)
    assert(before.dirs.keySet == after.dirs.keySet)
    for ((dir, (nIn, bytes)) <- before.dirs) {
      val nOut = after.dirs(dir)._1
      val want = math.max(1L, (bytes + 256L * 1024 - 1) / (256L * 1024))
      assert(nOut <= want, s"$dir: $nOut files > size-derived $want")
      assert(nOut < nIn, s"$dir: $nIn -> $nOut did not collapse")
    }
    // rewrite preserved every row bit-exactly (store-level, on top of
    // the registered oracle gate)
    val a = spark.read.parquet(s"$root/fragmented")
      .select($"term", $"doc_id", $"tf", $"pb").collect().toSet
    val b = spark.read.parquet(s"$root/compacted")
      .select($"term", $"doc_id", $"tf", $"pb").collect().toSet
    assert(a == b, "compaction changed store content")
    // the compacted store still partition-prunes on the bucket column
    val pruned = spark.read.parquet(s"$root/compacted")
      .filter($"pb" === 3)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(pb"),
      s"bucket cut not pruned at the scan:\n$plan")
    // SKIP metrics: re-compacting the already-tidy store must rewrite
    // NOTHING — every dir skipped, every file hard-copied byte-for-byte
    // (on a month-old store this is the ~99% of shards a maintenance
    // run must not touch)
    val (_, after2, skipped) = ops.Corpus.compactPartitionedStore(
      spark, s"$root/compacted", s"$root/recompacted", "pb", "term",
      targetBytes = 256L * 1024)
    assert(skipped == after.dirs.size,
      s"re-compaction skipped $skipped of ${after.dirs.size} tidy dirs")
    assert(after2.dirs == after.dirs,
      "skip path changed the layout it was supposed to leave alone")
    val c = spark.read.parquet(s"$root/recompacted")
      .select($"term", $"doc_id", $"tf", $"pb").collect().toSet
    assert(c == b, "skip path changed store content")
  }

  // ---- q322: manifest v4 — every stage provably fires -----------------

  test("q322: every composed stage moves the ledger (q142's lesson)") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    // sf0.01: the semantic prune needs near-dup cosine pairs to exist
    // (q55 finds them at this SF; 0.001's 50 vectors may not collide)
    val d = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("q322_manifest_v4")(spark, d).collect()
    val v1docs = rows.filter(_.getLong(0) == 1L).map(_.getLong(2)).sum
    val v2docs = rows.filter(_.getLong(0) == 2L).map(_.getLong(2)).sum
    val offered = Tables.documents(spark, d).count()
    // fertility gate fired: v1 ships fewer docs than offered
    assert(v1docs < offered, s"fertility gate pruned nothing: " +
      s"$v1docs of $offered")
    // semantic prune fired: v2 ships fewer than v1
    assert(v2docs < v1docs, s"semantic prune pruned nothing: " +
      s"v1=$v1docs v2=$v2docs")
    // schedule fired: multiple shards, contiguous dense step ranges
    val v2 = rows.filter(_.getLong(0) == 2L).sortBy(_.getLong(1))
    assert(v2.length > 1, "schedule produced a single shard")
    for (r <- v2) {
      val (shard, n, lo, hi) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(lo == shard * 64 && hi == lo + n - 1,
        s"shard $shard steps not dense: [$lo,$hi] n=$n")
    }
    // registry lineage fired: both versions committed and re-readable
    val root = ops.StoreGuard.storeRoot(spark, "target/graft_text_store",
      "mf4", d, "documents.parquet", ops.Text.embFreshness(spark, d))
    val log = new streaming.StoreLog(java.nio.file.Paths.get(root), "mf")
    assert(log.versions() == Seq(1L, 2L))
    // read-back ≡ a direct recompute of the same version
    val direct = ops.Text.manifestV4Version(spark, d, semantic = true)
      .collect().map(_.toSeq).toSet
    val reread = log.asOf(spark, 2L).get.collect().map(_.toSeq).toSet
    assert(reread == direct, "v2 read-back diverged from recompute")
  }

  // ---- q325: incremental v4 — genuinely incremental, replay-safe ------

  test("q325 runs from the persisted base states and replays identically") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val d = "/root/testdata/sf0.01"
    val first = SparkEntry.queries("q325_manifest_v4_incremental")(
      spark, d).collect().map(_.toSeq)
    // the persisted base states are the BASE slice only — the delta's
    // text was never priced into the store (the incremental claim)
    val root = ops.StoreGuard.storeRoot(spark, "target/graft_text_store",
      "mf4inc", d, "documents.parquet", ops.Text.embFreshness(spark, d))
    val econ = spark.read.parquet(s"$root/econ")
    val nBase = Tables.documents(spark, d)
      .where($"doc_id" % 10 < 8).count()
    assert(econ.count() == nBase, "econ store is not the base slice")
    assert(econ.filter($"doc_id" % 10 >= 8).count() == 0,
      "delta docs leaked into the persisted base pricing")
    // replay: a second run reads the same stores and emits the same rows
    val second = SparkEntry.queries("q325_manifest_v4_incremental")(
      spark, d).collect().map(_.toSeq)
    assert(first.toSeq == second.toSeq, "q325 replay diverged")
    // and the incremental ledger IS q322's v2 ledger (same pipeline,
    // maintained vs rebuilt) — the in-repo half of the oracle identity
    val v2 = SparkEntry.queries("q322_manifest_v4")(spark, d)
      .filter($"version" === 2L)
      .select($"shard", $"n_docs", $"min_step", $"max_step",
        $"n_words", $"n_pieces")
      .collect().map(_.toSeq)
    assert(first.toSeq == v2.toSeq, "incremental != rebuilt v2 ledger")
  }

  // ---- q319 at trainer fan-out: disjoint pruned worker reads ----------

  test("q319 manifest serves W workers disjoint partition-pruned slices") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val shardSize = 64L
    val path = ops.Corpus.scheduleStore(spark, sf, "graft", epochs = 2,
      shardSize = shardSize)
    // epoch 0's shard grid — each worker w reads exactly shard w
    val nDocs = Tables.documents(spark, sf).count()
    val workers = (0L until (nDocs + shardSize - 1) / shardSize).toSeq
    val slices = workers.map { w =>
      val slice = spark.read.parquet(path)
        .filter($"epoch" === 0 && $"shard" === w)
        .select($"step", $"doc_id")
      val plan = slice.queryExecution.executedPlan.toString
      // the worker cut reaches the FILE INDEX: epoch and shard are
      // directory columns, so un-asked shards are never listed or read
      assert(plan.contains("PartitionFilters:") &&
        plan.contains(s"(shard#") && plan.contains("= " + w + ")"),
        s"worker $w read not partition-pruned:\n$plan")
      slice.collect().map(r => (r.getLong(0), r.getLong(1)))
    }
    // disjoint + union ≡ the epoch's full schedule
    val all = slices.flatten
    assert(all.length == all.map(_._1).distinct.length,
      "worker slices overlap")
    val want = ops.Corpus
      .resumableSchedule(Tables.documents(spark, sf), "graft", epochs = 2)
      .filter($"epoch" === 0).select($"step", $"doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(all.toSet == want.toSet,
      "union of worker slices != the epoch schedule")
  }

  test("compaction verb on q184's delta-appended IVF cells: probe-identical") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    // q184 builds its store as base write + delta APPEND — the exact
    // fragmented layout the r16 verdict named. Run it, then compact
    // with the SAME generic verb q321 uses and prove the probe path is
    // row-identical on the compacted store.
    SparkEntry.queries("q184_ivf_incremental")(spark, sf).collect()
    val idx = ops.Vectors.q184IndexRoot(sf) + "/index"
    val out = ops.Vectors.q184IndexRoot(sf) + "/index_compacted"
    val (before, after, _) = ops.Corpus.compactPartitionedStore(
      spark, idx, out, "cell", "vec_id", targetBytes = 256L * 1024)
    assert(before.dirs.keySet == after.dirs.keySet,
      "compaction changed the cell layout")
    assert(after.files < before.files,
      s"append-fragmented index did not collapse: " +
        s"${before.files} -> ${after.files}")
    // content bit-exact
    val a = spark.read.parquet(idx)
      .select($"vec_id", $"label", $"cell").collect().toSet
    val b = spark.read.parquet(out)
      .select($"vec_id", $"label", $"cell").collect().toSet
    assert(a == b, "compaction changed index content")
    // the SERVING path (cell-pruned probe) is row-identical
    val emb = Tables.embeddings(spark, sf)
    val cents = ops.Vectors.ivfCentroids(
      emb.filter($"vec_id" % 10 < 8 && $"vec_id" =!= 0L), 16)
    def probe(p: String) = ops.Vectors.probeDiskIndex(
      spark, p, emb, queryVecId = 0L, cents, nCells = 16,
      nProbe = 4, k = 10).collect().toSeq
    assert(probe(idx) == probe(out),
      "probe results diverged on the compacted index")
  }

  // ---- Rank device: exact equivalence to the textbook windows --------

  // ---- q320: registry-driven serving cutover --------------------------

  test("q320: asOf(v) serving ≡ a direct index built from that version") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val rows = SparkEntry.queries("q320_registry_serving")(spark, sf)
      .collect()
    assert(rows.nonEmpty, "q320 returned no rows")
    val versions = rows.map(_.getLong(0)).distinct.sorted
    assert(versions.toSeq == Seq(1L, 2L),
      s"expected v1 AND v2 rows (rollback = the v1 half), got $versions")
    // the cutover/rollback identity: serving registry version v must
    // be bit-identical to building an index DIRECTLY from the same
    // version's retrained vectors and probing it — v1 from the base
    // pair store's model, v2 from the refreshed full model
    val direct = Map(
      1L -> ops.Graph.nodeEmbeddingsFromPairs(
        ops.Graph.basePairStore(spark, sf), dim = 8),
      2L -> ops.Graph.embeddingStore(spark, sf))
    for ((v, model) <- direct) {
      val vecs = model
        .select($"node", ops.Graph.microVec($"embedding").as("vmic"))
        .withColumn("n2", ops.Graph.dotLong($"vmic", $"vmic"))
        .filter($"n2" > 0L)
      val dir = java.nio.file.Files
        .createTempDirectory(s"r17_direct_v$v").toString
      val (p, c) = ops.Graph.buildIvfAt(spark, dir, vecs, nCells = 4)
      val want = ops.Graph.annRecallFromIndex(spark, p, c)
        .collect().map(_.toSeq).toSet
      val got = rows.filter(_.getLong(0) == v)
        .map(_.toSeq.drop(1)).toSet
      assert(got == want,
        s"asOf($v) serving diverged from the direct v$v build:\n" +
          s"got  = $got\nwant = $want")
    }
  }

  // ---- q323: live cutover ≡ cold start on each version ----------------

  test("q323: mid-stream pointer flips serve exactly the cold-start rows") {
    val live = SparkEntry.queries("q323_serving_cutover")(spark, sf)
      .collect()
    // three phases, served by versions 1, 2, 1 — the live rollback
    val byPhase = live.groupBy(_.getLong(0))
    assert(byPhase.keySet == Set(0L, 1L, 2L))
    assert(byPhase(0L).map(_.getLong(1)).distinct.toSeq == Seq(1L))
    assert(byPhase(1L).map(_.getLong(1)).distinct.toSeq == Seq(2L))
    assert(byPhase(2L).map(_.getLong(1)).distinct.toSeq == Seq(1L))
    // each phase row-identical to q320's COLD start on that version
    val cold = SparkEntry.queries("q320_registry_serving")(spark, sf)
      .collect().groupBy(_.getLong(0))
      .map { case (v, rs) => v -> rs.map(_.toSeq.drop(1)).toSet }
    def phaseRows(p: Long) =
      byPhase(p).map(_.toSeq.drop(2)).toSet
    assert(phaseRows(0L) == cold(1L), "phase 0 != cold v1")
    assert(phaseRows(1L) == cold(2L), "phase 1 != cold v2")
    assert(phaseRows(2L) == cold(1L), "rollback phase != cold v1")
  }

  test("Rank.globalRank ≡ row_number over a global order (randomized)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(17)
    val rows = (0 until 500).map(_ => rnd.nextLong())
      .distinct.zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val df = rows.toDF("id", "v").repartition(7)
    val got = ops.Rank.globalRank(df, Seq($"v", $"id"), "rk")
      .select($"id", $"rk")
    val want = df.withColumn("rk",
        row_number().over(Window.orderBy($"v", $"id")).cast("long") - 1L)
      .select($"id", $"rk")
    assert(got.collect().toSet == want.collect().toSet)
  }

  // ---- q326: manifest erasure — the non-monotone DELETE half ----------

  test("q326: erasure resurrects a doc whose only blocker was erased") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    // fixture: 1 ~ 3 ~ 9 a near-dup cluster (lowest id 1 survives;
    // 3, 9 dropped), 11 blocked ONLY by 3, 2 similar to nobody.
    // Erasing {3} (doc_id % 7 == 3) must (a) remove 3 everywhere,
    // (b) keep 9 dropped (1 still blocks it), (c) RESURRECT 11 —
    // the case q325's monotone delta merge cannot express.
    val dir = java.nio.file.Files.createTempDirectory("r17_era").toString
    writeSingleParquet(Seq(1L, 2L, 3L, 9L, 11L)
      .map(id => (id, "spark spark", "en", "fix", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"),
      s"$dir/documents.parquet")
    def unit(axis: Int): Array[Float] = {
      val a = new Array[Float](64); a(axis) = 1f; a
    }
    val v = (1.0 / math.sqrt(2)).toFloat
    val mix = { val a = new Array[Float](64); a(0) = v; a(1) = v; a }
    writeSingleParquet(
      Seq((1L, unit(0)), (9L, unit(0)), (3L, mix), (11L, unit(1)),
        (2L, unit(2)))
      .toDF("vec_id", "embedding").withColumn("label", lit(0)),
      s"$dir/embeddings.parquet")
    // "yesterday": the pre-request state — every blocking pair recorded
    val root = ops.Text.mf4ErasureState(spark, dir)
    val pairs = spark.read.parquet(s"$root/pairs")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 3L), (1L, 9L), (3L, 9L), (3L, 11L)),
      s"pair evidence wrong: $pairs")
    // "today": the erasure batch runs
    val out = SparkEntry.queries("q326_manifest_erasure")(spark, dir)
      .collect()
    // survivors = {1, 2, 11}: one shard, dense steps, 2 words/doc
    assert(out.map(_.toSeq).toSeq ==
      Seq(Seq(0L, 3L, 0L, 2L, 6L, 6L)),
      s"erasure ledger wrong: ${out.map(_.toSeq).toSeq}")
    // pre-erasure drops were {3, 9, 11}; post-erasure exactly {9}
    val survivors = ops.Text.mf4EraseSurvivors(spark, dir)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors == Set(1L, 2L, 11L),
      s"post-erasure survivors wrong: $survivors")
    // the rewritten evidence kept only survivor pairs, and the
    // superseded pre-erasure state was VACUUMED — payload AND marker
    // (a stranded marker would break the base store's self-heal)
    val keptPairs = spark.read.parquet(s"$root/erased_mod7ne3/pairs")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(keptPairs == Set((1L, 9L)), s"kept evidence wrong: $keptPairs")
    for (sub <- Seq("pairs", "econ", "_GRAFT_STORE_COMPLETE"))
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$root/$sub")),
        s"pre-erasure $sub not vacuumed")
    // self-heal: with the base marker vacuumed, re-ensuring the base
    // state rebuilds it from source instead of crashing on a missing
    // payload under a stale marker
    assert(ops.Text.mf4ErasureState(spark, dir) == root)
    assert(spark.read.parquet(s"$root/econ").count() == 5,
      "vacuumed base store did not self-heal on rebuild")
  }

  test("q326: erase path reads only the persisted state, never the corpus") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val d = "/root/testdata/sf0.01"
    val root = ops.Text.mf4EraseStateRoot(spark, d) // pure key
    val frame = ops.Text.mf4EraseSurvivors(spark, d)
    // sparkPlan, not executedPlan: the AQE wrapper hides the scans
    // from collect()
    val scans = frame.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec =>
        f.relation.location.rootPaths.mkString(",")
    }
    assert(scans.nonEmpty, "expected file scans of the state store")
    // the REWRITTEN store specifically — the pre-erasure base shares
    // the root prefix, so matching on the root alone would also pass a
    // regression that reads (and merely filters) the retained base
    assert(scans.forall(p => p.contains("mf4era") &&
      p.contains("erased_mod7ne3")),
      s"erase step scanned outside the rewritten store: $scans")
    // PHYSICAL forgetting: the rewritten store holds ZERO erased rows —
    // a read-time filter that retained them would fail GDPR's actual
    // obligation — every survivor is still priced, and the superseded
    // pre-erasure state is vacuumed
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val econ = spark.read.parquet(s"$root/erased_mod7ne3/econ")
    assert(econ.where($"doc_id" % 7 === 3).count() == 0,
      "erased docs still priced in the rewritten econ store")
    assert(econ.count() == Tables.documents(spark, d)
      .where($"doc_id" % 7 =!= 3).count(),
      "rewritten econ must still price every SURVIVING doc")
    assert(spark.read.parquet(s"$root/erased_mod7ne3/pairs")
      .where($"a" % 7 === 3 || $"b" % 7 === 3).count() == 0,
      "erased docs still present in the rewritten pair evidence")
    assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$root/econ")) &&
      !java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$root/pairs")),
      "pre-erasure state not vacuumed")
  }

  // ---- q327: compaction under a LIVE serving stream --------------------

  test("q327: every phase of the live swap serves identical exact BM25") {
    val rows = SparkEntry.queries("q327_live_compaction")(spark, sf)
      .collect()
    val byPhase = rows.groupBy(_.getLong(0))
    assert(byPhase.keySet == Set(0L, 1L, 2L), s"phases: ${byPhase.keySet}")
    // phase 0 = fragmented, 1 = compacted (cutover mid-stream),
    // 2 = rollback to the (unmutated) fragmented original — all three
    // row-identical, and identical to q167's direct full-corpus BM25
    val phase = (p: Long) => byPhase(p).map(_.toSeq.drop(1)).toSet
    assert(phase(0L) == phase(1L), "cutover changed the served rows")
    assert(phase(1L) == phase(2L), "rollback changed the served rows")
    val direct = SparkEntry.queries("q167_bm25_search")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(phase(0L) == direct, "served rows != direct corpus BM25")
    assert(byPhase(0L).length == 10)
  }

  // ---- q328: bulk ANN join ---------------------------------------------

  test("q328: full-probe ann join ≡ exact top-k join, row for row") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val d = "/root/testdata/sf0.01"
    val emb = Tables.embeddings(spark, d)
    val cents = ops.Vectors.ivfCentroids(emb, nCells = 16)
    val queries = emb.where($"vec_id" % 41 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qe"))
    val full = ops.Vectors
      .annJoin(emb, queries, cents, nCells = 16, nProbe = 16, k = 10)
      .select($"qid", $"vec_id", $"rn")
      .collect().map(_.toSeq).toSet
    val exact = ops.Vectors.exactJoinTopK(emb, queries, k = 10)
      .select($"qid", $"vec_id", $"rn")
      .collect().map(_.toSeq).toSet
    assert(full == exact,
      "nProbe = nCells did not degenerate to the exact join")
  }

  test("q328: partial probes hold a recall floor and actually prune") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val d = "/root/testdata/sf0.01"
    val emb = Tables.embeddings(spark, d)
    val n = emb.count()
    val cents = ops.Vectors.ivfCentroids(emb, nCells = 16)
    val queries = emb.where($"vec_id" % 41 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qe"))
    val nQ = queries.count()
    val ann = SparkEntry.queries("q328_ann_join")(spark, d)
    val exact = ops.Vectors.exactJoinTopK(emb, queries, k = 10)
    val hits = ann.select($"qid", $"vec_id")
      .join(exact.select($"qid", $"vec_id"), Seq("qid", "vec_id"))
      .count()
    // 4 of 16 cells probed: macro recall must beat random cell pickup
    // by a wide margin (random would be ~25%)
    val recall = hits.toDouble / (nQ * 10)
    assert(recall >= 0.5, f"bulk ANN recall $recall%.2f below floor 0.5")
    // the probe PRUNES: total candidates scored ≪ |Q| × corpus
    val probed = queries.withColumn("cell",
      explode(graft.functions.VectorExprs
        .vecTopCells(spark, $"qe", cents, 16, 64, 4)))
    val cand = ops.Vectors.ivfIndex(emb, cents, 16)
      .join(probed, Seq("cell"))
      .filter($"vec_id" =!= $"qid").count()
    assert(cand < nQ * n / 2,
      s"probe scored $cand of ${nQ * n} pairs — not pruning")
  }

  test("q328 plan: partitioned WindowGroupLimit top-k, no nested loop") {
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    val d = "/root/testdata/sf0.01"
    val df = SparkEntry.queries("q328_ann_join")(spark, d)
    // sparkPlan, not executedPlan: the AQE wrapper hides children
    val plan = df.queryExecution.sparkPlan
    val limits = plan.collect { case w: WindowGroupLimitExec => w }
    assert(limits.nonEmpty && limits.forall(_.partitionSpec.nonEmpty),
      s"per-query top-k is not a partitioned WindowGroupLimit:\n$plan")
    val global = plan.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(global.isEmpty, "global window in the ann join plan")
    val p = plan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"quadratic join shape in the serving plan:\n$p")
  }

  // ---- q329: training-statistic erasure (fold-out) ---------------------

  test("q329: erasure renormalizes the statistic, erased nodes leave") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val d = "/root/testdata/sf0.01"
    val era = SparkEntry.queries("q329_sppmi_erasure")(spark, d).collect()
    assert(era.nonEmpty)
    // erased nodes appear in NEITHER column
    assert(era.forall(r =>
      r.getLong(0) % 23 != 7 && r.getLong(1) % 23 != 7),
      "erased node survived in the folded-out matrix")
    // the statistic is NON-LOCAL: surviving pairs' values must move —
    // deleting only the erased rows without renormalizing would keep
    // q299's values verbatim
    val full = SparkEntry.queries("q299_shifted_ppmi")(spark, d)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val moved = era.count { r =>
      full.get((r.getLong(0), r.getLong(1)))
        .exists(_ != r.getDouble(3))
    }
    assert(moved > 0,
      "no surviving sppmi value moved — erasure did not renormalize")
    // the erase step reads ONLY the persisted pair store, and the
    // rewritten store PHYSICALLY forgot the erased nodes
    import org.apache.spark.sql.execution.FileSourceScanExec
    val kept = ops.Graph.erasedPairStore(spark, d)
    val scans = kept.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec =>
        f.relation.location.rootPaths.mkString(",")
    }
    // the REWRITTEN store specifically (the base shares the root
    // prefix — see the q326 test's rationale)
    assert(scans.nonEmpty && scans.forall(p =>
      p.contains("fullpairs") && p.contains("erased_mod23ne7")),
      s"erase step scanned outside the rewritten pair store: $scans")
    assert(kept.where($"center" % 23 === 7 || $"context" % 23 === 7)
      .count() == 0, "erased nodes still on disk in the pair store")
    // the superseded pre-erasure pair store is vacuumed, marker included
    val proot = ops.Graph.fullPairStoreRoot(spark, d)
    for (sub <- Seq("pairs.parquet", "_GRAFT_STORE_COMPLETE"))
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$proot/$sub")),
        s"pre-erasure $sub not vacuumed")
  }

  test("q329: erasure can flip an entry INTO the positive matrix") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    // planted counts: (1,2) is UNDER-represented while erased node 7's
    // mass inflates nn and cc(1); after the fold-out the same count is
    // over-represented and crosses the shift threshold — the
    // renormalization a naive row-delete erasure misses
    val pairs = Seq(
      (1L, 2L, 4L),   // the entry that must ENTER
      (1L, 7L, 96L),  // erased mass attached to center 1
      (5L, 6L, 100L), // unrelated background mass
    ).toDF("center", "context", "n_pairs")
    def positives(p: org.apache.spark.sql.DataFrame) =
      ops.Graph.sppmi(p, shift = 5)
        .select($"center", $"context")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val before = positives(pairs)
    val after = positives(
      pairs.where($"center" % 23 =!= 7 && $"context" % 23 =!= 7))
    assert(!before.contains((1L, 2L)),
      s"fixture broken: (1,2) already positive before erasure: $before")
    assert(after.contains((1L, 2L)),
      s"(1,2) did not enter the positive matrix after erasure: $after")
  }

  // ---- q330: streaming state erasure ------------------------------------

  test("q330: tombstones forget in arrival order; batch identity holds") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val d = "/root/testdata/sf0.01"
    val got = SparkEntry.queries("q330_stream_erasure")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // in-repo twin of the oracle: batch replay of forget-then-continue
    val ev = Tables.events(spark, d)
      .select($"event_id", $"user_id",
        expr("CAST(ROUND(value * 100) AS LONG)").as("cents"))
    val m = ev.agg(max($"event_id")).collect()(0).getLong(0) + 1
    val want = ev
      .withColumn("bkt", expr(s"least(3L, (event_id * 4) DIV ${m}L) + 1L"))
      .where($"user_id" % 97 =!= 13 || $"bkt" >= 3)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n"), sum($"cents").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSet == want.toSet, "stream erasure != batch replay")
    // the erased users genuinely lost history: their streamed counts
    // are strictly below their full-history counts
    val fullCnt = ev.groupBy($"user_id").agg(count(lit(1)).as("n"))
      .where($"user_id" % 97 === 13)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gotCnt = got.map(t => t._1 -> t._2).toMap
    assert(fullCnt.nonEmpty, "no erased users at this SF")
    // an erased user whose events all landed AFTER the tombstone
    // legitimately keeps its full count — so each user loses AT MOST
    // its pre-tombstone history (<=), and at least one user with
    // pre-tombstone events must strictly lose (the fixture test pins
    // the exact per-case semantics)
    for ((u, n) <- fullCnt)
      assert(gotCnt.getOrElse(u, 0L) <= n,
        s"erased user $u GAINED history")
    assert(fullCnt.exists { case (u, n) => gotCnt.getOrElse(u, 0L) < n },
      "no erased user lost any history — the tombstones did nothing")
  }

  test("q330 fixture: a fully-forgotten user leaves no row") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    // ids 0..7 → quarters (id DIV 2)+1. user 13: quarters 1-2 only →
    // fully forgotten; user 110 (also ≡13 mod 97): quarters 1+4 →
    // forget-then-continue; user 5: untouched
    val dir = java.nio.file.Files.createTempDirectory("r17_gdpr").toString
    val rows = Seq(
      (0L, 13L, 1.0), (2L, 13L, 1.0),
      (1L, 110L, 0.5), (7L, 110L, 0.7),
      (3L, 5L, 0.1), (6L, 5L, 0.2))
    writeSingleParquet(
      rows.map { case (id, u, v) =>
        (id, id * 1000000000L, u, "click", v, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props"),
      s"$dir/events.parquet")
    val got = SparkEntry.queries("q330_stream_erasure")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == Set((5L, 2L, 30L), (110L, 1L, 70L)),
      s"fixture semantics wrong: $got")
  }

  // ---- q331: retrieval-index erasure -----------------------------------

  test("q331: index erasure renormalizes BM25, erased docs leave") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val d = "/root/testdata/sf0.01"
    val era = SparkEntry.queries("q331_index_erasure")(spark, d)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(era.nonEmpty)
    assert(era.forall(_._1 % 9 != 4), "erased doc served from the index")
    // the scorer renormalized: at least one doc served by BOTH the
    // full and the reduced index must carry a DIFFERENT score (df, N,
    // avglen all shrank) — a naive row-delete that kept q167's
    // constants would score survivors identically
    val full = SparkEntry.queries("q167_bm25_search")(spark, d)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val shared = era.filter { case (id, _) => full.contains(id) }
    assert(shared.nonEmpty, "no shared docs between full/reduced top-10")
    assert(shared.exists { case (id, s) => full(id) != s },
      "no shared doc re-scored — index erasure did not renormalize")
    // the erase step reads ONLY the persisted posting store, and the
    // rewritten index PHYSICALLY forgot the erased docs
    import org.apache.spark.sql.execution.FileSourceScanExec
    val kept = ops.Corpus.erasedPostingStore(spark, d)
    val scans = kept.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec =>
        f.relation.location.rootPaths.mkString(",")
    }
    // the REWRITTEN store specifically (the base shares the root
    // prefix — see the q326 test's rationale)
    assert(scans.nonEmpty && scans.forall(p =>
      p.contains("fullpostings") && p.contains("erased_mod9ne4")),
      s"erase step scanned outside the rewritten posting store: $scans")
    assert(kept.where($"doc_id" % 9 === 4).count() == 0,
      "erased docs still on disk in the posting store")
    // the superseded pre-erasure index is vacuumed, marker included
    val proot = ops.Corpus.fullPostingStoreRoot(spark, d)
    for (sub <- Seq("postings", "_GRAFT_STORE_COMPLETE"))
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$proot/$sub")),
        s"pre-erasure $sub not vacuumed")
  }

  // ---- q332: hard-negative mining ---------------------------------------

  test("q332: band, cap, and no-self invariants hold") {
    val d = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("q332_hard_negatives")(spark, d)
      .collect()
    assert(rows.nonEmpty, "no hard negatives mined at this SF")
    for (r <- rows) {
      val (qid, vid, cos, rn) =
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))
      assert(qid != vid, "anchor returned as its own negative")
      assert(cos >= 0.30 && cos < 0.95, s"cos $cos outside the band")
      assert(rn >= 1 && rn <= 5, s"rank $rn outside the cap")
    }
    val perAnchor = rows.groupBy(_.getLong(0)).values.map(_.length)
    assert(perAnchor.forall(_ <= 5), "an anchor exceeded 5 negatives")
  }

  // ---- q333: leakage-free split ------------------------------------------

  test("q333: no near-dup pair straddles a split boundary") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val d = "/root/testdata/sf0.01"
    val split = SparkEntry.queries("q333_leakfree_split")(spark, d)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    assert(split.nonEmpty)
    // THE property: every near-dup pair lands in ONE split — the
    // contamination a per-doc hash split builds in by construction
    val pairs = ops.Corpus.blockedNearDupPairs(
      Tables.embeddings(spark, d), minCosine = 0.3)
      .select($"a", $"b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "no near-dup pairs at this SF")
    for ((a, b) <- pairs)
      assert(split(a)._2 == split(b)._2,
        s"near-dup pair ($a, $b) straddles ${split(a)._2}/${split(b)._2}")
    // all three splits populated, at roughly the asked 8/1/1 odds
    val byS = split.values.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byS.keySet == Set("train", "val", "test"), s"splits: $byS")
    assert(byS("train") > byS("val") && byS("train") > byS("test"),
      s"train is not the bulk: $byS")
  }

  // ---- q334: exact budget apportionment ----------------------------------

  test("q334: quotas sum to the budget EXACTLY; samples fill the quotas") {
    val d = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("q334_budget_apportion")(spark, d)
      .collect()
    assert(rows.nonEmpty)
    // the Hamilton guarantee a rate-based mixture can't make: quotas
    // sum to the budget exactly, and each bonus seat is 0 or 1
    assert(rows.map(_.getLong(4)).sum == 1000L,
      s"quotas sum to ${rows.map(_.getLong(4)).sum}, not the budget")
    assert(rows.forall(r => r.getLong(3) == 0L || r.getLong(3) == 1L))
    // the materialized sample fills every quota to min(supply, quota)
    for (r <- rows) {
      val (n, quota, sampled) =
        (r.getLong(1), r.getLong(4), r.getLong(5))
      assert(sampled == math.min(n, quota),
        s"${r.getString(0)}: sampled $sampled of quota $quota (n=$n)")
    }
  }

  // ---- q335: manifest v5 — every composed stage provably fires ----------

  test("q335: every composed stage moves the v5 ledger (q142's lesson)") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val d = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("q335_manifest_v5")(spark, d).collect()
    val survivors = ops.Text.mf4EraseSurvivors(spark, d)
      .collect().map(_.getLong(0)).toSet
    // erasure fired: no erased doc ships
    assert(survivors.forall(_ % 7 != 3), "erased doc shipped in v5")
    // gate + prune fired: the erased-state econ count strictly exceeds
    // the gated count, which strictly exceeds the shipped count
    val root = ops.Text.mf4EraseStateRoot(spark, d)
    val econ = spark.read.parquet(s"$root/erased_mod7ne3/econ")
    val gated = econ.where($"fert_ppm" <= 2000000L).count()
    assert(gated < econ.count(), "fertility gate pruned nothing")
    assert(survivors.size < gated, "semantic prune dropped nothing")
    // split fired: ≥ 2 splits populated; ledger accounts every survivor
    val bySplit = rows.groupBy(_.getString(0))
    assert(bySplit.size >= 2, s"one split only: ${bySplit.keySet}")
    assert(rows.map(_.getLong(2)).sum == survivors.size,
      "ledger does not account every shipped doc")
    // schedule fired: per split, dense per-shard step ranges from 0
    for ((sp, rs) <- bySplit) {
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.head.getLong(3) == 0L, s"$sp steps not 0-based")
      for (r <- sorted) {
        val (shard, n, lo, hi) =
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
        assert(lo == shard * 64 && hi == lo + n - 1,
          s"$sp shard $shard steps not dense: [$lo,$hi] n=$n")
      }
    }
  }

  test("Rank.runningSum ≡ cumulative window sum (randomized, desc order)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (0 until 400).map(i => (i.toLong, rnd.nextInt(1000).toLong))
    val df = rows.toDF("k", "cnt").repartition(5)
    val got = ops.Rank.runningSum(df, Seq($"k".desc), $"cnt", "cum")
      .select($"k", $"cum")
    val want = df.withColumn("cum",
        sum($"cnt").over(Window.orderBy($"k".desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"k", $"cum")
    assert(got.collect().toSet == want.collect().toSet)
  }
}
