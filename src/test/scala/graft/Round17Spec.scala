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
      // q148's two empty partitionBy() frames run on the |langs|-row
      // language histogram
      "src/main/scala/graft/ops/Corpus.scala" -> 7,
      // q241 cents-histogram CDF (distinct price cents — a price
      // DOMAIN bound), q247 isotonic bins, q234's 5-type frequency CDF,
      // q243's 5 p-values, q252's treated/control cents histogram
      "src/main/scala/graft/ops/Eval.scala" -> 8,
      // q283 binary segmentation + q284 ACF run on per-DAY / per-HOUR
      // series (calendar-bounded); the q204 incident window at :1992
      // is hourly too
      "src/main/scala/graft/ops/Events.scala" -> 9,
      // q311's event-type marginal back-off: |types| = 5 rows
      "src/main/scala/graft/ops/Sequence.scala" -> 1,
      // q157's above-average cut over the |types|-row totals — kept a
      // real Filter node deliberately so DPP attaches its subquery
      "src/main/scala/graft/ops/Sources.scala" -> 1,
      // q185/q194 variant pairs and q195's type histogram: group-count
      // bounded (variants × metrics, 5 types)
      "src/main/scala/graft/ops/Stats.scala" -> 2,
      // q151/q183's token-count frontier: distinct n_tokens values — a
      // max DOC-LENGTH domain bound, not a corpus bound
      "src/main/scala/graft/ops/Text.scala" -> 1,
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
      "q311_next_event_serving", // 5-row type marginal back-off
    )
    // same skips as PlanSpec's cartesian audit: streaming entries whose
    // construction RUNS a query (q315/q323 run complete streaming
    // pipelines at plan time — their batch tails are their own gates),
    // and the gen_ generator family (locked by GenSpec/ScheduleSpec +
    // the source audit above)
    val skip = Set("q73_stream_hourly", "q92_stream_enrich",
      "q315_stream_foldin", "q323_serving_cutover")
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
    val ep = new org.apache.hadoop.fs.Path(s"$d/embeddings.parquet")
    val est = ep.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .getFileStatus(ep)
    val root = ops.StoreGuard.storeRoot(spark, "target/graft_text_store",
      "mf4", d, "documents.parquet",
      s"${est.getModificationTime}:${est.getLen}")
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
    val ep = new org.apache.hadoop.fs.Path(s"$d/embeddings.parquet")
    val est = ep.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .getFileStatus(ep)
    val root = ops.StoreGuard.storeRoot(spark, "target/graft_text_store",
      "mf4inc", d, "documents.parquet",
      s"${est.getModificationTime}:${est.getLen}")
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
