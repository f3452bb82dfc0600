package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-14 gates. Headline: the r13-verdict weak item — q253/q56
  * formed within-brand all-pairs (quadratic in corpus size because
  * `p_brand` has fixed cardinality) — is fixed by moving the quadratic
  * work onto the DISTINCT-NAME domain (vocabulary grid, length-band
  * blocked) and joining the corpus only through equi-keys. These tests
  * prove (a) the candidate generator is EXACT (same accepted pair set
  * as the brute-force block scan), and (b) the emitted-pair count is a
  * small fraction of the within-brand pair count it replaces.
  */
class Round14Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("acceptedNamePairs equals brute-force lev<=2 on the vocabulary") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val names = Tables.part(spark, sf).select($"p_name").distinct()
    val got = ops.Dedup
      .acceptedNamePairs(names, 2)
      .as[(String, String)].collect().toSet
    val vocab = names.as[String].collect()
    val want = (for {
      a <- vocab; b <- vocab
      if levRef(a, b) <= 2
    } yield (a, b)).toSet
    assert(got == want)
    // diagonal present: every name matches itself at distance 0
    assert(vocab.forall(n => got((n, n))))
  }

  /** Textbook Wagner–Fischer, the driver-side reference. */
  private def levRef(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(
        math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("q253 candidate edges equal the brute-force block scan") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val p = Tables.part(spark, sf)
      .select($"p_partkey", $"p_name", $"p_brand", $"p_type", $"p_size")
      .as[(Long, String, String, String, Int)].collect()
    // brute force: every within-brand pair, full link rule
    val want = (for {
      a <- p; b <- p
      if a._3 == b._3 && a._1 < b._1
      if levRef(a._2, b._2) <= 2
      if a._4 == b._4 || math.abs(a._5 - b._5) <= 2
    } yield (a._1, b._1)).toSet
    // the production path: vocabulary accept-list → equi-join. Re-run
    // the q253 edge stage standalone (same code shape as the query).
    val pd = Tables.part(spark, sf)
    val namePairs = ops.Dedup
      .acceptedNamePairs(pd.select($"p_name").distinct(), 2)
    val l = pd.select($"p_brand", $"p_partkey".as("a"),
      $"p_name".as("na"), $"p_type".as("ta"), $"p_size".as("sa"))
    val r = pd.select($"p_brand", $"p_partkey".as("b"),
      $"p_name".as("nb"), $"p_type".as("tb"), $"p_size".as("sb"))
    val got = l
      .join(broadcast(namePairs), Seq("na"))
      .join(r, Seq("p_brand", "nb"))
      .filter($"a" < $"b")
      .filter($"ta" === $"tb" || abs($"sa" - $"sb") <= 2)
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    assert(got == want)
  }

  test("q253 emitted candidate pairs are a small fraction of block pairs") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val pd = Tables.part(spark, sf)
    val namePairs = ops.Dedup
      .acceptedNamePairs(pd.select($"p_name").distinct(), 2)
    val l = pd.select($"p_brand", $"p_partkey".as("a"),
      $"p_name".as("na"))
    val r = pd.select($"p_brand", $"p_partkey".as("b"),
      $"p_name".as("nb"))
    val emitted = l
      .join(broadcast(namePairs), Seq("na"))
      .join(r, Seq("p_brand", "nb"))
      .filter($"a" < $"b")
      .count()
    val blockPairs = pd
      .groupBy($"p_brand").agg(count(lit(1)).as("c"))
      .select(sum(expr("c * (c - 1) DIV 2")))
      .as[Long].head()
    // at sf0.001: tens vs 752; the ratio shrinks further as the
    // corpus grows because the accept-list density is a vocabulary
    // property while block pairs grow quadratically
    assert(emitted * 5 < blockPairs,
      s"emitted=$emitted blockPairs=$blockPairs")
  }

  /** Write a DataFrame as `$dir/<table>.parquet` (directory form —
    * Spark reads it like the driver's single-file layout).
    */
  private def fixture(dir: String, table: String,
      df: org.apache.spark.sql.DataFrame): String = {
    df.coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/$table.parquet")
    dir
  }

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"r14_$tag").toString

  test("q258 ignores 1-token and empty docs instead of crashing (ANSI)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 6 docs repeating "alpha beta" so the c12 >= 5 support floor
    // keeps the pair, plus the two degenerate docs the advice flagged:
    // sequence(0, size-2) on a 1-token doc is the DESCENDING [0, -1]
    // and t[-1] throws under ANSI before the fix
    val rows = (1L to 6L).map(i => (i, "alpha beta gamma delta", "en",
      "s1", 10L)) ++ Seq(
      (7L, "solo", "en", "s1", 4L),
      (8L, "", "en", "s1", 0L))
    val d = fixture(tmpDir("q258"), "documents",
      rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = SparkEntry.queries("q258_pmi_collocations")(spark, d)
      .select($"w1", $"w2", $"c12").as[(String, String, Long)]
      .collect().toSet
    assert(out == Set(("alpha", "beta", 6L), ("beta", "gamma", 6L),
      ("gamma", "delta", 6L)))
  }

  test("isotonicFit guard rejects fits past the 2^20 exactness bound") {
    import spark.implicits._
    val big = Seq((1L, 600000L, 10L), (2L, 600000L, 500L))
      .toDF("b", "n", "k")
    val e = intercept[Exception] {
      ops.Eval.isotonicFit(big).collect()
    }
    assert(e.getMessage.contains("isotonicFit") ||
      Option(e.getCause).exists(_.getMessage.contains("isotonicFit")))
    // and a legal fit still works, decimal key included: monotone
    // means pass through; a violator pools
    val fit = ops.Eval.isotonicFit(
      Seq((1L, 10L, 1L), (2L, 10L, 5L), (3L, 10L, 3L))
        .toDF("b", "n", "k"))
      .select("b", "iso_rate").as[(Long, Double)].collect().toMap
    assert(fit(1L) == 0.1 && fit(2L) == 0.4 && fit(3L) == 0.4)
  }

  test("q243 counts replicates that assign ZERO events to a type") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 5 types, one RARE (1/60 events): with 64 replicates the rare
    // type draws zero events in ~36% of them — before the grid fix
    // those replicates silently vanished from n_exceed. Independent
    // driver-side oracle replays the whole statistic with BigInt.
    val counts = Seq("click" -> 20, "view" -> 25, "purchase" -> 8,
      "error" -> 6, "signup" -> 1)
    val evRows = counts.flatMap { case (t, c) =>
      (1 to c).map(_ => t)
    }.zipWithIndex.map { case (t, i) =>
      val id = i + 1L
      (id, new java.sql.Timestamp(1705000000000L + id * 1000),
        id % 7, t, (id % 7) + 0.25, "{}")
    }
    val d = fixture(tmpDir("q243"), "events",
      evRows.toDF("event_id", "ts", "user_id", "event_type", "value",
        "props"))
    val got = SparkEntry.queries("q243_bh_fdr")(spark, d)
      .select($"event_type", $"n_exceed", $"p_num", $"p_milli", $"k",
        $"rejected")
      .as[(String, Long, Long, Long, Long, Boolean)].collect().toSeq

    // --- independent replay ---
    val ev = evRows.map(r => (r._1, r._4,
      math.round(r._5 * 100)))
    val types = counts.map(_._1).sorted
    val nT = types.map(t => t -> ev.count(_._2 == t).toLong).toMap
    val sT = types.map(t =>
      t -> ev.filter(_._2 == t).map(_._3).sum).toMap
    val n = ev.size.toLong
    val sTot = ev.map(_._3).sum
    val cum = types.scanLeft(0L)((a, t) => a + nT(t)).tail
    val his = types.zip(cum).map { case (t, c) =>
      t -> (c * 4294967296L / n) }.toMap
    val los = types.zip(cum).map { case (t, c) =>
      t -> ((c - nT(t)) * 4294967296L / n) }.toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def u32(id: Long, rep: Int): Long = {
      val h = md.digest(s"$id:$rep:bh".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h.substring(0, 8), 16)
    }
    val fan = (for {
      rep <- 0 until 64
      (id, _, c) <- ev
    } yield {
      val u = u32(id, rep)
      val t = types.find(t => u >= los(t) && u < his(t)).get
      ((rep, t), c)
    }).groupBy(_._1)
      .map { case (k, v) => k -> (v.size.toLong, v.map(_._2).sum) }
    def exceed(t: String, na: Long, sa: Long): Boolean = {
      if (na == 0L || na == n) true
      else {
        val na0 = nT(t); val sa0 = sT(t)
        val lhs = (BigInt(sa) * (n - na) - BigInt(sTot - sa) * na).abs *
          (BigInt(na0) * (n - na0))
        val rhs = (BigInt(sa0) * (n - na0) -
          BigInt(sTot - sa0) * na0).abs * (BigInt(na) * (n - na))
        lhs >= rhs
      }
    }
    val nExceed = types.map { t =>
      t -> (0 until 64).count { rep =>
        val (na, sa) = fan.getOrElse((rep, t), (0L, 0L))
        exceed(t, na, sa)
      }.toLong
    }.toMap
    // sanity: the rare type DOES have empty replicates in this fixture
    assert((0 until 64).exists(rep => !fan.contains((rep, "signup"))))
    val ranked = types.map(t => (t, nExceed(t) + 1L))
      .sortBy { case (t, p) => (p, t) }.zipWithIndex
      .map { case ((t, p), i) => (t, nExceed(t), p, i + 1L) }
    val kmax = ranked.collect {
      case (_, _, p, k) if 20L * p <= 65L * k => k
    }.foldLeft(0L)(math.max)
    val want = ranked.map { case (t, ne, p, k) =>
      (t, ne, p, p * 1000 / 65, k, k <= kmax) }
    assert(got == want)
  }

  test("q243 fails loudly when the type dictionary is not m=5") {
    import spark.implicits._
    val evRows = (1L to 40L).map { id =>
      (id, new java.sql.Timestamp(1705000000000L + id * 1000),
        id % 7, s"t${id % 4}", (id % 7) + 0.25, "{}")
    }
    val d = fixture(tmpDir("q243m"), "events",
      evRows.toDF("event_id", "ts", "user_id", "event_type", "value",
        "props"))
    val e = intercept[Exception] {
      SparkEntry.queries("q243_bh_fdr")(spark, d).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("m=5")))
  }

  test("degenerate-cell guards: q242/q245/q255 stay finite") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // all values IDENTICAL; two types; one type lives in ONE hour and
    // every cell is a singleton → q242 fully-tied pairs (z = 0),
    // q245 zero pooled variance paths, q255 kk=1/nn=kk strata
    val evRows = Seq(
      (1L, 1705000000000000L, 2L, "click", 3.0),
      (2L, 1705000001000000L, 4L, "click", 3.0),
      // the purchase keeps q245's death grid non-empty (one tau row
      // with n1 = 0 → var_micro = 0 exercises the chi2 guard itself,
      // not the empty-sum path)
      (3L, 1705003600000000L, 6L, "purchase", 3.0),
    ).map { case (id, us, u, t, v) =>
      (id, new java.sql.Timestamp(us / 1000), u, t, v, "{}")
    }
    val d = fixture(tmpDir("degen"), "events",
      evRows.toDF("event_id", "ts", "user_id", "event_type", "value",
        "props"))
    val z = SparkEntry.queries("q242_mann_whitney")(spark, d)
      .select($"z").as[Double].collect()
    assert(z.toSeq == Seq(0.0))
    // all user_ids even → group 1 empty → var_micro = 0 → chi2 = 0
    val chi = SparkEntry.queries("q245_logrank_test")(spark, d)
      .select($"var_micro", $"chi2").as[(Long, Double)].collect()
    assert(chi.toSeq == Seq((0L, 0.0)))
    val shrink = SparkEntry.queries("q255_eb_shrinkage")(spark, d)
      .select($"shrink_factor", $"shrunk_mean", $"raw_mean")
      .as[(Double, Double, Double)].collect()
    assert(shrink.forall(r => !r._1.isNaN && !r._2.isNaN))
    assert(shrink.forall(_._1 == 0.0))
    // q259's zero-arm-B stratum guard: same fixture has only even
    // user_ids → arm B (odd) empty in EVERY stratum; adj terms all 0
    val q259 = SparkEntry.queries("q259_post_stratification")(spark, d)
      .select($"n_b", $"mean_b_adjusted").as[(Long, Double)].collect()
    assert(q259.toSeq == Seq((0L, 0.0)))
  }

  test("q261 miner recovers the planted dictionary from the generator") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val spec = gen.GenQueries.demoSpec(10000L)
    val ev = gen.StreamGen.multi(spark, spec, nStreams = 10)
      .select($"stream_id", $"seq", $"event_type").toDF
    // mine ALL length-10 grams (support floor 1) so the test sees the
    // noise tail too, not just the survivors of a chosen cut
    val grams = ops.Sequence
      .mineEpisodes(ev, "stream_id", Seq("seq"), "event_type",
        minLen = 10, maxLen = 10)
      .select($"episode", $"support").as[(String, Long)].collect()
    val planted = spec.patterns.types.map(_.mkString(">")).toSet
    assert(planted.size == 8)
    val (hits, noise) = grams.partition(g => planted(g._1))
    // every planted pattern recovered...
    assert(hits.map(_._1).toSet == planted)
    // ...multiply above the loudest non-planted gram (the loudest
    // noise is a planted pattern crossing INTO its own next instance,
    // ~20% of instance count; deterministic at 363 vs 78 here), so a
    // support cut anywhere in the wide gap returns the dictionary
    // exactly
    val minHit = hits.map(_._2).min
    val maxNoise = noise.map(_._2).max
    assert(minHit > 3 * maxNoise,
      s"separation too thin: minPlanted=$minHit maxNoise=$maxNoise")
    // and the registered q261 cut (0.5% relative support) run on the
    // same corpus via the public API keeps exactly the dictionary
    val cut = ops.Sequence
      .mineEpisodes(ev, "stream_id", Seq("seq"), "event_type",
        minLen = 10, maxLen = 10, minSupport = minHit / 2)
      .select($"episode").as[String].collect().toSet
    assert(cut == planted)
  }

  test("q262 fusion tops the relevant doc that tops NEITHER single list") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // planted relevance: doc 5 is mid-ranked (r2) in BOTH lists; doc 1
    // tops BM25 only (and is cosine-last), doc 2 tops cosine only (and
    // sits in the BM25 tie tail) — RRF's rank sum puts doc 5 first
    val docs = (0L to 9L).map { i =>
      val text = i match {
        case 1L => "x x x y y y z z z f1"
        case 5L => "x x y y z z f5a f5b f5c f5d"
        case _ => s"x y z f${i}a f${i}b f${i}c f${i}d f${i}e f${i}f f${i}g"
      }
      (i, text, "en", "s1", text.length.toLong)
    }
    val embs = (0L to 9L).map { i =>
      val v = i match {
        case 0L => Array(1f, 0f, 0f, 0f)      // the query vector
        case 2L => Array(1f, 0f, 0f, 0f)      // cosine rank 1
        case 5L => Array(0.9f, 0.1f, 0f, 0f)  // cosine rank 2
        case 1L => Array(-1f, 0f, 0f, 0f)     // cosine last
        case _ => Array(0f, 1f, 0f, 0f)       // orthogonal tie tail
      }
      (i, v, i.toInt % 3)
    }
    val dir = tmpDir("q262")
    fixture(dir, "documents",
      docs.toDF("doc_id", "text", "lang", "source", "n_chars"))
    fixture(dir, "embeddings",
      embs.toDF("vec_id", "embedding", "label"))
    val bmTop = SparkEntry.queries("q167_bm25_search")(spark, dir)
      .select($"doc_id").as[Long].head()
    val cosTop = ops.Vectors
      .topKCosine(Tables.embeddings(spark, dir), 0L, 10)
      .select($"vec_id").as[Long].head()
    val fusedTop = SparkEntry.queries("q262_hybrid_rrf")(spark, dir)
      .select($"doc_id").as[Long].head()
    assert(bmTop == 1L && cosTop == 2L && fusedTop == 5L,
      s"bm=$bmTop cos=$cosTop fused=$fusedTop")
  }

  test("q263 filtered ANN: pushed predicate, in-cell exactness, recall") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf)
    val got = SparkEntry.queries("q263_filtered_ann")(spark, sf)
    val rows = got.collect()
    // every served row satisfies the predicate and k is honored
    assert(rows.nonEmpty && rows.forall(_.getAs[Int]("label") == 1))
    assert(rows.length <= 10)
    // (a) the physical scan carries BOTH filter classes: cell pruning
    // at the file index, the metadata predicate at the parquet reader
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell"),
      s"probe not partition-pruned:\n$plan")
    assert("PushedFilters: \\[[^\\]]*EqualTo\\(label,1\\)".r
      .findFirstIn(plan).isDefined,
      s"label predicate not pushed to the scan:\n$plan")
    // (b) exactness on the probed-cells × predicate subset: the store
    // probe must equal the in-memory twin over the same cells
    val nCells = 16
    val base = emb.filter($"vec_id" =!= 0L)
    val cents = ops.Vectors.ivfCentroids(base, nCells)
    val cells = emb.filter($"vec_id" === 0L)
      .select(graft.functions.VectorExprs
        .vecTopCells(spark, $"embedding", cents, nCells, 64, 4))
      .head.getSeq[Int](0)
    val qe = emb.filter($"vec_id" === 0L)
      .select($"embedding").head.getSeq[Float](0)
    val twin = ops.Vectors.ivfIndex(base, cents, nCells)
      .filter($"cell".isin(cells: _*) && $"label" === 1)
      .select($"vec_id", $"label",
        round(graft.functions.VectorExprs
          .vecCosine(spark, $"embedding", typedLit(qe)), 4).as("cos"))
      .orderBy($"cos".desc, $"vec_id").limit(10)
      .collect().map(_.toSeq).toSeq
    assert(rows.map(_.toSeq).toSeq == twin,
      "store probe diverged from the in-memory filtered twin")
    // (c) recall vs the GLOBAL filtered exact scan — the number the
    // operator is judged by in serving
    val exact = base.filter($"label" === 1)
      .select($"vec_id",
        round(graft.functions.VectorExprs
          .vecCosine(spark, $"embedding", typedLit(qe)), 4).as("cos"))
      .orderBy($"cos".desc, $"vec_id").limit(10)
      .select($"vec_id").as[Long].collect().toSet
    val recall = rows.map(_.getAs[Long]("vec_id"))
      .count(exact).toDouble / exact.size
    assert(recall >= 0.5, s"filtered recall@10 too low: $recall")
  }

  test("q264 edit locality: one edit splits extraction into flanking spans") {
    import spark.implicits._
    // doc 2 = doc 1 with TOKEN 21 (1-based) edited; docs 3-4 are
    // unique noise. Every 6-gram not touching the edit is duplicated,
    // so extraction must return exactly the two flanking maximal
    // spans — tokens [1, 20] and [22, 40] — leaving ONLY the edited
    // token uncovered, in both docs, with identical span text.
    val a = (1 to 40).map(i => s"w$i").mkString(" ")
    val b = (1 to 40).map(i => if (i == 21) "EDIT" else s"w$i")
      .mkString(" ")
    val docs = Seq(
      (1L, a, "en", "s1", a.length.toLong),
      (2L, b, "en", "s2", b.length.toLong),
      (3L, (1 to 40).map(i => s"x$i").mkString(" "), "en", "s1", 9L),
      (4L, (1 to 40).map(i => s"y$i").mkString(" "), "en", "s2", 9L))
    val d = fixture(tmpDir("q264"), "documents",
      docs.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val got = SparkEntry.queries("q264_dup_spans")(spark, d)
      .select($"doc_id", $"start_pos", $"span_len", $"span_text")
      .as[(Long, Long, Long, String)].collect().toSet
    val left = (1 to 20).map(i => s"w$i").mkString(" ")
    val right = (22 to 40).map(i => s"w$i").mkString(" ")
    assert(got == Set(
      (1L, 1L, 20L, left), (1L, 22L, 19L, right),
      (2L, 1L, 20L, left), (2L, 22L, 19L, right)))
  }

  test("q265 clamp: over-cap user activity cannot move the release") {
    import spark.implicits._
    def evRows(user7n: Int) = {
      val base = 1705000000000000L
      val mk = (id: Long, u: Long, t: String) =>
        (id, new java.sql.Timestamp(base / 1000 + id), u, t,
          1.25, "{}")
      val u7 = (1 to user7n).map(i => mk(i.toLong, 7L, "click"))
      val u8 = Seq(mk(1000L, 8L, "click"), mk(1001L, 8L, "click"))
      val u9 = (1 to 6).map(i => mk(2000L + i, 9L, "view"))
      u7 ++ u8 ++ u9
    }
    def release(q: String, n7: Int) = {
      val d = fixture(tmpDir(s"q265_$n7$q"), "events",
        evRows(n7).toDF("event_id", "ts", "user_id", "event_type",
          "value", "props"))
      SparkEntry.queries(q)(spark, d).collect().map(_.toSeq).toSeq
    }
    // user 7 at 10 vs 30 in-cell events — both beyond the C=4 cap:
    // the USER-LEVEL release is byte-identical (their contribution is
    // clamped; extra activity is invisible by construction)...
    assert(release("q265_dp_user_level", 10) ==
      release("q265_dp_user_level", 30))
    // ...while the EVENT-level release (q219) moves with every event,
    // which is exactly why it is the wrong unit for people
    assert(release("q219_dp_histogram", 10) !=
      release("q219_dp_histogram", 30))
    // and the clamp itself is visible: 12 click events from user 7+8
    // release as clamped 4 + 2 (+ deterministic noise shared with the
    // 30-event run) — strictly less than the raw 12
    val rel = release("q265_dp_user_level", 10)
    val click = rel.find(_.head == "click").get
    assert(click(2).asInstanceOf[Long] <= 6L + 96L)
  }

  test("q266 gappy episode counts equal brute-force subsequence windows") {
    import spark.implicits._
    val rnd = new scala.util.Random(14)
    val seqs = (1L to 5L).map(k =>
      k -> Vector.fill(60)("abcd" (rnd.nextInt(4)).toString))
    val rows = seqs.flatMap { case (k, s) =>
      s.zipWithIndex.map { case (t, i) => (k, i.toLong, t) }
    }
    val df = rows.toDF("k", "pos", "t")
    val got = ops.Sequence
      .mineGappyEpisodes(df, "k", Seq("pos"), "t", len = 3, maxGap = 2)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val occ = seqs.flatMap { case (k, s) =>
      for {
        i <- s.indices; j <- (i + 1) until s.length
        if j - i <= 2
        l <- (j + 1) until s.length
        if l - j <= 2
      } yield (k, s"${s(i)}>${s(j)}>${s(l)}")
    }
    val want = occ.groupBy(_._2).map { case (ep, os) =>
      ep -> (os.size.toLong, os.map(_._1).distinct.size.toLong)
    }
    assert(got == want)
  }

  test("q266 robustness: interleaved noise breaks contiguous, not gappy") {
    import spark.implicits._
    // every stream repeats the motif a,b,c with one noise token after
    // each step — the contiguous trigram a>b>c never occurs, the
    // gap<=2 episode occurs at full motif frequency
    val rows = for {
      k <- 1L to 20L
      rep <- 0 until 10
      (t, off) <- Seq("a" -> 0, "x" -> 1, "b" -> 2, "x" -> 3,
        "c" -> 4, "x" -> 5)
    } yield (k, (rep * 6 + off).toLong, t)
    val df = rows.toDF("k", "pos", "t")
    val contiguous = ops.Sequence
      .mineEpisodes(df, "k", Seq("pos"), "t", minLen = 3, maxLen = 3)
      .select($"episode").as[String].collect().toSet
    val gappy = ops.Sequence
      .mineGappyEpisodes(df, "k", Seq("pos"), "t", len = 3,
        maxGap = 2, minSupport = 200L)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(!contiguous.contains("a>b>c"))
    assert(gappy.contains("a>b>c") && gappy("a>b>c") == 200L,
      s"gappy=$gappy")
  }

  test("q267 streaming episode mining equals batch q261 row-for-row") {
    val batch = SparkEntry.queries("q261_episode_mining")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val stream = SparkEntry
      .queries("q267_stream_episode_mining")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(stream == batch)
  }

  test("q268 DSIR ranks the target-like pool doc above the rest") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // target corpus speaks vocab A; the pool has ONE A-speaking doc
    // among B-speaking noise — importance weighting must surface it.
    val vocabA = (0 until 20).map(i => s"alpha$i")
    val vocabB = (0 until 20).map(i => s"beta$i")
    def doc(id: Long, v: Seq[String]): (Long, String, Boolean) =
      (id, (0 until 40).map(j => v((id.toInt * 7 + j) % v.size))
        .mkString(" "), id < 100)
    val rows = (0L until 100L).map(doc(_, vocabA)) ++ // target
      Seq(doc(100L, vocabA)) ++                       // the planted doc
      (101L until 140L).map(doc(_, vocabB))           // pool noise
    val docs = rows.toDF("doc_id", "text", "is_t")
    val scored = ops.Corpus
      .dsirScores(docs, col("is_t"), 256)
      .filter($"doc_id" >= 100L)
      .orderBy($"score_micro".desc)
      .as[(Long, Long, Long)].collect()
    assert(scored.head._1 == 100L)
    // and by a wide margin: A-doc positive, B-docs negative
    assert(scored.head._3 > 0L)
    assert(scored.tail.forall(_._3 < 0L))
  }

  test("q271 NB classifier is perfectly diagonal on separated vocab") {
    import spark.implicits._
    // two "languages" with disjoint vocabularies; ids 0..199 land in
    // train/test by the production content-hash split, so both splits
    // are populated and the confusion matrix must be exactly diagonal.
    def doc(id: Long): (Long, String, String) = {
      val lang = if (id % 2 == 0) "aa" else "bb"
      val v = if (lang == "aa") (0 until 15).map(i => s"alpha$i")
        else (0 until 15).map(i => s"beta$i")
      (id, (0 until 30).map(j => v((id.toInt + j) % v.size))
        .mkString(" "), lang)
    }
    val docs = (0L until 200L).map(doc).toDF("doc_id", "text", "lang")
    val conf = ops.Corpus.nbConfusion(docs, 256)
      .as[(String, String, Long)].collect()
    assert(conf.nonEmpty)
    assert(conf.forall { case (lang, pred, _) => lang == pred })
    // sanity: the held-out third is actually populated on both classes
    assert(conf.map(_._1).toSet == Set("aa", "bb"))
  }

  test("q269 Bradley-Terry: planted dominance orders the ranking") {
    // A beats everyone heavily; B beats C; D never wins a pair.
    val prefs = Seq(
      ("A", "B", 30L), ("A", "C", 30L), ("A", "D", 30L),
      ("B", "A", 2L), ("B", "C", 10L), ("B", "D", 10L),
      ("C", "B", 3L), ("C", "D", 8L))
    val out = ops.Eval.bradleyTerry(prefs, iters = 10)
    assert(out.map(_._1) == Seq("A", "B", "C", "D"))
    assert(out.map(_._5) == Seq(1L, 2L, 3L, 4L))
    // strengths strictly ordered; zero-win D collapses to 0
    val pi = out.map(_._4)
    assert(pi.zip(pi.tail).forall { case (a, b) => a > b })
    assert(pi.last == 0L)
    // renormalization invariant: sum of strengths ~= nb * 1e9
    // (each truncating division loses < 1 nano-unit per brand)
    assert(math.abs(pi.sum - 4L * 1000000000L) <= 4L)
  }

  test("q270 estimators equal a driver-side recompute") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf)
      .select(
        expr("(unix_micros(ts) DIV 3600000000) % 24").as("hr"),
        $"event_type".as("a"),
        expr("CAST(ROUND(value * 100) AS BIGINT)").as("c"),
        expr("(unix_micros(ts) DIV 86400000000) % 2 = 0").as("tr"))
      .as[(Long, String, Long, Boolean)].collect()
    val qhat = ev.filter(_._4).groupBy(r => (r._1, r._2))
      .map { case (k, rs) => k -> rs.map(_._3).sum / rs.length }
    val pol = ev.filter(_._4).map(r => (r._1, r._2)).distinct
      .groupBy(_._1).map { case (h, ks) =>
        h -> ks.map(k => (k._2, qhat(k))).minBy { case (a, q) => (-q, a) }
      }
    val te = ev.filterNot(_._4)
    val n = te.length.toLong
    def w(hr: Long, a: String) = 10000000L / (1 + (hr + a.length) % 4)
    val ips = te.map { r =>
      if (pol.get(r._1).exists(_._1 == r._2)) r._3 * w(r._1, r._2) else 0L
    }
    val clip = te.map { r =>
      if (pol.get(r._1).exists(_._1 == r._2))
        r._3 * math.min(w(r._1, r._2), 4000000L) else 0L
    }
    val snDen = te.map { r =>
      if (pol.get(r._1).exists(_._1 == r._2)) w(r._1, r._2) else 0L
    }.sum
    val dr = te.map { r =>
      val qpi = pol.get(r._1).map(_._2).getOrElse(0L)
      val ind = if (pol.get(r._1).exists(_._1 == r._2)) 1L else 0L
      qpi * 1000000L +
        ind * w(r._1, r._2) * (r._3 - qhat.getOrElse((r._1, r._2), 0L))
    }.sum
    val num = ips.sum
    val den = math.max(snDen, 1L)
    val want = Map(
      "1_ips" -> num / n,
      "2_clip_ips" -> clip.sum / n,
      "3_snips" -> ((num / den) * 1000000L + (num % den) * 1000000L / den),
      "4_dr" -> dr / n)
    val got = SparkEntry.queries("q270_offpolicy_eval")(spark, sf)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(got == want)
  }

  test("q272 metric core: ideal ranking scores NDCG 1e6, noise lowers it") {
    import spark.implicits._
    // truth: docs 1..6 graded 3,3,2,2,1,1 — ideal order is 1..6
    val truth = Seq((1L, 3L), (2L, 3L), (3L, 2L), (4L, 2L), (5L, 1L),
      (6L, 1L)).toDF("doc_id", "rel")
    val ideal = (1L to 6L).zipWithIndex
      .map { case (d, i) => (d, i + 1L) }.toDF("doc_id", "i")
    val got = ops.Corpus.irMetrics(ideal, truth, Seq(3L, 6L))
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(3L)._7 == 1000000L) // NDCG@3 perfect
    assert(got(6L)._7 == 1000000L)
    assert(got(6L)._4 == 1000L)    // recall@6 = 100%
    assert(got(6L)._5 == 1000000L) // MRR: first hit at rank 1
    // corrupt: two irrelevant docs shoved on top
    val noisy = (Seq((90L, 1L), (91L, 2L)) ++
      (1L to 6L).zipWithIndex.map { case (d, i) => (d, i + 3L) })
      .toDF("doc_id", "i")
    val deg = ops.Corpus.irMetrics(noisy, truth, Seq(6L))
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head
    assert(deg._7 < 1000000L)
    assert(deg._5 == 333333L)      // first relevant now at rank 3
    assert(deg._3 == 4L)           // only 4 of 6 truth docs inside k=6
  }

  test("q273 LPA separates planted cliques and matches the simulation") {
    import spark.implicits._
    // two 6-cliques joined by one bridge edge
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val und = clique(1L to 6L) ++ clique(11L to 16L) ++ Seq((6L, 11L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = ops.Graph.labelPropagation(edges, iters = 4)
      .as[(Long, Long)].collect().toMap
    // exact same synchronous algorithm, simulated on the driver
    val adj = (und ++ und.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2)).toMap
    var lab = adj.keys.map(n => n -> n).toMap
    (1 to 4).foreach { _ =>
      lab = lab.map { case (n, _) =>
        val votes = (adj(n).map(lab) :+ lab(n))
          .groupBy(identity).view.mapValues(_.size).toSeq
        n -> votes.minBy { case (l, c) => (-c, l) }._1
      }
    }
    assert(got == lab)
    // and the planted structure is recovered: two communities, split
    // exactly at the bridge
    val comms = got.groupBy(_._2).values.map(_.keys.toSet).toSet
    assert(comms == Set((1L to 6L).toSet, (11L to 16L).toSet))
  }

  test("q274 scatter matrix: exact vs brute force, partition-invariant") {
    import spark.implicits._
    val vecs = Tables.embeddings(spark, sf).select($"embedding")
    val (got, n) = ops.Vectors.scatterMatrix(vecs, 64)
    val (got13, _) = ops.Vectors.scatterMatrix(vecs.repartition(13), 64)
    assert(got.sameElements(got13)) // integer sums: partition-proof
    // brute force on the driver, same fixed-point definition
    val raw = vecs.as[Array[Float]].collect()
      .map(_.map(x => math.round(x.toDouble * 10000.0)))
    assert(n == raw.length)
    val mu = (0 until 64)
      .map(j => raw.map(_(j)).sum / raw.length).toArray
    val want = new Array[Long](64 * 64)
    raw.foreach { v =>
      val c = (0 until 64).map(j => v(j) - mu(j))
      for (j <- 0 until 64; k <- 0 until 64)
        want(j * 64 + k) += c(j) * c(k)
    }
    assert(got.sameElements(want))
  }

  test("q274 eigensolve: residuals, orthonormality, trace, planted axis") {
    import spark.implicits._
    val vecs = Tables.embeddings(spark, sf).select($"embedding")
    val (scatter, n) = ops.Vectors.scatterMatrix(vecs, 64)
    val cov = Array.tabulate(64, 64)((j, k) =>
      scatter(j * 64 + k).toDouble / (n.toDouble * 1e8))
    val (eig, vects) = ops.Vectors.jacobiEig(cov)
    // trace preserved
    val trace = (0 until 64).map(i => cov(i)(i)).sum
    assert(math.abs(eig.sum - trace) < 1e-9 * math.abs(trace))
    // descending order
    assert(eig.zip(eig.tail).forall { case (a, b) => a >= b })
    // orthonormal vectors + eigen residuals
    for (i <- 0 until 8; j <- 0 until 8) {
      val dot = (0 until 64).map(k => vects(i)(k) * vects(j)(k)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-8)
    }
    for (i <- 0 until 8) {
      val av = (0 until 64).map(r =>
        (0 until 64).map(c => cov(r)(c) * vects(i)(c)).sum)
      val res = (0 until 64)
        .map(r => math.abs(av(r) - eig(i) * vects(i)(r))).max
      assert(res < 1e-9)
    }
    // planted anisotropy: points spread along one axis dominate
    val axis = (0 until 64).map(k => math.sin(k * 0.7)).toArray
    val nrm = math.sqrt(axis.map(x => x * x).sum)
    val ax = axis.map(_ / nrm)
    val planted = (0 until 300).map { i =>
      val t = (i % 21 - 10) / 2.0 // spread along ax, sd ~ 3
      (0 until 64).map(k =>
        (t * ax(k) + 0.01 * math.sin(i * 13 + k * 5)).toFloat).toArray
    }
    val pdf = planted.toDF("embedding")
    val (ps, pn) = ops.Vectors.scatterMatrix(pdf, 64)
    val pcov = Array.tabulate(64, 64)((j, k) =>
      ps(j * 64 + k).toDouble / (pn.toDouble * 1e8))
    val (peig, pv) = ops.Vectors.jacobiEig(pcov)
    val cos = math.abs((0 until 64).map(k => pv(0)(k) * ax(k)).sum)
    assert(cos > 0.999)
    assert(peig(0) / peig.sum > 0.99)
  }

  test("q275 merged index equals q167 rebuild; delta replay is a no-op") {
    import spark.implicits._
    val inc = SparkEntry.queries("q275_incremental_index")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val full = SparkEntry.queries("q167_bm25_search")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(inc == full)
    // replay: re-apply the SAME delta to the already-updated store —
    // the (term, doc_id)-keyed merge must leave it unchanged
    val root = ops.Corpus.q275StoreRoot(sf)
    val before = spark.read.parquet(s"$root/v2")
      .as[(String, Long, Long)].collect().toSet
    val delta = Tables.documents(spark, sf)
      .where($"doc_id" % 10 >= 8)
      .select($"doc_id",
        org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.split($"text", " ")).as("term"))
      .groupBy($"term", $"doc_id")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("tf"))
    val after = ops.Corpus
      .indexMergeStep(spark, delta, s"$root/v2", s"$root/v3")
      .as[(String, Long, Long)].collect().toSet
    assert(after == before)
  }

  test("q276 streaming PSI equals batch q246 row-for-row") {
    val batch = SparkEntry.queries("q246_psi_drift")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val stream = SparkEntry.queries("q276_stream_psi")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(stream == batch)
  }

  test("q277 k-center trajectory equals brute force; radii non-increase") {
    import spark.implicits._
    val got = SparkEntry.queries("q277_kcenter_coreset")(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq
    // driver brute force, same quantization and tie rule
    val raw = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect()
      .map { case (id, v) =>
        id -> v.map(x => math.round(x.toDouble * 10000.0))
      }.sortBy(_._1)
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val byId = raw.toMap
    var centers = Vector(0L)
    var want = Vector((1L, 0L, 0L))
    for (t <- 2 to 8) {
      val (id, md) = raw.map { case (id, v) =>
        id -> centers.map(c => d2(v, byId(c))).min
      }.maxBy { case (id, md) => (md, -id) }
      centers :+= id
      want :+= ((t.toLong, id, md))
    }
    assert(got == want)
    val radii = got.drop(1).map(_._3)
    assert(radii.zip(radii.tail).forall { case (a, b) => a >= b })
  }

  test("q278 PIT matrix: hand-computed fixture + no future leakage") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val us = 86400000000L // one day in µs
    def ev(u: Long, day: Long, t: String, v: Double) =
      (u, day * us, t, v)
    // user 1: views on days 93..99, purchase on day 100
    val base = (93L to 99L).map(d => ev(1L, d, "view", 1.0)) :+
      ev(1L, 100L, "purchase", 2.5)
    def run(rows: Seq[(Long, Long, String, Double)]) =
      ops.Events.featureMatrix(
        rows.toDF("user_id", "us", "event_type", "value")
          .select($"user_id", timestamp_micros($"us").as("ts"),
            $"event_type", $"value"))
        .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)]
        .collect().toSeq
    val got = run(base)
    // day 100 example: 7 views in the 7d window (93..99), purchase
    // label 1, no prior purchases/spend, recency 1 day
    assert(got.exists(r => r == ((1L, 100L, 7L, 7L, 0L, 0L, 0L, 1L, 1L))))
    // day 99 example: views 93..98 in window, label 0
    assert(got.exists(r => r == ((1L, 99L, 6L, 6L, 0L, 0L, 0L, 1L, 0L))))
    // LEAKAGE: appending a huge purchase on day 101 must leave every
    // existing example row byte-identical (new rows may appear)
    val withFuture = base :+ ev(1L, 101L, "purchase", 400.0)
    val got2 = run(withFuture)
    assert(got.forall(got2.contains))
    assert(got.toSet.subsetOf(got2.toSet))
  }

  test("q56 histogram decomposition equals the all-pairs definition") {
    import spark.implicits._
    val p = Tables.part(spark, sf)
      .select($"p_brand", $"p_partkey", $"p_name")
      .as[(String, Long, String)].collect()
    val byBrand = p.groupBy(_._1)
    val want = byBrand.flatMap { case (brand, rows) =>
      val pairs = for {
        a <- rows; b <- rows if a._2 < b._2
      } yield levRef(a._3, b._3)
      if (pairs.isEmpty) None
      else Some(brand -> (
        pairs.length.toLong,
        pairs.count(_ <= 4).toLong,
        pairs.min.toLong,
        BigDecimal(pairs.map(_.toLong).sum.toDouble / pairs.length)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    val got = SparkEntry.queries("q56_fuzzy_brand")(spark, sf)
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(got == want)
  }

  test("gen_parity_demo fingerprint equals the executed-reference golden") {
    // NumpyParitySpec proves the ParityStream iterator is byte-equal to
    // the reference; this closes the loop on the REGISTERED query: the
    // same fingerprint aggregate (count / n_random / final clock /
    // order-sensitive xxhash64) applied to a DataFrame built straight
    // from the executed-reference golden rows must match the query's
    // output row exactly.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val in = getClass.getResourceAsStream("/npparity/stream_demo.csv.gz")
    val golden = scala.io.Source
      .fromInputStream(new java.util.zip.GZIPInputStream(in))
      .getLines().drop(1).zipWithIndex.map { case (l, i) =>
        val Array(ts, ty, isp) = l.split(",")
        (i.toLong, ts.toLong, ty.toInt, isp == "1")
      }.toSeq
    val goldenRow = golden
      .toDF("seq", "ts", "event_type", "is_pattern")
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(!$"is_pattern", 1L).otherwise(0L)).as("n_random"),
        max($"ts").as("ts_span"),
        expr("bit_xor(xxhash64(seq, ts, event_type, is_pattern))")
          .as("stream_checksum"))
      .as[(Long, Long, Long, Long)].head()
    val got = SparkEntry.queries("gen_parity_demo")(spark, sf)
      .as[(Long, Long, Long, Long)].head()
    assert(got == goldenRow)
    assert(got._1 == 40000L && got._2 == 28000L) // N and round(N·0.7)
  }

  test("q279 core: repetitive sequences score lower surprisal than erratic") {
    import spark.implicits._
    def ev(user: Long, types: Seq[String]): Seq[(Long, java.sql.Timestamp, Long, String)] =
      types.zipWithIndex.map { case (t, i) =>
        (user, new java.sql.Timestamp(86400000L + i * 1000L), user * 1000 + i, t)
      }
    // user 1 loops a->b forever; user 2 wanders over four types
    val rows = ev(1L, Seq.fill(20)(Seq("a", "b")).flatten) ++
      ev(2L, Seq("a", "c", "b", "d", "c", "a", "d", "b", "a", "d",
        "c", "b", "d", "a", "c", "d", "b", "c", "a", "b"))
    val df = rows.toDF("user_id", "ts", "event_id", "event_type")
    val got = ops.Sequence.markovSurprisal(df)
      .select("user_id", "n_trans", "avg_nll_micro")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L)._1 == 39L && got(2L)._1 == 19L) // n-1 transitions each
    assert(got(1L)._2 < got(2L)._2,
      s"repetitive user must be less surprising: $got")
  }

  test("q280 core: a planted deterministic chain grades 100% on holdout") {
    import spark.implicits._
    val t0 = 1704067200000L // 2024-01-01
    val split = new java.sql.Timestamp(t0 + 10L * 86400000L)
    // train: a->b 3x then b->a 2x per user; holdout repeats a->b / b->a
    def seqAt(user: Long, start: Long, types: Seq[String]) =
      types.zipWithIndex.map { case (t, i) =>
        (user, new java.sql.Timestamp(start + i * 60000L), user * 100 + i, t)
      }
    val rows = seqAt(1L, t0, Seq("a", "b", "a", "b", "a", "b")) ++
      seqAt(2L, t0 + 20L * 86400000L, Seq("a", "b", "a", "b"))
    val df = rows.toDF("user_id", "ts", "event_id", "event_type")
    val got = ops.Sequence.nextEventEval(df, split)
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    // holdout (user 2): a->b, b->a, a->b; model learned exactly that
    assert(got("a") == (("b", 2L, 2L, 1000000L)))
    assert(got("b") == (("a", 1L, 1L, 1000000L)))
  }

  test("q282 Viterbi: planted regimes decode exactly") {
    import spark.implicits._
    def ev(user: Long, types: Seq[String]) = types.zipWithIndex.map {
      case (t, i) =>
        (user, new java.sql.Timestamp(86400000L + i * 1000L),
          user * 1000 + i, t)
    }
    // user 1: pure views -> all calm, zero switches; user 2: views,
    // then a long error burst, then views -> burst island, 2 switches
    val rows = ev(1L, Seq.fill(12)("view")) ++
      ev(2L, Seq.fill(6)("view") ++ Seq.fill(8)("error") ++
        Seq.fill(6)("view"))
    val df = rows.toDF("user_id", "ts", "event_id", "event_type")
    val got = ops.Sequence.viterbiRegimes(df)
      .select("user_id", "map_state", "n_burst_steps", "n_switches")
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got(1L) == (("calm", 0L, 0L)))
    assert(got(2L) == (("calm", 8L, 2L)), s"burst island: ${got(2L)}")
  }

  test("q283 segmenter: a planted step splits exactly at the step") {
    import spark.implicits._
    // 20 flat days at 100 then 10 flat days at 500: level 1 must cut
    // at the step; level-2 cuts of flat sides tie to the earliest day
    val daily = ((1 to 20).map(i => (100L + i, 100L)) ++
      (21 to 30).map(i => (100L + i, 500L)))
      .toDF("day_id", "n")
    val got = ops.Events.binarySegmentation(daily)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toList
    assert(got.map(_._4) == List(1L, 19L, 1L, 9L)) // n_days per segment
    assert(got.map(_._6) == List(100000L, 100000L, 500000L, 500000L))
    assert(got(1)._3 == 120L && got(2)._2 == 121L) // the step boundary
  }

  test("q284 ACF recovers the generator's planted sin-density period") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the byte-exact demo replay has density_mode=sin, period=8000
    // ticks (main.py:33-35); in 500-tick buckets that is lag 16
    val spec = gen.GenQueries.demoSpec(40000L).copy(
      patterns = gen.ParityStream.patterns(
        gen.PatternSpec(8, 10, 6, gen.Rng.IntervalDist.Uniform,
          5, 3, 9, 137L)))
    val buckets = gen.ParityStream.dataset(spark, spec)
      .groupBy(expr("ts DIV 500").as("h")).agg(count(lit(1)).as("x"))
    val top = ops.Events.acfTopLags(buckets, maxLag = 48, topK = 3)
      .select("lag_hours").as[Long].collect().toList
    assert(top.head == 16L, s"top lag: $top")
    assert(top.toSet == Set(16L, 32L, 48L), s"harmonics: $top")
  }

  test("q285 attribution: the channel on every converting path takes all credit") {
    import spark.implicits._
    def ev(user: Long, types: Seq[String]) = types.zipWithIndex.map {
      case (t, i) =>
        (user, new java.sql.Timestamp(86400000L + i * 1000L),
          user * 1000 + i, t)
    }
    // every conversion goes through click, but only SOME go through
    // view: click's removal kills all conversion, view's only part,
    // and error (only on already-dead paths) carries nothing
    val rows = ev(1L, Seq("click", "purchase", "click", "purchase",
        "view", "click", "purchase")) ++
      ev(2L, Seq("view", "error"))
    val df = rows.toDF("user_id", "ts", "event_id", "event_type")
    val got = ops.Events.markovAttribution(df)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("click")._3 == 0L) // removing click kills conversion
    assert(got("click")._4 > got("view")._4 && got("view")._4 > 0L,
      s"ordering: ${got("click")} vs ${got("view")}")
    assert(got("error")._4 == 0L) // error adds nothing
    assert(got("view")._2 == got("click")._2) // shared p_full column
    assert(got.values.map(_._5).sum <= 1000000L) // shares are a split
  }

  test("q286 calibration: planted split model grades exact integer buckets") {
    import spark.implicits._
    def ev(user: Long, day: String, types: Seq[String]) =
      types.zipWithIndex.map { case (t, i) =>
        (user, java.sql.Timestamp.valueOf(s"$day 00:00:0$i"),
          user * 100 + i, t)
      }
    // train (before the 2024-01-25 split): A,B,A,B,A fits a 2-type
    // chain with c=2, n=2, v=2 for both prevs -> p_hat = 3e6 DIV 4 =
    // 750000 exactly; holdout A,B,A,A grades 2/3 in bucket 75
    val rows = ev(1L, "2024-01-20", Seq("A", "B", "A", "B", "A")) ++
      ev(2L, "2024-01-26", Seq("A", "B", "A", "A"))
    val got = ops.Sequence
      .predictionCalibration(rows.toDF("user_id", "ts", "event_id", "event_type"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((75L, 3L, 750000L, 750000L, 2L, 666666L)))
  }

  test("q287 k-core: simultaneous peel cascades a tail one hop per sweep") {
    import spark.implicits._
    // triangle {1,2,3} + tail 3-4-5-6-7: k=2 peel removes exactly one
    // tail edge per sweep (leaf first), fixpoint = the triangle
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L))
    val edges = und.toDF("src", "dst")
      .unionAll(und.map(_.swap).toDF("src", "dst"))
    def run(sweeps: Int): Set[(Long, Long)] =
      ops.Graph.kCore(edges, k = 2, maxSweeps = sweeps)
        .as[(Long, Long)].collect().toSet
    val tri = Set((1L, 2L), (1L, 3L), (2L, 3L))
    val sym = (s: Set[(Long, Long)]) => s ++ s.map(_.swap)
    assert(run(19) == sym(tri))
    // trajectory is deterministic: after 2 sweeps exactly the edges
    // touching 7 (sweep 1) and 6 (sweep 2) are gone, no more
    assert(run(2) == sym(tri ++ Set((3L, 4L), (4L, 5L))))
  }

  test("q288 link prediction: RA index exact on planted graphs") {
    import spark.implicits._
    def run(und: Seq[(Long, Long)], cap: Int): Set[(Long, Long, Long, Long)] =
      ops.Graph.raLinkPrediction(und.toDF("a", "b"), cap)
        .select("a", "b", "ra_ppm", "common_n")
        .as[(Long, Long, Long, Long)].collect().toSet
    // path 1-2-3: the only non-edge with a common neighbor is (1,3)
    // through center 2 (deg 2) -> ra = 1e6 DIV 2
    assert(run(Seq((1L, 2L), (2L, 3L)), 64) ==
      Set((1L, 3L, 500000L, 1L)))
    // 4-cycle: both diagonals, two centers of degree 2 each
    assert(run(Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)), 64) ==
      Set((1L, 3L, 1000000L, 2L), (2L, 4L, 1000000L, 2L)))
    // triangle: every wedge pair is already an edge -> nothing predicted
    assert(run(Seq((1L, 2L), (2L, 3L), (1L, 3L)), 64).isEmpty)
    // star with center degree 4: cap 3 excludes the center entirely,
    // cap 4 admits it and scores every leaf pair at 1e6 DIV 4
    val star = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 10L))
    assert(run(star, 3).isEmpty)
    assert(run(star, 4) ==
      Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
        .map { case (a, b) => (a, b, 250000L, 1L) })
  }

  test("q289 personalized PageRank matches the integer reference walk") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // barbell: path 1-2-3 bridging into a triangle {3,4,5}; seed 1
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (3L, 5L), (4L, 5L))
    val sym = und ++ und.map(_.swap)
    // driver-side twin of the exact truncating recurrence
    val out = sym.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = sym.map(_._1).distinct
    var ref = nodes.map(n => n -> (if (n == 1L) 1000000L else 0L)).toMap
    for (_ <- 1 to 6) {
      val c = nodes.map { n =>
        n -> sym.collect { case (u, v) if v == n => ref(u) / out(u) }.sum
      }.toMap
      ref = nodes.map { n =>
        n -> ((if (n == 1L) 150000L else 0L) + 85L * c(n) / 100L)
      }.toMap
    }
    val got = ops.Graph
      .personalizedPageRank(
        sym.toDF("src", "dst"),
        Seq(Tuple1(1L)).toDF("seedv"), iters = 6)
      .as[(Long, Long)].collect().toMap
    assert(got == ref)
    // restart locality: the seed holds the most mass (plain distance
    // decay does NOT hold here — triangle node 3 recirculates more
    // than bridge node 2, which is the point of the walk model)
    assert(got(1L) == got.values.max)
    assert(got(3L) > got(4L) && got(4L) == got(5L))
  }

  test("q281 streaming Markov surprisal equals batch q279 row-for-row") {
    import spark.implicits._
    val batch = SparkEntry.queries("q279_markov_surprisal")(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val stream = SparkEntry.queries("q281_stream_markov")(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(stream == batch)
  }

  test("q290 delta core charges 1/2/3-new-edge triangles exactly once") {
    import spark.implicits._
    // old: path-ish graph with NO triangle; delta closes one triangle
    // with exactly 1 new edge (2-3), one with 2 new edges (2-3 + 3-4
    // over old 2-4), and one all-new (5-6-7) — the minimal-new-edge
    // charge must count each exactly once: Δ = 3
    val old   = Seq((1L, 2L), (1L, 3L), (2L, 4L)).toDF("a", "b")
    val delta = Seq((2L, 3L), (3L, 4L), (5L, 6L), (5L, 7L), (6L, 7L))
      .toDF("a", "b")
    val got = ops.Graph.triangleDelta(old, delta)
      .as[Long].collect().toSeq
    assert(got == Seq(3L))
    // and a no-op delta counts nothing
    assert(ops.Graph
      .triangleDelta(old, spark.emptyDataset[(Long, Long)].toDF("a", "b"))
      .as[Long].collect().toSeq == Seq(0L))
  }

  test("q290 delta core equals recompute difference on random graphs") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val rnd = new scala.util.Random(14290)
    for (trial <- 1 to 5) {
      val n = 12 + trial * 4
      val all = (for {
        a <- 1L to n; b <- (a + 1) to n
        if rnd.nextInt(100) < 30
      } yield (a, b)).toSeq
      val (oldSeq, deltaSeq) = all.partition(_ => rnd.nextBoolean())
      val oldDf   = oldSeq.toDF("a", "b")
      val deltaDf = deltaSeq.toDF("a", "b")
      def tri(df: org.apache.spark.sql.DataFrame): Long =
        ops.Graph.triangleCount(df)
          .select("n_triangles").as[Long].head()
      val want = tri(all.toDF("a", "b")) - tri(oldDf)
      val got = ops.Graph.triangleDelta(oldDf, deltaDf)
        .as[Long].head()
      assert(got == want, s"trial $trial: got $got want $want")
      // q291's exact index split: old edges arbitrarily divided
      // between the BASE index and the RECENT index (old flags), the
      // delta riding in RECENT with new flags — must score identically
      val (snapSeq, tickSeq) = oldSeq.partition(_ => rnd.nextBoolean())
      val recent = ops.Graph.adjacencyFlagged(
        tickSeq.toDF("a", "b").withColumn("nw", lit(false))
          .unionByName(deltaDf.withColumn("nw", lit(true))))
      val gotSplit = ops.Graph.triangleDeltaOnAdj(
        ops.Graph.adjacency(snapSeq.toDF("a", "b"), isNew = false),
        recent, deltaDf)
        .as[Long].head()
      assert(gotSplit == want, s"trial $trial split: $gotSplit/$want")
    }
  }

  test("q290 incremental census equals the q143 full recompute") {
    val full = SparkEntry.queries("q143_triangle_count")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val inc = SparkEntry.queries("q290_incremental_triangles")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(inc == full)
  }

  test("q292 rules equal a driver recompute from q261's episodes") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val eps = SparkEntry.queries("q261_episode_mining")(spark, sf)
      .as[(Long, String, Long, Long)].collect()
      .map { case (len, ep, sup, _) => (len, ep, sup) }
    val ev = Tables.events(spark, sf)
    val n = ev.count()
    val typeCnt = ev.groupBy($"event_type").count()
      .as[(String, Long)].collect().toMap
    val supOf = eps.map { case (_, ep, s) => ep -> s }.toMap
    val want = eps.map { case (len, ep, sup) =>
      val parts = ep.split(">")
      val ante  = parts.dropRight(1).mkString(">")
      val cons  = parts.last
      val pSup  = if (parts.length == 2) typeCnt(ante) else supOf(ante)
      val conf  = sup * 1000000L / pSup
      val baseP = typeCnt(cons) * 1000000L / n
      (len, ante, cons, sup, conf, baseP, conf * 1000L / baseP)
    }.sortBy { case (l, a, c, _, conf, _, _) => (l, -conf, a, c) }.toSeq
    val got = SparkEntry.queries("q292_episode_rules")(spark, sf)
      .as[(Long, String, String, Long, Long, Long, Long)]
      .collect().toSeq
    assert(got == want)
    // lift is the point of the rule layer: the fixture must contain
    // both enriching (>1000) and suppressing (<1000) rules, or the
    // milli ranking is vacuous here
    assert(got.exists(_._7 > 1000L) && got.exists(_._7 < 1000L))
  }

  test("q294 OOF encoding is mechanically leakage-free") {
    import spark.implicits._
    val base = Seq(
      ("A", 0L, 100L), ("A", 0L, 200L), ("A", 1L, 400L),
      ("A", 2L, 600L), ("B", 1L, 1000L), ("B", 2L, 2000L),
      ("B", 2L, 3000L), ("C", 0L, 500L))
    def run(rows: Seq[(String, Long, Long)]) =
      ops.Eval.oofEncoding(rows.toDF("cat", "fold", "t"), 100L)
        .as[(String, Long, Long, Long, Option[Long], Option[Long])]
        .collect().map(r => (r._1, r._2) -> r).toMap
    val got = run(base)
    // hand check: A/fold0 sees only A's fold-1/2 targets (400, 600)
    assert(got(("A", 0L))._5.contains(500000000L))
    // C exists only in fold 0: raw undefined, enc = the fold-0 prior
    // exactly = mean of every row NOT in fold 0 = 7000/5
    assert(got(("C", 0L))._5.isEmpty)
    assert(got(("C", 0L))._6.contains(1400000000L))
    // the leakage proof: perturb EVERY fold-0 target; nothing emitted
    // FOR fold 0 may move (its encoder never sees fold-0 labels),
    // while other folds' encodings must move
    val pert = base.map { case (c, f, t) =>
      (c, f, if (f == 0L) t + 10000L else t) }
    val got2 = run(pert)
    for (k <- got.keys if k._2 == 0L)
      assert(got2(k) == got(k), s"fold-0 cell $k moved")
    assert(got2(("A", 1L))._6 != got(("A", 1L))._6)
    assert(got2(("B", 2L))._6 != got(("B", 2L))._6)
  }

  test("q297 walks equal a driver MessageDigest replay of the draws") {
    import spark.implicits._
    // path + triangle: 1-2, 2-3, 3-4, 3-5, 4-5
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (3L, 5L), (4L, 5L))
    val adj = (und ++ und.map(_.swap)).groupBy(_._1)
      .map { case (v, es) => v -> es.map(_._2).sorted.toVector }
    def md5idx(walkId: Long, step: Int, deg: Int): Int = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$walkId:$step".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(h, 16) % deg).toInt
    }
    val want = (for {
      nd <- Seq(1L, 2L, 3L) // 3 seeds, 2 walks each
      j <- 0L to 1L
    } yield {
      val walkId = nd * 2 + j
      val nodes = Iterator.iterate((nd, 1)) { case (cur, k) =>
        val ns = adj(cur)
        (ns(md5idx(walkId, k, ns.size)), k + 1)
      }.map(_._1).take(5).toVector
      (walkId, nodes.mkString(">"), nodes.distinct.size.toLong)
    }).sortBy(_._1)
    val got = ops.Graph.randomWalks(und.toDF("a", "b"),
      nSeeds = 3, walksPerSeed = 2, len = 4)
      .as[(Long, String, Long)].collect().toSeq
    assert(got == want)
  }

  test("q298 skip-gram pairs equal a driver recompute from q297 walks") {
    import spark.implicits._
    val walks = SparkEntry.queries("q297_random_walks")(spark, sf)
      .as[(Long, String, Long)].collect()
    val want = walks
      .flatMap { case (_, w, _) =>
        val ns = w.split(">").map(_.toLong)
        for {
          i <- ns.indices; j <- ns.indices
          if i != j && math.abs(i - j) <= 2
        } yield (ns(i), ns(j))
      }
      .groupBy(identity).map { case ((c, x), v) => (c, x, v.size.toLong) }
      .toSeq
      .sortBy { case (c, x, n) => (-n, c, x) }
      .take(50)
    val got = SparkEntry.queries("q298_skipgram_pairs")(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == want)
  }

  test("q296 refresh: planted clusters move exactly; boundary defects") {
    import spark.implicits._
    // 2-dim line: seeds 0 at x=0 and 1 at x=10; members pull cluster 0
    // to 1.375 and cluster 1 to 7.55 — vector 4 (x=4.9) sits with seed
    // 0 initially but the refreshed centroid 1 comes CLOSER (2.65 vs
    // 3.525), so it defects; vector 5 (x=5.1) stays.
    val emb = Seq(
      (0L, Seq(0.0f, 0f)), (1L, Seq(10.0f, 0f)), (2L, Seq(0.2f, 0f)),
      (3L, Seq(0.4f, 0f)), (4L, Seq(4.9f, 0f)), (5L, Seq(5.1f, 0f)))
      .toDF("vec_id", "embedding")
    val got = ops.Vectors.kmeansRefresh(emb, k = 2)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 4L, 1375000L, 1L),   // mean (0+0.2+0.4+4.9)/4; one defector
      (1L, 2L, 2450000L, 0L))) // mean (10+5.1)/2 = 7.55, shift 2.45
  }

  test("q295 graph profile: star is exactly -1 assortative; guards") {
    import spark.implicits._
    // star K1,3: ends pairs (3,1)x3 + (1,3)x3 -> Pearson r = -1 exactly
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("a", "b")
    val p = ops.Graph.graphProfile(star)
      .as[(Long, Long, Long, Long, Option[Long], Option[Long])].head()
    assert(p._1 == 4L && p._2 == 3L && p._3 == 3L)
    assert(p._5.contains(-1000000L))
    // Hill at dmin=2: only the center qualifies, term = round(1e6 ln 1.5)
    val term = math.round(1e6 * math.log(1.5))
    assert(p._6.contains(1000000L + 1000000000000L / term))
    // 4-cycle: regular graph — zero degree variance and zero tail sum
    // hit BOTH null guards instead of dividing by zero
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("a", "b")
    val c = ops.Graph.graphProfile(cyc)
      .as[(Long, Long, Long, Long, Option[Long], Option[Long])].head()
    assert(c._5.isEmpty && c._6.isEmpty)
    assert(c._4 == 2000L) // avg degree exactly 2
  }

  test("q293 harmonic centrality exact on a planted path + star") {
    import spark.implicits._
    // path 1-2-3-4-5-6 plus star center 3 with leaves 7,8: landmark
    // BFS from seeds {1, 7}, 4 hops — hand-computed truncated
    // harmonic milli sums through the production multi-source BFS
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (3L, 7L), (3L, 8L))
    val edges = und.toDF("src", "dst")
      .unionAll(und.map(_.swap).toDF("src", "dst"))
    val seeds = Seq(1L, 7L).toDF("seed")
    val got = ops.Graph.harmonicCentrality(edges, seeds, hops = 4)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // d(1,·): 2→1 3→2 4→3 5→4 7→3 8→3 ; d(7,·): 3→1 2→2 4→2 8→2 1→3 5→3
    assert(got(2L) == (2L, 1000L + 500L))  // d=1 from 1, d=2 from 7
    assert(got(3L) == (2L, 500L + 1000L))
    assert(got(4L) == (2L, 333L + 500L))
    assert(got(5L) == (2L, 250L + 333L))
    assert(got(8L) == (2L, 333L + 500L))
    assert(got(6L) == (1L, 250L))          // d(1,6)=5 truncated; d(7,6)=4
    assert(got(1L) == (1L, 333L))          // seed 1 itself excluded (dist 0), d(7,1)=3
    assert(got(7L) == (1L, 333L))          // d(1,7)=3; seed 7 itself excluded
  }

  test("q291 streaming triangle census equals the q143 full recompute") {
    val full = SparkEntry.queries("q143_triangle_count")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val live = SparkEntry.queries("q291_stream_triangles")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(live == full)
  }
}
