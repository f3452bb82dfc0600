package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-15 gates. Headline: the r14-verdict weak item — q297's walk
  * frontier was force-broadcast at EVERY step with no fallback, a
  * driver-memory scale-killer at the millions-of-walks production
  * shape the docstring advertises — is fixed by a frontier-size
  * threshold: below it the frontier broadcasts (zero shuffles per
  * step), above it the adjacency is hash-partitioned once and each
  * step pays exactly one frontier exchange. These tests prove (a) the
  * large path plans ZERO BroadcastExchange, (b) the small path still
  * broadcasts, and (c) the two paths emit byte-identical corpora.
  */
class Round15Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("q297 large-frontier path plans no BroadcastExchange; small does") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")
    val dir = und.select($"a".as("v"), $"b".as("z"))
      .unionAll(und.select($"b".as("v"), $"a".as("z")))
    val adj = dir.groupBy($"v")
      .agg(sort_array(collect_list($"z")).as("nbrs"))
    val cur = Seq((10L, 0L, 1L), (11L, 0L, 2L))
      .toDF("walk_id", "step", "node").localCheckpoint()
    def planOf(small: Boolean): String =
      ops.Graph.walkStep(cur, adj, k = 1, smallFrontier = small)
        .queryExecution.executedPlan.toString
    val large = planOf(small = false)
    assert(!large.contains("BroadcastExchange"),
      "large-frontier walk step must not broadcast the frontier")
    assert(large.contains("SortMergeJoin"),
      "large-frontier walk step is pinned to sort-merge")
    assert(planOf(small = true).contains("BroadcastExchange"),
      "small-frontier walk step should broadcast the frontier")
  }

  test("q297 broadcast and co-partitioned walk paths emit identical corpora") {
    import spark.implicits._
    val und = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (2L, 5L),
      (5L, 6L), (1L, 6L)).toDF("a", "b")
    val viaBroadcast = ops.Graph
      .randomWalks(und, nSeeds = 4, walksPerSeed = 3, len = 5)
      .as[(Long, String, Long)].collect().toSeq
    val viaExchange = ops.Graph
      .randomWalks(und, nSeeds = 4, walksPerSeed = 3, len = 5,
        broadcastFrontierMax = 0L)
      .as[(Long, String, Long)].collect().toSeq
    assert(viaBroadcast == viaExchange)
    assert(viaBroadcast.size == 12)
  }

  // ---- q299/q300: SPPMI + embedding trainer gates --------------------

  /** Two 6-cliques joined by a single bridge edge — the planted
    * two-community fixture: walks mix within a clique and rarely cross
    * the bridge, so SPPMI factorization must place same-clique nodes
    * at high cosine and cross-clique nodes near/below zero.
    */
  private def barbellWalks(): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val cliqueA = for (a <- 1L to 6L; b <- (a + 1) to 6L) yield (a, b)
    val cliqueB = for (a <- 11L to 16L; b <- (a + 1) to 16L) yield (a, b)
    val und = (cliqueA ++ cliqueB :+ ((6L, 11L))).toDF("a", "b")
    ops.Graph.randomWalks(und, nSeeds = 12, walksPerSeed = 6, len = 8)
  }

  // shift = 1 (plain PPMI) on the dense 12-node fixture: with only two
  // 6-cliques the independence ratio tops out near 2.4, so the
  // registered shift of 5 would (correctly) empty the matrix
  test("q299 sppmi matrix is symmetric and positive by integer cut") {
    import spark.implicits._
    val m = ops.Graph.sppmi(
      ops.Graph.skipgramPairs(barbellWalks()), shift = 1)
      .select($"center", $"context", $"sppmi")
      .as[(Long, Long, Double)].collect().toSet
    assert(m.nonEmpty)
    assert(m.forall(_._3 > 0.0))
    // window-2 pairs count both directions, so SPPMI is symmetric
    assert(m.map { case (c, x, v) => (x, c, v) } == m)
  }

  test("q300 embeddings separate the planted two-community barbell") {
    import spark.implicits._
    val emb = ops.Graph.nodeEmbeddings(barbellWalks(), dim = 4, shift = 1)
      .as[(Long, Seq[Double])].collect().toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      dot / (na * nb)
    }
    val comm = Map(1L -> 0, 2L -> 0, 3L -> 0, 4L -> 0, 5L -> 0, 6L -> 0,
      11L -> 1, 12L -> 1, 13L -> 1, 14L -> 1, 15L -> 1, 16L -> 1)
    val nodes = emb.keySet.filter(comm.contains).toSeq.sorted
    val pairs = for {
      a <- nodes; b <- nodes if a < b
    } yield (comm(a) == comm(b), cos(emb(a), emb(b)))
    val intra = pairs.collect { case (true, c) => c }
    val inter = pairs.collect { case (false, c) => c }
    assert(intra.nonEmpty && inter.nonEmpty)
    val meanIntra = intra.sum / intra.size
    val meanInter = inter.sum / inter.size
    assert(meanIntra > meanInter + 0.4,
      s"intra=$meanIntra inter=$meanInter — communities not separated")
  }

  test("q300 reruns are bit-identical and the vocab cap binds exactly") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val walks = barbellWalks().localCheckpoint()
    val run1 = ops.Graph.nodeEmbeddings(walks, dim = 4, shift = 1, vocabCap = 8)
      .as[(Long, Seq[Double])].collect().toSeq.sortBy(_._1)
    val run2 = ops.Graph.nodeEmbeddings(walks, dim = 4, shift = 1, vocabCap = 8)
      .as[(Long, Seq[Double])].collect().toSeq.sortBy(_._1)
    assert(run1 == run2)
    assert(run1.size <= 8)
    // the kept vocab is exactly the top-8 centers by total pair count
    // (ties → smaller id) — a driver recompute from the pair layer
    val want = ops.Graph.sppmi(
      ops.Graph.skipgramPairs(walks), shift = 1)
      .groupBy($"center").agg(sum($"n_pairs").as("m"))
      .orderBy($"m".desc, $"center").limit(8)
      .select($"center").as[Long].collect().toSet
    assert(run1.map(_._1).toSet == want)
  }

  // ---- q301: fuzzy decontamination catches what q124 cannot ----------

  test("q301 catches a planted paraphrase that shares NO 13-gram") {
    import spark.implicits._
    // test doc: 30 words; train doc 100: same text with words 9 and 22
    // swapped — longest shared token run is 12 < 13, so exact 13-gram
    // decontamination provably passes it, while word-3-gram Jaccard
    // stays high (22 of 34 union shingles shared, J ≈ 0.65)
    val words = (0 until 30).map(i => s"w$i")
    val para = words.zipWithIndex.map { case (w, i) =>
      if (i == 9 || i == 22) s"x$i" else w
    }
    val docs = Seq(
      (100L, "train", para.mkString(" ")),      // planted paraphrase
      (101L, "train", (0 until 30).map(i => s"z$i").mkString(" ")),
      (200L, "test", words.mkString(" ")),
      (201L, "test", (0 until 30).map(i => s"y$i").mkString(" ")))
      .toDF("doc_id", "split", "text")
    // (a) zero shared 13-grams — the q124 blind spot, proven directly
    def grams13(t: Seq[String]): Set[String] =
      (0 to t.length - 13).map(i => t.slice(i, i + 13).mkString(" ")).toSet
    assert(grams13(para).intersect(grams13(words)).isEmpty)
    // (b) the fuzzy ledger drops the paraphrase and keeps the clean doc
    val led = ops.Corpus.fuzzyDecontam(docs, minMatches = 8)
      .as[(Long, Long, Option[Long], String)].collect().toSeq
    assert(led == Seq(
      (100L, 1L, Some(200L), "drop"),
      (101L, 0L, None, "keep")))
  }

  // ---- q302: modularity + best-move refinement ------------------------

  /** Driver-side exact Q numerator (Q = qnum / 4m²) — the independent
    * recompute the distributed modularity and gain tables are gated
    * against.
    */
  private def qNum(und: Seq[(Long, Long)], lab: Map[Long, Long]): Long = {
    val m = und.size.toLong
    val deg = und.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val dC = deg.groupBy { case (n, _) => lab(n) }
      .map { case (c, xs) => c -> xs.values.sum }
    val eC = und.filter { case (a, b) => lab(a) == lab(b) }
      .groupBy { case (a, _) => lab(a) }
      .map { case (c, xs) => c -> xs.size.toLong }
    lab.values.toSet.toSeq.map { c: Long =>
      4L * m * eC.getOrElse(c, 0L) - dC.getOrElse(c, 0L) * dC(c)
    }.sum
  }

  private val barbellEdges: Seq[(Long, Long)] = {
    val cliqueA = for (a <- 1L to 6L; b <- (a + 1) to 6L) yield (a, b)
    val cliqueB = for (a <- 11L to 16L; b <- (a + 1) to 16L) yield (a, b)
    (cliqueA ++ cliqueB :+ ((6L, 11L))).toSeq
  }

  test("q302 modularity_ppm equals the driver recompute exactly") {
    import spark.implicits._
    val und = barbellEdges.toDF("a", "b")
    val lab = barbellEdges.flatMap { case (a, b) => Seq(a, b) }.distinct
      .map(n => (n, if (n <= 6) 1L else 11L))
    val labels = lab.toDF("id", "lab")
    val got = ops.Graph.modularityOf(und, labels)
      .select($"modularity_ppm").distinct().as[Long].collect()
    val m = barbellEdges.size.toLong
    val want = BigInt(qNum(barbellEdges, lab.toMap)) * 1000000 /
      (4 * BigInt(m) * BigInt(m))
    assert(got.toSeq == Seq(want.toLong))
  }

  test("q302 refinement moves the planted misassignment; gain is exact") {
    import spark.implicits._
    val und = barbellEdges.toDF("a", "b")
    // node 6 misassigned to the far community
    val lab0 = barbellEdges.flatMap { case (a, b) => Seq(a, b) }.distinct
      .map(n => (n, if (n <= 6 && n != 6) 1L else if (n == 6) 11L else 11L))
    val (lab1, move) = ops.Graph.refineOnce(und, lab0.toDF("id", "lab"))
    assert(move.isDefined)
    val (v, from, to, gain) = move.get
    assert(v == 6L && from == 11L && to == 1L && gain > 0L)
    // exact accounting: the predicted integer gain IS the Q-numerator
    // delta of the applied move (ΔQ = gain / 4m²)
    val after = lab1.as[(Long, Long)].collect().toMap
    assert(qNum(barbellEdges, after) - qNum(barbellEdges, lab0.toMap) == gain)
    // iterate to the local optimum: Q never decreases, loop terminates
    var cur = lab1
    var curQ = qNum(barbellEdges, after)
    var moves = 0
    var done = false
    while (!done && moves < 20) {
      val (nxt, mv) = ops.Graph.refineOnce(und, cur)
      mv match {
        case Some((_, _, _, g)) =>
          val q2 = qNum(barbellEdges, nxt.as[(Long, Long)].collect().toMap)
          assert(q2 - curQ == g && g > 0L)
          curQ = q2; cur = nxt; moves += 1
        case None => done = true
      }
    }
    assert(done, "refinement did not reach a local optimum in 20 moves")
  }

  test("q302 refinement never decreases modularity on the real graph") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val und = ops.Graph.coPurchaseEdges(spark, sf).localCheckpoint()
    val labels = ops.Graph.lpaStore(spark, sf)
    def q(l: org.apache.spark.sql.DataFrame): Long =
      ops.Graph.modularityOf(und, l)
        .select($"modularity_ppm").distinct().as[Long].collect().head
    val before = q(labels)
    val (refined, move) = ops.Graph.refineOnce(und, labels)
    val after = q(refined)
    assert(after >= before,
      s"refinement decreased modularity: $before -> $after")
    // if a move was applied its gain must be strictly positive
    move.foreach { case (_, from, to, g) =>
      assert(g > 0L && from != to)
    }
  }

  // ---- q303: streaming A-ES reservoir ---------------------------------

  test("q303 stream reservoir is batching-independent and equals batch q146") {
    import spark.implicits._
    val oneBatch = graft.streaming.Streams
      .streamWeightedSample(spark, sf, nFiles = 1)
      .as[(Long, String, Long)].collect().toSeq
    val fourBatches = graft.streaming.Streams
      .streamWeightedSample(spark, sf, nFiles = 4)
      .as[(Long, String, Long)].collect().toSeq
    assert(oneBatch == fourBatches)
    val batch = SparkEntry.queries("q146_weighted_sample")(spark, sf)
      .as[(Long, String, Long)].collect().toSeq
    assert(fourBatches == batch)
  }

  // ---- StoreLog: the unified commit log (q107/q125/q152/q291/q304) ----

  private def freshLogRoot(): java.nio.file.Path =
    java.nio.file.Paths.get("target", "graft_stream",
      "slog_" + java.util.UUID.randomUUID().toString.replace("-", ""))

  test("StoreLog: replayed commit supersedes its own attempt; asOf reads") {
    import spark.implicits._
    val log = new graft.streaming.StoreLog(freshLogRoot(), "v")
    log.commitTable(0L, Seq((1L, "a")).toDF("k", "x"))
    log.commitTable(1L, Seq((1L, "b")).toDF("k", "x"))
    // at-least-once replay of batch 1 — re-derived from the same
    // predecessor, must REPLACE its own prior attempt, not duplicate
    log.commitTable(1L, Seq((1L, "b")).toDF("k", "x"))
    assert(log.versions() == Seq(0L, 1L))
    assert(log.latestBefore(1L) == Some(0L))
    def read(v: Long) =
      log.asOf(spark, v).get.as[(Long, String)].collect().toSeq
    assert(read(0L) == Seq((1L, "a")))
    assert(read(1L) == Seq((1L, "b")))
    assert(read(99L) == Seq((1L, "b"))) // asOf clamps to the newest ≤ v
    assert(log.asOf(spark, -1L).isEmpty)
  }

  test("StoreLog: retention vacuums history but keeps the predecessor") {
    import spark.implicits._
    val log = new graft.streaming.StoreLog(freshLogRoot(), "v",
      retention = 2)
    (0L to 3L).foreach(i => log.commitTable(i, Seq((i, i)).toDF("k", "x")))
    // exactly {latest, predecessor} survive — what a single-batch
    // replay needs to re-derive, nothing more
    assert(log.versions() == Seq(2L, 3L))
    assert(log.readLatest(spark).get.as[(Long, Long)].collect().toSeq ==
      Seq((3L, 3L)))
  }

  test("StoreLog: dead temp dirs are invisible and get cleaned by commit") {
    import spark.implicits._
    val root = freshLogRoot()
    val log = new graft.streaming.StoreLog(root, "v")
    // simulate a crash between stage and rename: a dead tmp_v0 exists
    java.nio.file.Files.createDirectories(root.resolve("tmp_v0"))
    java.nio.file.Files.write(root.resolve("tmp_v0").resolve("junk"),
      Array[Byte](1))
    assert(log.versions().isEmpty) // the listing IS the log; tmp ≠ commit
    log.commitTable(0L, Seq((7L, 7L)).toDF("k", "x"))
    assert(log.versions() == Seq(0L))
    assert(!java.nio.file.Files.exists(root.resolve("tmp_v0")))
    assert(log.asOf(spark, 0L).get.as[(Long, Long)].collect().toSeq ==
      Seq((7L, 7L)))
  }

  test("StoreLog: delta chain unions commits up to a version") {
    import spark.implicits._
    val log = new graft.streaming.StoreLog(freshLogRoot(), "b")
    log.commitTable(0L, Seq(1L).toDF("x"))
    log.commitTable(1L, Seq(2L).toDF("x"))
    log.commitTable(2L, Seq(3L).toDF("x"))
    def upTo(v: Long) = log.deltasUpTo(spark, v).get
      .as[Long].collect().toSeq.sorted
    assert(upTo(0L) == Seq(1L))
    assert(upTo(1L) == Seq(1L, 2L))
    assert(upTo(2L) == Seq(1L, 2L, 3L))
    assert(log.deltasUpTo(spark, -1L).isEmpty)
  }

  test("StoreLog model-based randomized commit/replay/crash sequences") {
    import spark.implicits._
    val rnd = new scala.util.Random(1546L)
    for (trial <- 0 until 3) {
      val retention = if (trial == 2) 2 else Int.MaxValue
      val log = new graft.streaming.StoreLog(freshLogRoot(), "v", retention)
      var model = Map.empty[Long, Long] // version -> content tag
      var nextId = 0L
      for (_ <- 0 until 25) {
        rnd.nextInt(4) match {
          case 0 | 1 => // fresh commit
            val id = nextId; nextId += 1
            val tag = rnd.nextLong()
            log.commitTable(id, Seq((id, tag)).toDF("k", "tag"))
            model += (id -> tag)
            if (retention != Int.MaxValue) {
              val keep = (model.keys.filter(_ < id).toSeq.sorted
                .takeRight(retention - 1) :+ id).toSet
              model = model.filter { case (v, _) => keep(v) }
            }
          case 2 if model.nonEmpty => // at-least-once replay of a past id
            val id = model.keys.toSeq(rnd.nextInt(model.size))
            log.commitTable(id, Seq((id, model(id))).toDF("k", "tag"))
            if (retention != Int.MaxValue) {
              val keep = (model.keys.filter(_ < id).toSeq.sorted
                .takeRight(retention - 1) :+ id).toSet
              model = model.filter { case (v, _) => keep(v) }
            }
          case _ => // crash between stage and publish: dead tmp junk
            val p = log.root.resolve(s"tmp_v$nextId")
            java.nio.file.Files.createDirectories(p)
            java.nio.file.Files.write(p.resolve("junk"), Array[Byte](7))
        }
        assert(log.versions() == model.keys.toSeq.sorted)
        if (model.nonEmpty) {
          val probe = rnd.nextLong(nextId + 2)
          val want = model.keys.filter(_ <= probe).maxOption
          val got = log.asOf(spark, probe)
            .map(_.as[(Long, Long)].collect().head)
          assert(got == want.map(v => (v, model(v))),
            s"trial $trial asOf($probe): got $got want $want")
        }
      }
    }
  }

  // ---- open-vocabulary ER blocking (q-gram prefix postings) -----------

  /** Deterministic OPEN vocabulary: names are 3 words drawn from a
    * word pool that GROWS with n (the defining property of an open
    * vocabulary — new entities bring new tokens; a fixed-alphabet
    * random-string fixture saturates its gram space and every blocker
    * goes quadratic on it, md5-measured 4.5× here). Planted near-dups
    * and short names exercise the accept set and the zero-gram
    * residue.
    */
  private def openVocab(n: Int): Seq[String] = {
    def word(i: Int): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"w:$i".getBytes("UTF-8"))
        .take(3).map("%02x".format(_)).mkString
    val pool = (0 until math.max(n / 2, 4)).map(word)
    def pick(i: Int, k: Int): String =
      pool(math.abs((i * 31 + k * 7 + 13) * 2654435761L % pool.size).toInt)
    val base = (0 until n)
      .map(i => Seq(pick(i, 0), pick(i, 1), pick(i, 2)).mkString(" "))
    val planted = base.take(n / 10).map(w => w.updated(3, 'z'))
    val shorts = Seq("ab", "abc", "abcd", "a")
    (base ++ planted ++ shorts).distinct
  }

  private def levRef(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("qgram accept set equals brute force on an open vocabulary") {
    import spark.implicits._
    val vocab = openVocab(200)
    val names = vocab.toDF("p_name")
    val got = ops.Dedup.acceptedNamePairsQgram(names, 2)
      .as[(String, String)].collect().toSet
    val want = (for {
      a <- vocab; b <- vocab if levRef(a, b) <= 2
    } yield (a, b)).toSet
    assert(got == want)
    assert(vocab.forall(n => got((n, n))))
  }

  test("qgram accept set equals the length-band grid on the TPC-H vocab") {
    import spark.implicits._
    val names = Tables.part(spark, sf).select($"p_name").distinct()
      .localCheckpoint()
    val viaQgram = ops.Dedup.acceptedNamePairsQgram(names, 2)
      .as[(String, String)].collect().toSet
    val viaGrid = ops.Dedup.acceptedNamePairs(names, 2)
      .as[(String, String)].collect().toSet
    assert(viaQgram == viaGrid)
  }

  test("qgram candidates grow ~linearly when the open vocabulary doubles") {
    import spark.implicits._
    val small = openVocab(400).toDF("p_name")
    val large = openVocab(800).toDF("p_name")
    val cSmall = ops.Dedup.qgramCandidates(small, 2).count().toDouble
    val cLarge = ops.Dedup.qgramCandidates(large, 2).count().toDouble
    val ratio = cLarge / cSmall
    // linear ≈ 2, all-pairs/within-band ≈ 4; leave slack for posting-
    // list collisions on the random vocab
    assert(ratio < 2.8,
      s"candidate growth $ratio on a 2x vocab — blocking is superlinear")
  }

  // ---- q307: embedding neighbors agree with communities ----------------

  test("q307 planted barbell: all embedding neighbors are intra-community") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val walks = barbellWalks().localCheckpoint()
    val emb = ops.Graph.nodeEmbeddings(walks, dim = 4, shift = 1)
      .localCheckpoint()
    val labels = emb.select($"node".as("id"))
      .withColumn("lab", when($"id" <= 6L, 1L).otherwise(11L))
    val got = ops.Graph.embeddingNeighbors(emb, labels, k = 2)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.nonEmpty)
    // every community: every mined neighbor is intra → intra_pct 100
    assert(got.forall(_._5 == 100L),
      s"cross-community embedding neighbors found: $got")
    // driver recompute of the identical integer-key ranking pins the
    // rollup end-to-end
    val vecs = emb.as[(Long, Seq[Double])].collect()
      .map { case (n, v) => n -> v.map(x => math.round(x * 1e6)) }.toMap
    val lab = (id: Long) => if (id <= 6L) 1L else 11L
    def dot(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val want = vecs.keys.toSeq.flatMap { a =>
      vecs.keys.toSeq.filter(_ != a)
        .map { b =>
          val dp = dot(vecs(a), vecs(b))
          val key = (BigInt(dp) * BigInt(dp).abs /
            BigInt(dot(vecs(b), vecs(b))))
          (b, key)
        }
        .sortBy { case (b, key) => (-key, b) }
        .take(2)
        .map { case (b, _) => (lab(a), a, b) }
    }
    val wantRoll = want.groupBy(_._1).map { case (c, xs) =>
      (c, xs.map(_._2).distinct.size.toLong, xs.size.toLong,
        xs.count { case (la, _, b) => la == lab(b) }.toLong, 100L)
    }.toSeq.sortBy(x => (-x._2, x._1))
    assert(got == wantRoll)
  }

  // ---- q308: fold-in places out-of-vocab nodes with their community ----

  test("q308 fold-in lands out-of-cap nodes nearest their own community") {
    import spark.implicits._
    val walks = barbellWalks().localCheckpoint()
    // cap 8 of 12: at least 4 nodes must fold in
    val trained = ops.Graph
      .nodeEmbeddings(walks, dim = 4, shift = 1, vocabCap = 8)
      .as[(Long, Seq[Double])].collect().toMap
    val folded = ops.Graph
      .foldInEmbeddings(walks, dim = 4, shift = 1, vocabCap = 8)
      .as[(Long, Seq[Long], Long)].collect()
    assert(folded.nonEmpty)
    assert(folded.map(_._1).toSet.intersect(trained.keySet).isEmpty)
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum))
    }
    val comm = (id: Long) => if (id <= 6L) 0 else 1
    folded.foreach { case (node, em, nAnchors) =>
      assert(nAnchors > 0L)
      val v = em.map(_.toDouble / 1e6)
      val own = trained.filter(t => comm(t._1) == comm(node)).values
      val other = trained.filter(t => comm(t._1) != comm(node)).values
      if (own.nonEmpty && other.nonEmpty) {
        val meanOwn = own.map(cos(v, _)).sum / own.size
        val meanOther = other.map(cos(v, _)).sum / other.size
        assert(meanOwn > meanOther,
          s"folded node $node sits closer to the other community")
      }
    }
    // determinism: the integer pipeline reruns bit-identically
    val rerun = ops.Graph
      .foldInEmbeddings(walks, dim = 4, shift = 1, vocabCap = 8)
      .as[(Long, Seq[Long], Long)].collect()
    assert(folded.toSeq == rerun.toSeq)
  }

  // ---- q310: backfill splice is a genuine correction -------------------

  test("q310 partial store genuinely differs on the restated day") {
    import spark.implicits._
    val (store, corrected, day) = ops.Events.backfillParts(spark, sf)
    val stale = store.filter($"day_id" === day)
      .as[(Long, String, Long, Long)].collect().toSet
    val fresh = corrected
      .as[(Long, String, Long, Long)].collect().toSet
    // the restatement must have something to correct — otherwise the
    // oracle gate (splice ≡ full recompute) would pass vacuously
    assert(fresh.nonEmpty)
    assert(stale != fresh,
      s"day $day partial build equals the recomputation — vacuous gate")
    // and only the restated day is touched by the splice
    val out = SparkEntry.queries("q310_backfill_splice")(spark, sf)
      .as[(Long, String, Long, Long)].collect()
    assert(out.filter(_._1 == day).toSet == fresh)
    assert(out.filterNot(_._1 == day).toSet ==
      store.filter($"day_id" =!= day)
        .as[(Long, String, Long, Long)].collect().toSet)
  }

  // ---- q311: next-event serving on a planted sequence -------------------

  test("q311 serves the planted bigram model and backs off on cold start") {
    import spark.implicits._
    // user 1: A B A B A C  → transitions A→B ×2, B→A ×2, A→C ×1;
    // user 2: A B          → A→B ×1. C never occurs as a CONTEXT, so
    // user 1 (last event C) must fall back to the global marginal;
    // user 2 (last event B) serves from the bigram model.
    def t(i: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:00:0$i")
    val ev = Seq(
      (1L, t(1), 1L, "A"), (2L, t(2), 1L, "B"), (3L, t(3), 1L, "A"),
      (4L, t(4), 1L, "B"), (5L, t(5), 1L, "A"), (6L, t(6), 1L, "C"),
      (7L, t(1), 2L, "A"), (8L, t(2), 2L, "B"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = ops.Sequence.nextEventServing(ev)
      .as[(Long, String, Long, String, Long, String)].collect().toSeq
    // marginal: A×4, B×3, C×1 of 8 → top-3 A(500000) B(375000) C(125000)
    // bigram from B: B→A c=2 n=2 → 1000000
    assert(got == Seq(
      (1L, "C", 1L, "A", 500000L, "marginal"),
      (1L, "C", 2L, "B", 375000L, "marginal"),
      (1L, "C", 3L, "C", 125000L, "marginal"),
      (2L, "B", 1L, "A", 1000000L, "bigram")))
  }

  // ---- q305: WAV codec round trip --------------------------------------

  test("q305 audio decode equals the closed-form waveform exactly") {
    import spark.implicits._
    val feats = ops.Multimodal
      .decodeAudioFeatures(ops.Multimodal.audioAssets(spark, sf))
      .select($"doc_id", $"n_samples", $"energy", $"zero_crossings",
        $"peak")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(feats.nonEmpty)
    feats.keys.toSeq.sorted.take(7).foreach { id =>
      val n = ops.Multimodal.audioLen(id)
      val s = (0 until n).map(i => ops.Multimodal.audioSample(id, i.toLong))
      val energy = s.map(v => v.toLong * v).sum
      val zc = (1 until n)
        .count(i => (s(i) >= 0) != (s(i - 1) >= 0)).toLong
      val peak = s.map(v => math.abs(v.toLong)).max
      assert(feats(id) == ((n.toLong, energy, zc, peak)),
        s"doc $id decoded features diverge from the closed form")
    }
  }
}
