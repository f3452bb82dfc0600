package graft

import org.apache.spark.sql.functions.expr
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 additions, locked: the incremental dedup step (q177) must
  * be replay-idempotent — the crash-recovery contract a cross-run
  * pipeline stage needs. Full-recompute parity (incremental ≡ whole
  * corpus dedup) is the driver's oracle gate; what ONLY a spec can
  * prove is what happens when the same delta is delivered twice.
  */
class Round11Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("q177 replay: same delta on the updated store — identical ledger, unchanged store") {
    import spark.implicits._
    // first delivery: builds store v1 from the base batch, dedups the
    // delta against it, writes store v2
    val first = SparkEntry.queries("q177_incremental_dedup")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(first.nonEmpty)
    // the delta genuinely both kept and lost passages — otherwise the
    // cross-batch suppression this operator exists for never fired
    val nPassages = first.map(_(1).asInstanceOf[Long]).sum
    val nKept = first.map(_(2).asInstanceOf[Long]).sum
    assert(nKept > 0 && nKept < nPassages)

    val root = ops.Text.q177StoreRoot(sf)
    val delta = Tables.documents(spark, sf).where($"doc_id" % 10 >= 8)
    // redelivery: the SAME delta against the store it already updated.
    // Winners for its passages now resolve to the delta's own positions,
    // so the ledger reproduces exactly (not empty, not doubled) and the
    // store gains nothing.
    val replay = ops.Text
      .incrementalDedupStep(spark, delta, s"$root/v2", s"$root/v3")
      .collect().map(_.toSeq).toSeq
    assert(replay == first)
    val v1 = spark.read.parquet(s"$root/v1").collect().map(_.toSeq).toSet
    val v2 = spark.read.parquet(s"$root/v2").collect().map(_.toSeq).toSet
    val v3 = spark.read.parquet(s"$root/v3").collect().map(_.toSeq).toSet
    assert(v3 == v2)
    // and the first delivery genuinely extended the base-batch store
    assert(v1.subsetOf(v2) && v1.size < v2.size)
  }

  test("q180 approx profile: exact columns equal q171, estimates within 3×rsd") {
    def byCol(rows: Array[org.apache.spark.sql.Row], ndField: String) =
      rows.map { r =>
        r.getAs[String]("column_name") ->
          ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_notnull"),
            r.getAs[Long]("n_null"), r.getAs[String]("min_str"),
            r.getAs[String]("max_str")), r.getAs[Long](ndField))
      }.toMap
    val exact = byCol(
      SparkEntry.queries("q171_column_profile")(spark, sf).collect(),
      "n_distinct")
    val approx = byCol(
      SparkEntry.queries("q180_approx_profile")(spark, sf).collect(),
      "n_approx_distinct")
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (c, ((nr, nn, nl, mn, mx), nd)) =>
      val ((anr, ann, anl, amn, amx), and) = approx(c)
      // everything except the sketch is exact arithmetic — must be EQUAL
      assert((anr, ann, anl, amn, amx) == ((nr, nn, nl, mn, mx)),
        s"$c: exact columns diverged")
      // HLL++ at rsd=0.05: |est - exact| within 3σ = 15%
      assert(math.abs(and - nd) <= math.max(1L, (0.15 * nd).toLong),
        s"$c: approx distinct $and vs exact $nd out of bound")
    }
  }

  test("q179 distributed Viterbi ≡ driver reference on every corpus word") {
    import spark.implicits._
    val costs = ops.Text.unigramPieces.toMap
    val words = Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split($"text", " ")).as("tok"))
      .where(org.apache.spark.sql.functions.length($"tok") > 0)
      .distinct()
    val got = words
      .withColumn("m", ops.Text.unigramM($"tok", ops.Text.unigramPieces))
      .as[(String, Long)].collect().toMap
    assert(got.nonEmpty)
    got.foreach { case (w, m) =>
      val (refM, _) = ops.Text.unigramSegmentRef(w, costs)
      assert(m == refM, s"word '$w': HOF DP $m vs reference $refM")
    }
    // the table genuinely compresses: some word segments as ONE piece
    // and fertility stays below chars-per-word
    val refs = got.keys.map(w =>
      w -> ops.Text.unigramSegmentRef(w, costs)._2).toMap
    assert(refs.values.exists(_.length == 1), "no whole-word piece fired")
    assert(refs.forall { case (w, p) => p.length <= w.length })
  }

  test("unigram EM trainer: deterministic, char-fallback-complete, and self-consistent") {
    val docs = Tables.documents(spark, sf)
    val t1 = ops.Text.learnUnigramPieces(docs)
    val t2 = ops.Text.learnUnigramPieces(docs)
    assert(t1 == t2, "trainer not deterministic")
    assert(t1.nonEmpty && t1.forall(_._2 > 0L))
    // every char of the training vocab survives as a piece — the
    // fallback guarantee that keeps segmentation total
    import spark.implicits._
    val vocabChars = Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split($"text", " ")).as("tok"))
      .distinct().as[String].collect()
      .flatMap(_.toSeq).toSet
    val pieceSet = t1.map(_._1).toSet
    assert(vocabChars.forall(c => pieceSet.contains(c.toString)))
    // applying the LEARNED table distributed ≡ driver reference — the
    // learn→apply loop closes without the shipped constant in between
    val costs = t1.toMap
    val sample = Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split($"text", " ")).as("tok"))
      .where(org.apache.spark.sql.functions.length($"tok") > 0)
      .distinct()
      .withColumn("m", ops.Text.unigramM($"tok", t1))
      .as[(String, Long)].collect()
    sample.foreach { case (w, m) =>
      assert(m == ops.Text.unigramSegmentRef(w, costs)._1, s"word '$w'")
    }
  }

  test("q181 graph ANN: recall vs exact scan, probe set bounded") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
    val exact = ops.Vectors
      .topKCosine(emb, queryVecId = 0L, k = 10)
      .select($"vec_id").as[Long].collect().toSet
    val got = SparkEntry.queries("q181_knn_graph_ann")(spark, sf).collect()
    assert(got.length == 10)
    val gotIds = got.map(_.getAs[Long]("vec_id")).toSet
    val nScored = got.head.getAs[Long]("n_scored")
    val recall = gotIds.intersect(exact).size / 10.0
    info(s"recall@10 = $recall, n_scored = $nScored")
    assert(recall >= 0.7, s"graph-ANN recall@10 $recall below 0.7")
    // the probe-cost claim: the walk touched a bounded neighborhood,
    // not the corpus (beam·degree·hops + seeds ≪ 500 vectors)
    assert(nScored <= 300, s"visited $nScored — walk not bounded")
    assert(nScored < emb.count(), "walk degenerated to a full scan")
  }

  test("q178 fixture carries genuine right-side orphans (and pairs)") {
    import spark.implicits._
    // batch pin on the SAME feed q178 streams: purchases with no click
    // in the preceding hour must exist, or the right-outer null-release
    // path under test never fires (q126's fixture discipline)
    val ev = Tables.events(spark, sf)
    val c = ev.where($"event_type" === "click")
      .select($"user_id".as("cu"), $"ts".as("cts"))
    val p = ev.where($"event_type" === "purchase")
      .select($"user_id".as("pu"), $"ts".as("pts"), $"event_id")
    val orphans = p.join(c,
      $"cu" === $"pu" && $"pts" >= $"cts" &&
        $"pts" <= $"cts" + expr("interval 1 hour"),
      "left_anti").count()
    val pairs = p.join(c,
      $"cu" === $"pu" && $"pts" >= $"cts" &&
        $"pts" <= $"cts" + expr("interval 1 hour"),
      "left_semi").count()
    assert(orphans > 0, "no right orphans in fixture — q178 proves nothing")
    assert(pairs > 0, "no matched pairs in fixture")
  }

  test("q174 shuffles 8-byte gram hashes — no span string crosses an exchange") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.StringType
    // AQE wraps stages and hides Exchange nodes from a tree collect;
    // the property under test is the static plan's shuffle payload
    val saved = spark.conf.get("spark.sql.adaptive.enabled")
    val exchanges =
      try {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        SparkEntry.queries("q174_source_overlap")(spark, sf)
          .queryExecution.executedPlan.collect {
            case e: ShuffleExchangeExec => e
          }
      } finally spark.conf.set("spark.sql.adaptive.enabled", saved)
    assert(exchanges.nonEmpty)
    // the only string allowed across ANY exchange is the tiny `source`
    // label; the 4-token span must have died inside its scan task
    val leakedStrings = exchanges
      .flatMap(_.output)
      .filter(_.dataType == StringType)
      .map(_.name)
      .filterNot(n => n.startsWith("source"))
    assert(leakedStrings.isEmpty,
      s"span-sized strings crossed an exchange: $leakedStrings")
  }
}
