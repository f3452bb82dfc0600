package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Brute-force and invariant checks for the round-3 queries, stated
  * independently of the DuckDB oracle (which checks cross-engine parity,
  * not semantics): small-data recomputation in plain Scala collections
  * against the distributed plans, on sf0.001.
  */
class Round3Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def docTokens(): Map[Long, Seq[String]] = {
    import spark.implicits._
    Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) => id -> t.split(" ").toSeq }.toMap
  }

  test("q64 TF-IDF matches a collections recomputation") {
    val toks = docTokens()
    val n = toks.size.toLong
    val tf = toks.values.flatten
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val df = toks.values.flatMap(_.distinct)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = tf.keys.toSeq
      .map { t =>
        val idfPpm = (1000000L * n) / df(t)
        (t, tf(t), df(t), tf(t).toDouble * idfPpm.toDouble)
      }
      .sortBy { case (t, _, _, s) => (-s, t) }
      .take(20)
    val got = run("q64_tfidf_terms").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got == expected)
  }

  test("q65 contamination matches set-intersection recomputation") {
    val toks = docTokens()
    def hexSplit(id: Long): String = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.charAt(0)
      if (h <= 'b') "train" else if (h <= 'd') "val" else "test"
    }
    val trainVocab = toks.collect {
      case (id, ts) if hexSplit(id) == "train" => ts
    }.flatten.toSet
    val expected = toks.collect {
      case (id, ts) if hexSplit(id) == "test" =>
        val distinct = ts.distinct
        val overlap = distinct.count(trainVocab)
        (id, distinct.size.toLong, overlap.toLong,
          (100L * overlap) / distinct.size)
    }.toSeq.sortBy(_._1)
    val got = run("q65_contamination").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
  }

  test("q68 duplicate-bigram ratio matches sliding-window recomputation") {
    val expected = docTokens().toSeq
      .filter(_._2.size >= 2)
      .map { case (id, ts) =>
        val bigrams = ts.sliding(2).map(_.mkString(" ")).toSeq
        val nd = bigrams.distinct.size.toLong
        val nb = bigrams.size.toLong
        (id, nb, nd, (100L * (nb - nd)) / nb)
      }
      .sortBy(_._1)
    val got = run("q68_dup_bigrams").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
  }

  test("q66 spine is dense, conserves events, and fills real gaps") {
    import spark.implicits._
    val rows = run("q66_hourly_spine").as[(Long, Long)].collect()
    val hours = rows.map(_._1)
    // dense: exactly max-min+1 consecutive hour ids
    assert(hours.toSeq == (hours.min to hours.max).toSeq)
    // conservation: filled counts sum to the raw event count
    assert(rows.map(_._2).sum == Tables.events(spark, sf).count())
    // the spine actually fills something at this sparsity (1000 events
    // over a month of hours) — otherwise the left join is untested
    assert(rows.exists(_._2 == 0L))
  }

  test("q69 trailing-hour burst matches a two-pointer recomputation") {
    import spark.implicits._
    val byUser = Tables.events(spark, sf)
      .select($"user_id", unix_micros($"ts").as("us"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val expected = byUser.toSeq.map { case (u, ts) =>
      val bursts = ts.indices.map { i =>
        // count of events with us in (ts(i) - 1h, ts(i)] — RANGE frame
        // semantics include ALL peers at equal us, regardless of order
        ts.count(t => t >= ts(i) - 3600000000L && t <= ts(i))
      }
      (u, bursts.max.toLong, ts.size.toLong)
    }.sortBy(_._1)
    val got = run("q69_user_bursts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
  }

  test("q70 milestones match per-customer sorted-order recomputation") {
    import spark.implicits._
    // o_orderdate is TIMESTAMP_NTZ (LocalDateTime rows) — compare via
    // ISO toString, which sorts identically to the temporal order here
    val orders = Tables.orders(spark, sf)
      .select($"o_custkey", $"o_orderdate", $"o_orderkey")
      .collect()
      .map(r => (r.getLong(0), String.valueOf(r.get(1)), r.getLong(2)))
    val expected = orders.groupBy(_._1).toSeq.map { case (c, os) =>
      val sorted = os.sortBy(o => (o._2, o._3))
      (c, sorted.head._2,
        if (sorted.size >= 2) sorted(1)._2 else "null",
        sorted.last._2, sorted.size.toLong)
    }.sortBy(_._1)
    val got = run("q70_order_milestones").collect()
      .map(r => (r.getLong(0), String.valueOf(r.get(1)),
        String.valueOf(r.get(2)), String.valueOf(r.get(3)),
        r.getLong(4))).toSeq
    assert(got == expected)
  }

  test("q71 incremental merge equals one-pass aggregation exactly") {
    import spark.implicits._
    val onePass = Tables.orders(spark, sf)
      .groupBy(date_trunc("month", $"o_orderdate").cast("date").as("month"))
      .agg(count(lit(1)).as("n_orders"),
        sum(round($"o_totalprice" * 100).cast("long")).as("revenue_cents"))
      .orderBy($"month")
    val inc = run("q71_incremental_agg")
    assert(inc.collect().map(_.toString).toSeq ==
      onePass.collect().map(_.toString).toSeq)
    // and the merge genuinely had two sides: months exist on each side
    // of the 1998-01-01 split (data spans 1995..2001)
    val months = inc.select($"month".cast("string")).as[String].collect()
    assert(months.exists(_ < "1998-01-01") && months.exists(_ >= "1998-01-01"))
  }

  test("q72 approx quartiles bound the exact quantiles' rank error") {
    import spark.implicits._
    val got = run("q72_approx_quantiles").collect()
      .map(r => r.getString(0) ->
        (Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3)),
          r.getLong(4))).toMap
    val prices = Tables.lineitem(spark, sf)
      .select($"l_returnflag", $"l_extendedprice")
      .as[(String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(got.keySet == prices.keySet)
    for ((flag, (approx, n)) <- got) {
      val xs = prices(flag)
      assert(n == xs.length.toLong)
      assert(approx.length == 3)
      for ((q, a) <- Seq(0.25, 0.5, 0.75).zip(approx)) {
        // rank of the approx answer must be within 1% of the target
        // rank (accuracy 10000 → eps 1e-4; 1% is a loose outer bound)
        val rank = xs.count(_ <= a).toDouble / xs.length
        assert(math.abs(rank - q) <= 0.01,
          s"$flag p$q: approx $a has rank $rank")
      }
    }
  }

  test("q79 manifest survives <2-token docs (ANSI bigram guard)") {
    import spark.implicits._
    // sequence(0, size-2) on a 1-token doc is sequence(0,-1) = [0,-1];
    // unguarded, toks[-1] throws INVALID_ARRAY_INDEX under ANSI. The
    // fixtures carry no such docs, so pin the guard with a synthetic
    // corpus containing 1-token and empty-string docs.
    val dir = java.nio.file.Files.createTempDirectory("graft_q79_").toString
    Seq(
      (1L, "solo", "en", "syn", 4L),
      (2L, "", "en", "syn", 0L),
      (3L, "two tokens here make a normal document for the manifest " +
        "with enough words to pass the token gate against the " +
        "twenty minimum threshold set by the keep rule", "en", "syn", 150L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = run("q79_corpus_manifest") // smoke the real sf too
    val got = SparkEntry.queries("q79_corpus_manifest")(spark, dir).collect()
    assert(got.length == 1 && got.head.getLong(1) == 3L) // n_docs
    assert(rows.count() > 0)
  }

  test("q73 streamed hourly rollup equals the batch q22 result") {
    val streamed = run("q73_stream_hourly").collect().map(_.toString).toSeq
    val batch = run("q22_hourly_windows").collect().map(_.toString).toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("q75 fixed-point PageRank matches an in-memory power iteration") {
    import spark.implicits._
    val edges = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), $"l_orderkey" === $"o_orderkey")
      .select($"l_suppkey".as("src"), $"o_custkey".as("dst"))
      .distinct().as[(Long, Long)].collect().toSeq
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val outd = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val inEdges = edges.groupBy(_._2)
    var rank = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to 3)
      rank = nodes.map { n =>
        val contrib = inEdges.getOrElse(n, Nil)
          .map { case (s, _) => rank(s) / outd(s) }.sum
        n -> (150000L + (85L * contrib) / 100L)
      }.toMap
    val expected = rank.toSeq.map { case (id, r) => (id, r) }
      .sortBy { case (id, r) => (-r, id) }.take(25)
    val got = run("q75_pagerank").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected)
  }

  test("q77 islands match a run-length recomputation over sorted hours") {
    import spark.implicits._
    val hours = Tables.events(spark, sf)
      .select($"user_id", expr("unix_micros(ts) DIV 3600000000").as("h"))
      .distinct().as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val expected = hours.toSeq.map { case (u, hs) =>
      // split the sorted hour list into maximal consecutive runs
      val runs = hs.foldLeft(List.empty[List[Long]]) {
        case (acc @ (run @ (last :: _)) :: rest, h) if h == last + 1 =>
          (h :: run) :: rest
        case (acc, h) => List(h) :: acc
      }.map(_.size.toLong)
      (u, runs.size.toLong, runs.max, runs.sum)
    }.sortBy(_._1)
    val got = run("q77_active_islands").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
  }

  test("q78 shares sum to ~10000 bp and match integer recomputation") {
    val rows = run("q78_brand_share").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val total = rows.map(_._2).sum
    rows.foreach { case (_, cents, bp) =>
      assert(bp == cents / (total / 10000L))
    }
    // truncation loses at most 1 bp per brand
    val bpSum = rows.map(_._3).sum
    assert(bpSum <= 10001 && bpSum >= 10000 - rows.length,
      s"shares sum to $bpSum bp")
  }

  test("q67 full-outer merge loses neither ledger and marks provenance") {
    import spark.implicits._
    val rows = run("q67_date_merge").collect()
    val orderDays = Tables.orders(spark, sf)
      .select($"o_orderdate").distinct().count()
    val shipDays = Tables.lineitem(spark, sf)
      .select($"l_shipdate").distinct().count()
    val n = rows.map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    // every order and every shipment is accounted for
    assert(n.map(_._2).sum == Tables.orders(spark, sf).count())
    assert(n.map(_._3).sum == Tables.lineitem(spark, sf).count())
    // day totals reconcile with the side counts
    assert(n.count(_._2 > 0) == orderDays)
    assert(n.count(_._3 > 0) == shipDays)
    // provenance marker consistent with the coalesced counts
    assert(n.forall {
      case ("both", o, s)       => o > 0 && s > 0
      case ("order_only", o, s) => o > 0 && s == 0
      case ("ship_only", o, s)  => o == 0 && s > 0
      case _                    => false
    })
    // the outer join genuinely fires on both sides in this data
    assert(n.exists(_._1 == "order_only") && n.exists(_._1 == "ship_only"))
  }
}
