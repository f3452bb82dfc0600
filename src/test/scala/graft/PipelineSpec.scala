package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Brute-force verification of the LSH-based pipeline operators on
  * sf0.001 (500 docs / 500 vectors — small enough for exact pairwise
  * ground truth).
  */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val docs: Seq[(Long, String)] = {
    import spark.implicits._
    Tables.documents(spark, sf).select($"doc_id", $"text")
      .as[(Long, String)].collect().toSeq
  }

  private def shingleSet(text: String, w: Int = 3): Set[String] = {
    val words = text.split(" ")
    if (words.length <= w) Set(text)
    else words.sliding(w).map(_.mkString(" ")).toSet
  }

  private def jaccard(a: Set[String], b: Set[String]): Double =
    a.intersect(b).size.toDouble / a.union(b).size

  test("minhash: reported pairs carry exact Jaccard; high-sim recall = 1") {
    val got = ops.Dedup
      .minhashPairs(Tables.documents(spark, sf), "doc_id", "text",
        threshold = 0.5)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap

    val truth = (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      j = jaccard(shingleSet(ta), shingleSet(tb)) if j >= 0.5
    } yield ((ia, ib), j)).toMap

    // verified pairs must be true pairs with matching Jaccard
    got.foreach { case (k, j) =>
      assert(truth.contains(k), s"false positive $k")
      assert(math.abs(truth(k) - j) < 1e-3, s"jaccard mismatch $k: $j")
    }
    // recall at j>=0.9 is ~1 for 8 bands × 4 rows — require completeness
    val high = truth.filter(_._2 >= 0.9).keySet
    assert(high.nonEmpty, "fixture should contain near-dups")
    assert(high.subsetOf(got.keySet),
      s"missed high-similarity pairs: ${high -- got.keySet}")
  }

  test("simhash: banding finds EVERY pair within hamming<=3 (pigeonhole)") {
    import spark.implicits._
    val sims = Tables.documents(spark, sf)
      .select($"doc_id", ops.Dedup.simhash64($"text").as("sim"))
      .as[(Long, Long)].collect()
    val truth = (for {
      (ia, sa) <- sims; (ib, sb) <- sims if ia < ib
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (ia, ib) -> h.toLong).toMap

    val got = ops.Dedup
      .simhashPairs(Tables.documents(spark, sf), "doc_id", "text",
        maxHamming = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        r.get(2).asInstanceOf[Number].longValue())
      .toMap

    assert(got == truth, s"got ${got.size} pairs, truth ${truth.size}")
  }

  test("simhash: 1000-token doc matches brute-force per-bit majority") {
    import spark.implicits._
    // 1000 tokens far exceeds the old byte-counter cap of 255; the 16-bit
    // SWAR counters must match an independent per-bit tally exactly.
    val text = (0 until 1000).map(i => s"tok${i % 37}").mkString(" ")
    val df = Seq(text).toDF("text")
    val got = df.select(ops.Dedup.simhash64($"text").as("sim"))
      .as[Long].head()

    val tokenHashes = df
      .select(explode(split($"text", " ")).as("t"))
      .select(xxhash64($"t").as("h"))
      .as[Long].collect()
    val expect = (0 until 64).map { b =>
      val ones = tokenHashes.count(h => ((h >> b) & 1L) == 1L)
      if (2 * ones > tokenHashes.length) 1L << b else 0L
    }.sum
    assert(got == expect, f"sim $got%016x != brute $expect%016x")
  }

  test("simhash: >65535-token doc exceeds the SWAR twin's counters — " +
    "twin fails loudly, native kernel stays exact") {
    import spark.implicits._
    val text = (0 to 65535).map(i => s"t${i % 3}").mkString(" ")
    val ex = intercept[Exception] {
      Seq(text).toDF("text")
        .select(ops.Dedup.simhash64Swar($"text")).collect()
    }
    assert(ex.getMessage != null)
    // the native kernel has int counters: exact at any realistic length
    val got = Seq(text).toDF("text")
      .select(ops.Dedup.simhash64($"text")).as[Long].head()
    val hashes = Seq(text).toDF("text")
      .select(explode(split($"text", " ")).as("t"))
      .select(xxhash64($"t").as("h")).as[Long].collect()
    val expect = (0 until 64).map { b =>
      if (2L * hashes.count(h => ((h >> b) & 1L) == 1L) > hashes.length)
        1L << b
      else 0L
    }.sum
    assert(got == expect)
  }

  test("ann: reported neighbor cosines equal brute-force values") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
    val got = ops.Vectors.annTopNeighbor(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty)
    val vecs = emb.select($"vec_id", $"embedding")
      .as[(Long, Seq[Float])].collect().toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
      val dot = ad.zip(bd).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(ad.map(x => x * x).sum) *
        math.sqrt(bd.map(x => x * x).sum))
    }
    got.foreach { case (v, nn, c) =>
      val expect = cos(vecs(v), vecs(nn))
      assert(math.abs(c - expect) < 1e-3, s"cos mismatch for ($v,$nn)")
    }
    // every vector appears at most once (top-1 per vector)
    assert(got.map(_._1).distinct.length == got.length)
  }

  test("ivf: probing ALL cells degenerates to the exact top-k") {
    val emb = Tables.embeddings(spark, sf)
    val exact = ops.Vectors.topKCosine(emb, queryVecId = 0L, k = 10)
      .collect().map(_.toString).toSeq
    val probeAll = ops.Vectors.ivfTopK(emb, queryVecId = 0L, k = 10,
      nCells = 16, nProbe = 16)
      .collect().map(_.toString).toSeq
    assert(probeAll == exact, "nProbe = nCells must equal the exact scan")
  }

  test("ivf: partial probe keeps most true neighbors (recall@10)") {
    val emb = Tables.embeddings(spark, sf)
    val exact = ops.Vectors.topKCosine(emb, queryVecId = 0L, k = 10)
      .collect().map(_.getLong(0)).toSet
    val approx = ops.Vectors.ivfTopK(emb, queryVecId = 0L, k = 10,
      nCells = 16, nProbe = 4)
      .collect().map(_.getLong(0)).toSet
    assert(approx.size == 10)
    val recall = exact.intersect(approx).size / 10.0
    info(s"IVF recall@10 with nProbe=4/16: $recall")
    assert(recall >= 0.5, // measured 0.8 on this fixture; 0.5 allows noise
      s"recall $recall collapsed — probe/cell assignment is broken")
  }

  test("multimodal: stride-1 frame sampling losslessly tiles the payload") {
    import spark.implicits._
    val a = ops.Multimodal.assets(spark, sf)
    val rebuilt = ops.Multimodal.sampleFrames(a, frameBytes = 256, stride = 1)
      .groupBy($"doc_id")
      .agg(
        sum(octet_length($"frame")).as("n"),
        count(lit(1)).as("n_frames"),
      )
      .join(a.select($"doc_id", $"n_bytes"), "doc_id")
    // every byte lands in exactly one frame
    assert(rebuilt.filter($"n" =!= $"n_bytes").count() == 0)
    // frame count is ceil(n_bytes / 256)
    assert(rebuilt
      .filter($"n_frames" =!= expr("(n_bytes + 255) DIV 256")).count() == 0)
  }

  test("multimodal: PNG encode → ImageIO decode round-trips exactly") {
    import spark.implicits._
    val assets = ops.Multimodal.imageAssets(spark, sf)
    // the payloads are genuine PNG containers, not passthrough pixels
    assets.limit(5).collect().foreach { r =>
      val png = r.getAs[Array[Byte]]("png")
      assert(png.length > 8 &&
        (png(0) & 0xFF) == 0x89 && png(1) == 'P' && png(2) == 'N' &&
        png(3) == 'G', "payload is not a PNG container")
    }
    // decoder output (metadata AND pixels) equals the closed form the
    // oracle uses — lossless round trip through a real codec
    val rows = ops.Multimodal.decodeImageFeatures(assets)
      .orderBy($"doc_id").limit(20).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val (w, h) = ops.Multimodal.imageDims(id)
      assert((r.getInt(2), r.getInt(3)) == ((w, h)),
        s"decoded dims mismatch for doc $id")
      val expect = (0L until (w.toLong * h)).map(
        ops.Multimodal.imagePixel(id, _).toLong).sum
      assert(r.getLong(4) == expect, s"decoded pixel sum mismatch doc $id")
    }
  }
}
