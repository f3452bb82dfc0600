package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the corpus-preparation operators (`ops/Corpus.scala`)
  * on sf0.001 — properties the DuckDB oracle can't state (partition
  * totality, token conservation, reproducibility across repartitioning).
  */
class CorpusSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("train split is a total, deterministic partition of the corpus") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val tagged = docs.withColumn("split", ops.Corpus.splitCol($"doc_id"))
    assert(tagged.filter($"split".isNull).count() == 0)
    assert(tagged.count() == docs.count())
    // reproducible under a different physical layout (the 1000-node
    // property: split derives from content, not from placement)
    val again = docs.repartition(7)
      .withColumn("split", ops.Corpus.splitCol($"doc_id"))
      .select($"doc_id", $"split")
    val diff = tagged.select($"doc_id", $"split")
      .except(again)
    assert(diff.count() == 0)
    // all three splits are non-empty at 500 docs with a 12/2/2 hex split
    assert(tagged.select($"split").distinct().count() == 3)
  }

  test("packChunks conserves tokens and bounds every chunk") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val chunks = ops.Corpus.packChunks(docs, chunkTokens = 16)

    val perDoc = chunks.groupBy($"doc_id")
      .agg(sum($"n_chunk_tokens").as("total"),
        max($"n_chunk_tokens").as("biggest"),
        count(lit(1)).as("n_chunks"),
        max($"chunk_id").as("max_id"))
    val joined = docs
      .select($"doc_id", size(split($"text", " ")).cast("long").as("n_tok"))
      .join(perDoc, "doc_id")
    // token conservation: chunks repartition the token stream exactly
    assert(joined.filter($"total" =!= $"n_tok").count() == 0)
    assert(chunks.filter($"n_chunk_tokens" > 16).count() == 0)
    assert(chunks.filter($"n_chunk_tokens" < 1).count() == 0)
    // chunk ids are dense 0..n-1
    assert(joined.filter($"max_id" =!= $"n_chunks" - 1).count() == 0)
    // only the LAST chunk of a doc may be ragged
    val ragged = chunks.filter($"n_chunk_tokens" < 16)
      .join(perDoc, "doc_id")
      .filter($"chunk_id" =!= $"max_id")
    assert(ragged.count() == 0)
  }

  test("corpus mix realizes its per-language rates, placement-free") {
    import spark.implicits._
    // sf0.01 has ~70 docs per minority language — enough for a loose
    // binomial bound on the realized rate
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val rates = docs
      .withColumn("keep", ops.Corpus.mixKeep($"doc_id", $"lang"))
      .groupBy($"lang")
      .agg(avg($"keep".cast("double")).as("rate"),
        count(lit(1)).as("n"))
      .as[(String, Double, Long)].collect()
      .map { case (l, r, n) => l -> (r, n) }.toMap
    assert(rates("en")._1 == 1.0)
    Seq("de" -> 0.5, "es" -> 0.5, "fr" -> 0.25, "zh" -> 0.25).foreach {
      case (l, want) =>
        val (got, n) = rates(l)
        val tol = 4 * math.sqrt(want * (1 - want) / n) // ±4σ
        assert(math.abs(got - want) < tol,
          s"$l rate $got vs $want (n=$n, tol $tol)")
    }
    // same kept-set under a different layout
    val a = docs.withColumn("k", ops.Corpus.mixKeep($"doc_id", $"lang"))
      .filter($"k").select($"doc_id")
    val b = docs.repartition(13)
      .withColumn("k", ops.Corpus.mixKeep($"doc_id", $"lang"))
      .filter($"k").select($"doc_id")
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
  }

  test("connectedComponents == driver union-find on the jaccard graph") {
    import spark.implicits._
    // real edges: q37's prefix-blocked pairs at j >= 0.4 (looser than the
    // registered query so the graph is denser)
    val pairs = SparkEntry.queries("q37_prefix_jaccard")(spark, sf)
      .filter($"word_jaccard" >= 0.4)
      .select($"a", $"b").as[(Long, Long)].collect()
    assert(pairs.length > 10, s"weak fixture: ${pairs.length} edges")

    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val truth = parent.keys.map(n => n -> find(n)).toMap

    val got = ops.Dedup
      .connectedComponents(pairs.toSeq.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap
    assert(got == truth)
  }

  test("connectedComponents converges on a long chain (diameter >> 1)") {
    import spark.implicits._
    val chain = (0L until 20L).map(i => (i, i + 1))
    val got = ops.Dedup.connectedComponents(chain.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap
    assert(got.size == 21 && got.values.forall(_ == 0L),
      s"chain must collapse to root 0: $got")
  }

  test("blockedNearDupPairs matches driver-side brute force within blocks") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
    val got = ops.Corpus.blockedNearDupPairs(emb, minCosine = 0.25)
      .select($"a", $"b", $"cos")
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, c) => ((a, b), c) }.toMap

    val local = emb.select($"label", $"vec_id", $"embedding")
      .as[(Int, Long, Seq[Float])].collect()
    def cos(x: Seq[Float], y: Seq[Float]): Double = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      x.indices.foreach { i =>
        dot += x(i).toDouble * y(i).toDouble
        nx += x(i).toDouble * x(i).toDouble
        ny += y(i).toDouble * y(i).toDouble
      }
      dot / (math.sqrt(nx) * math.sqrt(ny))
    }
    val truth = (for {
      (la, ia, ea) <- local; (lb, ib, eb) <- local
      if la == lb && ia < ib
      c = BigDecimal(cos(ea, eb)).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
      if c >= 0.25
    } yield ((ia, ib), c)).toMap
    assert(got.keySet == truth.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - truth(k)) < 1e-9) }
  }
}
