package graft

import graft.functions.TextHashExprs
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fused text-sketch kernels must be BIT-IDENTICAL to the composable
  * HOF formulations they replace (same xxhash64, same seed chaining) —
  * any drift would silently change every LSH bucket.
  */
class TextHashSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("native shingleHashes ≡ HOF formulation on the documents table") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val both = docs.select(
      $"doc_id",
      ops.Dedup.shingleHashes($"text").as("hof"),
      TextHashExprs.shingleHashes(spark, $"text", 3).as("native"),
    )
    val bad = both.filter(not($"hof" <=> $"native")).count()
    assert(bad == 0, s"$bad docs with diverging shingle hashes")
  }

  test("native minhashSig ≡ HOF formulation (32 permutations)") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val sh = docs.select(
      $"doc_id", ops.Dedup.shingleHashes($"text").as("sh"))
    val both = sh.select(
      $"doc_id",
      ops.Dedup.minhashSignature($"sh", 32).as("hof"),
      TextHashExprs.minhashSig(spark, $"sh", 32).as("native"),
    )
    val bad = both.filter(not($"hof" <=> $"native")).count()
    assert(bad == 0, s"$bad docs with diverging signatures")
  }

  test("native simhash64 ≡ SWAR HOF twin on the documents table") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val both = docs.select(
      $"doc_id",
      ops.Dedup.simhash64Swar($"text").as("hof"),
      ops.Dedup.simhash64($"text").as("native"),
    )
    val bad = both.filter(not($"hof" <=> $"native")).count()
    assert(bad == 0, s"$bad docs with diverging simhash")
  }

  test("short docs: <w words yield one whole-text shingle (no ANSI error)") {
    import spark.implicits._
    val df = Seq("one two", "solo", "").toDF("text")
    val got = df.select(TextHashExprs.shingleHashes(spark, $"text", 3))
      .as[Seq[Long]].collect()
    assert(got.forall(_.length == 1))
    // and the hash is exactly xxhash64 of the full text
    val direct = df.select(xxhash64($"text")).as[Long].collect()
    assert(got.map(_.head).toSeq == direct.toSeq)
  }

  test("kernel survives both codegen and interpreted eval paths") {
    import spark.implicits._
    val df = Seq("a b c d e f g").toDF("text")
    val col = TextHashExprs.shingleHashes(spark, $"text", 3)
    val viaPlan = df.select(col.as("sh")).as[Seq[Long]].head()
    // interpreted path: force eval() through a literal row
    val expr = graft.functions.WordShingleHashes(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString("a b c d e f g")),
      3)
    val viaEval = expr.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq
    assert(viaPlan == viaEval)
  }
}
