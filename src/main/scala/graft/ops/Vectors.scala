package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Vector similarity over `embeddings` (ARRAY<FLOAT>, 64-dim).
  *
  * Brute-force cosine is the exactness baseline (a single broadcast of
  * the query vector + one codegen'd projection — at 100 TB this is the
  * per-partition scan you compare ANN recall against); the scale path is
  * sign-LSH (random-hyperplane) bucketing, whose hyperplanes are derived
  * from counter-based hashes so the index is deterministic and
  * partition-independent. All arithmetic is double-precision built-in
  * higher-order functions — no UDFs.
  */
object Vectors {

  /** Σ aᵢ·bᵢ in double precision, left-to-right (stable across engines). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x,
    )

  def l2norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double")))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))

  /** Exact top-k by cosine against one stored query vector. The query row
    * is a 1-row aggregate cross-joined (broadcast) — no driver collect.
    */
  def topKCosine(
      embeddings: DataFrame,
      queryVecId: Long,
      k: Int,
  ): DataFrame = {
    val spark = embeddings.sparkSession
    val q = embeddings
      .filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("qe"))
    embeddings
      .filter(col("vec_id") =!= queryVecId)
      .join(broadcast(q))
      .select(
        col("vec_id"),
        col("label"),
        round(graft.functions.VectorExprs
          .vecCosine(spark, col("embedding"), col("qe")), 4).as("cos"),
      )
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  /** Rademacher ±1 hyperplane matrix for one LSH table, flat row-major
    * (`bit * dims + dim`). Derived from the low bit of
    * `xxhash64(table, bit, dim)` — evaluated HERE, once, via the same
    * Catalyst expression the per-row formulation used, so bucket keys
    * are bit-identical to hashing inside the scan while costing zero
    * per-row hash work. No stored index: any driver rebuilds any plane.
    */
  private[ops] def hyperplaneSigns(
      table: Int,
      nBits: Int,
      dims: Int,
  ): Array[Double] = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    val out = new Array[Double](nBits * dims)
    var b = 0
    while (b < nBits) {
      var d = 0
      while (d < dims) {
        // seed 42L = the SQL `xxhash64` default, so keys match the
        // original per-row formulation bit-for-bit
        val h = XxHash64(Seq(Literal(table), Literal(b), Literal(d)), 42L)
          .eval(null).asInstanceOf[Long]
        out(b * dims + d) = if ((h & 1L) == 1L) 1.0 else -1.0
        d += 1
      }
      b += 1
    }
    out
  }

  /** Sign-LSH bucket key: `nBits` random-hyperplane signs in one fused
    * codegen loop over a plan-build-time sign matrix (see
    * [[hyperplaneSigns]] and `functions.FloatVecLshBits`).
    */
  def lshKey(
      spark: SparkSession,
      emb: Column,
      nBits: Int,
      table: Int,
      dims: Int = 64,
  ): Column =
    graft.functions.VectorExprs.vecLshBits(
      spark, emb, hyperplaneSigns(table, nBits, dims), nBits, dims)

  /** ANN candidate pairs via multi-table sign-LSH: `tables` independent
    * `nBits`-bit keys; a pair is a candidate if it collides in ANY table
    * (explode → bucket join → exact-cosine verify, never O(n²)).
    */
  def annPairs(
      embeddings: DataFrame,
      nBits: Int = 8,
      tables: Int = 4,
      minCosine: Double = 0.0,
  ): DataFrame = {
    val spark = embeddings.sparkSession
    val keyed = embeddings.select(
      col("vec_id"),
      col("embedding"),
      explode(array((0 until tables).map(t =>
        struct(lit(t).as("tbl"),
          lshKey(spark, col("embedding"), nBits, t).as("bkey"))): _*)).as("k"),
    ).select(col("vec_id"), col("embedding"), col("k.tbl"), col("k.bkey"))
    val l = keyed.select(col("tbl"), col("bkey"), col("vec_id").as("a"),
      col("embedding").as("ea"))
    val r = keyed.select(col("tbl"), col("bkey"), col("vec_id").as("b"),
      col("embedding").as("eb"))
    l.join(r, Seq("tbl", "bkey"))
      .filter(col("a") < col("b"))
      .dropDuplicates("a", "b")
      .withColumn("cos", round(graft.functions.VectorExprs
        .vecCosine(embeddings.sparkSession, col("ea"), col("eb")), 4))
      .filter(col("cos") >= minCosine)
      .select(col("a"), col("b"), col("cos"))
  }

  /** Approximate nearest neighbor per vector: best LSH candidate by
    * cosine (the scale path next to `topKCosine`'s exact scan).
    */
  def annTopNeighbor(
      embeddings: DataFrame,
      nBits: Int = 8,
      tables: Int = 4,
  ): DataFrame = {
    val pairs = annPairs(embeddings, nBits, tables, minCosine = -1.0)
    val sym = pairs.select(col("a").as("v"), col("b").as("nn"), col("cos"))
      .unionByName(
        pairs.select(col("b").as("v"), col("a").as("nn"), col("cos")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("v")
      .orderBy(col("cos").desc, col("nn"))
    sym.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("v"), col("nn"), col("cos"))
  }

  // ---- registered queries ----

  private def q40(s: SparkSession, d: String): DataFrame =
    topKCosine(Tables.embeddings(s, d), queryVecId = 0L, k = 10)

  private val q40Sql =
    """SELECT vec_id, label,
      |  ROUND(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                         CAST(q.qe AS DOUBLE[])) /
      |        (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                               CAST(embedding AS DOUBLE[]))) *
      |         sqrt(list_dot_product(CAST(q.qe AS DOUBLE[]),
      |                               CAST(q.qe AS DOUBLE[])))), 4) AS cos
      |FROM embeddings,
      |     (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0) q
      |WHERE vec_id <> 0
      |ORDER BY cos DESC, vec_id
      |LIMIT 10""".stripMargin

  /** Per-label norm statistics — array math as plain aggregation. */
  private def q42(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables
      .embeddings(s, d)
      .withColumn("norm", l2norm($"embedding"))
      .groupBy($"label")
      .agg(
        count(lit(1)).as("n"),
        round(avg($"norm"), 4).as("avg_norm"),
        round(min($"norm"), 4).as("min_norm"),
        round(max($"norm"), 4).as("max_norm"),
      )
      .orderBy($"label")
  }

  private val q42Sql =
    """SELECT label, COUNT(*) AS n,
      |  ROUND(AVG(norm), 4) AS avg_norm,
      |  ROUND(MIN(norm), 4) AS min_norm,
      |  ROUND(MAX(norm), 4) AS max_norm
      |FROM (SELECT label,
      |        sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                              CAST(embedding AS DOUBLE[]))) AS norm
      |      FROM embeddings) t
      |GROUP BY label ORDER BY label""".stripMargin

  private def q41(s: SparkSession, d: String): DataFrame =
    annTopNeighbor(Tables.embeddings(s, d), nBits = 8, tables = 4)
      .orderBy(col("cos").desc, col("v"))
      .limit(50)

  val all: Seq[QueryDef] = Seq(
    QueryDef("q40_cosine_topk", q40, Some(q40Sql)),
    QueryDef("q41_ann_pairs", q41, None),
    QueryDef("q42_embedding_norms", q42, Some(q42Sql)),
  )
}
