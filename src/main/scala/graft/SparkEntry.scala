package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are assembled from the per-module registries; each module owns
  * its Spark plans and the matching DuckDB oracle SQL (`QueryDef`).
  */
object SparkEntry {
  private def modules: Seq[QueryDef] =
    ops.Relational.all ++ ops.Events.all ++ ops.Text.all ++
      ops.Dedup.all ++ ops.Vectors.all ++ ops.Multimodal.all ++
      ops.Corpus.all ++ ops.Graph.all ++ ops.Sources.all ++
      ops.Scale.all ++ ops.Stats.all ++ ops.Sequence.all ++
      ops.Eval.all ++ ops.Erasure.all ++ ops.Analyze.all ++
      gen.GenQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * SURVEY.md §7.3: generator → window agg → pattern-dim join → sort.
    */
  def entry(spark: SparkSession): DataFrame =
    gen.GenQueries.all.find(_.name == "gen_flagship_windows").get
      .fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
