package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named query: the Spark plan builder plus (when expressible) the
  * equivalent ANSI SQL the driver runs in DuckDB over the same parquet.
  * Column names/aliases MUST match between `fn`'s output and `oracle`.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
)

/** Loaders for the driver test tables (`TESTDATA.md`): one parquet file per
  * table under `/root/testdata/sf0.001 .. sf0.1`. Plain `spark.read.parquet`
  * — column pruning and predicate pushdown reach the scan via Catalyst, so
  * no manual projection is needed here.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's µs-precision
    * TimestampType rejects outright ([PARQUET_TYPE_ILLEGAL]). Read nanos
    * as raw longs and convert with integer division — the data's sub-µs
    * part is all zero, and `DIV` (not `/`) avoids double rounding at
    * ~1.7e18 ns magnitudes (> 2^53).
    */
  /** The single place the `nanosAsLong` session flag is set: every graft
    * reader of the `events` table (batch and streaming) calls this, so
    * the whole session uniformly surfaces parquet TIMESTAMP(NANOS) as
    * LONG — a deliberate session-wide contract, not a per-query toggle
    * (a save/restore would race across lazily-executed plans).
    */
  def ensureNanosAsLong(s: SparkSession): Unit =
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  def events(s: SparkSession, d: String): DataFrame = {
    ensureNanosAsLong(s)
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // legacy driver layout: TIMESTAMP(NANOS) surfaced as LONG nanos
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts DIV 1000")))
      case _ =>
        // current driver layout: plain µs timestamp (NTZ in the file);
        // cast to TIMESTAMP under the UTC session = identical µs values
        raw.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame =
    load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    load(s, d, "embeddings")
}
