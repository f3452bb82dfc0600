package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Non-parquet source/sink round-trips. The driver fixtures are parquet
  * only, so each query here materializes a table slice through a text
  * format (CSV / JSON lines) and reads it back with an EXPLICIT schema —
  * never `inferSchema`, which costs a second full pass at scale and can
  * type-drift between shards. The DuckDB oracle aggregates the original
  * parquet, so a green row proves the sink→source round-trip is
  * value-exact for longs, strings, and doubles (Spark writes doubles in
  * shortest-round-trip form; reading restores the identical bits).
  *
  * The staging directory is per-SF and overwritten each run; writes use
  * the normal committer protocol (temporary attempt dirs + rename), i.e.
  * the same write path a cluster job would use, just onto local disk.
  */
object Sources {

  private def stage(d: String, fmt: String): String = {
    val tag = d.replaceAll("[^A-Za-z0-9]", "_")
    s"target/stage_sources/${fmt}_$tag"
  }

  /** q82: customer → CSV (header, quoted strings) → explicit-schema read
    * → per-segment balance rollup. Strings in `c_mktsegment`/`c_name`
    * carry commas in other TPC-H columns, so quoting/escape handling is
    * part of what the oracle certifies.
    */
  private def q82(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val path = stage(d, "csv")
    Tables
      .customer(s, d)
      .select($"c_custkey", $"c_name", $"c_mktsegment", $"c_acctbal")
      .write.mode(SaveMode.Overwrite)
      .option("header", "true")
      .csv(path)
    val schema = StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_name", StringType),
      StructField("c_mktsegment", StringType),
      StructField("c_acctbal", DoubleType),
    ))
    s.read
      .schema(schema)
      .option("header", "true")
      .csv(path)
      .groupBy($"c_mktsegment")
      .agg(
        count(lit(1)).as("n_cust"),
        sum(round($"c_acctbal" * 100).cast("long")).as("bal_cents"),
        max(length($"c_name")).cast("long").as("max_name_len"),
      )
      .orderBy($"c_mktsegment")
  }

  private val q82Sql =
    """SELECT c_mktsegment, COUNT(*) AS n_cust,
      |  CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
      |    AS bal_cents,
      |  CAST(MAX(LENGTH(c_name)) AS BIGINT) AS max_name_len
      |FROM customer
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** q83: urgent orders → JSON lines → explicit-schema read → per-year
    * rollup. JSON adds the nested-value and null-handling surface CSV
    * lacks; the timestamp column is carried as epoch micros (a long) —
    * the same engine-neutral convention the events table uses — rather
    * than trusting two engines to agree on a timestamp text format.
    */
  private def q83(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val path = stage(d, "json")
    Tables
      .orders(s, d)
      .filter($"o_orderpriority" === "1-URGENT")
      .select(
        $"o_orderkey",
        $"o_orderstatus",
        unix_micros($"o_orderdate".cast("timestamp")).as("odate_us"),
        $"o_totalprice",
      )
      .write.mode(SaveMode.Overwrite)
      .json(path)
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("odate_us", LongType),
      StructField("o_totalprice", DoubleType),
    ))
    s.read
      .schema(schema)
      .json(path)
      .groupBy(year(timestamp_micros($"odate_us")).cast("long").as("y"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(round($"o_totalprice" * 100).cast("long")).as("cents"),
        countDistinct($"o_orderstatus").as("n_status"),
      )
      .orderBy($"y")
  }

  private val q83Sql =
    """SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS y,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |    AS cents,
      |  COUNT(DISTINCT o_orderstatus) AS n_status
      |FROM orders
      |WHERE o_orderpriority = '1-URGENT'
      |GROUP BY 1 ORDER BY y""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("q82_csv_roundtrip", q82, Some(q82Sql)),
    QueryDef("q83_json_roundtrip", q83, Some(q83Sql)),
  )
}
