package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
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

  /** q102: lineitem slice → ORC (the other columnar format Spark ships
    * natively: stripe-indexed, min/max-statistic'd, predicate-pushdown
    * capable like parquet) → explicit-schema read → per-flag rollup.
    * Timestamps are carried as epoch-µs longs (the engine-neutral
    * convention the events table uses); doubles and strings must survive
    * the ORC encode/decode bit-exactly for the oracle — which aggregates
    * the ORIGINAL parquet — to hash-match.
    */
  private def q102(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val path = stage(d, "orc")
    Tables
      .lineitem(s, d)
      .filter($"l_quantity" >= 25)
      .select($"l_orderkey", $"l_returnflag", $"l_linestatus",
        $"l_quantity", $"l_extendedprice",
        // NTZ → timestamp is identity under the UTC session TZ Verify
        // pins (same convention as q83's o_orderdate)
        unix_micros($"l_shipdate".cast("timestamp")).as("ship_us"))
      .write.mode(SaveMode.Overwrite)
      .orc(path)
    val schema = StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_returnflag", StringType),
      StructField("l_linestatus", StringType),
      StructField("l_quantity", DoubleType),
      StructField("l_extendedprice", DoubleType),
      StructField("ship_us", LongType),
    ))
    s.read
      .schema(schema)
      .orc(path)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        count(lit(1)).as("n_lines"),
        // integral-valued double on both sides, so cast-then-sum is exact
        sum($"l_quantity".cast("long")).as("sum_qty"),
        sum(round($"l_extendedprice" * 100).cast("long")).as("price_cents"),
        max($"ship_us").as("max_ship_us"),
        countDistinct($"l_orderkey").as("n_orders"),
      )
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  private val q102Sql =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_lines,
      |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |  CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |    AS price_cents,
      |  MAX(epoch_us(l_shipdate)) AS max_ship_us,
      |  COUNT(DISTINCT l_orderkey) AS n_orders
      |FROM lineitem
      |WHERE l_quantity >= 25
      |GROUP BY 1, 2 ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** q105: Hive-style partitioned layout — `partitionBy("event_type")`
    * on write, partition PRUNING on read. THE canonical 100 TB access
    * pattern: a corpus laid out by its hottest filter key (day, hour,
    * source, type) so that a filter on that key eliminates whole
    * directories at PLANNING time. The distinction this query certifies
    * is `PartitionFilters` (never read) versus `PushedFilters`
    * (read-then-skip via footer stats): the filtered read below must
    * plan as the former — enforced by a hard `require` on the physical
    * plan at every run, so the driver itself fails if pruning regresses
    * — and the result must equal the same filter over the UNpartitioned
    * original, which is exactly what the DuckDB oracle computes.
    * Columns partitioned on move into directory names (`event_type=
    * click/`), so string values must survive the path encode/decode;
    * the cent/µs projections are written pre-computed so the round-trip
    * is pure long/string, the layout's row content is byte-stable, and
    * the rollup is a single map-side-combinable hash-agg over only the
    * two surviving directories.
    */
  private def q105(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val path = stage(d, "part") + "/events_by_type"
    Tables
      .events(s, d)
      .select($"event_id", $"user_id",
        unix_micros($"ts").as("us"),
        expr("CAST(ROUND(value * 100) AS LONG)").as("cents"),
        $"event_type")
      .write.mode(SaveMode.Overwrite)
      .partitionBy("event_type")
      .parquet(path)
    val agg = s.read
      .parquet(path)
      .filter($"event_type".isin("click", "purchase"))
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum($"cents").as("value_cents"),
        countDistinct($"user_id").as("n_users"),
        max($"us").as("max_us"),
      )
      .orderBy($"event_type")
    // planning-time self-check (cheap — inspects the plan, runs nothing):
    // the event_type filter must be a directory-pruning PartitionFilter;
    // if it ever degrades to a row filter the query aborts rather than
    // silently scanning everything
    val plan = agg.queryExecution.executedPlan.toString
    require(
      "PartitionFilters: \\[[^\\]]*event_type".r.findFirstIn(plan).isDefined,
      s"q105: event_type filter fell out of PartitionFilters:\n$plan")
    agg
  }

  private val q105Sql =
    """SELECT event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
      |    AS value_cents,
      |  COUNT(DISTINCT user_id) AS n_users,
      |  MAX(epoch_us(ts)) AS max_us
      |FROM events
      |WHERE event_type IN ('click', 'purchase')
      |GROUP BY 1 ORDER BY event_type""".stripMargin

  /** q111: clustered (sort-ordered) layout + row-group statistics
    * skipping — the second half of the 100 TB layout story. q105 prunes
    * DIRECTORIES on the partition key; this clusters WITHIN the data on
    * the range key every time filter hits (`repartitionByRange(ts)` +
    * `sortWithinPartitions(ts)` at write time), so parquet min/max
    * row-group statistics make a narrow time-window read skip almost
    * every row group in the pushed scan — the poor man's z-order, and
    * the reason "sort your fact table by event time" is layout advice,
    * not folklore. The staged write shrinks `parquet.block.size` so the
    * test-scale file actually has many row groups (at corpus scale the
    * default 128 MB blocks give the same structure for free); Round8Spec
    * proves the physical skip via scan metrics (scan output rows ≪
    * table rows under an 8% time window). The oracle aggregates the
    * same window over the ORIGINAL parquet, so the clustered round-trip
    * must also be value-exact.
    */
  private def q111(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val path = stage(d, "sorted") + "/events_by_ts"
    val ev = Tables
      .events(s, d)
      .select($"event_id", $"user_id", unix_micros($"ts").as("us"),
        expr("CAST(ROUND(value * 100) AS LONG)").as("cents"),
        $"event_type")
    ev.repartitionByRange(4, $"us")
      .sortWithinPartitions($"us")
      .write.mode(SaveMode.Overwrite)
      .option("parquet.block.size", 64 * 1024) // many row groups at test SF
      .parquet(path)
    // Window = first ~8% of the time span, derived from the data so the
    // query is SF-independent. The bounds are COLLECTED (one row, two
    // longs — the bounded "index construction" class of driver-side
    // work): parquet row-group skipping only happens for LITERAL
    // predicates, so the cut must be a constant in the plan, not a
    // joined column. Integer division on driver-side longs ≡ DuckDB's
    // `//` (both values non-negative).
    val b = ev.agg(min($"us"), max($"us")).head
    val (lo, hi) = (b.getLong(0), b.getLong(1))
    val cut = lo + (hi - lo) / 12
    s.read
      .parquet(path)
      .filter($"us" <= cut)
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum($"cents").as("value_cents"),
        max($"us").as("max_us"),
      )
      .orderBy($"event_type")
  }

  private val q111Sql =
    """WITH b AS (SELECT MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi
      |           FROM events)
      |SELECT event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
      |    AS value_cents,
      |  MAX(epoch_us(ts)) AS max_us
      |FROM events, b
      |WHERE epoch_us(ts) <= b.lo + (b.hi - b.lo) // 12
      |GROUP BY 1 ORDER BY event_type""".stripMargin

  /** q115: file-provenance lineage via the `_metadata.file_path` hidden
    * column — the 100 TB incident primitive: when one source batch of a
    * corpus turns out to be bad, rollback is "delete every row whose
    * lineage points at those files", which requires per-row provenance
    * the table itself never stored. `_metadata` is synthesized by the
    * scan at READ time (zero storage cost, zero extra IO — the reader
    * already knows which file it is in), so lineage is available on any
    * parquet corpus retroactively.
    *
    * Harness: stage `documents` as one file per `src_bucket = doc_id %
    * 4` directory (repartition by the key first, so each dir holds
    * EXACTLY one part file), then read the staged corpus back and roll
    * up docs/chars PER SOURCE FILE — with the bucket key recovered from
    * `_metadata.file_path` alone (the partition column is dropped
    * before use, so the lineage genuinely comes from the path), and
    * `n_files = COUNT(DISTINCT file_path)` proving the rollup really
    * is keyed by physical files (the staged layout makes it exactly 1
    * per bucket, which the oracle asserts as a literal). The DuckDB
    * oracle recomputes the same rollup from the LOGICAL key on the
    * original table, so path-derived lineage must agree with ground
    * truth row for row.
    */
  private def q115(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val path = stage(d, "lineage") + "/documents_by_src"
    Tables
      .documents(s, d)
      .withColumn("src_bucket", $"doc_id" % 4)
      .repartition(4, $"src_bucket")
      .write.mode(SaveMode.Overwrite)
      .partitionBy("src_bucket")
      .parquet(path)
    s.read
      .parquet(path)
      .drop("src_bucket") // lineage must come from the file path alone
      .select(
        regexp_extract(col("_metadata.file_path"), "src_bucket=([0-9]+)", 1)
          .cast("long").as("src_bucket"),
        col("_metadata.file_path").as("fp"),
        $"doc_id", $"n_chars")
      .groupBy($"src_bucket")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_chars").as("sum_chars"),
        max($"doc_id").as("max_doc"),
        countDistinct($"fp").as("n_files"),
      )
      .orderBy($"src_bucket")
  }

  private val q115Sql =
    """SELECT doc_id % 4 AS src_bucket, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  MAX(doc_id) AS max_doc, CAST(1 AS BIGINT) AS n_files
      |FROM documents
      |GROUP BY 1 ORDER BY src_bucket""".stripMargin

  /** q116: the COMPOSED 100 TB event-table layout — q105's directory
    * pruning and q111's row-group clustering in ONE staged write, proven
    * on ONE scan. `partitionBy(event_type)` makes the hot categorical
    * filter a planning-time directory prune; `repartitionByRange(
    * event_type, us)` + a within-partition sort makes every parquet
    * row group inside each surviving directory a tight `us` range, so
    * the residual time predicate skips row groups via min/max footer
    * statistics. A combined type+time predicate then does BOTH: planner
    * never lists the other type dirs (`PartitionFilters` — hard
    * `require`d below at every run), and the pushed range filter reads
    * a fraction of the surviving dirs' row groups (Round9Spec proves
    * the skip with scan metrics against the same staged layout). This
    * is the layout a real event corpus ships: partition by the
    * low-cardinality hot key, cluster by time within it.
    */
  private def q116(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val path = stage(d, "combo") + "/events_by_type_time"
    val ev = Tables
      .events(s, d)
      .select($"event_id", $"user_id", unix_micros($"ts").as("us"),
        expr("CAST(ROUND(value * 100) AS LONG)").as("cents"),
        $"event_type")
    // range-partition on (type, time) so each writer task owns one
    // type's contiguous time slice: the partitionBy dirs then hold
    // time-disjoint files of time-sorted row groups
    // 16KB blocks (vs q111's 64KB): partitionBy splits the rows across
    // 5 type dirs first, so each dir's files are ~5× smaller than
    // q111's — the block size must shrink with them for the staged
    // files to still hold several row groups at test SF (at corpus
    // scale the default 128MB blocks give this structure for free)
    ev.repartitionByRange(8, $"event_type", $"us")
      .sortWithinPartitions($"event_type", $"us")
      .write.mode(SaveMode.Overwrite)
      .option("parquet.block.size", 16 * 1024)
      .partitionBy("event_type")
      .parquet(path)
    // literal time cut (same bounded 1-row collect as q111): row-group
    // skipping needs a constant predicate in the plan
    val b = ev.agg(min($"us"), max($"us")).head
    val cut = b.getLong(0) + (b.getLong(1) - b.getLong(0)) / 12
    val agg = s.read
      .parquet(path)
      .filter($"event_type" === "click" && $"us" <= cut)
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum($"cents").as("value_cents"),
        countDistinct($"user_id").as("n_users"),
        max($"us").as("max_us"),
      )
      .orderBy($"event_type")
    val plan = agg.queryExecution.executedPlan.toString
    require(
      "PartitionFilters: \\[[^\\]]*event_type".r.findFirstIn(plan).isDefined,
      s"q116: event_type filter fell out of PartitionFilters:\n$plan")
    // the column must appear as the OPERAND of a pushed comparison —
    // a bare substring match ("us") would be satisfied by e.g.
    // IsNotNull(user_id) and pass spuriously
    require(
      "PushedFilters: \\[[^\\]]*(LessThan|LessThanOrEqual)\\(us,".r
        .findFirstIn(plan).isDefined,
      s"q116: us range filter was not pushed to the scan:\n$plan")
    agg
  }

  private val q116Sql =
    """WITH b AS (SELECT MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi
      |           FROM events)
      |SELECT event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
      |    AS value_cents,
      |  COUNT(DISTINCT user_id) AS n_users,
      |  MAX(epoch_us(ts)) AS max_us
      |FROM events, b
      |WHERE event_type = 'click'
      |  AND epoch_us(ts) <= b.lo + (b.hi - b.lo) // 12
      |GROUP BY 1 ORDER BY event_type""".stripMargin

  /** Morton (Z-order) interleave of two 16-bit bucket columns into one
    * 32-bit cluster key: bit i of `a` lands at position 2i+1, bit i of
    * `b` at 2i. Pure codegen shift/mask arithmetic — the same closed
    * form every lakehouse OPTIMIZE ZORDER implements.
    */
  private def zInterleave(a: Column, b: Column): Column =
    (0 until 16)
      .map { i =>
        shiftleft(shiftrightunsigned(a, i).bitwiseAND(lit(1L)), 2 * i + 1)
          .bitwiseOR(
            shiftleft(shiftrightunsigned(b, i).bitwiseAND(lit(1L)), 2 * i))
      }
      .reduce(_ bitwiseOR _)

  /** q134: Z-ORDER clustering — the multi-dimensional data-skipping
    * layout q111/q116 cannot give: clustering by time alone makes a
    * user-only predicate read everything, and partitioning by user would
    * explode directory counts. Z-order interleaves the bits of the
    * 16-bit-bucketed (time, user) pair into ONE sort key, so rows close
    * in EITHER dimension are close in the file order and parquet
    * row-group min/max stats stay narrow on BOTH columns — a time slice
    * AND a user band each skip row groups on a single copy of the data
    * (the spec proves the skip with scan metrics A/B against the
    * time-only layout; this registered run proves the layout answers
    * the two-sided predicate exactly). Bucket bounds are one collected
    * row (the q111 "index construction" class); the cuts are literals
    * so the pushed filters prune at plan time. The bucket math is
    * integer DIV on non-negative operands — engine-exact.
    */
  private def q134(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val path = stage(d, "zorder") + "/events_z"
    val ev = Tables
      .events(s, d)
      .select($"event_id", $"user_id", unix_micros($"ts").as("us"),
        expr("CAST(ROUND(value * 100) AS LONG)").as("cents"),
        $"event_type")
    val b = ev.agg(min($"us"), max($"us"), max($"user_id")).head
    val (lo, hi, maxU) = (b.getLong(0), b.getLong(1), b.getLong(2))
    // 16-bit bucket of `(v - lo)` over `range`, overflow-safe at any
    // scale: the scale-up form `(v-lo)*65535 DIV range` (needed so a
    // SMALL domain — e.g. 150 user ids — still fills all 16 bits and
    // its interleave bits carry weight) would overflow Long once the
    // range tops ~4.5 years of microseconds; past 2^32 the values are
    // dense enough that divide-first loses nothing, so branch on range.
    def bucket(colSql: String, lo: Long, range: Long): String =
      if (range <= 0L) "CAST(0 AS BIGINT)"
      else if (range < (1L << 32)) s"(($colSql - $lo) * 65535) DIV $range"
      else {
        val step = range / 65536L + 1L
        s"($colSql - $lo) DIV $step"
      }
    val tb = expr(bucket("us", lo, hi - lo))
    val ub = expr(bucket("user_id", 0L, maxU))
    ev.withColumn("zkey", zInterleave(tb, ub))
      .repartitionByRange(8, $"zkey")
      .sortWithinPartitions($"zkey")
      .drop("zkey")
      .write.mode(SaveMode.Overwrite)
      .option("parquet.block.size", 16 * 1024) // many row groups at test SF
      .parquet(path)
    // the production access pattern the layout exists for: a time slice
    // AND a user band in one scan — both cuts literal, both pushed
    val tCut = lo + (hi - lo) / 10
    val uLo = maxU / 2
    s.read
      .parquet(path)
      .filter($"us" <= tCut && $"user_id" >= uLo)
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum($"cents").as("value_cents"),
        countDistinct($"user_id").as("n_users"),
        max($"us").as("max_us"),
      )
      .orderBy($"event_type")
  }

  private val q134Sql =
    """WITH b AS (SELECT MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi,
      |                  MAX(user_id) AS mu
      |           FROM events)
      |SELECT event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
      |    AS value_cents,
      |  COUNT(DISTINCT user_id) AS n_users,
      |  MAX(epoch_us(ts)) AS max_us
      |FROM events, b
      |WHERE epoch_us(ts) <= b.lo + (b.hi - b.lo) // 10
      |  AND user_id >= b.mu // 2
      |GROUP BY 1 ORDER BY event_type""".stripMargin

  /** q120: malformed-record QUARANTINE — the ingestion reality every
    * 100 TB feed has and no clean-fixture query shows: some fraction of
    * a text feed is broken (truncated writes, partial flushes, junk),
    * and the job must neither crash (FAILFAST) nor silently drop rows
    * (DROPMALFORMED) but parse in PERMISSIVE mode with a corrupt-record
    * column: good rows flow, broken lines land intact in quarantine for
    * replay/audit. Staged feed = the urgent-orders JSONL (q83's
    * convention) plus a file of deterministically malformed lines; the
    * rollup counts both sides and aggregates the good rows' values.
    * The oracle recomputes the good side from the ORIGINAL table and
    * pins the quarantine count — so a dropped good row, a good row
    * mis-quarantined, or a crash on the bad file all fail the gate.
    * Parsed-field access on a corrupt row is engine-defined, so the
    * aggregate reads parsed fields only where `_corrupt IS NULL`.
    */
  private def q120(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val path = stage(d, "quarantine") + "/orders_feed"
    Tables
      .orders(s, d)
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_orderkey", $"o_orderstatus",
        round($"o_totalprice" * 100).cast("long").as("cents"))
      .write.mode(SaveMode.Overwrite)
      .json(path)
    // three deterministically broken lines ride in their own part file:
    // truncated object, bare junk, unclosed string — all syntactically
    // invalid, so every engine agrees they cannot parse
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path, "part-junk.json"),
      java.util.Arrays.asList(
        """{"o_orderkey": 1, "o_orderstatus":""",
        """this is not json at all""",
        """{"o_orderkey": 2, "o_orderstatus": "O"""),
      java.nio.charset.StandardCharsets.UTF_8)
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("cents", LongType),
      StructField("_corrupt", StringType),
    ))
    s.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)
      .agg(
        count(when($"_corrupt".isNull, lit(1))).as("n_good"),
        count($"_corrupt").as("n_quarantined"),
        sum(when($"_corrupt".isNull, $"cents")).as("cents_total"),
        countDistinct(when($"_corrupt".isNull, $"o_orderstatus"))
          .as("n_status"),
      )
  }

  private val q120Sql =
    """SELECT COUNT(*) AS n_good, CAST(3 AS BIGINT) AS n_quarantined,
      |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |    AS cents_total,
      |  COUNT(DISTINCT o_orderstatus) AS n_status
      |FROM orders
      |WHERE o_orderpriority = '1-URGENT'""".stripMargin

  /** q121: storage-level schema EVOLUTION — a table written over months
    * drifts: newer files carry a column the older files lack, and a
    * 100 TB table is never rewritten to chase that. `mergeSchema=true`
    * reconciles at SCAN time: the footer schemas union, old-generation
    * rows surface the evolved schema with NULLs, and aggregates over
    * the new column skip them (q84 is the same drift story one level
    * up, for DataFrames; this is the storage layer's version). Staged
    * layout = one dir holding a v1 write (3 columns) and an appended
    * v2 write (+ `discount_bp`), deterministically split by order-key
    * parity so the DuckDB oracle can recompute both generations from
    * the original table. A dropped old-generation row, a misaligned
    * column, or discount values leaking into v1 rows all break the
    * hash.
    */
  private def q121(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val path = stage(d, "evolve") + "/lineitem_generations"
    val li = Tables
      .lineitem(s, d)
      .select($"l_orderkey", $"l_returnflag",
        $"l_quantity".cast("long").as("qty"),
        round($"l_discount" * 10000).cast("long").as("discount_bp"))
    li.filter($"l_orderkey" % 2 === 0)
      .select($"l_orderkey", $"l_returnflag", $"qty") // v1: no discount
      .write.mode(SaveMode.Overwrite).parquet(path)
    li.filter($"l_orderkey" % 2 === 1) // v2: evolved schema
      .write.mode(SaveMode.Append).parquet(path)
    s.read
      .option("mergeSchema", "true")
      .parquet(path)
      .groupBy($"l_returnflag")
      .agg(
        count(lit(1)).as("n_rows"),
        sum($"qty").as("sum_qty"),
        count($"discount_bp").as("n_v2_rows"), // nulls = v1 generation
        sum($"discount_bp").as("discount_bp_total"),
      )
      .orderBy($"l_returnflag")
  }

  private val q121Sql =
    """SELECT l_returnflag, COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |  CAST(SUM(CASE WHEN l_orderkey % 2 = 1 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_v2_rows,
      |  CAST(SUM(CASE WHEN l_orderkey % 2 = 1
      |            THEN CAST(ROUND(l_discount * 10000) AS BIGINT) END)
      |    AS BIGINT) AS discount_bp_total
      |FROM lineitem
      |GROUP BY 1 ORDER BY l_returnflag""".stripMargin

  /** q122: small-file COMPACTION — the maintenance job every streaming
    * sink eventually needs: micro-batch writers land a file per
    * (batch × partition), directory listings and task scheduling then
    * drown in tiny files, and a periodic compactor rewrites each
    * directory into size-targeted files. Staged input = the events
    * projection scattered across 64 tiny files (the sink reality);
    * the compactor SIZES its output from the data — file count =
    * ceil(input bytes / target file size), the arithmetic a real
    * compactor runs with a 128 MB–1 GB target — instead of hardcoding
    * a partition count. Hard `require`s prove the file count actually
    * collapsed; the oracle aggregates the ORIGINAL table, so the
    * rewrite must preserve every row and value bit-exactly.
    */
  private def q122(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val smallDir = stage(d, "compact") + "/events_small"
    val bigDir   = stage(d, "compact") + "/events_compacted"
    Tables
      .events(s, d)
      .select($"event_id", $"user_id", unix_micros($"ts").as("us"),
        expr("CAST(ROUND(value * 100) AS LONG)").as("cents"),
        $"event_type")
      .repartition(64)
      .write.mode(SaveMode.Overwrite).parquet(smallDir)
    def parquetFiles(dir: String): Seq[java.nio.file.Path] =
      scala.util.Using.resource(
        java.nio.file.Files.list(java.nio.file.Paths.get(dir))) { l =>
        import scala.jdk.CollectionConverters._
        l.iterator().asScala
          .filter(_.toString.endsWith(".parquet")).toSeq
      }
    val smallFiles = parquetFiles(smallDir)
    // size-targeted output: 256 KB target at test SF stands in for the
    // 128 MB-1 GB a cluster compactor uses — the ARITHMETIC is the
    // operator, the constant is configuration
    val targetBytes = 256L * 1024
    val totalBytes =
      smallFiles.map(java.nio.file.Files.size(_)).sum
    val nOut = math.max(1L,
      (totalBytes + targetBytes - 1) / targetBytes).toInt
    s.read.parquet(smallDir)
      .repartition(nOut)
      .write.mode(SaveMode.Overwrite).parquet(bigDir)
    val bigFiles = parquetFiles(bigDir)
    require(smallFiles.size >= 32,
      s"q122: staging produced only ${smallFiles.size} small files")
    // the writer must honor the size-derived target at ANY scale; the
    // 4x-collapse proof applies only where the target itself says the
    // input was over-fragmented (at a large enough SF, 64 files become
    // legitimately right-sized and a compactor correctly leaves them)
    require(bigFiles.size <= nOut,
      s"q122: compactor wrote ${bigFiles.size} files for target $nOut")
    if (nOut <= smallFiles.size / 4)
      require(bigFiles.size <= smallFiles.size / 4,
        s"q122: compaction left ${bigFiles.size} of ${smallFiles.size} files")
    s.read
      .parquet(bigDir)
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum($"cents").as("value_cents"),
        countDistinct($"event_id").as("n_ids"),
        max($"us").as("max_us"),
      )
      .orderBy($"event_type")
  }

  private val q122Sql =
    """SELECT event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
      |    AS value_cents,
      |  COUNT(DISTINCT event_id) AS n_ids,
      |  MAX(epoch_us(ts)) AS max_us
      |FROM events
      |GROUP BY 1 ORDER BY event_type""".stripMargin

  /** q157: DYNAMIC partition pruning — the runtime companion to q105's
    * planning-time prune, and the scale mechanism behind every
    * partitioned star join: the fact side is laid out
    * `partitionBy(event_type)`, the dimension is an above-average-volume
    * type list that only EXISTS at runtime (types whose total cents
    * exceed the per-type mean — an aggregate of the same table, so no
    * literal IN-list can be folded at planning), and Catalyst must turn
    * the broadcast dim into a `dynamicpruning` subquery ON THE FACT
    * SCAN's PartitionFilters so non-qualifying directories are never
    * read. A hard `require` on the executed plan enforces exactly that —
    * at 100 TB this is the difference between scanning 2 of 5 type
    * directories and scanning the corpus then throwing 60% away. The
    * above-average cut compares `total*k > grand` in exact integers, so
    * the dim membership (and with it the oracle) is engine-independent.
    */
  private def q157(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val path = stage(d, "dpp") + "/events_by_type"
    val e = Tables
      .events(s, d)
      .select($"event_id", $"user_id",
        expr("CAST(ROUND(value * 100) AS LONG)").as("cents"),
        $"event_type")
    e.write.mode(SaveMode.Overwrite)
      .partitionBy("event_type")
      .parquet(path)
    // the above-average cut stays a real Filter node (global window over
    // the |types|-row totals, then WHERE) rather than a cross-join
    // condition: the DPP rule only spends a subquery on a pruning side
    // that carries a selective Filter, and a BNLJ join condition is not
    // one
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    val totals = e
      .groupBy($"event_type")
      .agg(sum($"cents").as("total_cents"))
    val dim = totals
      .withColumn("grand", sum($"total_cents").over(wAll))
      .withColumn("k", count(lit(1)).over(wAll))
      .where($"total_cents" * $"k" > $"grand")
      .select($"event_type")
    val fact = s.read.parquet(path)
    val agg = fact
      // dim must be the BROADCAST side for DPP to attach its subquery
      // to the fact scan (the planner would otherwise pick the smaller
      // side by size estimate, which at test SF can be the fact)
      .join(broadcast(dim), Seq("event_type"))
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum($"cents").as("value_cents"),
        countDistinct($"user_id").as("n_users"),
      )
      .orderBy($"event_type")
    val plan = agg.queryExecution.executedPlan.toString
    require(
      "PartitionFilters: \\[[^\\]]*dynamicpruning".r
        .findFirstIn(plan).isDefined,
      s"q157: fact scan lost its dynamicpruning PartitionFilter:\n$plan")
    agg
  }

  private val q157Sql =
    """WITH e AS (
      |  SELECT event_id, user_id,
      |    CAST(ROUND(value * 100) AS BIGINT) AS cents, event_type
      |  FROM events
      |), totals AS (
      |  SELECT event_type, CAST(SUM(cents) AS BIGINT) AS total_cents
      |  FROM e GROUP BY event_type
      |), grand AS (
      |  SELECT CAST(SUM(total_cents) AS BIGINT) AS grand,
      |    COUNT(*) AS k FROM totals
      |), dim AS (
      |  SELECT event_type FROM totals, grand
      |  WHERE total_cents * k > grand
      |)
      |SELECT e.event_type, COUNT(*) AS n_events,
      |  CAST(SUM(e.cents) AS BIGINT) AS value_cents,
      |  COUNT(DISTINCT e.user_id) AS n_users
      |FROM e JOIN dim USING (event_type)
      |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin

  /** q162: parquet column BLOOM FILTER layout — the third row-group
    * skipping mechanism after min/max clustering (q111) and Z-order
    * (q134), and the only one that works for POINT LOOKUPS on a
    * high-cardinality key UNCORRELATED with the sort order: here `h` is
    * an md5-derived surrogate scattered uniformly through the
    * time-sorted layout, so every row group's min/max spans the whole
    * domain and stats skip NOTHING — the per-group bloom filter is what
    * lets the reader prove absence. Round10Spec measures the skip
    * (scan metrics: bloom layout reads ~1 row group, the no-bloom
    * control reads all); this query gates the VALUE correctness of a
    * lookup through the bloom-enabled layout against DuckDB computing
    * the same surrogate (q146's shared hex→BIGINT primitive). The
    * two 1-row collects are bounded literal cuts (q111's class): point
    * lookups are literal-driven by nature.
    */
  private def q162(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val path = stage(d, "bloom") + "/events_bloom"
    val ev = Tables
      .events(s, d)
      .select($"event_id", unix_micros($"ts").as("us"),
        expr("CAST(ROUND(value * 100) AS LONG)").as("cents"),
        expr("CAST(conv(substr(md5(CAST(event_id AS STRING)), 1, 15)" +
          ", 16, 10) AS BIGINT)").as("h"))
    ev.coalesce(1).sortWithinPartitions($"us")
      .write.mode(SaveMode.Overwrite)
      // small blocks → several row groups even at test SF (q111's knob);
      // at 100 TB the default 128 MB groups play the same role
      .option("parquet.block.size", "16384")
      .option("parquet.bloom.filter.enabled#h", "true")
      .parquet(path)
    val tid = ev.agg(min($"event_id")).head.getLong(0)
    val target = ev.where($"event_id" === tid).select($"h").head.getLong(0)
    s.read.parquet(path)
      .filter($"h" === target)
      .select($"event_id", $"us", $"cents")
      .orderBy($"event_id")
  }

  private val q162Sql =
    """WITH e AS (
      |  SELECT event_id, epoch_us(ts) AS us,
      |    CAST(ROUND(value * 100) AS BIGINT) AS cents,
      |    CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))
      |      AS BIGINT) AS h
      |  FROM events
      |), t AS (
      |  SELECT h AS th FROM e
      |  WHERE event_id = (SELECT MIN(event_id) FROM e)
      |)
      |SELECT event_id, us, cents FROM e, t WHERE h = th
      |ORDER BY event_id""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("q157_dynamic_prune", q157, Some(q157Sql)),
    QueryDef("q162_bloom_lookup", q162, Some(q162Sql)),
    QueryDef("q82_csv_roundtrip", q82, Some(q82Sql)),
    QueryDef("q83_json_roundtrip", q83, Some(q83Sql)),
    QueryDef("q102_orc_roundtrip", q102, Some(q102Sql)),
    QueryDef("q105_partition_prune", q105, Some(q105Sql)),
    QueryDef("q111_clustered_scan", q111, Some(q111Sql)),
    QueryDef("q115_file_lineage", q115, Some(q115Sql)),
    QueryDef("q116_layout_compose", q116, Some(q116Sql)),
    QueryDef("q134_zorder_layout", q134, Some(q134Sql)),
    QueryDef("q120_corrupt_quarantine", q120, Some(q120Sql)),
    QueryDef("q121_schema_evolution", q121, Some(q121Sql)),
    QueryDef("q122_compaction", q122, Some(q122Sql)),
  )
}
