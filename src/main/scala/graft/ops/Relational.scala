package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational operator surface over the TPC-H-ish driver tables
  * (`FIXTURES.md` §B). The reference has no relational operators at all
  * (SURVEY.md §2.b — closest analogue: the pattern-id lookup at
  * `eventstream.py:354-356` is a broadcast-hash-join shape), so this module
  * is the engine's own query surface, designed Spark-first:
  *
  *   - small dims (`region`,`nation`,`supplier`,`part`,`customer`) are
  *     explicitly `broadcast()` — at 100 TB the fact tables scale but these
  *     stay bounded, so a shuffle join there would be a planning bug;
  *   - `lineitem ⋈ orders` is left to Catalyst/AQE (both sides scale →
  *     sort-merge with AQE skew handling is the right default);
  *   - aggregates go through hash-agg with map-side partial aggregation
  *     (Catalyst default) — no `collect()` anywhere;
  *   - every query ends in a deterministic total ORDER BY so the DuckDB
  *     oracle compare is order-stable;
  *   - double-typed aggregates are `round()`ed (sum order across partitions
  *     perturbs low bits; integer-valued doubles like `l_quantity` sums are
  *     exact in any order and stay raw).
  */
object Relational {

  /** TPC-H Q1-shaped pricing summary: scan-filter → hash agg (partial +
    * final) → small sort. Filter + 7-column projection push into the
    * parquet scan.
    */
  private def q01(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables
      .lineitem(s, d)
      .filter($"l_shipdate" < lit("1999-06-01 00:00:00").cast("timestamp"))
      // Money sums in EXACT integer grid units (price 2dp → cents;
      // ×(1-disc) → 1e4 units; ×(1+tax) → 1e6 units): a double sum
      // rounded at the 6dp grid loses parity once magnitude × 1e6
      // approaches 2^53 — observed at sf0.1 where the two engines'
      // summation orders straddled a half-ulp of the grid. The per-row
      // grid products fit long (≤ ~1.1e11), but their SUM is
      // accumulated in decimal(38,0): an int64 accumulator overflows
      // around sf 40-60 for the 1e6-unit charge (ANSI: runtime error),
      // and decimal sums are just as association-free. The single final
      // exact-integer→double conversion is IEEE round-to-nearest on
      // both engines, hence deterministic.
      .withColumn("cents", round($"l_extendedprice" * 100).cast("long"))
      .withColumn("disc_pct", round($"l_discount" * 100).cast("long"))
      .withColumn("tax_pct", round($"l_tax" * 100).cast("long"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity").as("sum_qty"),
        (sum($"cents".cast("decimal(38,0)")).cast("double") / 100.0)
          .as("sum_base_price"),
        (sum(($"cents" * (lit(100L) - $"disc_pct")).cast("decimal(38,0)"))
          .cast("double") / 1e4).as("sum_disc_price"),
        (sum(($"cents" * (lit(100L) - $"disc_pct") *
          (lit(100L) + $"tax_pct")).cast("decimal(38,0)"))
          .cast("double") / 1e6).as("sum_charge"),
        round(avg($"l_quantity"), 4).as("avg_qty"),
        round(avg($"l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"),
      )
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  private val q01Sql =
    """SELECT l_returnflag, l_linestatus,
      |  SUM(l_quantity) AS sum_qty,
      |  CAST(CAST(SUM(cents) AS BIGINT) AS DOUBLE) / 100.0
      |    AS sum_base_price,
      |  CAST(CAST(SUM(cents * (100 - disc_pct)) AS BIGINT) AS DOUBLE)
      |    / 10000.0 AS sum_disc_price,
      |  CAST(CAST(SUM(cents * (100 - disc_pct) * (100 + tax_pct))
      |    AS BIGINT) AS DOUBLE) / 1000000.0 AS sum_charge,
      |  ROUND(AVG(l_quantity), 4) AS avg_qty,
      |  ROUND(AVG(l_discount), 6) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM (SELECT *,
      |        CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents,
      |        CAST(ROUND(l_discount * 100) AS BIGINT) AS disc_pct,
      |        CAST(ROUND(l_tax * 100) AS BIGINT) AS tax_pct
      |      FROM lineitem
      |      WHERE l_shipdate < TIMESTAMP '1999-06-01 00:00:00') t
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Selective scan: predicate + projection pushdown (explain shows
    * PushedFilters on l_quantity/l_returnflag and a 5-column ReadSchema).
    */
  private def q02(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables
      .lineitem(s, d)
      .filter($"l_quantity" > 45 && $"l_returnflag" === "R")
      .select(
        $"l_orderkey",
        $"l_linenumber",
        ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("net_price"),
      )
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  private val q02Sql =
    """SELECT l_orderkey, l_linenumber,
      |  l_extendedprice * (1.0 - l_discount) AS net_price
      |FROM lineitem
      |WHERE l_quantity > 45 AND l_returnflag = 'R'
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Top-k: agg then orderBy().limit() — Spark plans TakeOrderedAndProject,
    * which keeps only k rows per partition before the final merge (no full
    * sort at scale). Tie-broken on the key for determinism.
    */
  private def q03(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables
      .lineitem(s, d)
      .groupBy($"l_orderkey")
      .agg(
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 4)
          .as("revenue"),
        count(lit(1)).as("n_items"),
      )
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
  }

  private val q03Sql =
    """SELECT l_orderkey,
      |  ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |GROUP BY l_orderkey
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** Broadcast hash join: `part` is a bounded dimension (200 rows at
    * sf0.001, ~20k at sf0.1, still tiny at 100 TB fact scale) — the
    * broadcast hint comes from the PERSISTED ANALYZE artifact
    * ([[Analyze.statsJoinStoredOn]]: one metadata read of part's
    * measured byte mass against the budget), not a hand-placed
    * constant, so the same query degrades to a shuffle join the day
    * the dimension outgrows the budget (r19 verdict item 6 — the
    * measured artifact is load-bearing). Round20Spec plan-locks both
    * branches with size-estimate autobroadcast disabled.
    */
  private def q04(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Analyze
      .statsJoinStoredOn(s, d, Tables.lineitem(s, d), "part",
        $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand")
      .agg(
        sum($"l_quantity").as("sum_qty"),
        round(sum($"l_extendedprice"), 2).as("sum_price"),
        count(lit(1)).as("n_lines"),
      )
      .orderBy($"p_brand")
  }

  private val q04Sql =
    """SELECT p_brand,
      |  SUM(l_quantity) AS sum_qty,
      |  ROUND(SUM(l_extendedprice), 2) AS sum_price,
      |  COUNT(*) AS n_lines
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin

  /** Star join: lineitem→orders is the only big⋈big edge (left to
    * Catalyst/AQE → sort-merge); customer/nation/region are broadcast.
    */
  private def q05(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables
      .lineitem(s, d)
      .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables.customer(s, d)), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
      // integer 1e4-grid units: per-nation groups grow with the fact
      // table, so a rounded double sum eventually loses parity the way
      // q01's charge did at sf0.1 (see that query's note)
      .groupBy($"r_name", $"n_name")
      .agg(
        (sum(round($"l_extendedprice" * 100).cast("long") *
          (lit(100L) - round($"l_discount" * 100).cast("long")))
          .cast("double") / 1e4).as("revenue"),
        count(lit(1)).as("n_lines"),
      )
      .orderBy($"r_name", $"n_name")
  }

  private val q05Sql =
    """SELECT r_name, n_name,
      |  CAST(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) *
      |    (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT)
      |    AS DOUBLE) / 10000.0 AS revenue,
      |  COUNT(*) AS n_lines
      |FROM lineitem
      |  JOIN orders   ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation   ON c_nationkey = n_nationkey
      |  JOIN region   ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  /** Semi join (EXISTS): left_semi keeps orders columns only and never
    * duplicates rows — at scale this is a broadcast/shuffled hash semi,
    * strictly cheaper than inner-join + distinct.
    */
  private def q06(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables
      .orders(s, d)
      .join(
        Tables.lineitem(s, d).filter($"l_quantity" >= 48),
        $"o_orderkey" === $"l_orderkey",
        "left_semi",
      )
      .select($"o_orderkey", $"o_totalprice")
      .orderBy($"o_orderkey")
  }

  private val q06Sql =
    """SELECT o_orderkey, o_totalprice
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
      |ORDER BY o_orderkey""".stripMargin

  /** Anti join (NOT EXISTS): customers that never placed an urgent order.
    * The filter on the right side is applied before the anti join (pushed
    * into the orders scan).
    */
  private def q07(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables
      .customer(s, d)
      .join(
        Tables.orders(s, d).filter($"o_orderpriority" === "1-URGENT"),
        $"c_custkey" === $"o_custkey",
        "left_anti",
      )
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  private val q07Sql =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin

  /** Exact distinct aggregation: COUNT(DISTINCT) expands to a two-phase
    * partial/final plan in Spark; exact (not HLL) so the oracle matches.
    */
  private def q08(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables
      .orders(s, d)
      .groupBy($"o_orderstatus")
      .agg(
        countDistinct($"o_custkey").as("n_custs"),
        countDistinct($"o_orderpriority").as("n_prios"),
        count(lit(1)).as("n_orders"),
      )
      .orderBy($"o_orderstatus")
  }

  private val q08Sql =
    """SELECT o_orderstatus,
      |  COUNT(DISTINCT o_custkey) AS n_custs,
      |  COUNT(DISTINCT o_orderpriority) AS n_prios,
      |  COUNT(*) AS n_orders
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  /** Window top-k per group: row_number over (brand, price desc) with a
    * unique tie-break so rank assignment is total-order deterministic.
    */
  private def q09(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window
      .partitionBy($"p_brand")
      .orderBy($"p_retailprice".desc, $"p_partkey")
    Tables
      .part(s, d)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"p_brand", $"rn".cast("long").as("rn"), $"p_partkey",
        $"p_retailprice")
      .orderBy($"p_brand", $"rn")
  }

  private val q09Sql =
    """SELECT p_brand, rn, p_partkey, p_retailprice FROM (
      |  SELECT p_brand, p_partkey, p_retailprice,
      |    ROW_NUMBER() OVER (PARTITION BY p_brand
      |                       ORDER BY p_retailprice DESC, p_partkey) AS rn
      |  FROM part) t
      |WHERE rn <= 3
      |ORDER BY p_brand, rn""".stripMargin

  /** Running aggregate: cumulative sum per supplier over a unique total
    * order (shipdate, orderkey, linenumber); truncated to the first 5 rows
    * per supplier to keep the result bounded at any SF.
    */
  private def q10(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window
      .partitionBy($"l_suppkey")
      .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber")
    Tables
      .lineitem(s, d)
      .withColumn("rn", row_number().over(w))
      .withColumn(
        "running_qty",
        sum($"l_quantity")
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
      )
      .filter($"rn" <= 5)
      .select($"l_suppkey", $"rn".cast("long").as("rn"), $"l_orderkey",
        $"l_linenumber",
        $"running_qty")
      .orderBy($"l_suppkey", $"rn")
  }

  private val q10Sql =
    """SELECT l_suppkey, rn, l_orderkey, l_linenumber, running_qty FROM (
      |  SELECT l_suppkey, l_orderkey, l_linenumber,
      |    ROW_NUMBER() OVER (PARTITION BY l_suppkey
      |      ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn,
      |    SUM(l_quantity) OVER (PARTITION BY l_suppkey
      |      ORDER BY l_shipdate, l_orderkey, l_linenumber
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
      |  FROM lineitem) t
      |WHERE rn <= 5
      |ORDER BY l_suppkey, rn""".stripMargin

  /** Set operations: UNION (distinct) → EXCEPT → INTERSECT, composed the
    * same way on both sides (Spark's except/intersect are the SQL DISTINCT
    * variants).
    */
  private def q11(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, d)
    val a = c.filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val b = c.filter($"c_acctbal" > 8000).select($"c_custkey")
    val x = c.filter($"c_nationkey" < 3).select($"c_custkey")
    val y = c.filter($"c_custkey" % 3 =!= 0).select($"c_custkey")
    a.union(b).distinct().except(x).intersect(y).orderBy($"c_custkey")
  }

  private val q11Sql =
    """SELECT c_custkey FROM (
      |  ((SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |    UNION
      |    SELECT c_custkey FROM customer WHERE c_acctbal > 8000)
      |   EXCEPT
      |   SELECT c_custkey FROM customer WHERE c_nationkey < 3)
      |  INTERSECT
      |  SELECT c_custkey FROM customer WHERE c_custkey % 3 <> 0
      |) t
      |ORDER BY c_custkey""".stripMargin

  /** ROLLUP with grouping-null keys projected away via COALESCE so the
    * oracle compare never sees engine-specific null ordering.
    */
  private def q12(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables
      .lineitem(s, d)
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(sum($"l_quantity").as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
        coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
        $"sum_qty",
        $"n",
      )
      .orderBy($"returnflag", $"linestatus")
  }

  private val q12Sql =
    """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
      |       COALESCE(l_linestatus, 'ALL') AS linestatus,
      |       SUM(l_quantity) AS sum_qty, COUNT(*) AS n
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY returnflag, linestatus""".stripMargin

  /** Conditional aggregation: SUM(CASE WHEN) / COUNT(CASE WHEN) — stays in
    * one hash-agg pass (no per-branch scans).
    */
  private def q13(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables
      .lineitem(s, d)
      .groupBy($"l_returnflag")
      .agg(
        round(
          sum(
            when(
              $"l_discount" > 0.05,
              $"l_extendedprice" * (lit(1.0) - $"l_discount"),
            ).otherwise(lit(0.0))
          ),
          4,
        ).as("high_disc_rev"),
        count(when($"l_quantity" >= 25, lit(1))).as("big_lines"),
        count(lit(1)).as("n"),
      )
      .orderBy($"l_returnflag")
  }

  private val q13Sql =
    """SELECT l_returnflag,
      |  ROUND(SUM(CASE WHEN l_discount > 0.05
      |            THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END), 4)
      |    AS high_disc_rev,
      |  COUNT(CASE WHEN l_quantity >= 25 THEN 1 END) AS big_lines,
      |  COUNT(*) AS n
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** Date bucketing: month-truncated revenue series. */
  private def q14(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables
      .orders(s, d)
      .groupBy(
        date_trunc("month", $"o_orderdate").cast("date").as("month")
      )
      .agg(
        round(sum($"o_totalprice"), 2).as("revenue"),
        count(lit(1)).as("n_orders"),
      )
      .orderBy($"month")
  }

  private val q14Sql =
    """SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month,
      |  ROUND(SUM(o_totalprice), 2) AS revenue,
      |  COUNT(*) AS n_orders
      |FROM orders
      |GROUP BY 1
      |ORDER BY month""".stripMargin

  /** String functions: LIKE pushdown + upper/length/substring in the agg. */
  private def q15(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables
      .part(s, d)
      .filter($"p_name".like("%a%"))
      .groupBy(substring($"p_type", 1, 4).as("type_prefix"))
      .agg(
        min(length($"p_name")).cast("long").as("min_name_len"),
        max(upper($"p_brand")).as("max_brand_uc"),
        count(lit(1)).as("n"),
      )
      .orderBy($"type_prefix")
  }

  private val q15Sql =
    """SELECT SUBSTRING(p_type, 1, 4) AS type_prefix,
      |  MIN(LENGTH(p_name)) AS min_name_len,
      |  MAX(UPPER(p_brand)) AS max_brand_uc,
      |  COUNT(*) AS n
      |FROM part
      |WHERE p_name LIKE '%a%'
      |GROUP BY 1
      |ORDER BY type_prefix""".stripMargin

  /** Scalar "subquery" kept declarative: the 1-row aggregate is broadcast
    * and cross-joined instead of collected to the driver, so the plan stays
    * fully distributed.
    */
  private def q16(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, d)
    val thr = o.agg((avg($"o_totalprice") * 1.5).as("thr"))
    o.join(broadcast(thr))
      .filter($"o_totalprice" > $"thr")
      .select($"o_orderkey", $"o_totalprice")
      .orderBy($"o_orderkey")
  }

  private val q16Sql =
    """SELECT o_orderkey, o_totalprice
      |FROM orders
      |WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.5 FROM orders)
      |ORDER BY o_orderkey""".stripMargin

  /** Correlated-subquery shape solved with a window (one pass, no
    * self-join): lineitems far above their own order's mean quantity.
    * Quantities are integer-valued doubles → the window AVG is exact and
    * the predicate is bit-identical across engines.
    */
  private def q17(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"l_orderkey")
    Tables
      .lineitem(s, d)
      .withColumn("avg_qty", avg($"l_quantity").over(w))
      .filter($"l_quantity" > $"avg_qty" * 1.9)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity")
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  private val q17Sql =
    """SELECT l_orderkey, l_linenumber, l_quantity FROM (
      |  SELECT l_orderkey, l_linenumber, l_quantity,
      |    AVG(l_quantity) OVER (PARTITION BY l_orderkey) AS avg_qty
      |  FROM lineitem) t
      |WHERE l_quantity > avg_qty * 1.9
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** CUBE over two dimensions with grouping-null keys coalesced (same
    * reasoning as q12's ROLLUP).
    */
  private def q18(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables
      .orders(s, d)
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(round(sum($"o_totalprice"), 2).as("revenue"),
        count(lit(1)).as("n"))
      .select(
        coalesce($"o_orderstatus", lit("ALL")).as("status"),
        coalesce($"o_orderpriority", lit("ALL")).as("priority"),
        $"revenue",
        $"n",
      )
      .orderBy($"status", $"priority")
  }

  private val q18Sql =
    """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
      |       COALESCE(o_orderpriority, 'ALL') AS priority,
      |       ROUND(SUM(o_totalprice), 2) AS revenue, COUNT(*) AS n
      |FROM orders
      |GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin

  /** Sketch aggregation: HyperLogLog++ approximate distinct counts —
    * the cardinality operator that stays O(1) memory at 100 TB. No SQL
    * oracle (DuckDB's approx sketch differs); the exact counterpart is
    * q08. Deterministic for a fixed input, so the rows-only check is
    * stable.
    */
  private def q19(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables
      .lineitem(s, d)
      .groupBy($"l_returnflag")
      .agg(
        approx_count_distinct($"l_orderkey", rsd = 0.01)
          .as("approx_orders"),
        approx_count_distinct($"l_partkey", rsd = 0.01).as("approx_parts"),
        count(lit(1)).as("n"),
      )
      .orderBy($"l_returnflag")
  }

  /** Range join (equi key + date-range predicate): lineitems shipped
    * within 30 days of their order's date. Catalyst plans the equi key
    * as a normal join with the range as a post-condition — no
    * nested-loop blowup.
    */
  private def q27(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, d)
    Tables
      .lineitem(s, d)
      .join(
        o,
        $"l_orderkey" === $"o_orderkey" &&
          $"l_shipdate" >= $"o_orderdate" &&
          $"l_shipdate" < $"o_orderdate" + expr("INTERVAL 30 DAYS"),
      )
      .groupBy($"o_orderpriority")
      .agg(
        count(lit(1)).as("n_fast_lines"),
        sum($"l_quantity").as("sum_qty"),
      )
      .orderBy($"o_orderpriority")
  }

  private val q27Sql =
    """SELECT o_orderpriority, COUNT(*) AS n_fast_lines,
      |  SUM(l_quantity) AS sum_qty
      |FROM lineitem JOIN orders
      |  ON l_orderkey = o_orderkey
      | AND l_shipdate >= o_orderdate
      | AND l_shipdate < o_orderdate + INTERVAL 30 DAY
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** lead/lag + date arithmetic: inter-order gap in days per customer. */
  private def q28(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate",
      $"o_orderkey")
    Tables
      .orders(s, d)
      .withColumn("prev_date", lag($"o_orderdate", 1).over(w))
      .withColumn("gap_days",
        datediff($"o_orderdate".cast("date"), $"prev_date".cast("date")))
      .filter($"gap_days".isNotNull)
      .groupBy($"o_custkey")
      .agg(
        count(lit(1)).as("n_gaps"),
        round(avg($"gap_days"), 4).as("avg_gap_days"),
        max($"gap_days").cast("long").as("max_gap_days"),
      )
      .orderBy($"o_custkey")
  }

  private val q28Sql =
    """SELECT o_custkey, COUNT(*) AS n_gaps,
      |  ROUND(AVG(gap_days), 4) AS avg_gap_days,
      |  MAX(gap_days) AS max_gap_days
      |FROM (
      |  SELECT o_custkey,
      |    date_diff('day',
      |      CAST(LAG(o_orderdate) OVER (PARTITION BY o_custkey
      |        ORDER BY o_orderdate, o_orderkey) AS DATE),
      |      CAST(o_orderdate AS DATE)) AS gap_days
      |  FROM orders) t
      |WHERE gap_days IS NOT NULL
      |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  /** Exact quantiles (linear interpolation) per group — Spark's exact
    * `percentile` vs DuckDB's `quantile_cont`.
    */
  private def q29(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables
      .orders(s, d)
      .groupBy($"o_orderstatus")
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
        count(lit(1)).as("n"),
      )
      .orderBy($"o_orderstatus")
  }

  private val q29Sql =
    """SELECT o_orderstatus,
      |  ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
      |  ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90,
      |  COUNT(*) AS n
      |FROM orders
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Pivot (fixed value list → static schema, so the oracle's CASE-sum
    * formulation matches column-for-column).
    */
  private def q43(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables
      .lineitem(s, d)
      .groupBy($"l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(sum($"l_quantity"))
      .select(
        $"l_returnflag",
        coalesce($"F", lit(0.0)).as("qty_f"),
        coalesce($"O", lit(0.0)).as("qty_o"),
      )
      .orderBy($"l_returnflag")
  }

  private val q43Sql =
    """SELECT l_returnflag,
      |  COALESCE(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 0.0)
      |    AS qty_f,
      |  COALESCE(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 0.0)
      |    AS qty_o
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** posexplode over the embedding arrays: per-dimension mean across the
    * corpus (array → rows with ordinality).
    */
  private def q44(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables
      .embeddings(s, d)
      .select(posexplode($"embedding").as(Seq("dim", "x")))
      // quantize each float to exact integer micro-units BEFORE the
      // sum: a rounded double AVG lost parity at sf0.1 when one dim's
      // mean landed within a summation-order half-ulp of the 4dp grid.
      // float32→double is exact, so the per-element ROUND is identical
      // on both engines, and integer sums are association-free.
      .withColumn("x_e6", round($"x".cast("double") * 1e6).cast("long"))
      .groupBy($"dim".cast("long").as("dim")) // int64: exact dtype parity with the oracle
      .agg(
        (sum($"x_e6").cast("double") /
          (count(lit(1)) * lit(1000000L)).cast("double")).as("avg_x"),
        count(lit(1)).as("n"),
      )
      .orderBy($"dim")
  }

  private val q44Sql =
    """SELECT i - 1 AS dim,
      |  CAST(CAST(SUM(x_e6) AS BIGINT) AS DOUBLE)
      |    / CAST(COUNT(*) * 1000000 AS DOUBLE) AS avg_x,
      |  COUNT(*) AS n
      |FROM (SELECT CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT)
      |          AS x_e6, i
      |      FROM (SELECT unnest(embedding) AS x,
      |              generate_subscripts(embedding, 1) AS i
      |            FROM embeddings) t0) t
      |GROUP BY 1 ORDER BY dim""".stripMargin

  /** Regex extraction: first word of p_type as a derived dimension. */
  private def q45(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables
      .part(s, d)
      .groupBy(regexp_extract($"p_type", "^(\\w+)", 1).as("type_head"))
      .agg(
        count(lit(1)).as("n"),
        round(avg($"p_retailprice"), 4).as("avg_price"),
      )
      .orderBy($"type_head")
  }

  private val q45Sql =
    """SELECT regexp_extract(p_type, '^(\w+)', 1) AS type_head,
      |  COUNT(*) AS n,
      |  ROUND(AVG(p_retailprice), 4) AS avg_price
      |FROM part
      |GROUP BY 1 ORDER BY type_head""".stripMargin

  /** Skew-salted fact⋈dim join under the driver harness: plan-wise the
    * salted join fans each hot l_suppkey over 16 sub-keys (the 100 TB
    * skew fix); the oracle is the PLAIN SQL join, so the driver check
    * proves salted ≡ unsalted. The row-id for salt derivation is the
    * lineitem natural key (orderkey, linenumber) — deterministic, never
    * rand(). Revenue rounds at 4 dp, the intrinsic grid of
    * price(2dp)×discount(2dp).
    */
  private def q47(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val fact = Tables.lineitem(s, d)
      .withColumn("_rid", concat_ws("_", $"l_orderkey", $"l_linenumber"))
    val dim = Tables.supplier(s, d)
      .withColumnRenamed("s_suppkey", "l_suppkey")
    Salting.saltedJoin(fact, dim, key = "l_suppkey", rowIdCol = "_rid",
        salts = 16)
      .groupBy($"s_nationkey")
      .agg(
        count(lit(1)).as("n_items"),
        // integer 1e4-grid units — same scale-parity rationale as q05
        (sum(round($"l_extendedprice" * 100).cast("long") *
          (lit(100L) - round($"l_discount" * 100).cast("long")))
          .cast("double") / 1e4).as("revenue"),
      )
      .orderBy($"s_nationkey")
  }

  private val q47Sql =
    """SELECT s_nationkey, COUNT(*) AS n_items,
      |  CAST(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) *
      |    (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT)
      |    AS DOUBLE) / 10000.0 AS revenue
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin

  /** Statistical moment aggregates: corr / covar / stddev plus Spark's
    * POPULATION skewness and excess kurtosis. DuckDB's builtin
    * skewness/kurtosis are sample-bias-corrected (different estimator),
    * so the oracle states Spark's definition directly from central
    * moments (windowed group mean → avg of powered deviations) rather
    * than pretending the builtins agree. All single-pass hash aggs on
    * the Spark side.
    */
  private def q57(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables
      .lineitem(s, d)
      .groupBy($"l_returnflag")
      .agg(
        round(corr($"l_quantity", $"l_extendedprice"), 6)
          .as("corr_qty_price"),
        round(covar_samp($"l_quantity", $"l_extendedprice"), 4)
          .as("covar_qty_price"),
        round(stddev_samp($"l_quantity"), 6).as("std_qty"),
        round(skewness($"l_quantity"), 6).as("skew_qty"),
        round(kurtosis($"l_quantity"), 6).as("kurt_qty"),
        count(lit(1)).as("n"),
      )
      .orderBy($"l_returnflag")
  }

  private val q57Sql =
    """SELECT l_returnflag,
      |  ROUND(corr(x, y), 6) AS corr_qty_price,
      |  ROUND(covar_samp(x, y), 4) AS covar_qty_price,
      |  ROUND(stddev_samp(x), 6) AS std_qty,
      |  ROUND(AVG(dx*dx*dx) / POW(AVG(dx*dx), 1.5), 6) AS skew_qty,
      |  ROUND(AVG(dx*dx*dx*dx) / POW(AVG(dx*dx), 2) - 3, 6) AS kurt_qty,
      |  COUNT(*) AS n
      |FROM (SELECT l_returnflag, l_quantity AS x, l_extendedprice AS y,
      |        l_quantity - AVG(l_quantity)
      |          OVER (PARTITION BY l_returnflag) AS dx
      |      FROM lineitem) t
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q123: per-group linear TREND via the regression aggregates
    * (`regr_slope`/`regr_intercept`/`regr_r2`) — the drift-detection QC
    * every long-running feed wants ("is this metric moving?") as one
    * mergeable aggregate per group, no windowing, no model library:
    * cents regressed on hours-since-first-event per event type. The
    * regressor is CENTERED per group (hours since the group's own min,
    * via a window min on the same event_type shuffle the aggregate
    * needs anyway) — at epoch-scale x the co-moment cancellation would
    * eat the 6-decimal rounding margin; centered, both engines agree to
    * ~1e-12 relative and the q57 rounding discipline holds. regr_* are
    * plain co-moment aggregates, so the plan is the usual
    * partial+final hash-agg — mergeable at any parallelism.
    */
  private def q123(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"event_type")
    Tables
      .events(s, d)
      .select($"event_type", unix_micros($"ts").as("us"),
        expr("CAST(ROUND(value * 100) AS LONG)").cast("double").as("y"))
      .withColumn("x", ($"us" - min($"us").over(w)) / 3600000000.0)
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n"),
        round(regr_slope($"y", $"x"), 6).as("slope_cents_per_hr"),
        round(regr_intercept($"y", $"x"), 4).as("intercept_cents"),
        round(regr_r2($"y", $"x"), 6).as("r2"),
      )
      .orderBy($"event_type")
  }

  private val q123Sql =
    """WITH e AS (SELECT event_type,
      |    (epoch_us(ts) - MIN(epoch_us(ts))
      |       OVER (PARTITION BY event_type)) / 3600000000.0 AS x,
      |    CAST(ROUND(value * 100) AS BIGINT) AS y
      |  FROM events)
      |SELECT event_type, COUNT(*) AS n,
      |  ROUND(regr_slope(y, x), 6) AS slope_cents_per_hr,
      |  ROUND(regr_intercept(y, x), 4) AS intercept_cents,
      |  ROUND(regr_r2(y, x), 6) AS r2
      |FROM e GROUP BY 1 ORDER BY event_type""".stripMargin

  /** Distribution windows: ntile / percent_rank / cume_dist over a fully
    * tie-broken ordering (acctbal DESC, custkey — rank functions are only
    * cross-engine-deterministic under a total order), folded to quartile
    * profiles per market segment.
    */
  private def q58(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window
      .partitionBy($"c_mktsegment")
      .orderBy($"c_acctbal".desc, $"c_custkey")
    Tables
      .customer(s, d)
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .withColumn("pr", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
      .groupBy($"c_mktsegment", $"quartile")
      .agg(
        count(lit(1)).as("n"),
        round(avg($"c_acctbal"), 4).as("avg_bal"),
        round(max($"pr"), 6).as("max_pct_rank"),
        round(max($"cd"), 6).as("max_cume_dist"),
      )
      .orderBy($"c_mktsegment", $"quartile")
  }

  private val q58Sql =
    """SELECT c_mktsegment, quartile, COUNT(*) AS n,
      |  ROUND(AVG(c_acctbal), 4) AS avg_bal,
      |  ROUND(MAX(pr), 6) AS max_pct_rank,
      |  ROUND(MAX(cd), 6) AS max_cume_dist
      |FROM (
      |  SELECT c_mktsegment, c_acctbal,
      |    CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      |    percent_rank() OVER w AS pr,
      |    cume_dist() OVER w AS cd
      |  FROM customer
      |  WINDOW w AS (PARTITION BY c_mktsegment
      |               ORDER BY c_acctbal DESC, c_custkey)) t
      |GROUP BY c_mktsegment, quartile
      |ORDER BY c_mktsegment, quartile""".stripMargin

  /** GROUPING SETS beyond rollup/cube (q12/q18): an explicit lattice
    * subset with `grouping()` null-markers — Catalyst plans one Expand +
    * hash-agg, the same single-shuffle shape as rollup.
    */
  private def q59(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d).createOrReplaceTempView("graft_q59_lineitem")
    s.sql(
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
        |  COALESCE(l_linestatus, 'ALL') AS ls,
        |  CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
        |  CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
        |  COUNT(*) AS n, SUM(l_quantity) AS sum_qty
        |FROM graft_q59_lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |                        (l_returnflag), (l_linestatus), ())
        |ORDER BY g_rf, g_ls, rf, ls""".stripMargin)
  }

  private val q59Sql =
    """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
      |  COALESCE(l_linestatus, 'ALL') AS ls,
      |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
      |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
      |  COUNT(*) AS n, SUM(l_quantity) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
      |                        (l_returnflag), (l_linestatus), ())
      |ORDER BY g_rf, g_ls, rf, ls""".stripMargin

  /** q67: FULL OUTER merge of two daily aggregates — order counts by
    * order date vs shipment counts by ship date. Ship dates run past the
    * last order date (and vice versa at the epoch edges), so both outer
    * sides are genuinely exercised; the USING join coalesces the key and
    * a provenance marker records which side(s) produced each day. The
    * upsert/reconciliation shape: align two independently-aggregated
    * ledgers on a shared key without dropping either side's tail.
    *
    * Scale: both inputs are already one hash-agg each (map-side combine),
    * so the outer join runs on two day-cardinality relations — tiny
    * regardless of fact-table size.
    */
  private def q67(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val o = Tables
      .orders(s, d)
      .groupBy($"o_orderdate".as("day"))
      .agg(count(lit(1)).as("n_orders"))
    val l = Tables
      .lineitem(s, d)
      .groupBy($"l_shipdate".as("day"))
      .agg(count(lit(1)).as("n_ships"))
    o.join(l, Seq("day"), "full")
      .select(
        $"day",
        when($"n_orders".isNull, "ship_only")
          .when($"n_ships".isNull, "order_only")
          .otherwise("both")
          .as("src"),
        coalesce($"n_orders", lit(0L)).as("n_orders"),
        coalesce($"n_ships", lit(0L)).as("n_ships"),
      )
      .orderBy($"day")
  }

  private val q67Sql =
    """SELECT day,
      |  CASE WHEN n_orders IS NULL THEN 'ship_only'
      |       WHEN n_ships IS NULL THEN 'order_only'
      |       ELSE 'both' END AS src,
      |  COALESCE(n_orders, 0) AS n_orders,
      |  COALESCE(n_ships, 0) AS n_ships
      |FROM (SELECT o_orderdate AS day, COUNT(*) AS n_orders
      |      FROM orders GROUP BY 1) o
      |FULL JOIN (SELECT l_shipdate AS day, COUNT(*) AS n_ships
      |           FROM lineitem GROUP BY 1) l USING (day)
      |ORDER BY day""".stripMargin

  /** q70: window VALUE functions — first/last/nth order date per
    * customer over an unbounded frame with a unique tie-break
    * (`o_orderdate, o_orderkey`), collapsed to one row per customer via
    * DISTINCT (every row in a partition carries identical frame values,
    * so DISTINCT is exact, not a sample). `nth_value(_, 2)` is NULL for
    * single-order customers — the null-propagation case the compare
    * locks down.
    */
  private def q70(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window
      .partitionBy($"o_custkey")
      .orderBy($"o_orderdate", $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables
      .orders(s, d)
      .select(
        $"o_custkey",
        first($"o_orderdate").over(w).as("first_day"),
        nth_value($"o_orderdate", 2).over(w).as("second_day"),
        last($"o_orderdate").over(w).as("last_day"),
        count(lit(1)).over(w).as("n_orders"),
      )
      .distinct()
      .orderBy($"o_custkey")
  }

  private val q70Sql =
    """SELECT DISTINCT o_custkey,
      |  FIRST_VALUE(o_orderdate) OVER w AS first_day,
      |  NTH_VALUE(o_orderdate, 2) OVER w AS second_day,
      |  LAST_VALUE(o_orderdate) OVER w AS last_day,
      |  COUNT(*) OVER w AS n_orders
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey
      |  ORDER BY o_orderdate, o_orderkey
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_custkey""".stripMargin

  /** q71: incremental aggregation — maintain a monthly revenue rollup by
    * merging two independently-computed partial aggregates (a "base"
    * history and a "delta" of new data) instead of re-scanning history.
    * The incremental-view-maintenance shape: at 100 TB you aggregate
    * yesterday's partition and MERGE it into the materialized rollup;
    * count/sum merge by re-aggregation because they are associative.
    * Money is summed in integer cents (`round(price*100)` → BIGINT), so
    * base+delta merge is bit-exact regardless of association order — a
    * double sum would differ in the last ulp between the merged and the
    * one-pass plan. The oracle is the ONE-PASS aggregate: passing proves
    * the incremental plan equals the full recomputation.
    */
  private def q71(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    def partial(df: DataFrame): DataFrame = df
      .groupBy(date_trunc("month", $"o_orderdate").cast("date").as("month"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(round($"o_totalprice" * 100).cast("long")).as("revenue_cents"),
      )
    val orders = Tables.orders(s, d)
    val base  = partial(orders.filter($"o_orderdate" < "1998-01-01"))
    val delta = partial(orders.filter($"o_orderdate" >= "1998-01-01"))
    base
      .unionByName(delta)
      .groupBy($"month")
      .agg(
        sum($"n_orders").as("n_orders"),
        sum($"revenue_cents").as("revenue_cents"),
      )
      .orderBy($"month")
  }

  private val q71Sql =
    """SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |    AS revenue_cents
      |FROM orders
      |GROUP BY 1 ORDER BY month""".stripMargin

  /** q72: approximate quantiles — the sketch-based scale path next to
    * q29's exact percentiles (same pairing as q19's HLL next to q08's
    * exact distinct). `percentile_approx` (GK sketch) is mergeable
    * state: at 100 TB each partition builds a bounded sketch and the
    * merge is one small shuffle, where exact percentiles must shuffle
    * the full column. No DuckDB oracle (its approx_quantile is t-digest
    * — different sketch, different answers by design); Round3Spec bounds
    * the rank error against the exact quantiles instead. The three
    * quantiles ship as scalar columns (element_at), not the raw array:
    * the driver's pandas row-sort/hash path can't hash an ndarray cell,
    * and scalars keep the no-oracle row count/schema record clean.
    */
  private def q72(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables
      .lineitem(s, d)
      .groupBy($"l_returnflag")
      .agg(
        percentile_approx($"l_extendedprice",
          array(lit(0.25), lit(0.5), lit(0.75)), lit(10000))
          .as("aq"),
        count(lit(1)).as("n"),
      )
      .select(
        $"l_returnflag",
        element_at($"aq", 1).as("p25"),
        element_at($"aq", 2).as("p50"),
        element_at($"aq", 3).as("p75"),
        $"n",
      )
      .orderBy($"l_returnflag")
  }

  /** q74: NULL semantics, locked cross-engine — the silent-corruption
    * corner of every engine port. Derives nullable columns with NULLIF,
    * then checks in one query: a NULL grouping key forms its own group;
    * `COUNT(*)` vs `COUNT(col)` vs `COUNT(DISTINCT col)` (the latter two
    * skip NULLs); conditional counts of `IS NULL`; `MAX` over a group
    * whose values are all NULL returns NULL (not a crash or a default);
    * and ordering is pinned with an explicit NULLS FIRST (Spark's ASC
    * default is nulls-first, DuckDB's is nulls-LAST — left implicit,
    * the hash compare would order-split).
    */
  private def q74(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables
      .orders(s, d)
      .withColumn("prio_n", expr("nullif(o_orderpriority, '1-URGENT')"))
      .groupBy(expr("nullif(o_orderstatus, 'F')").as("status_n"))
      .agg(
        count(lit(1)).as("n"),
        count($"prio_n").as("n_nonnull"),
        count_distinct($"prio_n").as("n_distinct_prio"),
        count(when($"prio_n".isNull, lit(1))).as("n_null_prio"),
        max(when($"prio_n".isNull, $"prio_n")).as("all_null_max"),
        max($"prio_n").as("max_prio"),
      )
      .orderBy($"status_n".asc_nulls_first)
  }

  private val q74Sql =
    """SELECT NULLIF(o_orderstatus, 'F') AS status_n,
      |  COUNT(*) AS n,
      |  COUNT(prio_n) AS n_nonnull,
      |  COUNT(DISTINCT prio_n) AS n_distinct_prio,
      |  COUNT(CASE WHEN prio_n IS NULL THEN 1 END) AS n_null_prio,
      |  MAX(CASE WHEN prio_n IS NULL THEN prio_n END) AS all_null_max,
      |  MAX(prio_n) AS max_prio
      |FROM (SELECT o_orderstatus,
      |        NULLIF(o_orderpriority, '1-URGENT') AS prio_n
      |      FROM orders) t
      |GROUP BY 1 ORDER BY status_n NULLS FIRST""".stripMargin

  /** q103: null-safe equality join (`<=>` / IS NOT DISTINCT FROM) — the
    * join-side companion of q74's null semantics: under plain `=` a NULL
    * key matches nothing (those rows silently vanish from an inner
    * join), under null-safe equality NULL matches NULL and forms a real
    * group. Catalyst treats `EqualNullSafe` as an equi-join key, so the
    * plan stays a hash/broadcast join — NOT a nested loop — which is
    * what makes the operator usable at scale; the orderNulls dim here is
    * broadcast. The oracle uses IS NOT DISTINCT FROM; a plain-equality
    * plan would drop the NULL group and fail the row-count compare.
    */
  private def q103(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val o = Tables
      .orders(s, d)
      .withColumn("pk", expr("nullif(o_orderpriority, '1-URGENT')"))
    val dim = o
      .select($"pk".as("dk")).distinct()
      .withColumn("dim_label", coalesce($"dk", lit("URGENT(NULL)")))
    o.join(broadcast(dim), $"pk" <=> $"dk")
      .groupBy($"dim_label")
      .agg(
        count(lit(1)).as("n_orders"),
        sum(round($"o_totalprice" * 100).cast("long")).as("cents"),
      )
      .orderBy($"dim_label")
  }

  private val q103Sql =
    """WITH o AS (
      |  SELECT o_totalprice,
      |    NULLIF(o_orderpriority, '1-URGENT') AS pk
      |  FROM orders),
      |dim AS (
      |  SELECT DISTINCT pk AS dk,
      |    COALESCE(pk, 'URGENT(NULL)') AS dim_label
      |  FROM o)
      |SELECT dim_label, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |    AS cents
      |FROM o JOIN dim ON o.pk IS NOT DISTINCT FROM dim.dk
      |GROUP BY dim_label ORDER BY dim_label""".stripMargin

  /** q78: percent-of-total in integer BASIS POINTS, overflow-free at any
    * scale: `share_bp = cents DIV (total DIV 10000)` never multiplies a
    * corpus-sized sum (the textbook `(10000·x) DIV total` overflows
    * BIGINT once total passes ~9e14 cents — real at 100 TB). Total
    * revenue arrives as a broadcast 1-row aggregate, not an
    * unpartitioned window over the whole result.
    */
  private def q78(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cents = Tables
      .lineitem(s, d)
      .join(broadcast(Tables.part(s, d)), $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand")
      .agg(sum(round($"l_extendedprice" * 100).cast("long")).as("cents"))
    val total = cents.agg(sum($"cents").as("total_cents"))
    cents
      .crossJoin(broadcast(total))
      .select($"p_brand", $"cents",
        expr("cents DIV (total_cents DIV 10000)").as("share_bp"))
      .orderBy($"p_brand")
  }

  private val q78Sql =
    """WITH b AS (
      |  SELECT p_brand,
      |    CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  GROUP BY p_brand),
      |t AS (SELECT CAST(SUM(cents) AS BIGINT) AS total_cents FROM b)
      |SELECT p_brand, cents,
      |  CAST(cents // (total_cents // 10000) AS BIGINT) AS share_bp
      |FROM b, t ORDER BY p_brand""".stripMargin

  /** q80: correlated-aggregate decorrelation — orders strictly above
    * their own customer's average order value. The textbook form is a
    * correlated scalar subquery (the oracle states exactly that); the
    * Spark plan is the decorrelated single-shuffle form: both the
    * customer total and the customer count come from ONE window over
    * `o_custkey`, so there is no self-join and the fact table moves
    * once. The comparison is integer cross-multiplied
    * (`cents · n > sum_cents`, never `price > avg`): an average is a
    * division whose last ulp depends on engine summation order, and a
    * strict inequality on it would flip rows at scale.
    */
  private def q80(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
    Tables
      .orders(s, d)
      .withColumn("cents", round($"o_totalprice" * 100).cast("long"))
      .withColumn("cust_cents", sum($"cents").over(w))
      .withColumn("cust_n", count(lit(1)).over(w))
      .filter($"cents" * $"cust_n" > $"cust_cents")
      .groupBy($"o_orderpriority")
      .agg(
        count(lit(1)).as("n_above"),
        // decimal accumulator: same association-free exactness, int64
        // headroom bound (≈9e16 dollars) removed — see q01's note
        (sum($"cents".cast("decimal(38,0)")).cast("double") / 100.0)
          .as("sum_above"),
      )
      .orderBy($"o_orderpriority")
  }

  private val q80Sql =
    """WITH o AS (SELECT o_orderpriority, o_custkey,
      |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders)
      |SELECT o_orderpriority, COUNT(*) AS n_above,
      |  CAST(CAST(SUM(cents) AS BIGINT) AS DOUBLE) / 100.0 AS sum_above
      |FROM o
      |WHERE cents * (SELECT COUNT(*) FROM o o2
      |               WHERE o2.o_custkey = o.o_custkey)
      |    > (SELECT CAST(SUM(cents) AS BIGINT) FROM o o3
      |       WHERE o3.o_custkey = o.o_custkey)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** q81: nested collection round-trip — per priority, collect the
    * distinct (order-year, order-count) pairs as an array of structs,
    * sort it, then flatten back out with `posexplode`. Exercises
    * `collect_list(struct)`, `sort_array`, and generator output in one
    * plan; the oracle rebuilds the same rows with a window ordinal.
    * The collected arrays stay bounded (one element per year per
    * priority — grouped BEFORE collecting), which is the only shape a
    * driver-side array aggregate is allowed to take at 100 TB: collect
    * aggregated keys, never raw rows.
    */
  private def q81(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables
      .orders(s, d)
      .groupBy($"o_orderpriority", year($"o_orderdate").as("y"))
      .agg(count(lit(1)).as("n"))
      .groupBy($"o_orderpriority")
      .agg(sort_array(collect_list(struct($"y", $"n"))).as("years"))
      .select($"o_orderpriority", posexplode($"years").as(Seq("pos", "e")))
      .select(
        $"o_orderpriority",
        $"pos".cast("long").as("pos"),
        $"e.y".cast("long").as("y"),
        $"e.n".as("n"),
      )
      .orderBy($"o_orderpriority", $"pos")
  }

  private val q81Sql =
    """WITH per_year AS (
      |  SELECT o_orderpriority, EXTRACT(year FROM o_orderdate) AS y,
      |    COUNT(*) AS n
      |  FROM orders GROUP BY 1, 2)
      |SELECT o_orderpriority,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY y)
      |    - 1 AS BIGINT) AS pos,
      |  CAST(y AS BIGINT) AS y, n
      |FROM per_year
      |ORDER BY o_orderpriority, pos""".stripMargin

  /** q84: schema-drift union — two supplier projections with different
    * column order, one missing a column, merged with
    * `unionByName(allowMissingColumns = true)` (position-blind, absent
    * columns null-filled — the ingestion posture for a corpus whose
    * shards were written by different pipeline versions). The aggregate
    * proves both the name-based alignment and the null fill.
    */
  private def q84(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val sup = Tables.supplier(s, d)
    val v1 = sup
      .filter($"s_suppkey" % 2 === 0)
      .select($"s_nationkey", $"s_suppkey", $"s_acctbal")
    val v2 = sup
      .filter($"s_suppkey" % 2 === 1)
      .select($"s_suppkey", $"s_nationkey") // reordered, acctbal absent
    v1.unionByName(v2, allowMissingColumns = true)
      .groupBy($"s_nationkey")
      .agg(
        count(lit(1)).as("n_rows"),
        count($"s_acctbal").as("n_with_bal"),
        sum(round($"s_acctbal" * 100).cast("long")).as("bal_cents"),
      )
      .orderBy($"s_nationkey")
  }

  private val q84Sql =
    """WITH u AS (
      |  SELECT s_nationkey, s_suppkey, s_acctbal
      |  FROM supplier WHERE s_suppkey % 2 = 0
      |  UNION ALL BY NAME
      |  SELECT s_suppkey, s_nationkey FROM supplier
      |  WHERE s_suppkey % 2 = 1)
      |SELECT s_nationkey, COUNT(*) AS n_rows,
      |  COUNT(s_acctbal) AS n_with_bal,
      |  CAST(SUM(CAST(ROUND(s_acctbal * 100) AS BIGINT)) AS BIGINT)
      |    AS bal_cents
      |FROM u GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin

  /** q93: unpivot (wide → long) — the inverse of q43's pivot, via the
    * dedicated `Dataset.unpivot` (MELT) operator. The wide side is a
    * small aggregate, so the reshape itself is a per-row expression
    * expansion (no shuffle); all measures are exact integers. The
    * oracle states the reshape as the dialect-portable UNION ALL.
    */
  private def q93(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables
      .lineitem(s, d)
      .groupBy($"l_returnflag")
      .agg(
        // cast BEFORE summing: values are exactly-integral doubles, so
        // both engines sum exact longs and the Spark-truncates vs
        // DuckDB-rounds cast-direction difference can't surface
        sum($"l_quantity".cast("long")).as("qty"),
        count(lit(1)).as("items"),
        countDistinct($"l_orderkey").as("orders"),
      )
      .unpivot(
        Array($"l_returnflag"),
        Array($"qty", $"items", $"orders"),
        "metric",
        "value",
      )
      .orderBy($"l_returnflag", $"metric")
  }

  private val q93Sql =
    """WITH w AS (SELECT l_returnflag,
      |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
      |    COUNT(*) AS items,
      |    COUNT(DISTINCT l_orderkey) AS orders
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, 'qty' AS metric, qty AS value FROM w
      |UNION ALL
      |SELECT l_returnflag, 'items', items FROM w
      |UNION ALL
      |SELECT l_returnflag, 'orders', orders FROM w
      |ORDER BY l_returnflag, metric""".stripMargin

  /** q136: RECURSIVE CTE hierarchy rollup — the Spark 4 `WITH
    * RECURSIVE` surface (the CONNECT-BY class of warehouse workload:
    * org charts, category trees, BOM walks) on a hierarchy derived
    * deterministically from the data: customer `key DIV 10` is the
    * parent, so every key walks a digit-tree to its leading-digit root.
    * Termination is STRUCTURAL, not fixture luck: depth = digit count,
    * log₁₀ of the key space — 7 levels at a hundred million customers,
    * far under the engine's recursion limit at any corpus size (the
    * property a recursive query must prove before it is allowed near
    * 100 TB; Spark supports UNION ALL recursion only, so an unbounded
    * fixpoint like connected components stays with q63's explicit
    * loop). Balance carried through the walk in integer cents; per-root
    * rollup: members, max depth, balance mass. DuckDB executes the
    * IDENTICAL recursion — both engines' recursive executors must agree
    * exactly.
    */
  private def q136(s: SparkSession, d: String): DataFrame =
    s.sql(
      s"""WITH RECURSIVE walk(key, anc, depth, cents) AS (
         |  SELECT c_custkey, c_custkey, 0,
         |         CAST(ROUND(c_acctbal * 100) AS BIGINT)
         |  FROM parquet.`$d/customer.parquet`
         |  UNION ALL
         |  SELECT key, anc DIV 10, depth + 1, cents
         |  FROM walk WHERE anc >= 10)
         |SELECT anc AS root,
         |  COUNT(*) AS n_members,
         |  CAST(MAX(depth) AS BIGINT) AS max_depth,
         |  CAST(SUM(cents) AS BIGINT) AS bal_cents
         |FROM walk WHERE anc < 10
         |GROUP BY anc ORDER BY root""".stripMargin)

  private val q136Sql =
    """WITH RECURSIVE walk(key, anc, depth, cents) AS (
      |  SELECT c_custkey, c_custkey, 0,
      |         CAST(ROUND(c_acctbal * 100) AS BIGINT)
      |  FROM customer
      |  UNION ALL
      |  SELECT key, anc // 10, depth + 1, cents
      |  FROM walk WHERE anc >= 10)
      |SELECT anc AS root,
      |  COUNT(*) AS n_members,
      |  CAST(MAX(depth) AS BIGINT) AS max_depth,
      |  CAST(SUM(cents) AS BIGINT) AS bal_cents
      |FROM walk WHERE anc < 10
      |GROUP BY anc ORDER BY root""".stripMargin

  /** q139: correlated LATERAL table subquery — the declarative
    * per-outer-row top-k (the CROSS APPLY class of workload), the
    * formulation q09's rank-window is the operational twin of: for each
    * region, the two nations with the largest customer balance mass,
    * expressed as a correlated subquery with its own ORDER BY + LIMIT.
    * Catalyst decorrelates the lateral into a joint plan rather than
    * re-executing the inner query per outer row — which is what makes
    * the shape admissible at scale (the outer side here is the 5-row
    * region dim, but the plan does not depend on that). Balance in
    * integer cents on the 2-decimal grid; ties broken by name so both
    * engines' LIMIT picks identical rows. DuckDB runs the IDENTICAL
    * LATERAL SQL — two independent decorrelation/execution strategies
    * must agree exactly.
    */
  private def q139(s: SparkSession, d: String): DataFrame =
    s.sql(
      s"""SELECT r.r_name, t.n_name, t.bal_cents
         |FROM parquet.`$d/region.parquet` r,
         |LATERAL (
         |  SELECT n.n_name,
         |    CAST(SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)) AS BIGINT)
         |      AS bal_cents
         |  FROM parquet.`$d/nation.parquet` n
         |  JOIN parquet.`$d/customer.parquet` c
         |    ON c.c_nationkey = n.n_nationkey
         |  WHERE n.n_regionkey = r.r_regionkey
         |  GROUP BY n.n_name
         |  ORDER BY bal_cents DESC, n.n_name
         |  LIMIT 2) t
         |ORDER BY r.r_name, t.bal_cents DESC, t.n_name""".stripMargin)

  private val q139Sql =
    """SELECT r.r_name, t.n_name, t.bal_cents
      |FROM region r,
      |LATERAL (
      |  SELECT n.n_name,
      |    CAST(SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)) AS BIGINT)
      |      AS bal_cents
      |  FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
      |  WHERE n.n_regionkey = r.r_regionkey
      |  GROUP BY n.n_name
      |  ORDER BY bal_cents DESC, n.n_name
      |  LIMIT 2) t
      |ORDER BY r.r_name, t.bal_cents DESC, t.n_name""".stripMargin

  /** q169: market-basket ASSOCIATION RULES — support / confidence /
    * lift over order baskets, the Apriori output everyone means by
    * "customers who bought X also bought Y", and a capability class
    * (affinity mining) the join/agg inventory did not yet cover. Pairs
    * come from a self-join INSIDE the order (baskets are bounded — the
    * q143 discipline, |basket|² per order, never corpus-wide), support
    * prunes before anything expensive, and confidence/lift are integer
    * ppm (`n_ab·10⁶ DIV n_a`, `n_ab·N·10⁶ DIV (n_a·n_b)`) so the
    * ranking is hash-exact. Top-20 by lift as TakeOrderedAndProject.
    */
  private def q169(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val items = Tables
      .lineitem(s, d)
      .select($"l_orderkey".as("okey"), $"l_partkey".as("part"))
      .distinct()
    val nOrders = Tables.orders(s, d)
      .agg(count(lit(1)).as("n_orders"))
    val itemN = items.groupBy($"part").agg(count(lit(1)).as("n_item"))
    val pairs = items
      .join(items.select($"okey", $"part".as("part_b")), Seq("okey"))
      .where($"part" < $"part_b")
      .groupBy($"part", $"part_b")
      .agg(count(lit(1)).as("n_ab"))
      .where($"n_ab" >= 3L) // support prune
    pairs
      .join(itemN.withColumnRenamed("n_item", "n_a"), Seq("part"))
      .join(itemN.select($"part".as("part_b"), $"n_item".as("n_b")),
        Seq("part_b"))
      .crossJoin(broadcast(nOrders)) // 1-row aggregate broadcast
      .withColumn("conf_ppm", expr("(n_ab * 1000000) DIV n_a"))
      .withColumn("lift_ppm",
        expr("(n_ab * n_orders * 1000000) DIV (n_a * n_b)"))
      .select($"part", $"part_b", $"n_ab", $"n_a", $"n_b",
        $"conf_ppm", $"lift_ppm")
      .orderBy($"lift_ppm".desc, $"part", $"part_b")
      .limit(20)
  }

  /** q176: RFM segmentation — the marketing-analytics quintile cube:
    * per customer, Recency (latest order date), Frequency (order
    * count), Monetary (total cents), each scored 1-5 and the base
    * rolled up per (r, f, m) cell (≤125 rows out of any corpus size).
    * Scores come from BROADCAST percentile thresholds
    * (`score = 1 + Σ(v > P20/40/60/80)`, q148's aggregate→broadcast→
    * codegen-comparison shape — ties land in one bucket together),
    * NOT from a global `ntile` window: ntile would drag every customer
    * row through a single partition, and the cross-engine exactness of
    * `percentile` ≡ `quantile_cont` is already certified by q29.
    */
  private def q176(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val per = Tables
      .orders(s, d)
      .groupBy($"o_custkey")
      .agg(
        max(unix_micros($"o_orderdate".cast("timestamp"))).as("last_us"),
        count(lit(1)).as("freq"),
        sum(expr("CAST(ROUND(o_totalprice * 100) AS LONG)")).as("cents"),
      )
    val cutCols =
      for (m <- Seq("last_us", "freq", "cents"); q <- Seq(2, 4, 6, 8))
        yield expr(s"percentile($m, 0.$q)").as(s"${m}_p$q")
    val cuts = per.agg(cutCols.head, cutCols.tail: _*)
    def score(m: String): org.apache.spark.sql.Column =
      lit(1) + Seq(2, 4, 6, 8)
        .map(q => when(col(m) > col(s"${m}_p$q"), 1).otherwise(0))
        .reduce(_ + _)
    per
      .crossJoin(broadcast(cuts)) // 1-row thresholds
      .withColumn("r", score("last_us"))
      .withColumn("f", score("freq"))
      .withColumn("m", score("cents"))
      .groupBy($"r", $"f", $"m")
      .agg(count(lit(1)).as("n_customers"), sum($"cents").as("cell_cents"))
      .orderBy($"r", $"f", $"m")
  }

  private val q176Sql = {
    val cuts = (for (m <- Seq("last_us", "freq", "cents"); q <- Seq(2, 4, 6, 8))
      yield s"quantile_cont($m, 0.$q) AS ${m}_p$q").mkString(", ")
    def score(m: String) =
      Seq(2, 4, 6, 8)
        .map(q => s"CASE WHEN $m > ${m}_p$q THEN 1 ELSE 0 END")
        .mkString("1 + ", " + ", "")
    s"""WITH per AS (
       |  SELECT o_custkey,
       |    MAX(epoch_us(o_orderdate)) AS last_us,
       |    COUNT(*) AS freq,
       |    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
       |      AS cents
       |  FROM orders GROUP BY o_custkey),
       |cuts AS (SELECT $cuts FROM per),
       |scored AS (
       |  SELECT cents,
       |    ${score("last_us")} AS r,
       |    ${score("freq")} AS f,
       |    ${score("cents")} AS m
       |  FROM per, cuts)
       |SELECT r, f, m, COUNT(*) AS n_customers,
       |  CAST(SUM(cents) AS BIGINT) AS cell_cents
       |FROM scored GROUP BY r, f, m ORDER BY r, f, m""".stripMargin
  }

  private val q169Sql =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey AS okey, l_partkey AS part
      |  FROM lineitem),
      |n AS (SELECT COUNT(*) AS n_orders FROM orders),
      |itemn AS (SELECT part, COUNT(*) AS n_item FROM items GROUP BY part),
      |pairs AS (
      |  SELECT a.part, b.part AS part_b, COUNT(*) AS n_ab
      |  FROM items a JOIN items b
      |    ON a.okey = b.okey AND a.part < b.part
      |  GROUP BY a.part, b.part
      |  HAVING COUNT(*) >= 3)
      |SELECT p.part, p.part_b, p.n_ab,
      |  ia.n_item AS n_a, ib.n_item AS n_b,
      |  (p.n_ab * 1000000) // ia.n_item AS conf_ppm,
      |  (p.n_ab * n.n_orders * 1000000) // (ia.n_item * ib.n_item)
      |    AS lift_ppm
      |FROM pairs p
      |JOIN itemn ia ON p.part = ia.part
      |JOIN itemn ib ON p.part_b = ib.part
      |CROSS JOIN n
      |ORDER BY lift_ppm DESC, p.part, p.part_b LIMIT 20""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("q01_pricing_summary", q01, Some(q01Sql)),
    QueryDef("q169_basket_rules", q169, Some(q169Sql)),
    QueryDef("q176_rfm_segments", q176, Some(q176Sql)),
    QueryDef("q02_selective_scan", q02, Some(q02Sql)),
    QueryDef("q03_topk_orders", q03, Some(q03Sql)),
    QueryDef("q04_brand_volume", q04, Some(q04Sql)),
    QueryDef("q05_star_revenue", q05, Some(q05Sql)),
    QueryDef("q06_semi_join", q06, Some(q06Sql)),
    QueryDef("q07_anti_join", q07, Some(q07Sql)),
    QueryDef("q08_distinct_agg", q08, Some(q08Sql)),
    QueryDef("q09_window_topk", q09, Some(q09Sql)),
    QueryDef("q10_running_sum", q10, Some(q10Sql)),
    QueryDef("q11_set_ops", q11, Some(q11Sql)),
    QueryDef("q12_rollup", q12, Some(q12Sql)),
    QueryDef("q13_case_agg", q13, Some(q13Sql)),
    QueryDef("q14_monthly_revenue", q14, Some(q14Sql)),
    QueryDef("q15_string_funcs", q15, Some(q15Sql)),
    QueryDef("q16_scalar_subquery", q16, Some(q16Sql)),
    QueryDef("q17_window_filter", q17, Some(q17Sql)),
    QueryDef("q18_cube", q18, Some(q18Sql)),
    QueryDef("q19_approx_distinct", q19, None),
    QueryDef("q27_range_join", q27, Some(q27Sql)),
    QueryDef("q28_order_gaps", q28, Some(q28Sql)),
    QueryDef("q29_quantiles", q29, Some(q29Sql)),
    QueryDef("q43_pivot", q43, Some(q43Sql)),
    QueryDef("q44_explode_dims", q44, Some(q44Sql)),
    QueryDef("q45_regexp_extract", q45, Some(q45Sql)),
    QueryDef("q47_salted_join", q47, Some(q47Sql)),
    QueryDef("q57_stats_moments", q57, Some(q57Sql)),
    QueryDef("q123_regr_trend", q123, Some(q123Sql)),
    QueryDef("q58_ntile_quartiles", q58, Some(q58Sql)),
    QueryDef("q59_grouping_sets", q59, Some(q59Sql)),
    QueryDef("q67_date_merge", q67, Some(q67Sql)),
    QueryDef("q70_order_milestones", q70, Some(q70Sql)),
    QueryDef("q71_incremental_agg", q71, Some(q71Sql)),
    QueryDef("q72_approx_quantiles", q72, None),
    QueryDef("q74_null_semantics", q74, Some(q74Sql)),
    QueryDef("q78_brand_share", q78, Some(q78Sql)),
    QueryDef("q80_above_cust_avg", q80, Some(q80Sql)),
    QueryDef("q81_collect_structs", q81, Some(q81Sql)),
    QueryDef("q84_union_by_name", q84, Some(q84Sql)),
    QueryDef("q93_unpivot", q93, Some(q93Sql)),
    QueryDef("q136_recursive_cte", q136, Some(q136Sql)),
    QueryDef("q139_lateral_topk", q139, Some(q139Sql)),
    QueryDef("q103_nullsafe_join", q103, Some(q103Sql)),
  )
}
