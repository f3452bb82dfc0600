package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Statistical inference over the `events` table — the experiment-readout
  * layer a product pipeline ends in (the reference generates streams FOR
  * learning systems, `README.md:3-6`, but ships no statistics: all three
  * operators here are ABSENT-IN-REF).
  *
  * The module's shared discipline: every stochastic or order-sensitive
  * quantity is derived from integer sums, md5 hex prefixes, or
  * identically-ordered IEEE double expressions, so the DuckDB oracle
  * hash-matches bit-for-bit — randomness is NEVER `rand()` (retry/
  * partition-layout unstable) but a hash of stable row identity, the
  * same device as q90's stratified sample.
  */
object Stats {

  private val centsExpr = "CAST(ROUND(value * 100) AS BIGINT)"

  /** q186: TWO-SAMPLE KOLMOGOROV–SMIRNOV statistic for every pair of
    * event types — "did these two segments draw `value` from the same
    * distribution?", the nonparametric companion to q185's t-test.
    *
    * The naive shape sorts both full samples per pair; the scale shape
    * is HISTOGRAM-FIRST (q156's value-domain trick): one hash aggregate
    * to (type, cent) counts — the only event-cardinality pass, map-side
    * combinable — then every downstream row count is bounded by the
    * value domain, not the row count. Each histogram row fans out to
    * its pairs via two broadcast equi-joins against the tiny pair dim
    * (never a non-equi join), cumulative counts run per pair over the
    * cent grid, and D = max|F_a − F_b| is carried as the INTEGER
    * cross-product |cumA·n_b − cumB·n_a| so the max is exact; the one
    * float division happens once per pair at the end. The type
    * dictionary is a bounded driver collect (5 values here; a dictionary
    * by construction), same discipline as the repo's other ≤2048-row
    * constants.
    */
  private def q186(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val hist = Tables
      .events(s, d)
      .select($"event_type".as("t"), expr(centsExpr).as("c"))
      .groupBy($"t", $"c")
      .agg(count(lit(1)).as("cnt"))
    val types = hist.select($"t").distinct().as[String].collect().sorted
    // `event_type` is a dictionary by schema contract; guard the
    // bounded-collect (and the |types|² pair fan-out) against a table
    // where it isn't
    require(types.length <= 2048,
      s"q186 pairs over ${types.length} types — event_type is not " +
        "dictionary-sized; the pair fan-out assumes it is")
    val pairs = for { a <- types; b <- types if a < b } yield (a, b)
    val pairsDf = s.createDataFrame(pairs).toDF("ta", "tb")
    val sideA = hist
      .join(broadcast(pairsDf), $"t" === $"ta")
      .select($"ta", $"tb", $"c", $"cnt".as("ca"), lit(0L).as("cb"))
    val sideB = hist
      .join(broadcast(pairsDf), $"t" === $"tb")
      .select($"ta", $"tb", $"c", lit(0L).as("ca"), $"cnt".as("cb"))
    val merged = sideA
      .unionAll(sideB)
      .groupBy($"ta", $"tb", $"c")
      .agg(sum($"ca").as("ca"), sum($"cb").as("cb"))
    val part = Window.partitionBy($"ta", $"tb")
    val runW = part.orderBy($"c")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    merged
      .withColumn("cuma", sum($"ca").over(runW))
      .withColumn("cumb", sum($"cb").over(runW))
      .withColumn("na", sum($"ca").over(part))
      .withColumn("nb", sum($"cb").over(part))
      .groupBy($"ta", $"tb")
      .agg(
        max($"na").as("n_a"),
        max($"nb").as("n_b"),
        max(abs($"cuma" * $"nb" - $"cumb" * $"na")).as("ks_scaled"),
      )
      .withColumn("ks_stat",
        round($"ks_scaled".cast("double") /
          ($"n_a" * $"n_b").cast("double"), 6))
      .orderBy($"ta", $"tb")
  }

  private val q186Sql =
    s"""WITH hist AS (
      |  SELECT event_type AS t, $centsExpr AS c, COUNT(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |types AS (SELECT DISTINCT t FROM hist),
      |pairs AS (
      |  SELECT a.t AS ta, b.t AS tb FROM types a JOIN types b
      |  ON a.t < b.t),
      |merged AS (
      |  SELECT ta, tb, c,
      |    CAST(SUM(ca) AS BIGINT) AS ca, CAST(SUM(cb) AS BIGINT) AS cb
      |  FROM (
      |    SELECT p.ta, p.tb, h.c, h.cnt AS ca, 0 AS cb
      |    FROM hist h JOIN pairs p ON h.t = p.ta
      |    UNION ALL
      |    SELECT p.ta, p.tb, h.c, 0 AS ca, h.cnt AS cb
      |    FROM hist h JOIN pairs p ON h.t = p.tb) u
      |  GROUP BY 1, 2, 3),
      |cum AS (
      |  SELECT ta, tb,
      |    SUM(ca) OVER (PARTITION BY ta, tb ORDER BY c
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
      |    SUM(cb) OVER (PARTITION BY ta, tb ORDER BY c
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb,
      |    SUM(ca) OVER (PARTITION BY ta, tb) AS na,
      |    SUM(cb) OVER (PARTITION BY ta, tb) AS nb
      |  FROM merged)
      |SELECT ta, tb,
      |  CAST(MAX(na) AS BIGINT) AS n_a,
      |  CAST(MAX(nb) AS BIGINT) AS n_b,
      |  CAST(MAX(ABS(cuma * nb - cumb * na)) AS BIGINT) AS ks_scaled,
      |  ROUND(CAST(MAX(ABS(cuma * nb - cumb * na)) AS DOUBLE) /
      |    CAST(MAX(na) * MAX(nb) AS DOUBLE), 6) AS ks_stat
      |FROM cum GROUP BY ta, tb ORDER BY ta, tb""".stripMargin

  /** q191: KMV (θ) SKETCH DISTINCT-INTERSECTION — estimated audience
    * overlap |users(a) ∩ users(b)| for every type pair from k-minimum-
    * value sketches. HLL (q19/q91) unions but cannot intersect; the KMV
    * sketch is the classic mergeable structure that can, and because
    * the sketch is a DETERMINISTIC function of the data (k smallest
    * md5(user_id) values — no seed, no layout dependence) the whole
    * estimator replays exactly in DuckDB: a rare fully ORACLE-GATED
    * sketch query (the other sketches are spec-gated, VERDICT r10).
    *
    * Shape: one (type, user) distinct — the only event-cardinality
    * shuffle — then `row_number() ≤ k` per type (WindowGroupLimit:
    * map-side bounded heaps, each task ships ≤ k rows per type), a
    * 5-row θ table broadcast both ways onto the sketch–sketch hash
    * equi-join, and the standard estimator |{h ∈ A∩B : h < θ_min}| /
    * θ_min with θ_min decoded from its first 8 hex nibbles into an
    * exact 32-bit integer (identical `instr` arithmetic in both
    * engines; one float division per pair). Pairs sharing no hash below
    * θ_min drop out — an empty estimate, stated.
    */
  private def q191(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val k = 64
    val sk = Tables
      .events(s, d)
      .select($"event_type".as("t"), $"user_id")
      .distinct()
      .withColumn("h", md5($"user_id".cast("string").cast("binary")))
      .withColumn("rk",
        row_number().over(Window.partitionBy($"t").orderBy($"h")))
      .filter($"rk" <= k)
    val theta = sk.groupBy($"t").agg(max($"h").as("theta"))
    val uInt = (1 to 8)
      .map(i =>
        s"(instr('0123456789abcdef', substr(thmin, $i, 1)) - 1) * " +
          s"${math.pow(16, 8 - i).toLong}L")
      .mkString(" + ")
    sk.as("a")
      .join(sk.as("b"), $"a.h" === $"b.h" && $"a.t" < $"b.t")
      .select($"a.t".as("ta"), $"b.t".as("tb"), $"a.h".as("h"))
      .join(broadcast(theta.select($"t".as("ta"), $"theta".as("tha"))),
        "ta")
      .join(broadcast(theta.select($"t".as("tb"), $"theta".as("thb"))),
        "tb")
      .withColumn("thmin", least($"tha", $"thb"))
      .filter($"h" < $"thmin")
      .groupBy($"ta", $"tb", $"thmin")
      .agg(count(lit(1)).as("n_common_below"))
      .withColumn("est_intersection",
        round($"n_common_below" * 4294967296.0 / expr(uInt), 2))
      .select($"ta", $"tb", $"n_common_below", $"est_intersection")
      .orderBy($"ta", $"tb")
  }

  private val q191Sql = {
    val uInt = (1 to 8)
      .map(i =>
        s"(instr('0123456789abcdef', substr(thmin, $i, 1)) - 1) * " +
          s"${math.pow(16, 8 - i).toLong}")
      .mkString(" + ")
    s"""WITH du AS (
      |  SELECT DISTINCT event_type AS t, user_id FROM events),
      |hashed AS (
      |  SELECT t, md5(CAST(user_id AS VARCHAR)) AS h FROM du),
      |sk AS (
      |  SELECT t, h FROM (
      |    SELECT t, h, ROW_NUMBER() OVER (PARTITION BY t ORDER BY h)
      |      AS rk FROM hashed) r
      |  WHERE rk <= 64),
      |theta AS (SELECT t, MAX(h) AS theta FROM sk GROUP BY t),
      |common AS (
      |  SELECT a.t AS ta, b.t AS tb,
      |    LEAST(tha.theta, thb.theta) AS thmin, a.h
      |  FROM sk a JOIN sk b ON a.h = b.h AND a.t < b.t
      |  JOIN theta tha ON tha.t = a.t
      |  JOIN theta thb ON thb.t = b.t
      |  WHERE a.h < LEAST(tha.theta, thb.theta)),
      |agg AS (
      |  SELECT ta, tb, thmin, COUNT(*) AS n_common_below
      |  FROM common GROUP BY ta, tb, thmin)
      |SELECT ta, tb, n_common_below,
      |  ROUND(n_common_below * 4294967296.0 / ($uInt), 2)
      |    AS est_intersection
      |FROM agg ORDER BY ta, tb""".stripMargin
  }

  /** q192: POISSON-BOOTSTRAP CONFIDENCE INTERVALS for the per-type mean
    * — the uncertainty readout (Efron bootstrap, streaming/Poissonized
    * variant: each row enters replicate r with weight ~ Poisson(1), so
    * no resampling pass ever materializes a resample). 32 replicates;
    * the interval is the order-statistic [2nd, 31st] of the replicate
    * means (a ~94% interval — stated, not a percentile interpolation).
    *
    * The replicate weight is DETERMINISTIC: u = first 8 hex nibbles of
    * md5(event_id ':' rep) compared against the precomputed hex
    * thresholds of the Poisson(1) CDF — pure string compares, zero
    * float ops, so both engines draw identical weights. The plan is one
    * scan with a 32× `explode(sequence(...))` fan-out that collapses
    * immediately into the (type, rep) partial aggregate — the shuffle
    * carries #types × 32 rows of integer sums, the textbook map-side-
    * combine bootstrap. Replicate means are one double division each,
    * ranked with a rep tie-break so order is engine-independent.
    */
  /** Cumulative Poisson(1) CDF × 16^8 as lowercase hex — weight j is
    * drawn by comparing the first 8 md5 nibbles against these (pure
    * string compares; zero float ops, engine-identical by construction).
    */
  private val poissonTh = Seq("5e2d58d8", "bc5ab1b1", "eb715e1d",
    "fb239797", "ff1025f5", "ffd90f3b", "fffa8b71", "ffff540c")

  private def poissonUhex(idCol: org.apache.spark.sql.Column,
      repCol: org.apache.spark.sql.Column) =
    substring(
      md5(concat(idCol.cast("string"), lit(":"),
        repCol.cast("string")).cast("binary")), 1, 8)

  private def poissonWeight(uhex: org.apache.spark.sql.Column) =
    poissonTh.zipWithIndex.foldRight(lit(8L)) { case ((t, j), e) =>
      when(uhex < t, j.toLong).otherwise(e)
    }

  /** The identical draw in DuckDB SQL, over a column named `uhex`. */
  private val poissonCaseSql =
    poissonTh.zipWithIndex
      .map { case (t, j) => s"WHEN uhex < '$t' THEN $j" }
      .mkString("CASE ", " ", " ELSE 8 END")

  private def q192(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val weight = poissonWeight(poissonUhex($"event_id", $"rep"))
    val repAgg = Tables
      .events(s, d)
      .select($"event_type", $"event_id", expr(centsExpr).as("c"))
      .withColumn("rep", explode(sequence(lit(0), lit(31))))
      .withColumn("w", weight)
      .groupBy($"event_type", $"rep")
      .agg(
        sum($"w").as("nw"),
        sum($"w" * $"c").as("sw"),
        count(lit(1)).as("n0"),
        sum($"c").as("s0"),
      )
      .withColumn("mean_r", $"sw".cast("double") / $"nw")
    val rw = Window.partitionBy($"event_type").orderBy($"mean_r", $"rep")
    repAgg
      .withColumn("rk", row_number().over(rw))
      .groupBy($"event_type")
      .agg(
        max($"n0").as("n_events"),
        round(max($"s0").cast("double") / max($"n0"), 4)
          .as("mean_cents"),
        round(max(when($"rk" === 2, $"mean_r")), 4).as("boot_lo"),
        round(max(when($"rk" === 31, $"mean_r")), 4).as("boot_hi"),
      )
      .orderBy($"event_type")
  }

  private val q192Sql =
    s"""WITH fan AS (
      |  SELECT event_type, event_id, $centsExpr AS c, r.rep,
      |    substr(md5(CAST(event_id AS VARCHAR) || ':' ||
      |      CAST(r.rep AS VARCHAR)), 1, 8) AS uhex
      |  FROM events, range(0, 32) r(rep)),
      |weighted AS (
      |  SELECT event_type, rep, c, $poissonCaseSql AS w
      |  FROM fan),
      |rep_agg AS (
      |  SELECT event_type, rep,
      |    CAST(SUM(w) AS BIGINT) AS nw,
      |    CAST(SUM(w * c) AS BIGINT) AS sw,
      |    COUNT(*) AS n0,
      |    CAST(SUM(c) AS BIGINT) AS s0
      |  FROM weighted GROUP BY event_type, rep),
      |ranked AS (
      |  SELECT event_type, nw, sw, n0, s0,
      |    CAST(sw AS DOUBLE) / nw AS mean_r,
      |    ROW_NUMBER() OVER (PARTITION BY event_type
      |      ORDER BY CAST(sw AS DOUBLE) / nw, rep) AS rk
      |  FROM rep_agg)
      |SELECT event_type,
      |  MAX(n0) AS n_events,
      |  ROUND(CAST(MAX(s0) AS DOUBLE) / MAX(n0), 4) AS mean_cents,
      |  ROUND(MAX(CASE WHEN rk = 2 THEN mean_r END), 4) AS boot_lo,
      |  ROUND(MAX(CASE WHEN rk = 31 THEN mean_r END), 4) AS boot_hi
      |FROM ranked GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q219's noise table: the two-sided geometric (discrete Laplace)
    * distribution with α = e^(−ε), ε = 1 — P(k) ∝ α^|k| — as cumulative
    * hex thresholds over k = −20..19 (±20 absorb the <2⁻³⁰ tails).
    * Computed once here and embedded as identical STRING constants in
    * both the Spark plan and the oracle SQL, so the draw is the q192
    * device: one md5 per cell, pure string compares, zero float ops at
    * query time.
    */
  /** Cumulative hex thresholds for discrete Laplace with P(k) ∝ α^|k|
    * over k = −kMax..kMax−1 — computed ONCE here and embedded as
    * identical string constants in both engines (q219 uses α = e^(−1);
    * q265's user-level variant widens to α = e^(−ε/Δ) for clamped
    * sensitivity Δ).
    */
  private def dpThresholdTable(
      alpha: Double, kMax: Int): Seq[(Int, String)] = {
    val p0 = (1 - alpha) / (1 + alpha)
    var cum = 0.0
    (-kMax until kMax).map { k =>
      cum += p0 * math.pow(alpha, math.abs(k))
      k -> f"${math.min(math.floor(cum * 4294967296.0).toLong, 0xffffffffL)}%08x"
    }
  }

  private def dpNoiseCol(
      uhex: org.apache.spark.sql.Column,
      th: Seq[(Int, String)],
      kMax: Int) =
    th.foldRight(lit(kMax)) { case ((k, t), e) =>
      when(uhex < t, k).otherwise(e)
    }

  private def dpCaseSqlFor(th: Seq[(Int, String)], kMax: Int) =
    th.map { case (k, t) => s"WHEN uhex < '$t' THEN $k" }
      .mkString("CASE ", " ", s" ELSE $kMax END")

  private val dpK = 20
  private val dpTh: Seq[(Int, String)] =
    dpThresholdTable(math.exp(-1.0), dpK)

  private def dpNoise(uhex: org.apache.spark.sql.Column) =
    dpNoiseCol(uhex, dpTh, dpK)

  private val dpCaseSql = dpCaseSqlFor(dpTh, dpK)

  /** q219: DIFFERENTIALLY-PRIVATE RELEASE AGGREGATE — the missing
    * release-side member of the privacy family (q89 masks identifiers,
    * q199 erases on request; neither makes an AGGREGATE safe to
    * publish): the per-(type, day) event-count histogram under the
    * discrete Laplace mechanism, ε = 1 — integer noise k drawn with
    * P(k) ∝ e^(−|k|), the geometric mechanism that gives exact
    * event-level ε-DP for counting queries (add/remove one event
    * changes any cell by ≤ 1; user-level DP would additionally bound
    * per-user contributions first — q196's capping composes). Noisy
    * counts are released un-clamped (a negative cell is a valid DP
    * release; post-processing is the consumer's choice).
    *
    * The twist that makes a NOISE mechanism oracle-gateable at all:
    * the draw is DETERMINISTIC — u = first 8 md5 nibbles of the cell
    * key, mapped through the precomputed CDF hex thresholds above
    * (q192's bootstrap device). Both engines draw bit-identical noise,
    * so the release hash-matches exactly while Round12Spec gates the
    * DISTRIBUTION (mean ≈ 0, Var ≈ 2α/(1−α)² over a wide synthetic
    * domain) — deterministic per release, statistically Laplace across
    * cells. One event-cardinality hash aggregate (map-side
    * combinable), one md5 per output cell; scales as q01 does.
    */
  private def q219(s: SparkSession, d: String): DataFrame =
    dpHistogram(Tables.events(s, d))

  /** The q219 mechanism over any events-shaped frame (event_type, ts) —
    * exposed so Round12Spec can gate the noise DISTRIBUTION over a wide
    * synthetic cell domain.
    */
  def dpHistogram(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val uhex = substring(
      md5(concat($"event_type", lit(":"), $"day_id".cast("string"),
        lit(":dp1")).cast("binary")), 1, 8)
    events
      .select($"event_type",
        expr("unix_micros(ts) DIV 86400000000").as("day_id"))
      .groupBy($"event_type", $"day_id")
      .agg(count(lit(1)).as("n"))
      .select($"event_type", $"day_id",
        ($"n" + dpNoise(uhex)).as("noisy_count"),
        lit(1.0).as("epsilon"))
      .orderBy($"event_type", $"day_id")
  }

  private val q219Sql =
    s"""WITH cells AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day_id,
      |    COUNT(*) AS n
      |  FROM events GROUP BY 1, 2),
      |keyed AS (
      |  SELECT event_type, day_id, n,
      |    substr(md5(event_type || ':' ||
      |      CAST(day_id AS VARCHAR) || ':dp1'), 1, 8) AS uhex
      |  FROM cells)
      |SELECT event_type, day_id,
      |  CAST(n + ($dpCaseSql) AS BIGINT) AS noisy_count,
      |  CAST(1.0 AS DOUBLE) AS epsilon
      |FROM keyed ORDER BY event_type, day_id""".stripMargin

  /** q265's noise table: α = e^(−ε/Δ) with ε = 1 and clamped
    * user-level sensitivity Δ = C = 4; tails past ±96 carry
    * < α⁹⁶ ≈ 2⁻³⁵ — below the u32 draw's resolution.
    */
  private val dpuK = 96
  private val dpuCap = 4L
  private val dpuTh: Seq[(Int, String)] =
    dpThresholdTable(math.exp(-1.0 / dpuCap), dpuK)

  /** q265: USER-LEVEL DP HISTOGRAM — the real privacy unit. q219 is
    * event-level (add/remove ONE EVENT moves a cell by ≤ 1); but the
    * thing a release must protect is a PERSON, and one user can
    * contribute many events. The standard construction (Google's DP
    * library, Wilson et al.): CLAMP each user's contribution to any
    * single cell to C = 4 events FIRST (one user-grain aggregate,
    * LEAST(n_u, C) — the q196 capping device as a privacy primitive),
    * then add discrete-Laplace noise scaled to the clamped
    * sensitivity.
    *
    * Sensitivity argument: after clamping, adding or removing one
    * user changes any single cell's count by at most C (their clamped
    * contribution there), so noise α = e^(−ε/C) makes EACH CELL's
    * release ε-DP at user level. A user may touch many cells, so the
    * whole-release guarantee composes: ε_total = M·ε over the M cells
    * a user contributes to (bounding M too — contribution capping
    * across cells — tightens this; here M is the user's active
    * (type, day) spread, reported nowhere and bounded by the 5×days
    * cell domain). Clamping bias is the price of bounded sensitivity;
    * note the release deliberately does NOT report how much was
    * clipped — that quantity moves one-for-one with a single user's
    * over-cap activity, so publishing it raw would leak exactly what
    * the clamp bounds (a DP utility readout would need its own noised
    * release).
    *
    * The draw stays the q192/q219 deterministic device (one md5 per
    * cell, pure string compares, bit-identical in both engines) — so
    * the release hash-matches under the oracle while Round14Spec
    * proves the CLAMP does the privacy work: duplicating one user's
    * in-cell activity beyond the cap leaves the release BYTE-IDENTICAL
    * (q219's event-level release moves by the duplicate count).
    * Scale: user-grain aggregate then cell aggregate — two map-side-
    * combinable exchanges, nothing event-sized past the first.
    */
  private def q265(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val uhex = substring(
      md5(concat($"event_type", lit(":"), $"day_id".cast("string"),
        lit(":dpu")).cast("binary")), 1, 8)
    Tables
      .events(s, d)
      .select($"event_type",
        expr("unix_micros(ts) DIV 86400000000").as("day_id"),
        $"user_id")
      .groupBy($"event_type", $"day_id", $"user_id")
      .agg(count(lit(1)).as("nu"))
      .groupBy($"event_type", $"day_id")
      .agg(sum(least($"nu", lit(dpuCap))).as("n"))
      .select($"event_type", $"day_id",
        ($"n" + dpNoiseCol(uhex, dpuTh, dpuK)).as("noisy_count"),
        lit(1.0).as("epsilon"),
        lit(dpuCap).as("cap"))
      .orderBy($"event_type", $"day_id")
  }

  private val q265Sql =
    s"""WITH per_user AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day_id,
      |    user_id, COUNT(*) AS nu
      |  FROM events GROUP BY 1, 2, 3),
      |cells AS (
      |  SELECT event_type, day_id,
      |    CAST(SUM(LEAST(nu, $dpuCap)) AS BIGINT) AS n
      |  FROM per_user GROUP BY 1, 2),
      |keyed AS (
      |  SELECT event_type, day_id, n,
      |    substr(md5(event_type || ':' ||
      |      CAST(day_id AS VARCHAR) || ':dpu'), 1, 8) AS uhex
      |  FROM cells)
      |SELECT event_type, day_id,
      |  CAST(n + (${dpCaseSqlFor(dpuTh, dpuK)}) AS BIGINT)
      |    AS noisy_count,
      |  CAST(1.0 AS DOUBLE) AS epsilon,
      |  CAST($dpuCap AS BIGINT) AS cap
      |FROM keyed ORDER BY event_type, day_id""".stripMargin

  // ---- q309: k-anonymity audit along a generalization step -----------

  /** q309: GENERALIZATION-STEP EVALUATION — the action side of q236's
    * k-anonymity verdict: q236 tells you a release is re-identifiable;
    * this query evaluates the classic REMEDY, one step up the
    * generalization lattice, answering "how much does coarsening a
    * quasi-identifier actually buy" BEFORE the release is rewritten.
    * QI level 0 = (nation, market segment, $1000 balance band); level
    * 1 drops the segment. Per nation: group count, min k, groups
    * violating k < 5, and the EXPOSED row count (customers inside
    * violating groups) at BOTH levels side by side — the before/after
    * a data steward reads to pick the lattice cut. Two hash aggregates
    * over the customer table plus domain-sized rollups — map-side
    * combinable, exact integers, fully hash-gated. ABSENT-IN-REF.
    */
  private def q309(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = Tables.customer(s, d)
      .select($"c_nationkey",
        $"c_mktsegment",
        expr("CAST(ROUND(c_acctbal * 100) AS BIGINT) DIV 100000")
          .as("bal_band"))
    def audit(groups: DataFrame, pfx: String): DataFrame =
      groups
        .groupBy($"c_nationkey")
        .agg(
          count(lit(1)).as(s"${pfx}n_groups"),
          min($"k").as(s"${pfx}min_k"),
          sum(when($"k" < 5L, 1L).otherwise(0L))
            .as(s"${pfx}n_violating"),
          sum(when($"k" < 5L, $"k").otherwise(0L))
            .as(s"${pfx}n_exposed"))
    val g0 = base.groupBy($"c_nationkey", $"c_mktsegment", $"bal_band")
      .agg(count(lit(1)).as("k"))
    val g1 = base.groupBy($"c_nationkey", $"bal_band")
      .agg(count(lit(1)).as("k"))
    audit(g0, "")
      .join(audit(g1, "gen_"), "c_nationkey")
      .orderBy($"c_nationkey")
  }

  private val q309Sql =
    """WITH base AS (
      |  SELECT c_nationkey, c_mktsegment,
      |    CAST(ROUND(c_acctbal * 100) AS BIGINT) // 100000 AS bal_band
      |  FROM customer),
      |g0 AS (
      |  SELECT c_nationkey, c_mktsegment, bal_band,
      |    CAST(COUNT(*) AS BIGINT) AS k
      |  FROM base GROUP BY 1, 2, 3),
      |g1 AS (
      |  SELECT c_nationkey, bal_band, CAST(COUNT(*) AS BIGINT) AS k
      |  FROM base GROUP BY 1, 2),
      |a0 AS (
      |  SELECT c_nationkey,
      |    CAST(COUNT(*) AS BIGINT) AS n_groups,
      |    MIN(k) AS min_k,
      |    CAST(SUM(CASE WHEN k < 5 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_violating,
      |    CAST(SUM(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT)
      |      AS n_exposed
      |  FROM g0 GROUP BY 1),
      |a1 AS (
      |  SELECT c_nationkey,
      |    CAST(COUNT(*) AS BIGINT) AS gen_n_groups,
      |    MIN(k) AS gen_min_k,
      |    CAST(SUM(CASE WHEN k < 5 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS gen_n_violating,
      |    CAST(SUM(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT)
      |      AS gen_n_exposed
      |  FROM g1 GROUP BY 1)
      |SELECT a0.*, a1.gen_n_groups, a1.gen_min_k, a1.gen_n_violating,
      |  a1.gen_n_exposed
      |FROM a0 JOIN a1 USING (c_nationkey)
      |ORDER BY c_nationkey""".stripMargin

  /** q194: CUPED variance reduction (Controlled-experiment Using
    * Pre-Experiment Data, Deng et al.) — the adjustment every mature
    * experimentation platform applies before q185's t-test: the
    * experiment-period metric Y is debiased by the pre-period covariate
    * X via Y − θ(X − X̄), θ = cov(X,Y)/var(X), shrinking variance by
    * the factor (1 − ρ²) without touching the treatment effect.
    * Pre/experiment split at a fixed calendar cut (2024-01-16, the data
    * span's midpoint — a constant, so the split is partition-stable).
    *
    * Because the adjustment is linear, variant-level means suffice —
    * no per-user re-join: ȳ_adj(v) = ȳ(v) − θ(x̄(v) − x̄). One
    * user-grain hash aggregate (the only event-cardinality pass), one
    * 2-row variant aggregate of BIGINT sums (Σx, Σy, Σxy, Σx², Σy²),
    * and the pooled θ/ρ² from full-frame window sums over those 2 rows
    * — every double derives from integer sums in identical operand
    * order, q185's cross-engine discipline. (Per-user cent products
    * stay < 2⁶³ through sf0.1 ×10⁴; a 100 TB deployment lifts Σxy/Σx²
    * to DECIMAL(38,0), q170's device.)
    */
  private def q194(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cutUs = 1705363200000000L // 2024-01-16T00:00:00Z
    val users = Tables
      .events(s, d)
      .select($"user_id",
        expr(centsExpr).as("c"),
        (unix_micros($"ts") < cutUs).as("pre"),
        ($"event_type" === "purchase").as("purch"))
      .groupBy($"user_id")
      .agg(
        sum(when($"pre", $"c").otherwise(0L)).as("x"),
        sum(when(!$"pre" && $"purch", $"c").otherwise(0L)).as("y"),
      )
    val byVariant = users
      .groupBy(($"user_id" % 2).as("variant"))
      .agg(
        count(lit(1)).as("n"),
        sum($"x").as("sx"),
        sum($"y").as("sy"),
        sum($"x" * $"y").as("sxy"),
        sum($"x" * $"x").as("sxx"),
        sum($"y" * $"y").as("syy"),
      )
    val full = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    byVariant
      .withColumn("tn", sum($"n").over(full))
      .withColumn("tsx", sum($"sx").over(full))
      .withColumn("tsy", sum($"sy").over(full))
      .withColumn("tsxy", sum($"sxy").over(full))
      .withColumn("tsxx", sum($"sxx").over(full))
      .withColumn("tsyy", sum($"syy").over(full))
      .withColumn("cxy",
        $"tsxy" - $"tsx".cast("double") * $"tsy" / $"tn")
      .withColumn("cxx",
        $"tsxx" - $"tsx".cast("double") * $"tsx" / $"tn")
      .withColumn("cyy",
        $"tsyy" - $"tsy".cast("double") * $"tsy" / $"tn")
      .withColumn("theta", $"cxy" / $"cxx")
      .withColumn("xbar", $"tsx".cast("double") / $"tn")
      .select(
        $"variant",
        $"n".as("n_users"),
        round($"sy".cast("double") / $"n", 4).as("mean_y"),
        round(
          $"sy".cast("double") / $"n" -
            $"theta" * ($"sx".cast("double") / $"n" - $"xbar"),
          4).as("mean_y_adj"),
        round($"theta", 6).as("theta"),
        round($"cxy" * $"cxy" / ($"cxx" * $"cyy"), 6).as("rho2"),
      )
      .orderBy($"variant")
  }

  private val q194Sql =
    s"""WITH users AS (
      |  SELECT user_id,
      |    CAST(SUM(CASE WHEN epoch_us(ts) < 1705363200000000
      |      THEN $centsExpr ELSE 0 END) AS BIGINT) AS x,
      |    CAST(SUM(CASE WHEN epoch_us(ts) >= 1705363200000000
      |      AND event_type = 'purchase'
      |      THEN $centsExpr ELSE 0 END) AS BIGINT) AS y
      |  FROM events GROUP BY user_id),
      |v AS (
      |  SELECT user_id % 2 AS variant, COUNT(*) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |    CAST(SUM(x * y) AS BIGINT) AS sxy,
      |    CAST(SUM(x * x) AS BIGINT) AS sxx,
      |    CAST(SUM(y * y) AS BIGINT) AS syy
      |  FROM users GROUP BY user_id % 2),
      |g AS (
      |  SELECT *,
      |    CAST(SUM(n) OVER () AS BIGINT) AS tn,
      |    CAST(SUM(sx) OVER () AS BIGINT) AS tsx,
      |    CAST(SUM(sy) OVER () AS BIGINT) AS tsy,
      |    CAST(SUM(sxy) OVER () AS BIGINT) AS tsxy,
      |    CAST(SUM(sxx) OVER () AS BIGINT) AS tsxx,
      |    CAST(SUM(syy) OVER () AS BIGINT) AS tsyy
      |  FROM v),
      |der AS (
      |  SELECT *,
      |    tsxy - CAST(tsx AS DOUBLE) * tsy / tn AS cxy,
      |    tsxx - CAST(tsx AS DOUBLE) * tsx / tn AS cxx,
      |    tsyy - CAST(tsy AS DOUBLE) * tsy / tn AS cyy,
      |    CAST(tsx AS DOUBLE) / tn AS xbar
      |  FROM g)
      |SELECT variant, n AS n_users,
      |  ROUND(CAST(sy AS DOUBLE) / n, 4) AS mean_y,
      |  ROUND(CAST(sy AS DOUBLE) / n -
      |    (cxy / cxx) * (CAST(sx AS DOUBLE) / n - xbar), 4)
      |    AS mean_y_adj,
      |  ROUND(cxy / cxx, 6) AS theta,
      |  ROUND(cxy * cxy / (cxx * cyy), 6) AS rho2
      |FROM der ORDER BY variant""".stripMargin

  /** q195: CHI-SQUARE independence + SAMPLE-RATIO-MISMATCH audit — the
    * guardrail run BEFORE reading any experiment metric: does event
    * composition depend on variant (independence over the type×variant
    * contingency table), and did the 50/50 assignment actually deliver
    * 50/50 (SRM, the 1-df test on assignment totals that invalidates
    * an experiment when it fires)?
    *
    * One (type, variant-conditional) hash aggregate; expected counts
    * from full-frame window totals over the type-cardinality table.
    * Cross-row sums of FLOATS are banned (Spark's partial-aggregate
    * order differs from DuckDB's sequential fold, and float addition
    * is not associative) — so each cell contribution is rounded to
    * INTEGER MICRO-UNITS first and the totals are integer sums:
    * associative, engine-exact.
    */
  private def q195(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val full = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val ct = Tables
      .events(s, d)
      .groupBy($"event_type")
      .agg(
        sum(when($"user_id" % 2 === 0, 1L).otherwise(0L)).as("n0"),
        sum(when($"user_id" % 2 =!= 0, 1L).otherwise(0L)).as("n1"),
      )
      .withColumn("t0", sum($"n0").over(full))
      .withColumn("t1", sum($"n1").over(full))
      .withColumn("n", $"t0" + $"t1")
      .withColumn("rowtot", $"n0" + $"n1")
      .withColumn("e0", $"rowtot".cast("double") * $"t0" / $"n")
      .withColumn("e1", $"rowtot".cast("double") * $"t1" / $"n")
      .withColumn("contrib_micro",
        expr("CAST(ROUND(((n0 - e0) * (n0 - e0) / e0 + " +
          "(n1 - e1) * (n1 - e1) / e1) * 1000000) AS BIGINT)"))
    ct.withColumn("chi2_indep_micro", sum($"contrib_micro").over(full))
      .withColumn("chi2_srm_micro",
        expr("CAST(ROUND(1000000.0 * (t0 - t1) * (t0 - t1) / n) " +
          "AS BIGINT)"))
      .select($"event_type", $"n0", $"n1", $"contrib_micro",
        $"chi2_indep_micro", $"chi2_srm_micro")
      .orderBy($"event_type")
  }

  private val q195Sql =
    """WITH ct AS (
      |  SELECT event_type,
      |    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n0,
      |    CAST(SUM(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n1
      |  FROM events GROUP BY event_type),
      |tot AS (
      |  SELECT *,
      |    CAST(SUM(n0) OVER () AS BIGINT) AS t0,
      |    CAST(SUM(n1) OVER () AS BIGINT) AS t1,
      |    CAST(SUM(n0) OVER () + SUM(n1) OVER () AS BIGINT) AS n,
      |    n0 + n1 AS rowtot
      |  FROM ct),
      |cells AS (
      |  SELECT *,
      |    CAST(rowtot AS DOUBLE) * t0 / n AS e0,
      |    CAST(rowtot AS DOUBLE) * t1 / n AS e1
      |  FROM tot),
      |micro AS (
      |  SELECT *,
      |    CAST(ROUND(((n0 - e0) * (n0 - e0) / e0 +
      |      (n1 - e1) * (n1 - e1) / e1) * 1000000) AS BIGINT)
      |      AS contrib_micro
      |  FROM cells)
      |SELECT event_type, n0, n1, contrib_micro,
      |  CAST(SUM(contrib_micro) OVER () AS BIGINT)
      |    AS chi2_indep_micro,
      |  CAST(ROUND(1000000.0 * (t0 - t1) * (t0 - t1) / n) AS BIGINT)
      |    AS chi2_srm_micro
      |FROM micro ORDER BY event_type""".stripMargin

  /** q196: WINSORIZED MEAN per event type — the robust metric the raw
    * mean cannot be at heavy-tailed scale (one whale order moves the
    * average; every experimentation platform clips at P5/P95 before
    * averaging). ABSENT-IN-REF.
    *
    * Exact and integer END TO END via the value-domain histogram
    * (q156's discipline): after the one (type, cent) hash aggregate,
    * the cumulative walk, the ceil-rank thresholds
    * (k = ⌈n·p⌉ in pure integer arithmetic), the clamp, and the
    * clamped sum Σ cnt·clip(c) are all over domain-sized tables — the
    * textbook formulation sorts every row per type twice (once for
    * each percentile) and once more for the clipped pass. The only
    * float op is the final mean division. At 100 TB nothing but
    * (type, cent) distinct rows ever shuffles.
    */
  private def q196(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val hist = Tables
      .events(s, d)
      .select($"event_type".as("t"), expr(centsExpr).as("c"))
      .groupBy($"t", $"c")
      .agg(count(lit(1)).as("cnt"))
    val part = Window.partitionBy($"t")
    val runW = part.orderBy($"c")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("cum", sum($"cnt").over(runW))
      .withColumn("n", sum($"cnt").over(part))
      .withColumn("klo", expr("(n * 5 + 99) DIV 100"))
      .withColumn("khi", expr("(n * 95 + 99) DIV 100"))
    val thresholds = cum
      .groupBy($"t")
      .agg(
        min(when($"cum" >= $"klo", $"c")).as("lo"),
        min(when($"cum" >= $"khi", $"c")).as("hi"),
        max($"n").as("n"),
        sum($"cnt" * $"c").as("sum_c"),
      )
    hist
      .join(broadcast(thresholds), Seq("t"))
      .groupBy($"t", $"lo", $"hi", $"n", $"sum_c")
      .agg(sum($"cnt" *
        greatest($"lo", least($"hi", $"c"))).as("wsum"))
      .select(
        $"t".as("event_type"), $"n".as("n_events"),
        $"lo".as("lo_cents"), $"hi".as("hi_cents"),
        round($"sum_c".cast("double") / $"n", 4).as("mean_cents"),
        round($"wsum".cast("double") / $"n", 4).as("winsor_mean_cents"),
      )
      .orderBy($"event_type")
  }

  private val q196Sql =
    s"""WITH hist AS (
      |  SELECT event_type AS t, $centsExpr AS c, COUNT(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |cum AS (
      |  SELECT *,
      |    CAST(SUM(cnt) OVER (PARTITION BY t ORDER BY c
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS cumn,
      |    CAST(SUM(cnt) OVER (PARTITION BY t) AS BIGINT) AS n
      |  FROM hist),
      |thr AS (
      |  SELECT t,
      |    MIN(CASE WHEN cumn >= (n * 5 + 99) // 100 THEN c END) AS lo,
      |    MIN(CASE WHEN cumn >= (n * 95 + 99) // 100 THEN c END) AS hi,
      |    MAX(n) AS n,
      |    CAST(SUM(cnt * c) AS BIGINT) AS sum_c
      |  FROM cum GROUP BY t)
      |SELECT h.t AS event_type, thr.n AS n_events,
      |  thr.lo AS lo_cents, thr.hi AS hi_cents,
      |  ROUND(CAST(thr.sum_c AS DOUBLE) / thr.n, 4) AS mean_cents,
      |  ROUND(CAST(SUM(h.cnt * GREATEST(thr.lo, LEAST(thr.hi, h.c)))
      |    AS DOUBLE) / thr.n, 4) AS winsor_mean_cents
      |FROM hist h JOIN thr ON h.t = thr.t
      |GROUP BY h.t, thr.n, thr.lo, thr.hi, thr.sum_c
      |ORDER BY event_type""".stripMargin

  /** q197: BOOTSTRAP CONFIDENCE INTERVAL FOR THE MEDIAN — q192's
    * uncertainty machinery applied to the statistic that actually NEEDS
    * a bootstrap (the mean has a closed-form standard error; the
    * median's depends on the unknown density at the median). FULLY
    * INTEGER: medians of cent histograms are cents, so unlike q192
    * there is not a single float anywhere — point estimate and both
    * interval bounds are exact BIGINTs.
    *
    * One pass: the 32× Poisson-weight fan-out collapses into a
    * (type, rep, cent) weighted histogram whose per-group `count(*)`
    * doubles as the RAW histogram (each event contributes exactly one
    * fan row per replicate, so the rep=0 slice's row counts are the
    * unweighted distribution — the point-estimate median comes from
    * the same aggregate, no second scan). Everything after is
    * domain-sized: cumulative walks per (type, rep), lower-median
    * selection (first c with 2·cum ≥ n), order statistics [2nd, 31st]
    * over the 32 replicate medians.
    */
  private def q197(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val weight = poissonWeight(poissonUhex($"event_id", $"rep"))
    val hist = Tables
      .events(s, d)
      .select($"event_type", $"event_id", expr(centsExpr).as("c"))
      .withColumn("rep", explode(sequence(lit(0), lit(31))))
      .withColumn("w", weight)
      .groupBy($"event_type", $"rep", $"c")
      .agg(sum($"w").as("sw"), count(lit(1)).as("m"))
    val repPart = Window.partitionBy($"event_type", $"rep")
    val repRun = repPart.orderBy($"c")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val medians = hist
      .withColumn("cum", sum($"sw").over(repRun))
      .withColumn("nw", sum($"sw").over(repPart))
      .groupBy($"event_type", $"rep")
      .agg(min(when($"cum" * 2 >= $"nw", $"c")).as("med"))
    val rw = Window.partitionBy($"event_type").orderBy($"med", $"rep")
    val boot = medians
      .withColumn("rk", row_number().over(rw))
      .groupBy($"event_type")
      .agg(
        max(when($"rk" === 2, $"med")).as("boot_lo"),
        max(when($"rk" === 31, $"med")).as("boot_hi"),
      )
    val point = hist
      .filter($"rep" === 0)
      .withColumn("cum", sum($"m").over(repRun))
      .withColumn("n", sum($"m").over(repPart))
      .groupBy($"event_type")
      .agg(
        max($"n").as("n_events"),
        min(when($"cum" * 2 >= $"n", $"c")).as("median_cents"),
      )
    point
      .join(boot, Seq("event_type"))
      .select($"event_type", $"n_events", $"median_cents",
        $"boot_lo", $"boot_hi")
      .orderBy($"event_type")
  }

  private val q197Sql =
    s"""WITH fan AS (
      |  SELECT event_type, event_id, $centsExpr AS c, r.rep,
      |    substr(md5(CAST(event_id AS VARCHAR) || ':' ||
      |      CAST(r.rep AS VARCHAR)), 1, 8) AS uhex
      |  FROM events, range(0, 32) r(rep)),
      |hist AS (
      |  SELECT event_type, rep, c,
      |    CAST(SUM($poissonCaseSql) AS BIGINT) AS sw,
      |    COUNT(*) AS m
      |  FROM fan GROUP BY event_type, rep, c),
      |walk AS (
      |  SELECT *,
      |    CAST(SUM(sw) OVER (PARTITION BY event_type, rep ORDER BY c
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS cum,
      |    CAST(SUM(sw) OVER (PARTITION BY event_type, rep)
      |      AS BIGINT) AS nw,
      |    CAST(SUM(m) OVER (PARTITION BY event_type, rep ORDER BY c
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS cum_m,
      |    CAST(SUM(m) OVER (PARTITION BY event_type, rep)
      |      AS BIGINT) AS n_m
      |  FROM hist),
      |medians AS (
      |  SELECT event_type, rep,
      |    MIN(CASE WHEN cum * 2 >= nw THEN c END) AS med
      |  FROM walk GROUP BY event_type, rep),
      |boot AS (
      |  SELECT event_type,
      |    MAX(CASE WHEN rk = 2 THEN med END) AS boot_lo,
      |    MAX(CASE WHEN rk = 31 THEN med END) AS boot_hi
      |  FROM (
      |    SELECT event_type, med,
      |      ROW_NUMBER() OVER (PARTITION BY event_type
      |        ORDER BY med, rep) AS rk
      |    FROM medians) r
      |  GROUP BY event_type),
      |pt AS (
      |  SELECT event_type,
      |    MAX(n_m) AS n_events,
      |    MIN(CASE WHEN cum_m * 2 >= n_m THEN c END) AS median_cents
      |  FROM walk WHERE rep = 0 GROUP BY event_type)
      |SELECT pt.event_type, pt.n_events, pt.median_cents,
      |  boot.boot_lo, boot.boot_hi
      |FROM pt JOIN boot ON pt.event_type = boot.event_type
      |ORDER BY pt.event_type""".stripMargin

  /** q198: THEIL–SEN ROBUST TREND — the median of pairwise slopes of
    * the daily mean metric, the outlier-immune answer to "is this
    * metric drifting?" (one corrupted day breaks an OLS fit; Theil–Sen
    * tolerates ~29% contamination). ABSENT-IN-REF.
    *
    * Scale shape: events pre-aggregate to DAY grain first (integer
    * sums; the only event-cardinality pass), so the O(days²) pairwise
    * slope enumeration runs over a calendar-bounded grid (≤435 pairs
    * per type here; a year is ~66k — trivial either way). The pair
    * join is a hash equi-join on type with the day inequality as a
    * post-filter, never a nested loop over events. Slopes are doubles
    * but are never SUMMED — the median is pure ORDER STATISTICS
    * (row_number with a (da, db) tie-break), so engine-identical
    * slope values give an engine-identical pick.
    */
  private def q198(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dayUs = 86400L * 1000000L
    val daily = Tables
      .events(s, d)
      .select($"event_type".as("t"),
        expr(s"unix_micros(ts) DIV $dayUs").as("day"),
        expr(centsExpr).as("c"))
      .groupBy($"t", $"day")
      .agg(count(lit(1)).as("n"), sum($"c").as("sc"))
    val pairs = daily.as("a")
      .join(daily.as("b"), $"a.t" === $"b.t" && $"a.day" < $"b.day")
      .select($"a.t".as("t"), $"a.day".as("da"), $"b.day".as("db"),
        (($"b.sc".cast("double") / $"b.n" -
          $"a.sc".cast("double") / $"a.n") /
          ($"b.day" - $"a.day")).as("slope"))
    val part = Window.partitionBy($"t")
    val rw = part.orderBy($"slope", $"da", $"db")
    pairs
      .withColumn("rk", row_number().over(rw))
      .withColumn("np", count(lit(1)).over(part))
      .filter($"rk" === expr("(np + 1) DIV 2"))
      .select($"t".as("event_type"), $"np".as("n_pairs"),
        round($"slope", 6).as("theil_sen_slope_cents_per_day"))
      .orderBy($"event_type")
  }

  private val q198Sql =
    s"""WITH daily AS (
      |  SELECT event_type AS t, epoch_us(ts) // 86400000000 AS day,
      |    COUNT(*) AS n, CAST(SUM($centsExpr) AS BIGINT) AS sc
      |  FROM events GROUP BY 1, 2),
      |pairs AS (
      |  SELECT a.t, a.day AS da, b.day AS db,
      |    (CAST(b.sc AS DOUBLE) / b.n - CAST(a.sc AS DOUBLE) / a.n) /
      |      (b.day - a.day) AS slope
      |  FROM daily a JOIN daily b ON a.t = b.t AND a.day < b.day),
      |ranked AS (
      |  SELECT t, slope,
      |    ROW_NUMBER() OVER (PARTITION BY t ORDER BY slope, da, db)
      |      AS rk,
      |    COUNT(*) OVER (PARTITION BY t) AS np
      |  FROM pairs)
      |SELECT t AS event_type, CAST(np AS BIGINT) AS n_pairs,
      |  ROUND(slope, 6) AS theil_sen_slope_cents_per_day
      |FROM ranked WHERE rk = (np + 1) // 2
      |ORDER BY event_type""".stripMargin

  /** q203: ROLLING 7-DAY MEDIAN per event type — the windowed robust
    * center a monitoring dashboard plots (a daily mean spikes on one
    * whale; the trailing median does not). The naive shape re-sorts
    * every trailing window's raw rows per day; the scale shape extends
    * q156/q196's value-domain discipline to MOVING windows: one
    * (type, day, cent) aggregate (the only event-cardinality pass),
    * then the trailing histogram for every day is a RANGE-frame window
    * sum over days partitioned by (type, cent) — each output day's
    * distribution materializes as domain-sized rows, and the median
    * walk is one more cumulative over cents. Everything integer; rows
    * after the first aggregate are bounded by types × days × cents.
    */
  private def q203(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dayUs = 86400L * 1000000L
    val hist = Tables
      .events(s, d)
      .select($"event_type".as("t"),
        expr(s"unix_micros(ts) DIV $dayUs").as("day"),
        expr(centsExpr).as("c"))
      .groupBy($"t", $"day", $"c")
      .agg(count(lit(1)).as("cnt"))
    // trailing-7-day count of value c as of each day the type has data:
    // densify to the (type, day) grid first so days where c is absent
    // still carry the window sum
    val grid = hist.select($"t", $"day").distinct()
    val trail = grid
      .join(hist.select($"t", $"c").distinct(), Seq("t"))
      .join(hist, Seq("t", "day", "c"), "left")
      .na.fill(0L, Seq("cnt"))
      .withColumn("wcnt",
        sum($"cnt").over(Window.partitionBy($"t", $"c")
          .orderBy($"day").rangeBetween(-6, 0)))
      .filter($"wcnt" > 0)
    val part = Window.partitionBy($"t", $"day")
    val runW = part.orderBy($"c")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    trail
      .withColumn("cum", sum($"wcnt").over(runW))
      .withColumn("n", sum($"wcnt").over(part))
      .groupBy($"t", $"day")
      .agg(
        max($"n").as("n_window"),
        min(when($"cum" * 2 >= $"n", $"c")).as("rolling_median_cents"),
      )
      .select($"t".as("event_type"), $"day", $"n_window",
        $"rolling_median_cents")
      .orderBy($"event_type", $"day")
  }

  private val q203Sql =
    s"""WITH hist AS (
      |  SELECT event_type AS t, epoch_us(ts) // 86400000000 AS day,
      |    $centsExpr AS c, COUNT(*) AS cnt
      |  FROM events GROUP BY 1, 2, 3),
      |grid AS (SELECT DISTINCT t, day FROM hist),
      |vals AS (SELECT DISTINCT t, c FROM hist),
      |dense AS (
      |  SELECT g.t, g.day, v.c, COALESCE(h.cnt, 0) AS cnt
      |  FROM grid g JOIN vals v ON g.t = v.t
      |  LEFT JOIN hist h ON h.t = g.t AND h.day = g.day AND h.c = v.c),
      |trail AS (
      |  SELECT t, day, c,
      |    CAST(SUM(cnt) OVER (PARTITION BY t, c ORDER BY day
      |      RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS wcnt
      |  FROM dense),
      |nz AS (SELECT * FROM trail WHERE wcnt > 0),
      |walk AS (
      |  SELECT t, day, c,
      |    CAST(SUM(wcnt) OVER (PARTITION BY t, day ORDER BY c
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS cum,
      |    CAST(SUM(wcnt) OVER (PARTITION BY t, day) AS BIGINT) AS n
      |  FROM nz)
      |SELECT t AS event_type, day, MAX(n) AS n_window,
      |  MIN(CASE WHEN cum * 2 >= n THEN c END) AS rolling_median_cents
      |FROM walk GROUP BY t, day ORDER BY event_type, day""".stripMargin

  /** q206: KMV SKETCH MERGE — the property that makes sketches a data
    * structure rather than a trick: per-DAY sketches built independently
    * (the pre-aggregated daily cube every metrics store keeps) merge
    * into the month's distinct-user estimate WITHOUT touching the raw
    * data again — union the sketch rows, keep the k smallest distinct
    * hashes, re-read θ. q191 showed intersection; this is the
    * time-partitioned union that powers "distinct users, any date
    * range" dashboards. Deterministic md5 hashing makes the whole
    * merge oracle-replayable, and the output carries the exact distinct
    * count next to the estimate so the error is part of the artifact.
    *
    * Scale: each day's sketch is `row_number ≤ k` (WindowGroupLimit —
    * map-side bounded heaps per day); the merge operates on days × k
    * rows ≈ KBs regardless of corpus size; the exact control is one
    * distinct-agg (the thing the sketch exists to avoid — kept here
    * as the error gauge).
    */
  private def q206(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val k = 64
    val dayUs = 86400L * 1000000L
    val daily = Tables
      .events(s, d)
      .select(expr(s"unix_micros(ts) DIV $dayUs").as("day"), $"user_id")
      .distinct()
      .withColumn("h", md5($"user_id".cast("string").cast("binary")))
      .withColumn("rk",
        row_number().over(Window.partitionBy($"day").orderBy($"h")))
      .filter($"rk" <= k)
    // k smallest distinct hashes via orderBy+limit →
    // TakeOrderedAndProject (bounded per-task heaps), not a
    // single-partition global row_number window
    val merged = daily
      .select($"h").distinct()
      .orderBy($"h")
      .limit(k)
    val uInt = (1 to 8)
      .map(i =>
        s"(instr('0123456789abcdef', substr(theta, $i, 1)) - 1) * " +
          s"${math.pow(16, 8 - i).toLong}L")
      .mkString(" + ")
    val sketch = merged.agg(
      count(lit(1)).as("n_sketch"),
      max($"h").as("theta"),
    )
    val nDays = daily.select($"day").distinct()
      .agg(count(lit(1)).as("n_days"))
    val exact = Tables
      .events(s, d)
      .agg(countDistinct($"user_id").as("exact_distinct"))
    sketch
      .crossJoin(broadcast(nDays)) // 1-row
      .crossJoin(broadcast(exact)) // 1-row
      .withColumn("est",
        when($"n_sketch" < k, $"n_sketch".cast("double"))
          .otherwise(lit((k - 1).toDouble) * 4294967296.0 / expr(uInt)))
      .select($"n_days", lit(k).as("k"), $"n_sketch",
        round($"est", 2).as("est_distinct"), $"exact_distinct",
        expr("CAST(ROUND(1000 * ABS(est - exact_distinct) / " +
          "exact_distinct) AS BIGINT)").as("err_permille"))
  }

  private val q206Sql = {
    val uInt = (1 to 8)
      .map(i =>
        s"(instr('0123456789abcdef', substr(theta, $i, 1)) - 1) * " +
          s"${math.pow(16, 8 - i).toLong}")
      .mkString(" + ")
    s"""WITH du AS (
      |  SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id
      |  FROM events),
      |daily AS (
      |  SELECT day, h FROM (
      |    SELECT day, md5(CAST(user_id AS VARCHAR)) AS h,
      |      ROW_NUMBER() OVER (PARTITION BY day
      |        ORDER BY md5(CAST(user_id AS VARCHAR))) AS rk
      |    FROM du) r
      |  WHERE rk <= 64),
      |merged AS (
      |  SELECT h FROM (
      |    SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rk
      |    FROM (SELECT DISTINCT h FROM daily) u) r
      |  WHERE rk <= 64),
      |sk AS (
      |  SELECT COUNT(*) AS n_sketch, MAX(h) AS theta FROM merged),
      |nd AS (SELECT COUNT(DISTINCT day) AS n_days FROM du),
      |ex AS (
      |  SELECT COUNT(DISTINCT user_id) AS exact_distinct FROM events),
      |est AS (
      |  SELECT n_days, 64 AS k, n_sketch,
      |    CASE WHEN n_sketch < 64 THEN CAST(n_sketch AS DOUBLE)
      |         ELSE 63.0 * 4294967296.0 / ($uInt) END AS est,
      |    exact_distinct
      |  FROM sk, nd, ex)
      |SELECT CAST(n_days AS BIGINT) AS n_days, k,
      |  CAST(n_sketch AS BIGINT) AS n_sketch,
      |  ROUND(est, 2) AS est_distinct,
      |  CAST(exact_distinct AS BIGINT) AS exact_distinct,
      |  CAST(ROUND(1000 * ABS(est - exact_distinct) / exact_distinct)
      |    AS BIGINT) AS err_permille
      |FROM est""".stripMargin
  }

  /** q212: QUANTILE TREATMENT EFFECTS — the experiment readout the
    * mean difference (q185) hides: a treatment that helps the P25 user
    * and hurts the P90 user can show a zero mean effect; the QTE curve
    * (per-quantile variant difference) is how heterogeneous effects
    * surface. Exact and integer end to end via per-variant value-domain
    * histograms (q196's ceil-rank discipline at the deciles P10..P90),
    * so every quantile and every difference is an exact BIGINT cents
    * value. One (type, variant, cent) aggregate — the only
    * event-cardinality pass; everything after is domain-sized.
    */
  private def q212(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val hist = Tables
      .events(s, d)
      .select($"event_type".as("t"), ($"user_id" % 2).as("variant"),
        expr(centsExpr).as("c"))
      .groupBy($"t", $"variant", $"c")
      .agg(count(lit(1)).as("cnt"))
    val part = Window.partitionBy($"t", $"variant")
    val runW = part.orderBy($"c")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val walked = hist
      .withColumn("cum", sum($"cnt").over(runW))
      .withColumn("n", sum($"cnt").over(part))
      .withColumn("q", explode(expr(
        "sequence(10L, 90L, 10L)")))
      .filter($"cum" >= expr("(n * q + 99) DIV 100"))
      .groupBy($"t", $"variant", $"q")
      .agg(min($"c").as("qv"))
    walked
      .groupBy($"t", $"q")
      .agg(
        max(when($"variant" === 0, $"qv")).as("q_control"),
        max(when($"variant" === 1, $"qv")).as("q_treatment"),
      )
      .withColumn("qte_cents", $"q_treatment" - $"q_control")
      .orderBy($"t", $"q")
  }

  private val q212Sql =
    s"""WITH hist AS (
      |  SELECT event_type AS t, user_id % 2 AS variant,
      |    $centsExpr AS c, COUNT(*) AS cnt
      |  FROM events GROUP BY 1, 2, 3),
      |walk AS (
      |  SELECT *,
      |    CAST(SUM(cnt) OVER (PARTITION BY t, variant ORDER BY c
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS cum,
      |    CAST(SUM(cnt) OVER (PARTITION BY t, variant)
      |      AS BIGINT) AS n
      |  FROM hist),
      |quant AS (
      |  SELECT t, variant, q.q, MIN(c) AS qv
      |  FROM walk, (SELECT UNNEST(generate_series(10, 90, 10)) AS q) q
      |  WHERE cum >= (n * q.q + 99) // 100
      |  GROUP BY t, variant, q.q)
      |SELECT t, q,
      |  MAX(CASE WHEN variant = 0 THEN qv END) AS q_control,
      |  MAX(CASE WHEN variant = 1 THEN qv END) AS q_treatment,
      |  MAX(CASE WHEN variant = 1 THEN qv END) -
      |    MAX(CASE WHEN variant = 0 THEN qv END) AS qte_cents
      |FROM quant GROUP BY t, q ORDER BY t, q""".stripMargin

  /** q213: TIME-TO-CONVERT DISTRIBUTION — how long after first signup
    * the first strictly-later purchase lands, per variant: the lag
    * histogram (hour-bucketed) plus the exact median lag, the metric
    * growth teams track next to q188's conversion RATE. One user_id
    * exchange (q188's window chain), then everything runs on
    * user-cardinality rows; the median comes from the same value-domain
    * walk as q197, over hour-bucket cardinality. Integer hours end to
    * end.
    */
  private def q213(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id")
    val lags = Tables
      .events(s, d)
      .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
      .withColumn("s1",
        min(when($"event_type" === "signup", $"us")).over(w))
      .withColumn("p1",
        min(when($"event_type" === "purchase" && $"us" > $"s1", $"us"))
          .over(w))
      .groupBy($"user_id")
      .agg(max($"s1").as("s1"), max($"p1").as("p1"))
      .filter($"s1".isNotNull && $"p1".isNotNull)
      .select(($"user_id" % 2).as("variant"),
        expr("(p1 - s1) DIV 3600000000").as("lag_hours"))
    val hist = lags.groupBy($"variant", $"lag_hours")
      .agg(count(lit(1)).as("cnt"))
    val part = Window.partitionBy($"variant")
    val runW = part.orderBy($"lag_hours")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("cum", sum($"cnt").over(runW))
      .withColumn("n", sum($"cnt").over(part))
      .groupBy($"variant")
      .agg(
        max($"n").as("n_converted"),
        min(when($"cum" * 2 >= $"n", $"lag_hours"))
          .as("median_lag_hours"),
        max($"lag_hours").as("max_lag_hours"),
      )
      .orderBy($"variant")
  }

  private val q213Sql =
    """WITH marked AS (
      |  SELECT user_id,
      |    MIN(CASE WHEN event_type = 'signup' THEN us END)
      |      OVER (PARTITION BY user_id) AS s1, us, event_type
      |  FROM (SELECT user_id, event_type, epoch_us(ts) AS us
      |        FROM events) e),
      |u AS (
      |  SELECT user_id, MAX(s1) AS s1,
      |    MIN(CASE WHEN event_type = 'purchase' AND us > s1
      |      THEN us END) AS p1
      |  FROM marked GROUP BY user_id),
      |lags AS (
      |  SELECT user_id % 2 AS variant,
      |    (p1 - s1) // 3600000000 AS lag_hours
      |  FROM u WHERE s1 IS NOT NULL AND p1 IS NOT NULL),
      |hist AS (
      |  SELECT variant, lag_hours, COUNT(*) AS cnt
      |  FROM lags GROUP BY variant, lag_hours),
      |walk AS (
      |  SELECT *,
      |    CAST(SUM(cnt) OVER (PARTITION BY variant ORDER BY lag_hours
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS cum,
      |    CAST(SUM(cnt) OVER (PARTITION BY variant) AS BIGINT) AS n
      |  FROM hist)
      |SELECT variant, MAX(n) AS n_converted,
      |  MIN(CASE WHEN cum * 2 >= n THEN lag_hours END)
      |    AS median_lag_hours,
      |  MAX(lag_hours) AS max_lag_hours
      |FROM walk GROUP BY variant ORDER BY variant""".stripMargin

  /** q217: DELTA-METHOD CLUSTERED VARIANCE for a ratio metric — the #1
    * correctness trap in real experiment readouts, and the one q185's
    * per-event t-test walks into: "revenue per event" is a RATIO of two
    * user-level sums (Σ cents / Σ events), and events cluster within
    * users, so treating them as independent draws understates the
    * standard error whenever users differ systematically. The fix every
    * mature platform applies (Deng et al.'s companion to q194's CUPED)
    * is the delta method on per-user sufficient statistics:
    * Var(R̂) ≈ (N/(N−1)) · Σᵢ(sᵢ − R·nᵢ)² / (Σn)², expanded to the
    * cluster moments Σs², Σn², Σns so no residual pass is needed.
    *
    * Output per variant: the naive per-event SE next to the clustered
    * SE and their design effect deff = (se_cluster/se_naive)² — on this
    * fixture's iid-ish values deff ≈ 1 (the honest readout); Round12Spec
    * plants a user-clustered fixture where the naive SE understates by
    * >3× and the delta SE tracks a direct jackknife.
    *
    * Scale: one event-cardinality hash aggregate to user grain (the
    * same user_id exchange every per-user query shares), then a 2-row
    * variant aggregate of BIGINT sums; every double derives from
    * integer sums in identical operand order (q185's cross-engine
    * discipline). Per-user cent sums and their squares stay < 2⁶³
    * through sf0.1×10⁴; a 100 TB deployment lifts Σs²/Σns to
    * DECIMAL(38,0) — q170's device.
    */
  private def q217(s: SparkSession, d: String): DataFrame =
    deltaMethod(Tables.events(s, d))

  /** The q217 computation over any events-shaped frame (user_id, value)
    * — exposed so Round12Spec can plant a genuinely clustered fixture.
    */
  def deltaMethod(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val users = events
      .select($"user_id", expr(centsExpr).as("c"))
      .groupBy($"user_id")
      .agg(
        count(lit(1)).as("n"),
        sum($"c").as("cs"),
        sum($"c" * $"c").as("q2"),
      )
    val byVariant = users
      .groupBy(($"user_id" % 2).as("variant"))
      .agg(
        count(lit(1)).as("nu"),
        sum($"n").as("m"),
        sum($"cs").as("sc"),
        sum($"q2").as("sc2"),
        sum($"cs" * $"cs").as("ss2"),
        sum($"n" * $"n").as("sn2"),
        sum($"n" * $"cs").as("sns"),
      )
    byVariant
      .withColumn("r", $"sc".cast("double") / $"m")
      .withColumn("var_e",
        ($"sc2" - $"sc".cast("double") * $"sc" / $"m") / ($"m" - 1))
      .withColumn("se_naive", sqrt($"var_e" / $"m"))
      .withColumn("resid",
        $"ss2" - lit(2.0) * $"r" * $"sns" + $"r" * $"r" * $"sn2")
      .withColumn("se_cluster",
        sqrt($"resid" * $"nu" / ($"nu" - 1)) / $"m")
      .select(
        $"variant",
        $"nu".as("n_users"),
        $"m".as("n_events"),
        round($"r" / 100.0, 4).as("mean_per_event"),
        round($"se_naive" / 100.0, 6).as("se_naive"),
        round($"se_cluster" / 100.0, 6).as("se_cluster"),
        round($"se_cluster" * $"se_cluster" /
          ($"se_naive" * $"se_naive"), 4).as("deff"),
      )
      .orderBy($"variant")
  }

  private val q217Sql =
    s"""WITH u AS (
      |  SELECT user_id, COUNT(*) AS n,
      |    CAST(SUM($centsExpr) AS BIGINT) AS cs,
      |    CAST(SUM($centsExpr * $centsExpr) AS BIGINT) AS q2
      |  FROM events GROUP BY user_id),
      |v AS (
      |  SELECT user_id % 2 AS variant, COUNT(*) AS nu,
      |    CAST(SUM(n) AS BIGINT) AS m,
      |    CAST(SUM(cs) AS BIGINT) AS sc,
      |    CAST(SUM(q2) AS BIGINT) AS sc2,
      |    CAST(SUM(cs * cs) AS BIGINT) AS ss2,
      |    CAST(SUM(n * n) AS BIGINT) AS sn2,
      |    CAST(SUM(n * cs) AS BIGINT) AS sns
      |  FROM u GROUP BY user_id % 2),
      |der AS (
      |  SELECT *,
      |    CAST(sc AS DOUBLE) / m AS r,
      |    (sc2 - CAST(sc AS DOUBLE) * sc / m) / (m - 1) AS var_e
      |  FROM v),
      |der2 AS (
      |  SELECT *,
      |    SQRT(var_e / m) AS se_naive,
      |    SQRT((ss2 - 2.0 * r * sns + r * r * sn2) * nu / (nu - 1)) / m
      |      AS se_cluster
      |  FROM der)
      |SELECT variant, nu AS n_users, m AS n_events,
      |  ROUND(r / 100.0, 4) AS mean_per_event,
      |  ROUND(se_naive / 100.0, 6) AS se_naive,
      |  ROUND(se_cluster / 100.0, 6) AS se_cluster,
      |  ROUND(se_cluster * se_cluster / (se_naive * se_naive), 4)
      |    AS deff
      |FROM der2 ORDER BY variant""".stripMargin

  /** q232: KENDALL RANK CORRELATION (τ-b) between two day rankings per
    * event type — are high-VOLUME days also high-REVENUE days? The
    * nonparametric rank-agreement statistic (robust companion to
    * q123's parametric regression and q198's Theil-Sen): every pair of
    * days is concordant, discordant, or tied on either axis, and
    * τ_b = (C − D) / √((C + D + Tx)(C + D + Ty)).
    *
    * Scale = q198's discipline: events pre-aggregate to DAY grain (one
    * map-side-combinable pass — the only event-cardinality work), so
    * the O(days²) pair enumeration runs over a calendar-bounded grid
    * (30 days → 435 pairs per type) via a type-equi-join with a
    * day-order filter — never an event-level pair join. C/D/T are
    * exact BIGINT counts; the single √ runs over identical integer
    * operands on both engines.
    */
  private def q232(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val daily = Tables
      .events(s, d)
      .select($"event_type",
        expr("unix_micros(ts) DIV 86400000000").as("day_id"),
        expr(centsExpr).as("c"))
      .groupBy($"event_type", $"day_id")
      .agg(count(lit(1)).as("n"), sum($"c").as("cents"))
    val a = daily.select($"event_type", $"day_id".as("d1"),
      $"n".as("n1"), $"cents".as("c1"))
    val b = daily.select($"event_type".as("t2"), $"day_id".as("d2"),
      $"n".as("n2"), $"cents".as("c2"))
    a.join(b, $"event_type" === $"t2" && $"d1" < $"d2")
      .select($"event_type",
        (signum($"n2" - $"n1") * signum($"c2" - $"c1")).as("s"),
        ($"n1" === $"n2").as("tx"),
        ($"c1" === $"c2").as("ty"))
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(when(!$"tx" && !$"ty" && $"s" > 0, 1L).otherwise(0L))
          .as("concordant"),
        sum(when(!$"tx" && !$"ty" && $"s" < 0, 1L).otherwise(0L))
          .as("discordant"),
        sum(when($"tx" && !$"ty", 1L).otherwise(0L)).as("ties_x"),
        sum(when($"ty" && !$"tx", 1L).otherwise(0L)).as("ties_y"),
      )
      .withColumn("tau_b", round(
        ($"concordant" - $"discordant").cast("double") /
          sqrt((($"concordant" + $"discordant" + $"ties_x") *
            ($"concordant" + $"discordant" + $"ties_y"))
            .cast("double")), 6))
      .orderBy($"event_type")
  }

  private val q232Sql =
    s"""WITH daily AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day_id,
      |    COUNT(*) AS n, CAST(SUM($centsExpr) AS BIGINT) AS cents
      |  FROM events GROUP BY 1, 2),
      |pairs AS (
      |  SELECT a.event_type,
      |    SIGN(b.n - a.n) * SIGN(b.cents - a.cents) AS s,
      |    a.n = b.n AS tx, a.cents = b.cents AS ty
      |  FROM daily a JOIN daily b
      |    ON a.event_type = b.event_type AND a.day_id < b.day_id),
      |agg AS (
      |  SELECT event_type, COUNT(*) AS n_pairs,
      |    CAST(SUM(CASE WHEN NOT tx AND NOT ty AND s > 0 THEN 1
      |      ELSE 0 END) AS BIGINT) AS concordant,
      |    CAST(SUM(CASE WHEN NOT tx AND NOT ty AND s < 0 THEN 1
      |      ELSE 0 END) AS BIGINT) AS discordant,
      |    CAST(SUM(CASE WHEN tx AND NOT ty THEN 1 ELSE 0 END)
      |      AS BIGINT) AS ties_x,
      |    CAST(SUM(CASE WHEN ty AND NOT tx THEN 1 ELSE 0 END)
      |      AS BIGINT) AS ties_y
      |  FROM pairs GROUP BY event_type)
      |SELECT event_type, n_pairs, concordant, discordant, ties_x,
      |  ties_y,
      |  ROUND(CAST(concordant - discordant AS DOUBLE) /
      |    SQRT(CAST((concordant + discordant + ties_x) *
      |      (concordant + discordant + ties_y) AS DOUBLE)), 6)
      |    AS tau_b
      |FROM agg ORDER BY event_type""".stripMargin

  /** One q233 output row: a step of the survival curve. */
  final case class KmRow(variant: Long, t_hours: Long, n_risk: Long,
      n_events: Long, s_micro: Long)

  /** q233: KAPLAN-MEIER SURVIVAL — time-to-first-purchase per variant
    * WITH RIGHT-CENSORING, the correctness upgrade q213's lag
    * distribution silently lacks: a user whose purchase hasn't
    * happened by the observation cut (2024-01-04 here; 43 of 105
    * subjects) is CENSORED at the cut, not dropped — dropping them
    * biases every "time to convert" readout toward the fast
    * converters. The estimator steps at each event hour t:
    * Ŝ ← Ŝ·(n_t − d_t)/n_t with n_t = subjects still at risk
    * (deaths-before-censorings tie convention).
    *
    * Exactness device: the survival product is SEQUENTIAL, so it runs
    * as q104's fold in integer MICRO-UNITS with truncating division
    * at each step — and the oracle replays the identical integer
    * recursion as a recursive CTE (q214's device). Everything before
    * the fold is one user-grain pass (the shared user_id exchange)
    * plus windows over the hour-bounded risk table; the fold touches
    * |variants|×|event hours| rows.
    */
  private def q233(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cutUs = 1704326400000000L // 2024-01-04T00:00:00Z
    val hourUs = 3600000000L
    val users = Tables
      .events(s, d)
      .withColumn("us", unix_micros($"ts"))
      .withColumn("s1", min(when($"event_type" === "signup", $"us"))
        .over(Window.partitionBy($"user_id")))
      .groupBy($"user_id")
      .agg(
        max($"s1").as("s1"),
        min(when($"event_type" === "purchase" && $"us" > $"s1", $"us"))
          .as("p1"),
      )
      .where($"s1".isNotNull && $"s1" < cutUs)
      .select(($"user_id" % 2).as("variant"),
        // truncating INTEGER division (DIV, positive operands), never
        // a float divide-and-cast
        when($"p1".isNotNull && $"p1" < cutUs,
          expr(s"(p1 - s1) DIV $hourUs"))
          .otherwise(expr(s"(${cutUs}L - s1) DIV $hourUs"))
          .as("dur_h"),
        ($"p1".isNotNull && $"p1" < cutUs).as("ev"))
    val riskW = Window.partitionBy($"variant").orderBy($"dur_h")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val evRows = users
      .groupBy($"variant", $"dur_h")
      .agg(count(lit(1)).as("n_all"),
        sum(when($"ev", 1L).otherwise(0L)).as("n_ev"))
      .withColumn("n_risk", sum($"n_all").over(riskW))
      .where($"n_ev" >= 1)
      .select($"variant", $"dur_h", $"n_risk", $"n_ev")
      .repartition($"variant")
      .sortWithinPartitions($"variant", $"dur_h")
      .as[(Long, Long, Long, Long)]
    implicit val enc = org.apache.spark.sql.Encoders.product[KmRow]
    evRows
      .mapPartitions { it =>
        val buf = it.buffered
        new Iterator[KmRow] {
          private var curV = Long.MinValue
          private var sMicro = 1000000L
          def hasNext: Boolean = buf.hasNext
          def next(): KmRow = {
            val (v, t, n, dd) = buf.next()
            if (v != curV) { curV = v; sMicro = 1000000L }
            sMicro = sMicro * (n - dd) / n
            KmRow(v, t, n, dd, sMicro)
          }
        }
      }
      .toDF()
      .orderBy($"variant", $"t_hours")
  }

  private val q233Sql =
    """WITH RECURSIVE marked AS (
      |  SELECT user_id, epoch_us(ts) AS us, event_type,
      |    MIN(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END)
      |      OVER (PARTITION BY user_id) AS s1
      |  FROM events),
      |u AS (
      |  SELECT user_id, MAX(s1) AS s1,
      |    MIN(CASE WHEN event_type = 'purchase' AND us > s1
      |      THEN us END) AS p1
      |  FROM marked GROUP BY user_id),
      |subj AS (
      |  SELECT user_id % 2 AS variant,
      |    CASE WHEN p1 IS NOT NULL AND p1 < 1704326400000000
      |      THEN (p1 - s1) // 3600000000
      |      ELSE (1704326400000000 - s1) // 3600000000 END AS dur_h,
      |    (p1 IS NOT NULL AND p1 < 1704326400000000) AS ev
      |  FROM u WHERE s1 IS NOT NULL AND s1 < 1704326400000000),
      |grid AS (
      |  SELECT variant, dur_h, COUNT(*) AS n_all,
      |    CAST(SUM(CASE WHEN ev THEN 1 ELSE 0 END) AS BIGINT) AS n_ev
      |  FROM subj GROUP BY 1, 2),
      |ev_rows AS (
      |  SELECT variant, dur_h,
      |    CAST(SUM(n_all) OVER (PARTITION BY variant ORDER BY dur_h
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
      |      AS BIGINT) AS n_risk,
      |    n_ev,
      |    ROW_NUMBER() OVER (PARTITION BY variant ORDER BY dur_h) AS i
      |  FROM grid),
      |evs AS (
      |  SELECT variant, dur_h, n_risk, n_ev,
      |    ROW_NUMBER() OVER (PARTITION BY variant ORDER BY dur_h) AS j
      |  FROM ev_rows WHERE n_ev >= 1),
      |rec AS (
      |  SELECT variant, dur_h, n_risk, n_ev, j,
      |    (1000000 * (n_risk - n_ev)) // n_risk AS s
      |  FROM evs WHERE j = 1
      |  UNION ALL
      |  SELECT nx.variant, nx.dur_h, nx.n_risk, nx.n_ev, nx.j,
      |    (r.s * (nx.n_risk - nx.n_ev)) // nx.n_risk AS s
      |  FROM rec r JOIN evs nx
      |    ON nx.variant = r.variant AND nx.j = r.j + 1)
      |SELECT variant, dur_h AS t_hours, n_risk,
      |  n_ev AS n_events, CAST(s AS BIGINT) AS s_micro
      |FROM rec ORDER BY variant, t_hours""".stripMargin

  /** q234: PERMUTATION TEST for the per-type mean difference — the
    * assumption-free member completing the inference family (q185
    * parametric, q186 nonparametric-distributional, q192 resampling):
    * the null distribution is built by RE-ASSIGNING WHOLE USERS to
    * variants (cluster-correct — q217's lesson applied to testing) 64
    * times and asking how often the permuted |mean_A − mean_B| reaches
    * the observed one. p = (1 + #exceed)/(R + 1), reported in exact
    * integer milli-units.
    *
    * Determinism/exactness: each replicate's assignment is an md5 hex
    * threshold on (user, rep) — q192's device, identical draws both
    * engines — and the exceedance compare never divides:
    * |sA·nB − sB·nA|/(nA·nB) ≥ obs cross-multiplies into DECIMAL(38,0)
    * products (HUGEINT in DuckDB; ≤ 10²² here, exact in both — q170's
    * device applied to a comparison). One user-grain pass (the shared
    * exchange), then (type, user)×64 fan-out rows collapse straight
    * into the (type, rep) partial aggregate.
    */
  private def q234(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val reps = 64
    val byUser = Tables
      .events(s, d)
      .select($"event_type", $"user_id", expr(centsExpr).as("c"))
      .groupBy($"event_type", $"user_id")
      .agg(count(lit(1)).as("n"), sum($"c").as("cs"))
    val obs = byUser
      .groupBy($"event_type")
      .agg(
        sum(when($"user_id" % 2 === 0, $"n").otherwise(0L)).as("na0"),
        sum(when($"user_id" % 2 === 0, $"cs").otherwise(0L)).as("sa0"),
        sum(when($"user_id" % 2 =!= 0, $"n").otherwise(0L)).as("nb0"),
        sum(when($"user_id" % 2 =!= 0, $"cs").otherwise(0L)).as("sb0"),
      )
    val sideA = substring(
      md5(concat($"user_id".cast("string"), lit(":"),
        $"rep".cast("string"), lit(":perm")).cast("binary")),
      1, 8) < "80000000"
    val repAgg = byUser
      .withColumn("rep", explode(sequence(lit(0), lit(reps - 1))))
      .withColumn("a", sideA)
      .groupBy($"event_type", $"rep")
      .agg(
        sum(when($"a", $"n").otherwise(0L)).as("na"),
        sum(when($"a", $"cs").otherwise(0L)).as("sa"),
        sum(when(!$"a", $"n").otherwise(0L)).as("nb"),
        sum(when(!$"a", $"cs").otherwise(0L)).as("sb"),
      )
    val dec = "decimal(38,0)"
    repAgg
      .join(obs, Seq("event_type"))
      .withColumn("exceed",
        $"na" === 0L || $"nb" === 0L ||
          abs($"sa".cast(dec) * $"nb".cast(dec) -
            $"sb".cast(dec) * $"na".cast(dec)) *
          ($"na0".cast(dec) * $"nb0".cast(dec)) >=
          abs($"sa0".cast(dec) * $"nb0".cast(dec) -
            $"sb0".cast(dec) * $"na0".cast(dec)) *
          ($"na".cast(dec) * $"nb".cast(dec)))
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n_reps"),
        sum(when($"exceed", 1L).otherwise(0L)).as("n_exceed"),
        max(round(abs($"sa0".cast("double") / $"na0" -
          $"sb0".cast("double") / $"nb0") / 100.0, 4))
          .as("obs_diff"),
      )
      .withColumn("p_milli",
        expr("(1 + n_exceed) * 1000 DIV (n_reps + 1)"))
      .orderBy($"event_type")
  }

  private val q234Sql =
    s"""WITH by_user AS (
      |  SELECT event_type, user_id, COUNT(*) AS n,
      |    CAST(SUM($centsExpr) AS BIGINT) AS cs
      |  FROM events GROUP BY 1, 2),
      |obs AS (
      |  SELECT event_type,
      |    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN n ELSE 0 END)
      |      AS BIGINT) AS na0,
      |    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN cs ELSE 0 END)
      |      AS BIGINT) AS sa0,
      |    CAST(SUM(CASE WHEN user_id % 2 <> 0 THEN n ELSE 0 END)
      |      AS BIGINT) AS nb0,
      |    CAST(SUM(CASE WHEN user_id % 2 <> 0 THEN cs ELSE 0 END)
      |      AS BIGINT) AS sb0
      |  FROM by_user GROUP BY event_type),
      |fan AS (
      |  SELECT u.event_type, u.user_id, u.n, u.cs, r.rep,
      |    substr(md5(CAST(u.user_id AS VARCHAR) || ':' ||
      |      CAST(r.rep AS VARCHAR) || ':perm'), 1, 8) < '80000000'
      |      AS a
      |  FROM by_user u, range(0, 64) r(rep)),
      |rep_agg AS (
      |  SELECT event_type, rep,
      |    CAST(SUM(CASE WHEN a THEN n ELSE 0 END) AS BIGINT) AS na,
      |    CAST(SUM(CASE WHEN a THEN cs ELSE 0 END) AS BIGINT) AS sa,
      |    CAST(SUM(CASE WHEN NOT a THEN n ELSE 0 END) AS BIGINT)
      |      AS nb,
      |    CAST(SUM(CASE WHEN NOT a THEN cs ELSE 0 END) AS BIGINT)
      |      AS sb
      |  FROM fan GROUP BY event_type, rep),
      |cmp AS (
      |  SELECT r.event_type,
      |    (r.na = 0 OR r.nb = 0 OR
      |     ABS(CAST(r.sa AS HUGEINT) * r.nb -
      |         CAST(r.sb AS HUGEINT) * r.na) *
      |       (CAST(o.na0 AS HUGEINT) * o.nb0) >=
      |     ABS(CAST(o.sa0 AS HUGEINT) * o.nb0 -
      |         CAST(o.sb0 AS HUGEINT) * o.na0) *
      |       (CAST(r.na AS HUGEINT) * r.nb)) AS exceed,
      |    o.na0, o.sa0, o.nb0, o.sb0
      |  FROM rep_agg r JOIN obs o ON o.event_type = r.event_type)
      |SELECT event_type, COUNT(*) AS n_reps,
      |  CAST(SUM(CASE WHEN exceed THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_exceed,
      |  ROUND(MAX(ABS(CAST(sa0 AS DOUBLE) / na0 -
      |    CAST(sb0 AS DOUBLE) / nb0) / 100.0), 4) AS obs_diff,
      |  (1 + CAST(SUM(CASE WHEN exceed THEN 1 ELSE 0 END) AS BIGINT))
      |    * 1000 // (COUNT(*) + 1) AS p_milli
      |FROM cmp GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q235: PRICE-VOLUME CHANGE DECOMPOSITION — the "why did revenue
    * move" root-cause readout: per type, the first-half → second-half
    * revenue change (q194's calendar cut) splits along the exact
    * algebraic identity Δs = Δn·p₁ + n₁·Δp + Δn·Δp into a VOLUME
    * effect (more events at old value), a RATE effect (old volume at
    * new value), and the interaction — the decomposition every
    * revenue dashboard drills into before anyone gets paged. Sums are
    * exact BIGINT cents; the per-event rates and effect terms derive
    * from them in identical IEEE operand order (q185's discipline),
    * rounded at the very end.
    */
  private def q235(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cutUs = 1705363200000000L // 2024-01-16T00:00:00Z, q194's cut
    val suff = Tables
      .events(s, d)
      .select($"event_type", expr(centsExpr).as("c"),
        (unix_micros($"ts") < cutUs).as("h1"))
      .groupBy($"event_type")
      .agg(
        sum(when($"h1", 1L).otherwise(0L)).as("n1"),
        sum(when($"h1", $"c").otherwise(0L)).as("s1"),
        sum(when(!$"h1", 1L).otherwise(0L)).as("n2"),
        sum(when(!$"h1", $"c").otherwise(0L)).as("s2"),
      )
    suff
      .withColumn("p1", $"s1".cast("double") / $"n1")
      .withColumn("p2", $"s2".cast("double") / $"n2")
      .select(
        $"event_type", $"n1", $"n2",
        ($"s2" - $"s1").as("delta_cents"),
        round(($"n2" - $"n1") * $"p1" / 100.0, 4).as("volume_effect"),
        round($"n1" * ($"p2" - $"p1") / 100.0, 4).as("rate_effect"),
        round(($"n2" - $"n1") * ($"p2" - $"p1") / 100.0, 4)
          .as("interaction"),
      )
      .orderBy($"event_type")
  }

  private val q235Sql =
    s"""WITH suff AS (
      |  SELECT event_type,
      |    CAST(SUM(CASE WHEN epoch_us(ts) < 1705363200000000 THEN 1
      |      ELSE 0 END) AS BIGINT) AS n1,
      |    CAST(SUM(CASE WHEN epoch_us(ts) < 1705363200000000
      |      THEN $centsExpr ELSE 0 END) AS BIGINT) AS s1,
      |    CAST(SUM(CASE WHEN epoch_us(ts) >= 1705363200000000 THEN 1
      |      ELSE 0 END) AS BIGINT) AS n2,
      |    CAST(SUM(CASE WHEN epoch_us(ts) >= 1705363200000000
      |      THEN $centsExpr ELSE 0 END) AS BIGINT) AS s2
      |  FROM events GROUP BY event_type),
      |der AS (
      |  SELECT *, CAST(s1 AS DOUBLE) / n1 AS p1,
      |    CAST(s2 AS DOUBLE) / n2 AS p2
      |  FROM suff)
      |SELECT event_type, n1, n2,
      |  CAST(s2 - s1 AS BIGINT) AS delta_cents,
      |  ROUND((n2 - n1) * p1 / 100.0, 4) AS volume_effect,
      |  ROUND(n1 * (p2 - p1) / 100.0, 4) AS rate_effect,
      |  ROUND((n2 - n1) * (p2 - p1) / 100.0, 4) AS interaction
      |FROM der ORDER BY event_type""".stripMargin

  /** q236: K-ANONYMITY / L-DIVERSITY AUDIT — the release-side check
    * that closes the privacy family's loop (q89 masks, q199 erases,
    * q219 noises; this one tells you whether a quasi-identifier
    * release is safe to publish at all): a user-grain release keyed by
    * the quasi-identifiers (nation = the engine-wide `user_id % 25`
    * assignment, cohort day = first activity day) with a binary
    * sensitive attribute (ever purchased). Per QI group: k = group
    * size, l = distinct sensitive values; groups with k < 5 are
    * re-identifiable, groups with l < 2 leak the sensitive value even
    * at large k (homogeneity attack). One user-grain pass, then
    * group-cardinality work — at 100 TB this is q01's shape.
    */
  private def q236(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables
      .events(s, d)
      .select($"user_id", unix_micros($"ts").as("us"), $"event_type")
      .groupBy($"user_id")
      .agg(
        expr("MIN(us) DIV 86400000000").as("cohort_day"),
        max(when($"event_type" === "purchase", 1L).otherwise(0L))
          .as("purch"),
      )
      .select(($"user_id" % 25).as("nation_key"), $"cohort_day",
        $"purch")
      .groupBy($"nation_key", $"cohort_day")
      .agg(
        count(lit(1)).as("k"),
        countDistinct($"purch").as("l"),
      )
      .select($"nation_key", $"cohort_day", $"k", $"l",
        ($"k" < 5).as("violates_k"), ($"l" < 2).as("violates_l"))
      .orderBy($"nation_key", $"cohort_day")
  }

  private val q236Sql =
    """WITH rel AS (
      |  SELECT user_id % 25 AS nation_key,
      |    MIN(epoch_us(ts)) // 86400000000 AS cohort_day,
      |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS purch
      |  FROM events GROUP BY user_id)
      |SELECT nation_key, cohort_day, COUNT(*) AS k,
      |  CAST(COUNT(DISTINCT purch) AS BIGINT) AS l,
      |  COUNT(*) < 5 AS violates_k,
      |  COUNT(DISTINCT purch) < 2 AS violates_l
      |FROM rel GROUP BY nation_key, cohort_day
      |ORDER BY nation_key, cohort_day""".stripMargin

  // ---- q367: Misra–Gries heavy hitters ----------------------------------

  /** Misra–Gries k-counter compress of an exact (key, cnt) histogram:
    * keep the top-k keys with every count decremented by the (k+1)-th
    * largest (0 when fewer than k+1 keys) — the deterministic
    * "summary of a summary" operation from the mergeable-summaries
    * literature (Agarwal et al., PODS'12): union two compressed
    * summaries, sum by key, compress again, and every estimate
    * UNDERESTIMATES its true count by at most the sum of the
    * decrements, while any key whose true count exceeds that sum is
    * GUARANTEED present. Scale shape: the only global step is a
    * top-(k+1) via orderBy+limit (TakeOrderedAndProject — bounded
    * per-task heaps), and every window/rank runs on that ≤ k+1-row
    * frame, never on the key domain. Ties break on (cnt DESC, key) so
    * the whole summary is engine-exact.
    *
    * Returns (summary, t): summary = (key, est) survivors, and t the
    * 1-row decrement this compress applied — emitted from the RANKED
    * frame, not the survivors, so a compress that empties its summary
    * (every top-k count equal to the (k+1)-th) still reports its real
    * nonzero decrement to the guarantee ledger (r19 advice).
    */
  private[graft] def mgCompress(
      s: SparkSession, h: DataFrame, k: Int): (DataFrame, DataFrame) = {
    import s.implicits._
    val top = h.orderBy($"cnt".desc, $"key").limit(k + 1)
    val ranked = top.withColumn("rn",
      row_number().over(Window.orderBy($"cnt".desc, $"key")))
    val t = ranked.agg(coalesce(
      max(when($"rn" === k + 1, $"cnt")), lit(0L)).as("t"))
    val summary = ranked.where($"rn" <= k)
      .crossJoin(broadcast(t)) // 1-row decrement
      .where($"cnt" > $"t")
      .select($"key", ($"cnt" - $"t").as("est"))
    (summary, t)
  }

  /** q367: MERGEABLE HEAVY HITTERS, oracle-gated — the deterministic
    * complement of the probabilistic CMS (q137): per batch
    * (event_id % 10 < 8 / ≥ 8), the exact per-user histogram is
    * Misra–Gries-compressed to k = 16 counters; the two summaries
    * merge by key-sum + one more compress — never touching the raw
    * rows again — and the ledger joins the exact control: per surviving
    * counter, the estimate, the true count, the underestimate, and the
    * total decrement bound T = t₁ + t₂ + t_merge. The MG contract the
    * spec asserts: 0 ≤ true − est ≤ T for every counter, and every key
    * with true > T survives the merge. Everything is integer and
    * tie-broken on (cnt DESC, key), so DuckDB replays the compresses,
    * the merge, and the bound bit-for-bit.
    */
  private def q367(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val k = 16
    val ev = Tables.events(s, d).select($"user_id".as("key"), $"event_id")
    def hist(pred: org.apache.spark.sql.Column) = ev.where(pred)
      .groupBy($"key").agg(count(lit(1)).as("cnt"))
    val (s1, t1) = mgCompress(s, hist($"event_id" % 10 < 8), k)
    val (s2, t2) = mgCompress(s, hist($"event_id" % 10 >= 8), k)
    val (merged, tm) = mgCompress(s,
      s1.select($"key", $"est".as("cnt"))
        .unionByName(s2.select($"key", $"est".as("cnt")))
        .groupBy($"key").agg(sum($"cnt").as("cnt")),
      k)
    // each t comes from its compress's RANKED frame (1 row, 0 when
    // fewer than k+1 keys), so an emptied summary cannot understate T
    val tsum = t1.select($"t".as("t1"))
      .crossJoin(t2.select($"t".as("t2")))
      .crossJoin(tm.select($"t".as("tm")))
      .select(($"t1" + $"t2" + $"tm").as("t_bound"))
    val truth = ev.groupBy($"key").agg(count(lit(1)).as("true_cnt"))
    merged
      .join(truth, Seq("key"))
      .crossJoin(broadcast(tsum)) // 1-row bound
      .select($"key".as("user_id"), $"est".as("est_cnt"), $"true_cnt",
        ($"true_cnt" - $"est").as("under_by"), $"t_bound")
      .orderBy($"est_cnt".desc, $"user_id")
  }

  private val q367Sql =
    """WITH ev AS (SELECT user_id AS key, event_id FROM events),
      |h1 AS (SELECT key, CAST(COUNT(*) AS BIGINT) AS cnt FROM ev
      |       WHERE event_id % 10 < 8 GROUP BY 1),
      |r1 AS (SELECT key, cnt,
      |         ROW_NUMBER() OVER (ORDER BY cnt DESC, key) AS rn
      |       FROM (SELECT * FROM h1 ORDER BY cnt DESC, key LIMIT 17) x),
      |t1 AS (SELECT COALESCE(MAX(CASE WHEN rn = 17 THEN cnt END), 0)
      |         AS t FROM r1),
      |s1 AS (SELECT key, cnt - t AS est, t FROM r1, t1
      |       WHERE rn <= 16 AND cnt > t),
      |h2 AS (SELECT key, CAST(COUNT(*) AS BIGINT) AS cnt FROM ev
      |       WHERE event_id % 10 >= 8 GROUP BY 1),
      |r2 AS (SELECT key, cnt,
      |         ROW_NUMBER() OVER (ORDER BY cnt DESC, key) AS rn
      |       FROM (SELECT * FROM h2 ORDER BY cnt DESC, key LIMIT 17) x),
      |t2 AS (SELECT COALESCE(MAX(CASE WHEN rn = 17 THEN cnt END), 0)
      |         AS t FROM r2),
      |s2 AS (SELECT key, cnt - t AS est, t FROM r2, t2
      |       WHERE rn <= 16 AND cnt > t),
      |hm AS (SELECT key, SUM(est) AS cnt FROM
      |        (SELECT key, est FROM s1 UNION ALL SELECT key, est FROM s2)
      |       GROUP BY 1),
      |rm AS (SELECT key, cnt,
      |         ROW_NUMBER() OVER (ORDER BY cnt DESC, key) AS rn
      |       FROM (SELECT * FROM hm ORDER BY cnt DESC, key LIMIT 17) x),
      |tm AS (SELECT COALESCE(MAX(CASE WHEN rn = 17 THEN cnt END), 0)
      |         AS t FROM rm),
      |sm AS (SELECT key, cnt - t AS est FROM rm, tm
      |       WHERE rn <= 16 AND cnt > t),
      |bound AS (SELECT (SELECT t FROM t1) + (SELECT t FROM t2)
      |            + (SELECT t FROM tm) AS t_bound),
      |truth AS (SELECT key, CAST(COUNT(*) AS BIGINT) AS true_cnt
      |          FROM ev GROUP BY 1)
      |SELECT sm.key AS user_id, CAST(est AS BIGINT) AS est_cnt, true_cnt,
      |  CAST(true_cnt - est AS BIGINT) AS under_by,
      |  CAST(t_bound AS BIGINT) AS t_bound
      |FROM sm JOIN truth ON truth.key = sm.key CROSS JOIN bound
      |ORDER BY est_cnt DESC, user_id""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("q186_ks_test", q186, Some(q186Sql)),
    // deterministic mergeable heavy hitters (the CMS complement)
    QueryDef("q367_heavy_hitters_mg", q367, Some(q367Sql)),
    QueryDef("q191_kmv_intersect", q191, Some(q191Sql)),
    QueryDef("q192_bootstrap_ci", q192, Some(q192Sql)),
    QueryDef("q194_cuped", q194, Some(q194Sql)),
    QueryDef("q195_chi2_srm", q195, Some(q195Sql)),
    QueryDef("q196_winsorized_mean", q196, Some(q196Sql)),
    QueryDef("q197_bootstrap_median", q197, Some(q197Sql)),
    QueryDef("q198_theil_sen", q198, Some(q198Sql)),
    QueryDef("q203_rolling_median", q203, Some(q203Sql)),
    QueryDef("q206_kmv_merge", q206, Some(q206Sql)),
    QueryDef("q212_quantile_effects", q212, Some(q212Sql)),
    QueryDef("q217_delta_method", q217, Some(q217Sql)),
    QueryDef("q219_dp_histogram", q219, Some(q219Sql)),
    QueryDef("q265_dp_user_level", q265, Some(q265Sql)),
    QueryDef("q309_k_anonymity", q309, Some(q309Sql)),
    QueryDef("q232_kendall_tau", q232, Some(q232Sql)),
    QueryDef("q233_kaplan_meier", q233, Some(q233Sql)),
    QueryDef("q234_permutation_test", q234, Some(q234Sql)),
    QueryDef("q235_change_decomposition", q235, Some(q235Sql)),
    QueryDef("q236_kanon_audit", q236, Some(q236Sql)),
    QueryDef("q213_conversion_lag", q213, Some(q213Sql)),
  )
}
