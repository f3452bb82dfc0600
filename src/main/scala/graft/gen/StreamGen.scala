package graft.gen

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import Rng.{DensityMode, IntervalDist, JitterDist}

/** One generated event (≡ the reference's three parallel arrays,
  * `eventstream.py:304-306`, plus the implicit array index as `seq`).
  * `ts` is an integer tick — logical time, not wall-clock
  * (`eventstream.py:2-3`); project onto TimestampType only at the
  * streaming/window boundary (SURVEY.md §7.5.4).
  */
final case class Event(
    seq: Long,
    ts: Long,
    event_type: Int,
    is_pattern: Boolean,
)

/** Full stream spec ≡ `EventStream.__init__`'s 18 parameters
  * (`eventstream.py:197-284`).
  */
final case class StreamSpec(
    patterns: PatternSet,
    nTypes: Int,
    totalEvents: Long,
    randomRatio: Double = 0.5,
    patternJitterDist: JitterDist = JitterDist.None,
    patternJitter: Double = 0.0,
    randIntervalDist: IntervalDist = IntervalDist.Fixed,
    randIntervalBase: Int = 5,
    randLow: Int = 1,
    randHigh: Int = 1,
    randJitterDist: JitterDist = JitterDist.None,
    randJitter: Double = 0.0,
    density: DensityMode = DensityMode.None,
    seed: Long = 2025L,
) {
  require(
    randomRatio >= 0.0 && randomRatio <= 1.0,
    "random_ratio must be in [0, 1]", // eventstream.py:223
  )

  /** Expected base interval (before density scaling) — drives block
    * mode's expected-clock recurrence (SURVEY.md §4.3).
    */
  def meanBase: Double = randIntervalDist match {
    case IntervalDist.Fixed     => math.max(1, randIntervalBase).toDouble
    case IntervalDist.Poisson   => math.max(1.0, randIntervalBase.toDouble)
    case IntervalDist.Geometric => math.max(1, randIntervalBase).toDouble
    case IntervalDist.Uniform   => (randLow + randHigh) / 2.0
  }

  /** Mean gap inside pattern instances (from the gap matrices). */
  def patternMeanGap: Double = {
    val g = patterns.gaps.flatten
    if (g.isEmpty) 1.0 else g.sum.toDouble / g.length
  }

  /** Expected block duration in ticks at rate factor r. */
  def expectedBlockTicks(b: Schedule.Block, r: Double): Double = {
    val rest = if (b.afterPattern) 1.0 else 0.0
    if (b.isPattern) rest + (b.len - 1) * (patternMeanGap / r)
    else rest + b.len * (meanBase / r)
  }
}

/** The stream generator (≡ `EventStream._generate_stream`,
  * `eventstream.py:288-409`) in two modes:
  *
  *  - '''exact''': one sequential pass, faithful to every reference
  *    semantic — zero first-gap at pattern starts (`:357-360`), per-gap
  *    jitter (`:366-373`), density divided at the true running clock
  *    (`:331-337,374-381`), +1 tick rest after each pattern (`:383-385`),
  *    truncation at N (`:363-364`). Runs as a single-partition flatMap on
  *    an executor (the reference itself is single-thread at ~100k ev/s;
  *    this loop does >10M ev/s).
  *
  *  - '''block''': the 100 TB path. The RNG-free schedule assigns every
  *    block an independent substream keyed by its seqStart; executors fill
  *    blocks embarrassingly parallel, then timestamps are fixed up with a
  *    two-pass per-partition prefix sum (no global single-partition
  *    window, no shuffle — one tiny collect of per-partition gap sums).
  *    Identical to exact mode except the density phase is evaluated at
  *    the expected clock `seq * meanGap` (bounded drift, documented) —
  *    with density off, block mode and exact mode produce byte-identical
  *    streams for the same seed regardless of partition count.
  */
object StreamGen {

  /** Faithful sequential generator (shared by exact mode and tests).
    * Draws come from the same per-block substreams as block mode (keyed
    * on the block's seqStart), so with density off the two modes emit
    * byte-identical streams; the only exact-mode difference is that the
    * density phase sees the TRUE running clock.
    */
  def exactIterator(spec: StreamSpec): Iterator[Event] = {
    val pat = spec.patterns
    var t   = 0L
    var emitted = 0L

    Schedule
      .blocks(spec.totalEvents, spec.randomRatio, pat.length)
      .flatMap { b =>
        val rng = new Rng.Stream(spec.seed, stream = b.seqStart + 3L)
        if (b.afterPattern) t += 1L // rest tick, eventstream.py:383-385
        if (!b.isPattern) {
          val base = Rng.interval(spec.randIntervalBase, spec.randIntervalDist,
            rng, spec.randLow, spec.randHigh)
          val jit = Rng.jitter(base, spec.randJitterDist, spec.randJitter, rng)
          val r   = Rng.densityScale(t, spec.density)
          val gap = math.max(1L, math.rint(jit / r).toLong)
          t += gap
          val ev = Event(emitted, t, rng.nextInt(0, spec.nTypes - 1),
            is_pattern = false)
          emitted += 1
          Iterator.single(ev)
        } else {
          val p = rng.nextInt(0, pat.nPatterns - 1)
          val out = new Array[Event](b.len)
          var j = 0
          while (j < b.len) {
            if (j > 0) {
              val jit = Rng.jitter(pat.gaps(p)(j - 1), spec.patternJitterDist,
                spec.patternJitter, rng)
              val r   = Rng.densityScale(t, spec.density)
              t += math.max(1L, math.rint(jit / r).toLong)
            } // j == 0: first event shares the previous timestamp (zero gap)
            out(j) = Event(emitted, t, pat.types(p)(j), is_pattern = true)
            emitted += 1
            j += 1
          }
          out.iterator
        }
      }
  }

  /** Exact mode as a Dataset: the loop runs lazily on one executor. */
  def exact(spark: SparkSession, spec: StreamSpec): Dataset[Event] = {
    implicit val enc = Encoders.product[Event]
    spark.range(0, 1, 1, 1).flatMap(_ => exactIterator(spec))
  }

  /** Per-block fill: gaps + types only (timestamps need the global prefix
    * sum). Every draw is keyed on (seed, block seqStart, local counter) —
    * no sequential RNG state crosses a block boundary.
    */
  private def fillBlock(
      spec: StreamSpec,
      b: Schedule.Block,
      approxStart: Double,
  ): Array[(Long, Long, Int, Boolean)] = {
    val rng = new Rng.Stream(spec.seed, stream = b.seqStart + 3L)
    val pat = spec.patterns
    val lead = if (b.afterPattern) 1L else 0L
    val out = new Array[(Long, Long, Int, Boolean)](b.len)
    val stepGap = if (b.isPattern) spec.patternMeanGap else spec.meanBase
    def tApprox(localSeq: Long): Long =
      math.rint(
        approxStart + localSeq * stepGap /
          Rng.densityScale(math.rint(approxStart).toLong, spec.density)
      ).toLong
    if (!b.isPattern) {
      val base = Rng.interval(spec.randIntervalBase, spec.randIntervalDist,
        rng, spec.randLow, spec.randHigh)
      val jit = Rng.jitter(base, spec.randJitterDist, spec.randJitter, rng)
      val r   = Rng.densityScale(tApprox(0), spec.density)
      val gap = math.max(1L, math.rint(jit / r).toLong)
      out(0) = (b.seqStart, lead + gap, rng.nextInt(0, spec.nTypes - 1), false)
    } else {
      val p = rng.nextInt(0, pat.nPatterns - 1)
      var j = 0
      while (j < b.len) {
        val gap =
          if (j == 0) 0L // zero first-gap, eventstream.py:357-360
          else {
            val jit = Rng.jitter(pat.gaps(p)(j - 1), spec.patternJitterDist,
              spec.patternJitter, rng)
            val r = Rng.densityScale(tApprox(j), spec.density)
            math.max(1L, math.rint(jit / r).toLong)
          }
        out(j) = (b.seqStart + j, (if (j == 0) lead else 0L) + gap,
          pat.types(p)(j), true)
        j += 1
      }
    }
    out
  }

  /** Block-parallel mode: schedule → parallel fill → two-pass prefix sum.
    * `parallelize` slices the block list into contiguous ranges, so each
    * partition owns a contiguous seq span and the per-partition running
    * sums compose with one broadcast of partition offsets.
    */
  def block(
      spark: SparkSession,
      spec: StreamSpec,
      partitions: Int = 0,
  ): Dataset[Event] = {
    val nPart =
      if (partitions > 0) partitions else spark.sparkContext.defaultParallelism
    val blockList = Schedule
      .blocks(spec.totalEvents, spec.randomRatio, spec.patterns.length)
      .toIndexedSeq

    // Expected clock per block: integrate dt ≈ len·meanBase/r(t̂) on the
    // driver (one double per block). This tracks the density feedback —
    // events cluster where the rate is high, so the naive seq·meanGap
    // clock would drift the sin phase and inflate the span; the
    // recurrence keeps block mode's density profile aligned with exact
    // mode's true running clock. O(#blocks) driver time, no RNG.
    val withStarts: IndexedSeq[(Schedule.Block, Double)] = {
      var tHat = 0.0
      blockList.map { b =>
        val r = Rng.densityScale(math.rint(tHat).toLong, spec.density)
        val entry = (b, tHat)
        tHat += spec.expectedBlockTicks(b, r)
        entry
      }
    }
    val bcSpec = spark.sparkContext.broadcast(spec)
    val gapsRdd = spark.sparkContext
      .parallelize(withStarts, math.min(nPart, math.max(1, blockList.size)))
      .flatMap { case (b, t0) => fillBlock(bcSpec.value, b, t0) }

    // pass 1: total gap per partition (tiny collect: one long per partition)
    val partSums = gapsRdd
      .mapPartitionsWithIndex { (i, it) =>
        var s = 0L; it.foreach(s += _._2); Iterator((i, s))
      }
      .collect()
      .sortBy(_._1)
      .map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _)

    // pass 2: partition-local running sum + broadcast offset
    val events = gapsRdd.mapPartitionsWithIndex { (i, it) =>
      var t = offsets(i)
      it.map { case (seq, gap, tpe, isPat) =>
        t += gap
        Event(seq, t, tpe, isPat)
      }
    }
    implicit val enc = Encoders.product[Event]
    spark.createDataset(events)
  }
}
