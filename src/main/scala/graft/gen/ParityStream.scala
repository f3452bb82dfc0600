package graft.gen

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import Rng.{DensityMode, IntervalDist, JitterDist}

/** BYTE-EXACT twin of the reference generator: replays
  * `generate_patterns` (`eventstream.py:140-183`) and `_generate_stream`
  * (`eventstream.py:288-409`) draw-for-draw on [[NumpyRng]], so the
  * produced (ts, event_type, is_pattern) arrays equal the reference's
  * numpy output bit-for-bit (golden-proven by NumpyParitySpec against
  * executed reference runs, including `main.py`'s 40k demo config).
  *
  * This mode is sequential BY DEFINITION — the reference consumes one
  * global numpy draw stream, so byte parity and partition-independence
  * are mutually exclusive. The engine's default remains [[StreamGen]]'s
  * counter-based exact/block modes (distribution-equal, any-scale); use
  * this twin when replaying a numpy-generated corpus exactly matters
  * (cross-system result diffs, cache-key-compatible regeneration,
  * fixture refresh without Python). The loop runs lazily inside one
  * executor task and streams events without materializing the arrays,
  * so N is bounded by time, not memory; repartition downstream for
  * parallel consumption.
  */
object ParityStream {

  /** ≡ `_apply_jitter_int` (`eventstream.py:31-60`) over numpy draws. */
  private[gen] def jitter(rng: NumpyRng, base: Long, dist: JitterDist,
      amount: Double, minVal: Long): Long = {
    if (dist == JitterDist.None || amount <= 0) return math.max(minVal, base)
    val delta = dist match {
      case JitterDist.Uniform =>
        rng.integers(-amount.toLong, amount.toLong + 1)
      case JitterDist.Gaussian => Math.rint(rng.normal(0.0, amount)).toLong
      case JitterDist.Laplace  => Math.rint(rng.laplace(0.0, amount)).toLong
      case JitterDist.None     => 0L // unreachable
    }
    math.max(minVal, base + delta)
  }

  /** ≡ `_sample_interval_int` (`eventstream.py:63-91`) over numpy draws. */
  private[gen] def interval(rng: NumpyRng, base: Int, dist: IntervalDist,
      low: Int, high: Int): Long = dist match {
    case IntervalDist.Fixed   => math.max(1L, base.toLong)
    case IntervalDist.Poisson =>
      math.max(1L, rng.poisson(math.max(1e-9, base.toDouble)))
    case IntervalDist.Geometric =>
      rng.geometric(1.0 / math.max(1.0, base.toDouble))
    case IntervalDist.Uniform =>
      require(low >= 1 && high >= low,
        "uniform interval requires valid [low, high] with low>=1")
      rng.integers(low.toLong, high.toLong + 1)
  }

  /** ≡ `_density_scale` (`eventstream.py:94-113`); pure math, shared
    * semantics with Rng.densityScale but kept inline here so the float
    * expression order matches the reference line-for-line.
    */
  private[gen] def density(t: Long, mode: DensityMode): Double = mode match {
    case DensityMode.None => 1.0
    case DensityMode.Sin(baseRate, period, amp) =>
      val r = baseRate *
        (1.0 + amp * Math.sin(2.0 * Math.PI * (t.toDouble / math.max(1.0, period))))
      math.max(1e-6, r)
  }

  /** ≡ `generate_patterns` (`eventstream.py:140-183`): one numpy stream
    * seeded at `spec.seed` draws the int32 type matrix (row-major,
    * buffered 32-bit Lemire — [[NumpyRng.integers]]) then the gap matrix
    * through the interval sampler, exactly numpy's draw order.
    */
  def patterns(spec: PatternSpec): PatternSet = {
    require(spec.patternLength >= 2, "pattern_length must be >= 2")
    val rng = NumpyRng(spec.seed)
    val types = Array.tabulate(spec.nPatterns, spec.patternLength) { (_, _) =>
      rng.integers(0L, spec.nTypes.toLong).toInt
    }
    val gaps = Array.tabulate(spec.nPatterns, spec.patternLength - 1) { (_, _) =>
      interval(rng, spec.gapBase, spec.gapDist, spec.gapLow, spec.gapHigh).toInt
    }
    PatternSet(types, gaps)
  }

  /** ≡ `_generate_stream` (`eventstream.py:288-409`), draw-for-draw:
    * ratio-controlled interleave of random events and intact pattern
    * instances, rest tick after complete patterns, truncation at N.
    */
  def iterator(spec: StreamSpec): Iterator[Event] = {
    val rng = NumpyRng(spec.seed)
    val pat = spec.patterns
    val L = pat.length
    val n = spec.totalEvents
    val targetRandom = Math.rint(n * spec.randomRatio).toLong
    val targetPattern = n - targetRandom

    new Iterator[Event] {
      private var t = 0L
      private var i = 0L
      private var nRandom = 0L
      private var nPattern = 0L
      private var pending: Iterator[Event] = Iterator.empty

      override def hasNext: Boolean = pending.hasNext || i < n

      override def next(): Event = {
        if (!pending.hasNext) advance()
        pending.next()
      }

      private def advance(): Unit = {
        val ratioNow = nRandom.toDouble / math.max(1L, nRandom + nPattern)
        if ((ratioNow < spec.randomRatio || nPattern + L > targetPattern) &&
            nRandom < targetRandom) {
          // insert_random_event (eventstream.py:314-345)
          val base = interval(rng, spec.randIntervalBase, spec.randIntervalDist,
            spec.randLow, spec.randHigh)
          val jit = jitter(rng, base, spec.randJitterDist, spec.randJitter, 1L)
          val r = density(t, spec.density)
          t += math.max(1L, Math.rint(jit.toDouble / r).toLong)
          val et = rng.integers(0L, spec.nTypes.toLong).toInt // rng.choice
          val ev = Event(i, t, et, is_pattern = false)
          nRandom += 1
          i += 1
          pending = Iterator.single(ev)
        } else {
          // insert_pattern_instance (eventstream.py:348-386)
          val pid = rng.integers(0L, pat.nPatterns.toLong).toInt
          var tCur = t
          val len = math.min(L.toLong, n - i).toInt
          val out = new Array[Event](len)
          var j = 0
          var truncated = false
          while (j < L && !truncated) {
            out(j) = Event(i + j, tCur, pat.types(pid)(j), is_pattern = true)
            nPattern += 1
            if (i + j + 1 >= n) truncated = true // idx >= N early return
            else if (j < L - 1) {
              val jit = jitter(rng, pat.gaps(pid)(j), spec.patternJitterDist,
                spec.patternJitter, 1L)
              val r = density(tCur, spec.density)
              tCur += math.max(1L, Math.rint(jit.toDouble / r).toLong)
            }
            j += 1
          }
          if (!truncated) tCur += 1L // rest tick only after a full pattern
          t = tCur
          i += L // reference advances by L even when truncated
          pending = out.iterator
        }
      }
    }
  }

  /** Parity stream as a Dataset: the sequential loop runs lazily in one
    * executor task (the driver stays light); callers repartition for
    * parallel downstream work.
    */
  def dataset(spark: SparkSession, spec: StreamSpec): Dataset[Event] = {
    implicit val enc = Encoders.product[Event]
    spark.range(0, 1, 1, 1).flatMap(_ => iterator(spec))
  }
}
