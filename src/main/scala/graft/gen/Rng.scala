package graft.gen

/** Counter-based deterministic randomness for the stream generator.
  *
  * The reference draws every sample from one sequential numpy PCG64
  * generator (`eventstream.py:27-28`), which makes output depend on global
  * draw order — unusable under partitioning. We instead key every draw on
  * `(seed, stream, counter)` through a splitmix64-style avalanche, so any
  * executor can compute any draw independently and the output is identical
  * across partition layouts and cluster sizes. Bitwise parity with PCG64 is
  * an explicit non-goal (SURVEY.md §7.5.1); distributional parity is
  * covered by RngSpec.
  *
  * Samplers mirror the reference ops:
  *  - jitter        ≡ `_apply_jitter_int`     (`eventstream.py:31-60`)
  *  - interval      ≡ `_sample_interval_int`  (`eventstream.py:63-91`)
  *  - densityScale  ≡ `_density_scale`        (`eventstream.py:94-113`)
  *
  * Rounding uses half-even (`math.rint`) to match Python/numpy `round`.
  */
object Rng {

  /** splitmix64 finalizer — full-avalanche 64-bit mix. */
  @inline def mix64(x: Long): Long = {
    var z = x
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  @inline def hash(seed: Long, stream: Long, ctr: Long): Long =
    mix64(mix64(mix64(seed + 0x9E3779B97F4A7C15L) ^ stream) ^ ctr)

  /** Uniform double in [0, 1) from 53 high bits. */
  @inline def uniform(seed: Long, stream: Long, ctr: Long): Double =
    (hash(seed, stream, ctr) >>> 11) * 1.1102230246251565e-16

  /** Stateful view over one `(seed, stream)` substream — sequential
    * convenience for the generator loops; the state is just the counter,
    * so position is reproducible and streams never collide.
    */
  final class Stream(seed: Long, stream: Long, var ctr: Long = 0L) {
    @inline def nextUniform(): Double = {
      val u = uniform(seed, stream, ctr); ctr += 1; u
    }

    /** Uniform integer in [lo, hi] inclusive. */
    def nextInt(lo: Int, hi: Int): Int =
      lo + math.floor(nextUniform() * (hi.toLong - lo + 1)).toInt

    /** Standard normal via Box–Muller. */
    def nextGaussian(): Double = {
      val u1 = 1.0 - nextUniform() // (0, 1] — keeps log finite
      val u2 = nextUniform()
      math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
    }

    /** Laplace(0, b) via inverse CDF. */
    def nextLaplace(b: Double): Double = {
      val v = nextUniform() - 0.5
      -b * math.signum(v) * math.log(1.0 - 2.0 * math.abs(v))
    }

    /** Geometric (# trials to first success, >=1) via inverse CDF —
      * matches numpy's support (`eventstream.py:82-85`).
      */
    def nextGeometric(p: Double): Int = {
      if (p >= 1.0) 1
      else {
        val u = nextUniform()
        math.max(1L, math.ceil(math.log1p(-u) / math.log1p(-p)).toLong).toInt
      }
    }

    /** Poisson via Knuth's product-of-uniforms — exact for the small λ the
      * generator uses (λ≈5-10; reference clamps λ ≥ 1e-9 at
      * `eventstream.py:81`). O(λ) per draw; fine for λ up to ~500.
      */
    def nextPoisson(lambda: Double): Int = {
      val l = math.exp(-math.max(1e-9, lambda))
      var k = 0
      var p = 1.0
      while ({ k += 1; p *= nextUniform(); p > l }) {}
      k - 1
    }
  }

  // ---- reference op #2: _apply_jitter_int (eventstream.py:31-60) ----

  sealed trait JitterDist
  object JitterDist {
    case object None     extends JitterDist
    case object Uniform  extends JitterDist
    case object Gaussian extends JitterDist
    case object Laplace  extends JitterDist
  }

  /** Additive integer jitter with clamp `max(minVal, base + delta)`. */
  def jitter(
      base: Int,
      dist: JitterDist,
      amount: Double,
      rng: Stream,
      minVal: Int = 1,
  ): Int = {
    val delta = dist match {
      case JitterDist.None => 0L
      case JitterDist.Uniform =>
        val a = amount.toInt
        rng.nextInt(-a, a).toLong
      case JitterDist.Gaussian =>
        math.rint(rng.nextGaussian() * amount).toLong
      case JitterDist.Laplace =>
        math.rint(rng.nextLaplace(amount)).toLong
    }
    math.max(minVal.toLong, base.toLong + delta).toInt
  }

  // ---- reference op #3: _sample_interval_int (eventstream.py:63-91) ----

  sealed trait IntervalDist
  object IntervalDist {
    case object Fixed     extends IntervalDist
    case object Poisson   extends IntervalDist
    case object Geometric extends IntervalDist
    case object Uniform   extends IntervalDist
  }

  /** Base-interval sampler; `low`/`high` only used by Uniform
    * (validated: low >= 1, high >= low, `eventstream.py:87-88`).
    */
  def interval(
      base: Int,
      dist: IntervalDist,
      rng: Stream,
      low: Int = 1,
      high: Int = 1,
  ): Int = dist match {
    case IntervalDist.Fixed => math.max(1, base)
    case IntervalDist.Poisson =>
      math.max(1, rng.nextPoisson(base.toDouble))
    case IntervalDist.Geometric =>
      rng.nextGeometric(1.0 / math.max(1, base))
    case IntervalDist.Uniform =>
      require(low >= 1 && high >= low, s"uniform interval bounds [$low,$high]")
      rng.nextInt(low, high)
  }

  // ---- reference op #4: _density_scale (eventstream.py:94-113) ----

  sealed trait DensityMode
  object DensityMode {
    case object None extends DensityMode
    final case class Sin(baseRate: Double, period: Double, amp: Double)
        extends DensityMode
  }

  /** Time-varying rate factor r(t); consumers divide gaps by it. */
  def densityScale(t: Long, mode: DensityMode): Double = mode match {
    case DensityMode.None => 1.0
    case DensityMode.Sin(baseRate, period, amp) =>
      math.max(
        1e-6,
        baseRate *
          (1.0 + amp * math.sin(2.0 * math.Pi * t / math.max(1.0, period))),
      )
  }
}
