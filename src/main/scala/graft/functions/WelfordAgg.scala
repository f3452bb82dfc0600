package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.b): numerically-stable running
  * mean/variance via Welford's algorithm with Chan's parallel merge —
  * the shape any bespoke distributed statistic takes in this engine
  * (per-partition `reduce`, cross-partition `merge`, associative and
  * order-tolerant). Verified against the built-in `var_samp` across
  * partitionings in WelfordSpec.
  */
object WelfordAgg {

  final case class Moments(n: Long, mean: Double, m2: Double)

  val zero: Moments = Moments(0L, 0.0, 0.0)

  def step(s: Moments, x: Double): Moments = {
    val n     = s.n + 1
    val delta = x - s.mean
    val mean  = s.mean + delta / n
    Moments(n, mean, s.m2 + delta * (x - mean))
  }

  def merge(a: Moments, b: Moments): Moments = {
    if (a.n == 0) b
    else if (b.n == 0) a
    else {
      val n     = a.n + b.n
      val delta = b.mean - a.mean
      Moments(
        n,
        a.mean + delta * b.n / n,
        a.m2 + b.m2 + delta * delta * a.n * b.n / n.toDouble,
      )
    }
  }

  /** (count, mean, sample variance) in one pass. */
  final case class Stats(n: Long, mean: Double, varSamp: Double)

  val of: Aggregator[Double, Moments, Stats] =
    new Aggregator[Double, Moments, Stats] {
      def zero: Moments = WelfordAgg.zero
      def reduce(s: Moments, x: Double): Moments = step(s, x)
      def merge(a: Moments, b: Moments): Moments = WelfordAgg.merge(a, b)
      def finish(s: Moments): Stats =
        Stats(s.n, s.mean, if (s.n > 1) s.m2 / (s.n - 1) else Double.NaN)
      def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
      def outputEncoder: Encoder[Stats]   = Encoders.product[Stats]
    }
}
