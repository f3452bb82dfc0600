package graft

import graft.gen.{Rng, Schedule}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Randomized property coverage (ScalaCheck driven from ScalaTest):
  * sampler contracts from `eventstream.py:31-91` and schedule
  * closed-form equivalence over arbitrary configs.
  */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop, n: Int = 200): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private val seeds = Gen.choose(Long.MinValue, Long.MaxValue)

  test("uniform draws are in [0,1) for any seed/stream/counter") {
    check(Prop.forAll(seeds, seeds, Gen.choose(0L, 1000000L)) {
      (seed, stream, ctr) =>
        val u = Rng.uniform(seed, stream, ctr)
        u >= 0.0 && u < 1.0
    })
  }

  test("jitter respects the minVal clamp for every dist/amount/base") {
    val dists = Gen.oneOf(Rng.JitterDist.None, Rng.JitterDist.Uniform,
      Rng.JitterDist.Gaussian, Rng.JitterDist.Laplace)
    check(Prop.forAll(dists, Gen.choose(0, 100), Gen.choose(0.0, 50.0),
      Gen.choose(0, 5), seeds) { (d, base, amount, minVal, seed) =>
      val r = new Rng.Stream(seed, 0)
      val out = Rng.jitter(base, d, amount, r, minVal)
      out >= minVal &&
        (d != Rng.JitterDist.None || out == math.max(minVal, base))
    })
  }

  test("interval sampler stays in its contract range") {
    check(Prop.forAll(Gen.choose(1, 50), Gen.choose(1, 20),
      Gen.choose(0, 30), seeds) { (base, low, span, seed) =>
      val r    = new Rng.Stream(seed, 1)
      val high = low + span
      val fixed = Rng.interval(base, Rng.IntervalDist.Fixed, r)
      val uni   = Rng.interval(base, Rng.IntervalDist.Uniform, r, low, high)
      val geo   = Rng.interval(base, Rng.IntervalDist.Geometric, r)
      val poi   = Rng.interval(base, Rng.IntervalDist.Poisson, r)
      fixed == math.max(1, base) &&
      uni >= low && uni <= high &&
      geo >= 1 && poi >= 1
    })
  }

  test("density scale is always >= 1e-6") {
    check(Prop.forAll(Gen.choose(0L, 1000000L), Gen.choose(-2.0, 2.0),
      Gen.choose(-3.0, 3.0), Gen.choose(1.0, 100000.0)) {
      (t, baseRate, amp, period) =>
        Rng.densityScale(t, Rng.DensityMode.Sin(baseRate, period, amp)) >=
          1e-6
    })
  }

  test("closed-form layout ≡ iterative schedule for arbitrary configs") {
    check(
      Prop.forAll(
        Gen.choose(1L, 5000L),
        Gen.choose(0.0, 1.0),
        Gen.choose(2, 20),
      ) { (n, r, l) =>
        val iter   = Schedule.blocks(n, r, l).toVector
        val layout = Schedule.Layout(n, r, l)
        layout.numBlocks == iter.length &&
        iter.indices.forall(k => layout.blockAt(k.toLong) == iter(k))
      },
      n = 120,
    )
  }

  test("KMV merge law: sketch(A ∪ B) == merge(sketch(A), sketch(B))") {
    // the algebra q206 (daily merge) and q207 (streaming state fold)
    // rely on: for any partition of the id space, merging the parts'
    // k-minimum sets and re-truncating equals sketching the union —
    // associative, commutative, idempotent
    val k = 16
    def md5hex(x: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(x.toString.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    def sketch(ids: Set[Long]): Vector[String] =
      ids.map(md5hex).toVector.sorted.take(k)
    def merge(a: Vector[String], b: Vector[String]): Vector[String] =
      (a ++ b).distinct.sorted.take(k)
    val idSets = Gen.containerOf[Set, Long](Gen.choose(0L, 100000L))
    check(Prop.forAll(idSets, idSets) { (a, b) =>
      val direct = sketch(a ++ b)
      merge(sketch(a), sketch(b)) == direct &&
      merge(sketch(b), sketch(a)) == direct && // commutative
      merge(direct, sketch(a)) == direct       // idempotent absorb
    })
  }
}
