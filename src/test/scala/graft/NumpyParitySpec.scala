package graft

import graft.gen._
import graft.gen.Rng.{DensityMode, IntervalDist, JitterDist}
import org.scalatest.funsuite.AnyFunSuite

import java.util.zip.GZIPInputStream
import scala.io.Source

/** Bit-parity gate for the numpy `default_rng` port ([[NumpyRng]]) and
  * the byte-exact reference replay ([[ParityStream]]). Every golden in
  * `src/test/resources/npparity/` was produced by EXECUTING numpy 1.26 /
  * the reference generator itself (`eventstream.py`, including
  * `main.py`'s exact 40k demo config) and captures raw draws, integer
  * distribution draws, float draw bit patterns, `generate_patterns`
  * matrices, and full (ts, type, is_pattern) streams.
  *
  * Exactness tiers asserted here (matching NumpyRng's documented
  * contract): raw PCG64 output, every integer-valued draw, the pattern
  * matrices, and all four reference streams are BIT-EXACT; float draws
  * (normal/laplace/exponential) are allowed ≤2 ulp on the small libm
  * tail/wedge fraction where JVM `Math.log/exp` differs from glibc by
  * 1 ulp, and must be bit-equal on ≥95% of draws (fast ziggurat paths
  * are pure arithmetic and always exact).
  */
class NumpyParitySpec extends AnyFunSuite {

  private def resLines(name: String): List[String] = {
    val in = getClass.getResourceAsStream(s"/npparity/$name")
    require(in != null, s"missing golden resource $name")
    val src =
      if (name.endsWith(".gz")) Source.fromInputStream(new GZIPInputStream(in))
      else Source.fromInputStream(in)
    try src.getLines().toList
    finally src.close()
  }

  private val draws: Map[(String, Long), Array[String]] =
    resLines("draws.csv").map { l =>
      val Array(kind, seed, payload) = l.split(",", 3)
      (kind, seed.toLong) -> payload.split(" ")
    }.toMap

  private val seeds = Seq(0L, 42L, 123456789L, 4611686018427387907L)

  test("SeedSequence -> PCG64 raw 64-bit stream is bit-exact") {
    seeds.foreach { s =>
      val rng = NumpyRng(s)
      val got = Array.fill(16)(rng.nextLong())
      val want = draws(("raw", s)).map(h => java.lang.Long.parseUnsignedLong(h, 16))
      assert(got.sameElements(want), s"raw stream diverged for seed $s")
    }
  }

  test("bounded integer draws are bit-exact (32-bit Lemire + 64-bit path)") {
    seeds.foreach { s =>
      var rng = NumpyRng(s)
      assert(draws(("int1000", s)).map(_.toLong)
        .sameElements(Array.fill(500)(rng.integers(0, 1000))), s"int1000 seed $s")
      rng = NumpyRng(s)
      assert(draws(("intneg", s)).map(_.toLong)
        .sameElements(Array.fill(500)(rng.integers(-7, 8))), s"intneg seed $s")
      rng = NumpyRng(s)
      assert(draws(("intbig", s)).map(_.toLong)
        .sameElements(Array.fill(200)(rng.integers(0, (1L << 40) + 17))),
        s"intbig seed $s")
    }
  }

  test("poisson draws are bit-exact (multiplication and PTRS branches)") {
    seeds.foreach { s =>
      var rng = NumpyRng(s)
      assert(draws(("poisson6", s)).map(_.toLong)
        .sameElements(Array.fill(500)(rng.poisson(6.0))), s"poisson6 seed $s")
      rng = NumpyRng(s)
      assert(draws(("poisson25", s)).map(_.toLong)
        .sameElements(Array.fill(500)(rng.poisson(25.5))), s"poisson25 seed $s")
    }
  }

  test("geometric draws are bit-exact (search and exponential-inversion)") {
    seeds.foreach { s =>
      var rng = NumpyRng(s)
      assert(draws(("geom05", s)).map(_.toLong)
        .sameElements(Array.fill(300)(rng.geometric(0.5))), s"geom05 seed $s")
      rng = NumpyRng(s)
      assert(draws(("geom0125", s)).map(_.toLong)
        .sameElements(Array.fill(300)(rng.geometric(0.125))), s"geom0125 seed $s")
    }
  }

  test("interleaved draws share the 32-bit buffer exactly like numpy") {
    // the reference's actual call mix: bounded ints (32-bit buffered
    // path) interleaved with 64-bit normal/poisson/laplace/geometric
    // draws; any buffer-handling slip desynchronizes instantly
    seeds.foreach { s =>
      val rng = NumpyRng(s)
      val got = Array.tabulate(600) { i =>
        i % 5 match {
          case 0 => rng.integers(0, 17)
          case 1 => Math.rint(rng.normal(0, 3)).toLong
          case 2 => rng.poisson(6.0)
          case 3 => Math.rint(rng.laplace(0.0, 2.0)).toLong
          case _ => rng.geometric(0.2)
        }
      }
      assert(got.sameElements(draws(("mixed", s)).map(_.toLong)),
        s"interleaved stream diverged for seed $s")
    }
  }

  test("float draws: per-family ulp residue pinned (permanent contract)") {
    // THE formal float-parity residue (r18 verdict item 7) — a tested
    // invariant, not a prose note. Measured on this JVM's libm against
    // executed-numpy goldens: normal 2000/2000 and stdexp 2000/2000
    // bit-equal, laplace 1998/2000 with both mismatches ≤ 2 ulp (the
    // ziggurat fast paths are pure arithmetic = bit-exact; only the
    // log/exp tail corrections can differ where JVM libm ≠ glibc).
    // Pinned with minimal headroom: ≥ 99.9% exact for the bit-exact
    // families, ≥ 99.8% for laplace, and EVERY draw within 2 ulp —
    // any libm drift or port regression lands on a hard assert.
    def check(kind: String, minExact: Double, gen: NumpyRng => Double)
        : Unit = {
      var exact = 0L
      var total = 0L
      seeds.foreach { s =>
        val rng = NumpyRng(s)
        draws((kind, s)).foreach { hexBits =>
          val want = java.lang.Long.parseUnsignedLong(hexBits, 16)
          val gotBits = java.lang.Double.doubleToLongBits(gen(rng))
          total += 1
          if (gotBits == want) exact += 1
          else {
            // same-sign IEEE doubles order monotonically in their bits
            assert((gotBits ^ want) >= 0 && math.abs(gotBits - want) <= 2,
              s"$kind seed $s: ${java.lang.Double.longBitsToDouble(gotBits)} vs " +
                s"${java.lang.Double.longBitsToDouble(want)}")
          }
        }
      }
      info(s"$kind: $exact/$total bit-equal")
      assert(exact.toDouble / total >= minExact,
        s"$kind: only $exact/$total bit-equal (contract $minExact)")
    }
    check("normal", 0.999, _.standardNormal())
    check("laplace", 0.998, _.laplace(0.0, 2.5))
    check("stdexp", 0.999, _.standardExponential())
  }

  test("unsignedMulHigh matches the BigInt reference") {
    val r = new scala.util.Random(20260814L)
    val cases = Seq(0L, -1L, 1L, Long.MinValue, Long.MaxValue) ++
      Seq.fill(2000)(r.nextLong())
    for (a <- cases.take(60); b <- cases.take(60)) {
      val big = (BigInt(a) & BigInt("ffffffffffffffff", 16)) *
        (BigInt(b) & BigInt("ffffffffffffffff", 16))
      val want = (big >> 64).toLong
      assert(NumpyRng.unsignedMulHigh(a, b) == want, s"mulhigh($a, $b)")
    }
  }

  test("generate_patterns replays bit-exactly across gap distributions") {
    resLines("patterns.csv").foreach { line =>
      val Array(cfg, typesSer, gapsSer) = line.split("\\|", 3)
      val Array(np0, l0, nt, gd, gb, lo, hi, seed) = cfg.split(",")
      val dist = gd match {
        case "uniform"   => IntervalDist.Uniform
        case "poisson"   => IntervalDist.Poisson
        case "geometric" => IntervalDist.Geometric
        case "fixed"     => IntervalDist.Fixed
      }
      val got = ParityStream.patterns(PatternSpec(np0.toInt, l0.toInt, nt.toInt,
        dist, gb.toInt, lo.toInt, hi.toInt, seed.toLong))
      val wantTypes = typesSer.split(";").map(_.split(",").map(_.toInt))
      val wantGaps = gapsSer.split(";").map(_.split(",").map(_.toInt))
      assert(got.types.map(_.toSeq).toSeq == wantTypes.map(_.toSeq).toSeq,
        s"types mismatch for $cfg")
      assert(got.gaps.map(_.toSeq).toSeq == wantGaps.map(_.toSeq).toSeq,
        s"gaps mismatch for $cfg")
    }
  }

  private val demoPatterns = ParityStream.patterns(
    PatternSpec(8, 10, 6, IntervalDist.Uniform, 5, 3, 9, 137L))

  private val streamConfigs: Map[String, StreamSpec] = Map(
    // main.py:4-38 verbatim
    "demo" -> StreamSpec(patterns = demoPatterns, nTypes = 6,
      totalEvents = 40000, randomRatio = 0.7,
      patternJitterDist = JitterDist.Uniform, patternJitter = 2.0,
      randIntervalDist = IntervalDist.Poisson, randIntervalBase = 6,
      randJitterDist = JitterDist.Uniform, randJitter = 1.0,
      density = DensityMode.Sin(1.0, 8000.0, 0.6), seed = 2025L),
    "gauss_geom" -> StreamSpec(patterns = demoPatterns, nTypes = 6,
      totalEvents = 5000, randomRatio = 0.5,
      patternJitterDist = JitterDist.Gaussian, patternJitter = 3.0,
      randIntervalDist = IntervalDist.Geometric, randIntervalBase = 8,
      randJitterDist = JitterDist.Laplace, randJitter = 2.0,
      density = DensityMode.None, seed = 7L),
    "laplace_unif" -> StreamSpec(patterns = demoPatterns, nTypes = 12,
      totalEvents = 8000, randomRatio = 0.3,
      patternJitterDist = JitterDist.Laplace, patternJitter = 1.0,
      randIntervalDist = IntervalDist.Uniform, randIntervalBase = 5,
      randLow = 2, randHigh = 9,
      randJitterDist = JitterDist.Gaussian, randJitter = 2.0,
      density = DensityMode.Sin(1.3, 500.0, 0.9), seed = 555L),
    "fixed_none" -> StreamSpec(patterns = demoPatterns, nTypes = 4,
      totalEvents = 3000, randomRatio = 0.95,
      patternJitterDist = JitterDist.None, patternJitter = 0.0,
      randIntervalDist = IntervalDist.Fixed, randIntervalBase = 3,
      randJitterDist = JitterDist.None, randJitter = 0.0,
      density = DensityMode.None, seed = 123L),
  )

  test("reference streams replay BYTE-FOR-BYTE (4 configs incl. main.py demo)") {
    streamConfigs.foreach { case (name, spec) =>
      val want = resLines(s"stream_$name.csv.gz").drop(1).map { l =>
        val Array(ts, ty, isp) = l.split(",")
        (ts.toLong, ty.toInt, isp == "1")
      }
      val got = ParityStream.iterator(spec)
        .map(e => (e.ts, e.event_type, e.is_pattern)).toList
      assert(got.size == want.size, s"$name: size ${got.size} vs ${want.size}")
      got.zip(want).zipWithIndex.find { case ((a, b), _) => a != b }.foreach {
        case ((a, b), idx) => fail(s"$name: first divergence at $idx: $a vs $b")
      }
    }
  }

  test("parity iterator is deterministic and seq-indexed") {
    val spec = streamConfigs("gauss_geom")
    val a = ParityStream.iterator(spec).toList
    val b = ParityStream.iterator(spec).toList
    assert(a == b)
    assert(a.map(_.seq) == (0L until 5000L).toList)
  }
}
