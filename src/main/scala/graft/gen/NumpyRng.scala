package graft.gen

/** Bit-exact Scala port of `numpy.random.default_rng(seed)` — the RNG the
  * reference draws every sample from (`eventstream.py:27-28`). This closes
  * the one remaining fidelity gap documented since round 1 (SURVEY §7.5.1):
  * with this generator, [[ParityStream]] reproduces the reference's event
  * stream BYTE-FOR-BYTE (timestamps, types, is_pattern), not just
  * distributionally. The scalable default remains [[Rng]]'s counter-based
  * splitmix64 (partition-independent); this sequential twin exists for
  * golden-exact replay, cross-validation, and drop-in parity with numpy
  * pipelines at bounded N.
  *
  * Everything here is re-derived from public, BSD-licensed numpy 1.26
  * sources (no proprietary inputs):
  *  - `SeedSequence` entropy pooling: `_bit_generator.pyx` (O'Neill's
  *    proposed seed_seq design: 4-word pool, hashmix/mix with the
  *    published INIT_A/MULT_A/INIT_B/MULT_B/MIX constants).
  *  - `PCG64` (XSL-RR 128/64): `pcg64.h` — 128-bit LCG with the canonical
  *    multiplier, output = rotr64(hi ^ lo, state >> 122). The 32-bit
  *    output buffer (`has_uint32`/`uinteger`) persists across 64-bit
  *    draws exactly as in `pcg64_next32`.
  *  - `Generator` distributions: `distributions.c` — Lemire bounded
  *    integers (32-bit path for ranges ≤ 2^32, with the shared next32
  *    buffer), 256-layer ziggurat normal/exponential ([[NumpyTables]]),
  *    inverse-CDF Laplace, Poisson (multiplication for λ<10, Hörmann PTRS
  *    for λ≥10, with numpy's `random_loggam`), geometric (sequential
  *    search for p≥1/3, exponential inversion below).
  *
  * Exactness contract (proven by NumpyParitySpec goldens generated from
  * executed numpy/reference runs): SeedSequence pools, PCG64 raw streams,
  * and ALL integer-valued draws (integers/poisson/geometric and the
  * reference's rounded jitter/gap arithmetic) are bit-exact. Float-valued
  * draws (normal/laplace/exponential) are exact except where the JVM's
  * `Math.log/log1p/exp` differ from glibc by 1 ulp (~0.1% of inputs);
  * those last-ulp cases can flip an integer outcome only when a value
  * lands within 1 ulp of a rint/ceil/accept boundary (≈1e-16 per draw) —
  * negligible at any tested N and called out here rather than hidden.
  *
  * Thread-safety: none (sequential by definition, like the original).
  */
final class NumpyRng private (initHi: Long, initLo: Long, seqHi: Long, seqLo: Long) {

  import NumpyRng._

  // ---- PCG64 state: 128-bit LCG as two longs -------------------------
  private var stateHi = 0L
  private var stateLo = 0L
  private val incLo = (seqLo << 1) | 1L
  private val incHi = (seqHi << 1) | (seqLo >>> 63)
  // pcg_setseq_128_srandom: step, += initstate, step
  step()
  add(initHi, initLo)
  step()

  // PCG64's buffered 32-bit output channel (pcg64_next32)
  private var has32 = false
  private var buf32 = 0L

  @inline private def add(hi: Long, lo: Long): Unit = {
    val nl = stateLo + lo
    // carry if unsigned overflow
    stateHi += hi + (if (java.lang.Long.compareUnsigned(nl, stateLo) < 0) 1L else 0L)
    stateLo = nl
  }

  /** state = state * PCG_DEFAULT_MULTIPLIER_128 + inc (mod 2^128). */
  @inline private def step(): Unit = {
    val lo = stateLo * MULT_LO
    val hi = unsignedMulHigh(stateLo, MULT_LO) + stateHi * MULT_LO + stateLo * MULT_HI
    stateHi = hi
    stateLo = lo
    add(incHi, incLo)
  }

  /** One 64-bit output: XSL-RR on the post-step state. */
  def nextLong(): Long = {
    step()
    val rot = (stateHi >>> 58).toInt // state >> 122
    java.lang.Long.rotateRight(stateHi ^ stateLo, rot)
  }

  /** Buffered 32-bit output (low half first), as `pcg64_next32`. The
    * buffer survives interleaved [[nextLong]] calls — numpy semantics.
    */
  def next32(): Long = {
    if (has32) { has32 = false; buf32 }
    else {
      val v = nextLong()
      buf32 = v >>> 32
      has32 = true
      v & 0xFFFFFFFFL
    }
  }

  /** 53-bit uniform double in [0, 1) — `next_double`. */
  def nextDouble(): Double = (nextLong() >>> 11) * (1.0 / 9007199254740992.0)

  // ---- bounded integers (Generator.integers, endpoint=False) ---------

  /** Lemire rejection on the buffered 32-bit stream; rngSpan ≤ 2^32 - 2. */
  private def lemire32(rngSpan: Long): Long = {
    val rngExcl = rngSpan + 1L
    var m = next32() * rngExcl // fits: < 2^64 (bits exact mod 2^64)
    var leftover = m & 0xFFFFFFFFL
    if (leftover < rngExcl) {
      val threshold = (0xFFFFFFFFL - rngSpan) % rngExcl
      while (leftover < threshold) {
        m = next32() * rngExcl
        leftover = m & 0xFFFFFFFFL
      }
    }
    m >>> 32
  }

  /** Lemire rejection on 64-bit draws, for spans above 2^32. */
  private def lemire64(rngSpan: Long): Long = {
    val rngExcl = rngSpan + 1L
    var v = nextLong()
    var hi = unsignedMulHigh(v, rngExcl)
    var leftover = v * rngExcl
    if (java.lang.Long.compareUnsigned(leftover, rngExcl) < 0) {
      // threshold = (2^64 - rngExcl) % rngExcl  ==  (-rngExcl) % rngExcl
      val threshold = java.lang.Long.remainderUnsigned(0L - rngExcl, rngExcl)
      while (java.lang.Long.compareUnsigned(leftover, threshold) < 0) {
        v = nextLong()
        hi = unsignedMulHigh(v, rngExcl)
        leftover = v * rngExcl
      }
    }
    hi
  }

  /** `Generator.integers(low, high)` — high EXCLUSIVE, any int dtype.
    * numpy routes every span that fits in 32 bits (so all int32 draws and
    * small int64 draws alike) through the buffered 32-bit Lemire path.
    */
  def integers(low: Long, high: Long): Long = {
    val span = high - 1 - low
    if (span == 0L) low
    else if (span == -1L) low + nextLong() // full 64-bit range
    else if (span == 0xFFFFFFFFL) low + next32()
    else if (java.lang.Long.compareUnsigned(span, 0xFFFFFFFFL) < 0) low + lemire32(span)
    else low + lemire64(span)
  }

  // ---- ziggurat standard normal (random_standard_normal) -------------

  def standardNormal(): Double = {
    while (true) {
      var r = nextLong()
      val idx = (r & 0xFF).toInt
      r >>>= 8
      val sign = (r & 1L) == 1L
      val rabs = (r >>> 1) & 0x000FFFFFFFFFFFFFL
      var x = rabs.toDouble * NumpyTables.WI(idx)
      if (sign) x = -x
      if (rabs < NumpyTables.KI(idx)) return x
      if (idx == 0) {
        while (true) {
          val xx = -NOR_INV_R * Math.log1p(-nextDouble())
          val yy = -Math.log1p(-nextDouble())
          if (yy + yy > xx * xx)
            return if (((rabs >>> 8) & 1L) == 1L) -(NOR_R + xx) else NOR_R + xx
        }
      } else if ((NumpyTables.FI(idx - 1) - NumpyTables.FI(idx)) * nextDouble() +
                   NumpyTables.FI(idx) < Math.exp(-0.5 * x * x)) {
        return x
      }
    }
    Double.NaN // unreachable
  }

  def normal(loc: Double, scale: Double): Double = loc + scale * standardNormal()

  // ---- ziggurat standard exponential ---------------------------------

  def standardExponential(): Double = {
    while (true) {
      var ri = nextLong()
      ri >>>= 3
      val idx = (ri & 0xFF).toInt
      ri >>>= 8
      val x = ri.toDouble * NumpyTables.WE(idx)
      if (ri < NumpyTables.KE(idx)) return x
      if (idx == 0) return EXP_R - Math.log1p(-nextDouble())
      else if ((NumpyTables.FE(idx - 1) - NumpyTables.FE(idx)) * nextDouble() +
                 NumpyTables.FE(idx) < Math.exp(-x)) {
        return x
      }
    }
    Double.NaN // unreachable
  }

  // ---- Laplace (inverse CDF, random_laplace) -------------------------

  def laplace(loc: Double, scale: Double): Double = {
    while (true) {
      val u = nextDouble()
      if (u >= 0.5) return loc - scale * Math.log(2.0 - u - u)
      else if (u > 0.0) return loc + scale * Math.log(u + u)
    }
    Double.NaN // unreachable
  }

  // ---- Poisson (random_poisson) --------------------------------------

  def poisson(lam: Double): Long = {
    if (lam >= 10.0) {
      // Hörmann's PTRS transformed rejection
      val slam = Math.sqrt(lam)
      val loglam = Math.log(lam)
      val b = 0.931 + 2.53 * slam
      val a = -0.059 + 0.02483 * b
      val invalpha = 1.1239 + 1.1328 / (b - 3.4)
      val vr = 0.9277 - 3.6224 / (b - 2.0)
      while (true) {
        val u = nextDouble() - 0.5
        val v = nextDouble()
        val us = 0.5 - Math.abs(u)
        val k = Math.floor((2.0 * a / us + b) * u + lam + 0.43)
        if (us >= 0.07 && v <= vr) return k.toLong
        if (!(k < 0 || (us < 0.013 && v > us))) {
          if (Math.log(v) + Math.log(invalpha) - Math.log(a / (us * us) + b) <=
                k * loglam - lam - loggam(k + 1.0)) return k.toLong
        }
      }
      0L // unreachable
    } else if (lam == 0.0) 0L
    else {
      // multiplication method
      val enlam = Math.exp(-lam)
      var x = 0L
      var prod = 1.0
      while (true) {
        prod *= nextDouble()
        if (prod > enlam) x += 1 else return x
      }
      0L // unreachable
    }
  }

  // ---- geometric (random_geometric) ----------------------------------

  def geometric(p: Double): Long = {
    if (p >= 0.3333333333333333) {
      // sequential search
      var x = 1L
      var prod = p
      var sum = p
      val q = 1.0 - p
      val u = nextDouble()
      while (u > sum) {
        prod *= q
        sum += prod
        x += 1
      }
      x
    } else {
      Math.ceil(-standardExponential() / Math.log1p(-p)).toLong
    }
  }
}

object NumpyRng {

  private val MULT_HI = 0x2360ED051FC65DA4L // PCG_DEFAULT_MULTIPLIER_128
  private val MULT_LO = 0x4385DF649FCCF645L
  private val NOR_R = 3.6541528853610088
  private val NOR_INV_R = 0.27366123732975827967 // ziggurat_nor_inv_r
  private val EXP_R = 7.69711747013104972 // ziggurat_exp_r

  // SeedSequence constants (O'Neill seed_seq design, as in numpy)
  private val XSHIFT = 16
  private val INIT_A = 0x43B0D7E5L
  private val MULT_A = 0x931E8875L
  private val INIT_B = 0x8B51F9DDL
  private val MULT_B = 0x58F38DEDL
  private val MIX_L = 0xCA01F9DDL
  private val MIX_R = 0x4973F715L
  private val M32 = 0xFFFFFFFFL

  /** High 64 bits of the full unsigned 128-bit product. */
  @inline private[graft] def unsignedMulHigh(a: Long, b: Long): Long =
    Math.multiplyHigh(a, b) + ((a >> 63) & b) + ((b >> 63) & a)

  /** `np.random.default_rng(seed)` for a non-negative Long seed: run the
    * SeedSequence pool over the seed's little-endian 32-bit words, expand
    * 4×64-bit state words, seed PCG64 with (initstate, initseq).
    */
  def apply(seed: Long): NumpyRng = {
    require(seed >= 0, s"numpy seeds are non-negative; got $seed")
    val entropy =
      if (seed == 0L) Array(0L)
      else if ((seed >>> 32) == 0L) Array(seed & M32)
      else Array(seed & M32, seed >>> 32)

    var hashConst = INIT_A
    @inline def hashmix(v0: Long): Long = {
      var v = (v0 ^ hashConst) & M32
      hashConst = (hashConst * MULT_A) & M32
      v = (v * hashConst) & M32
      v ^= v >>> XSHIFT
      v & M32
    }
    @inline def mix(x: Long, y: Long): Long = {
      var r = (x * MIX_L - y * MIX_R) & M32
      r ^= r >>> XSHIFT
      r & M32
    }

    val pool = new Array[Long](4)
    var i = 0
    while (i < 4) {
      pool(i) = hashmix(if (i < entropy.length) entropy(i) else 0L)
      i += 1
    }
    var src = 0
    while (src < 4) {
      var dst = 0
      while (dst < 4) {
        if (src != dst) pool(dst) = mix(pool(dst), hashmix(pool(src)))
        dst += 1
      }
      src += 1
    }
    src = 4
    while (src < entropy.length) {
      var dst = 0
      while (dst < 4) {
        pool(dst) = mix(pool(dst), hashmix(entropy(src)))
        dst += 1
      }
      src += 1
    }

    // generate_state(4, uint64) = 8 uint32 words, low half first
    hashConst = INIT_B
    val w32 = new Array[Long](8)
    i = 0
    while (i < 8) {
      var v = (pool(i % 4) ^ hashConst) & M32
      hashConst = (hashConst * MULT_B) & M32
      v = (v * hashConst) & M32
      v ^= v >>> XSHIFT
      w32(i) = v & M32
      i += 1
    }
    val s0 = w32(0) | (w32(1) << 32)
    val s1 = w32(2) | (w32(3) << 32)
    val s2 = w32(4) | (w32(5) << 32)
    val s3 = w32(6) | (w32(7) << 32)
    // initstate = s0<<64 | s1, initseq = s2<<64 | s3
    new NumpyRng(s0, s1, s2, s3)
  }

  /** numpy's `random_loggam` — log Γ(x) with the published coefficient
    * ladder; needed for PTRS Poisson acceptance.
    */
  private[gen] def loggam(x: Double): Double = {
    val a = Array(8.333333333333333e-02, -2.777777777777778e-03,
      7.936507936507937e-04, -5.952380952380952e-04, 8.417508417508418e-04,
      -1.917526917526918e-03, 6.410256410256410e-03, -2.955065359477124e-02,
      1.796443723688307e-01, -1.39243221690590e+00)
    if (x == 1.0 || x == 2.0) return 0.0
    val n = if (x < 7.0) (7.0 - x).toInt else 0
    var x0 = x + n
    val x2 = (1.0 / x0) * (1.0 / x0)
    var gl0 = a(9)
    var k = 8
    while (k >= 0) { gl0 = gl0 * x2 + a(k); k -= 1 }
    var gl = gl0 / x0 + 0.5 * Math.log(2.0 * Math.PI) + (x0 - 0.5) * Math.log(x0) - x0
    if (x < 7.0) {
      var j = 1
      while (j <= n) { gl -= Math.log(x0 - 1.0); x0 -= 1.0; j += 1 }
    }
    gl
  }
}
