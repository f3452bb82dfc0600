package graft

import graft.gen.Schedule
import org.scalatest.funsuite.AnyFunSuite

/** The closed-form Layout must reproduce the iterative controller
  * block-for-block — including every floating-point edge of the ratio
  * test — across ratios, pattern lengths, and sizes.
  */
class ScheduleSpec extends AnyFunSuite {

  private val ratios =
    Seq(0.0, 0.001, 0.1, 1.0 / 3.0, 0.5, 0.7, 2.0 / 3.0, 0.9, 0.999, 1.0)
  private val lens  = Seq(2, 3, 7, 10, 17)
  private val sizes = Seq(1L, 2L, 17L, 1000L, 40007L)

  test("closed-form blockAt ≡ iterative blocks() on a config grid") {
    for (r <- ratios; l <- lens; n <- sizes) {
      val iter   = Schedule.blocks(n, r, l).toVector
      val layout = Schedule.Layout(n, r, l)
      assert(layout.numBlocks == iter.length,
        s"block count n=$n r=$r L=$l: ${layout.numBlocks} vs ${iter.length}")
      iter.zipWithIndex.foreach { case (b, k) =>
        val c = layout.blockAt(k)
        assert(c == b, s"n=$n r=$r L=$l block $k: closed=$c iter=$b")
      }
    }
  }

  test("closed-form is O(log) random access at planetary N") {
    // 1e12 events would need ~7e11 iterative steps; closed form answers
    // arbitrary probes immediately and self-consistently
    val layout = Schedule.Layout(1000000000000L, 0.7, 10)
    val probes = Seq(0L, 1L, 12345678L, layout.numBlocks / 2,
      layout.numBlocks - 2, layout.numBlocks - 1)
    val bs = probes.map(layout.blockAt)
    // seq coverage: every block starts where expected relative to kind mix
    bs.foreach { b =>
      assert(b.seqStart >= 0 && b.seqStart < 1000000000000L)
      assert(b.len >= 1 && b.len <= 10)
    }
    // exact global ratio is preserved by construction
    val last = layout.blockAt(layout.numBlocks - 1)
    assert(last.seqStart + last.len == 1000000000000L)
  }
}
