package graft.gen

/** The ratio controller's decision sequence (`eventstream.py:388-402`),
  * inverted into a precomputable schedule.
  *
  * Key observation (SURVEY.md §2.a op #8c): the reference's greedy
  * controller decides "random event or pattern instance?" from the running
  * counters ONLY — never from sampled values — so the full block layout of
  * a stream is a pure function of (totalEvents, randomRatio, patternLen).
  * That is what makes the generator parallelizable: blocks get independent
  * RNG substreams and executors fill them without any sequential
  * dependency except the final timestamp prefix-sum.
  *
  * Decision rule replicated exactly: insert a random event iff
  * `(ratio_now < random_ratio OR n_pattern + L > target_pattern) AND
  *  n_random < target_random`, else a whole pattern instance, truncated at
  * N (`eventstream.py:363-364,393-401`); `target_random =
  * rint(N * ratio)` uses half-even rounding to match Python `round`
  * (`eventstream.py:300-302`).
  */
object Schedule {

  /** One contiguous run of events: a single random event (len=1) or one
    * pattern instance (len<=patternLen, truncated at stream end).
    *
    * @param seqStart    global emission index of the block's first event
    * @param len         number of events in the block
    * @param isPattern   pattern instance vs random event
    * @param afterPattern true when the previous block was a pattern
    *                     instance — the reference rests one tick after
    *                     each pattern (`eventstream.py:383-385`), which
    *                     shifts this block's first gap by +1
    */
  final case class Block(
      seqStart: Long,
      len: Int,
      isPattern: Boolean,
      afterPattern: Boolean,
  )

  def targetRandom(totalEvents: Long, randomRatio: Double): Long =
    math.rint(totalEvents * randomRatio).toLong

  /** Lazy block iterator — O(1) state, so exact mode streams it and block
    * mode materializes it (block count is N·ratio + N/L; for truly
    * planetary N the same recurrence is expressible in closed form per
    * block index, see the regularity proven by ScheduleSpec).
    */
  def blocks(
      totalEvents: Long,
      randomRatio: Double,
      patternLen: Int,
  ): Iterator[Block] = new Iterator[Block] {
    private val tR = targetRandom(totalEvents, randomRatio)
    private val tP = totalEvents - tR
    private var nRandom  = 0L
    private var nPattern = 0L
    private var prevWasPattern = false

    def hasNext: Boolean = nRandom + nPattern < totalEvents

    def next(): Block = {
      val emitted  = nRandom + nPattern
      val ratioNow = nRandom.toDouble / math.max(1L, emitted)
      val insertRandom =
        (ratioNow < randomRatio || nPattern + patternLen > tP) &&
          nRandom < tR
      val b =
        if (insertRandom) {
          nRandom += 1
          Block(emitted, 1, isPattern = false, afterPattern = prevWasPattern)
        } else {
          val len = math.min(patternLen.toLong, totalEvents - emitted).toInt
          nPattern += len
          Block(emitted, len, isPattern = true, afterPattern = prevWasPattern)
        }
      prevWasPattern = b.isPattern
      b
    }
  }
}
