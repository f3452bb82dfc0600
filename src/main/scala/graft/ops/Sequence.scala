package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Declarative sequence-pattern matching — the MATCH_RECOGNIZE-class
  * CEP engine. The reference's entire purpose is generating event
  * SEQUENCES for sequence-learning systems
  * (`/root/reference/README.md:3-6`), and its `PatternSet`
  * (`eventstream.py:116-137`) makes ordered type patterns the data
  * model itself — yet every detector in this engine before round 12
  * was fixed-shape (q24/q188 hard-code a 3-step funnel,
  * `gen_pattern_detect` matches exact type vectors). Here a user
  * DECLARES a pattern — programmatically or textually via [[parse]]
  * (`"view click+ purchase within 24h"`) — and the engine compiles and
  * runs it. ABSENT-IN-REF (the reference only generates patterns; it
  * never matches them).
  *
  * The surface:
  *   - steps with type-SET predicates (alternation, `(click|error)`)
  *     and the greedy quantifier algebra `{min,max}` — once, `+`, `?`,
  *     `{n,m}`;
  *   - STRICT contiguity (the SQL MATCH_RECOGNIZE default: a row that
  *     cannot extend the attempt kills it) or RELAXED contiguity
  *     (Flink CEP `followedBy`: it is skipped);
  *   - WITHIN T (every consumed row inside T of the match's first);
  *   - AFTER MATCH SKIP PAST LAST ROW (matches never overlap);
  *   - MEASURES accumulated inside the fold ([[matchPatternMeasured]]);
  *   - ONE ROW ([[matchPattern]]) or ALL ROWS + CLASSIFIER
  *     ([[matchPatternRows]]) output; PARTITION BY any key; optional
  *     session scoping; and the same engine streamed
  *     (`streaming.Streams.PatternProcessor`, q222/q228).
  *
  * Two execution strategies, chosen by [[matcherFor]]:
  *   - [[Nfa]] — a single attempt thread, O(pattern) state per key —
  *     whenever that is EXACTLY the backtracking attempt-at-every-row
  *     definition: all strict patterns (disjoint step sets mean a row
  *     consumed mid-attempt can never have anchored a competing
  *     attempt, and a killing row immediately re-anchors; greedy needs
  *     no backtracking because a shorter take re-offers the same row)
  *     and un-timed relaxed patterns (attempts can only end by
  *     completing, so the earliest anchor dominates).
  *   - [[ThreadMatcher]] — concurrent attempt threads, state bounded
  *     by anchors inside the time window (the Flink-CEP shape) — for
  *     time-bounded RELAXED patterns, where a timed-out attempt can
  *     hide viable later anchors inside rows it skipped.
  * Both are pinned against an independent backtracking
  * attempt-at-every-row reference matcher on randomized sequences
  * (Round12Spec), and eleven registered queries put every feature
  * under the driver's DuckDB oracle gate.
  *
  * Scale: ONE hash exchange on the key (q104's secondary-sort device —
  * shared with every other per-user query), a partition-LOCAL sort, and
  * a forward pass that emits matches as a streaming iterator (never a
  * per-partition match buffer). At 100 TB this is strictly cheaper
  * than the window-cascade equivalent (a window pass per step) and
  * infinitely cheaper than the self-join formulation.
  */
object Sequence {

  /** One pattern step: an event-type predicate — a SET of accepted
    * types (ALTERNATION, `(click|error)`) — plus its quantifier as a
    * GREEDY repetition range `{minRep, maxRep}`: once = {1,1},
    * one-or-more `+` = {1,∞}, optional `?` = {0,1}, bounded `{n,m}`.
    * `Step("click", oneOrMore = true)` etc. are shorthands.
    */
  final case class Step(eventTypes: Seq[String], minRep: Int,
      maxRep: Int) {
    require(eventTypes.nonEmpty, "a step needs at least one event type")
    require(eventTypes.distinct.size == eventTypes.size,
      s"duplicate types within a step: $eventTypes")
    require(minRep >= 0 && maxRep >= 1 && minRep <= maxRep,
      s"bad repetition range {$minRep,$maxRep}")
    /** variable-width steps — what `n_plus`/`meas_plus` count */
    def variable: Boolean = maxRep > 1
  }

  object Step {
    val Inf: Int = Int.MaxValue
    def apply(eventType: String, oneOrMore: Boolean): Step =
      Step(Seq(eventType), 1, if (oneOrMore) Inf else 1)
    def apply(eventTypes: Seq[String], oneOrMore: Boolean): Step =
      Step(eventTypes, 1, if (oneOrMore) Inf else 1)
    /** bounded greedy repetition `{min,max}` */
    def rep(eventType: String, min: Int, max: Int): Step =
      Step(Seq(eventType), min, max)
    /** optional `?` = {0,1} */
    def opt(eventType: String): Step = Step(Seq(eventType), 0, 1)
  }

  /** No time bound — the only `withinUs` relaxed contiguity admits. */
  val Unbounded: Long = Long.MaxValue / 4

  /** A declarative sequence pattern: ordered steps + a time bound,
    * under STRICT contiguity (`relaxed = false`, the SQL
    * MATCH_RECOGNIZE default: a non-matching row kills the attempt) or
    * RELAXED contiguity (`relaxed = true`, Flink CEP's `followedBy`:
    * a non-matching row is SKIPPED — "signup, then EVENTUALLY views,
    * then a purchase").
    */
  final case class Pattern(steps: Seq[Step], withinUs: Long,
      relaxed: Boolean = false) {
    require(steps.nonEmpty, "pattern needs at least one step")
    require(steps.flatMap(_.eventTypes).distinct.size ==
      steps.map(_.eventTypes.size).sum,
      "step type sets must be pairwise disjoint — that is what makes " +
        "the single-pass NFA exact (see module doc); overlapping " +
        "predicates would need concurrent attempt threads")
    require(steps.head.minRep >= 1,
      "the first step must consume the anchor row (minRep ≥ 1): a " +
        "skippable head would let matches start at a later step's " +
        "type, an ambiguity the anchored attempt model doesn't define")
    require(relaxed || steps.length == 1 || steps.head.maxRep == 1,
      "a strict multi-step pattern must be anchored by a single-row " +
        "first step (maxRep = 1): with a repeating head, a WITHIN-" +
        "timeout can fail an attempt whose consumed run contains " +
        "valid later attempt starts, which exact semantics can only " +
        "honor with concurrent attempt threads (state bounded by the " +
        "time window, not the pattern). A single-step repeating " +
        "pattern is exact — every attempt at a matching row succeeds, " +
        "so skip-past-last-row realigns the scan.")
    require(withinUs > 0, "withinUs must be positive")

    /** Time-bounded relaxed matching cannot run on the O(1)-state
      * single-thread NFA: a timed-out attempt may hide viable later
      * anchors inside the rows it skipped, which exact semantics can
      * only honor with CONCURRENT attempt threads (state bounded by
      * anchors inside the time window — the Flink-CEP state shape).
      * [[matchPattern]] routes such patterns to [[timedRelaxedFold]];
      * un-timed relaxed attempts never die, so there the earliest
      * anchor provably dominates and the single thread stays exact.
      */
    def needsThreads: Boolean = relaxed && withinUs != Unbounded
  }

  /** One completed match. `n_plus` counts rows consumed by one-or-more
    * steps (e.g. the click count in `view click+ purchase`).
    */
  final case class SeqMatch(user_id: Long, start_us: Long, end_us: Long,
      n_rows: Long, n_plus: Long)

  /** A match without its key (the [[Nfa]] is key-agnostic).
    * `measAll`/`measPlus` are the MEASURES accumulators: the sum of the
    * caller-supplied per-row measure over every consumed row and over
    * the one-or-more steps' rows respectively (0 when no measure is
    * fed) — integer sums, so the oracle replays them exactly.
    * `startEid`/`endEid` carry the boundary rows' event ids so ALL
    * ROWS PER MATCH ([[matchPatternRows]]) can address the match's
    * exact row range even under timestamp ties.
    */
  final case class MatchCore(startUs: Long, endUs: Long, nRows: Long,
      nPlus: Long, measAll: Long, measPlus: Long, startEid: Long,
      endEid: Long)

  /** Uniform persistable state row for any [[KeyMatcher]] — what the
    * STREAMING runner stores per key between microbatches. The Nfa
    * snapshots as one row; the ThreadMatcher as one row per live
    * (`kind = 1`) or held (`kind = 2`) attempt.
    */
  final case class MatcherSnap(kind: Int, stepIdx: Int, consumed: Int,
      aUs: Long, aEid: Long, endUs: Long, endEid: Long, nRows: Long,
      nPlus: Long, measAll: Long, measPlus: Long)

  /** What the per-key fold drives: one matcher instance per partition,
    * reset per key, fed ordered rows, flushed at key end. Implemented
    * by the O(1)-state [[Nfa]] (strict / un-timed-relaxed) and the
    * concurrent-thread [[ThreadMatcher]] (time-bounded relaxed).
    *
    * `onTime(now)` advances the TIME axis without a row: with `now`
    * a proven lower bound on every future row's timestamp (a
    * watermark), attempts whose deadline has passed resolve — they
    * die, or complete their satisfied trailing `+` — and held matches
    * they were blocking commit. Batch folds never need it (the next
    * row or the key end carries time forward); the streaming runner
    * calls it each release so a quiet key cannot wedge a held match
    * behind a long-dead attempt. `nextDeadlineUs` tells the runner
    * when to wake.
    */
  sealed trait KeyMatcher extends Serializable {
    def step(us: Long, eid: Long, tpe: String, meas: Long)
        : Seq[MatchCore]
    def finish(): Seq[MatchCore]
    def reset(): Unit
    def onTime(nowUs: Long): Seq[MatchCore]
    def nextDeadlineUs: Option[Long]
    def snapshotRows: Seq[MatcherSnap]
    def restoreRows(rows: Seq[MatcherSnap]): Unit
  }

  /** The compiled single-thread NFA for ONE key's time-ordered rows.
    * `advance` feeds one row and returns the match it completed, if
    * any (≤ 1 per row by construction); `flushEnd` closes a satisfied
    * trailing one-or-more match at end-of-key. State is O(pattern
    * length); see the module doc for why this single pass is exact.
    */
  final class Nfa(
      stepOf: Map[String, Int],
      minR: Array[Int],
      maxR: Array[Int],
      within: Long,
      relaxed: Boolean = false,
  ) extends KeyMatcher {
    private val nSteps = maxR.length
    private var active = false
    private var stepIdx, consumed = 0
    private var startUs, endUs, nRows, nPlus = 0L
    private var measAll, measPlus, rowMeas, rowEid = 0L
    private var startEid, endEid = 0L
    private var emitted: MatchCore = _

    private def emit(): Unit =
      emitted = MatchCore(startUs, endUs, nRows, nPlus, measAll,
        measPlus, startEid, endEid)

    /** The attempt is committable as it stands: the current step has
      * its minimum and every remaining step is skippable ({0,m}).
      */
    private def satisfiedNow: Boolean =
      active && stepIdx < nSteps && consumed >= minR(stepIdx) &&
        (stepIdx + 1 until nSteps).forall(minR(_) == 0)

    /** Kill the attempt; a satisfied greedy tail is a completed match,
      * emitted before the state clears.
      */
    private def kill(): Unit = {
      if (satisfiedNow) emit()
      active = false
    }

    private def consumeInto(k: Int, us: Long): Unit = {
      stepIdx = k; consumed += 1; nRows += 1; endUs = us
      endEid = rowEid
      measAll += rowMeas
      if (maxR(k) > 1) { nPlus += 1; measPlus += rowMeas }
      if (consumed == maxR(k)) { stepIdx = k + 1; consumed = 0 } // full
      if (stepIdx == nSteps) { emit(); active = false }
    }

    /** The step this row could ADVANCE to from `k`: its own step `j`,
      * if `j > k`, the current step has its minimum, and every step
      * strictly between is skippable.
      */
    private def advanceTarget(k: Int, sIdx: Int): Int =
      if (sIdx > k && consumed >= minR(k) &&
        (k + 1 until sIdx).forall(minR(_) == 0)) sIdx
      else -1

    private def tryStart(us: Long, tpe: String): Unit =
      if (stepOf.get(tpe).contains(0)) {
        active = true; stepIdx = 0; consumed = 0
        startUs = us; endUs = us; nRows = 0L; nPlus = 0L
        measAll = 0L; measPlus = 0L
        startEid = rowEid; endEid = rowEid
        consumeInto(0, us)
      }

    def advance(us: Long, tpe: String, meas: Long = 0L,
        eid: Long = 0L): Option[MatchCore] = {
      rowMeas = meas
      rowEid = eid
      emitted = null
      if (!active) tryStart(us, tpe)
      else {
        val timeOk = us - startUs <= within
        val k = stepIdx
        val sIdx = stepOf.getOrElse(tpe, -1)
        if (timeOk && sIdx == k && consumed < maxR(k))
          consumeInto(k, us)
        else if (timeOk && sIdx >= 0 && advanceTarget(k, sIdx) >= 0) {
          consumed = 0
          consumeInto(sIdx, us)
        } else if (relaxed) {
          // relaxed contiguity: an irrelevant row is SKIPPED, the
          // attempt survives until it completes or times out
        } else { // strict: cannot extend — close out, re-consider row
          kill()
          tryStart(us, tpe)
        }
      }
      Option(emitted)
    }

    def flushEnd(): Option[MatchCore] = {
      emitted = null
      kill()
      Option(emitted)
    }

    override def step(us: Long, eid: Long, tpe: String, meas: Long)
        : Seq[MatchCore] = advance(us, tpe, meas, eid).toSeq
    override def finish(): Seq[MatchCore] = flushEnd().toSeq

    override def onTime(nowUs: Long): Seq[MatchCore] =
      if (active && within != Unbounded && nowUs - startUs > within) {
        // every future row is ≥ nowUs, so the attempt is decided: a
        // satisfied trailing + completes, anything else is dead
        // (kill() clears the attempt, including `active`)
        emitted = null
        kill()
        Option(emitted).toSeq
      } else Nil

    override def nextDeadlineUs: Option[Long] =
      if (active && within != Unbounded) Some(startUs + within) else None

    override def snapshotRows: Seq[MatcherSnap] =
      if (!active) Nil
      else Seq(MatcherSnap(0, stepIdx, consumed, startUs, startEid,
        endUs, endEid, nRows, nPlus, measAll, measPlus))

    override def restoreRows(rows: Seq[MatcherSnap]): Unit =
      rows.headOption match {
        case None => active = false
        case Some(r) =>
          active = true; stepIdx = r.stepIdx; consumed = r.consumed
          startUs = r.aUs; startEid = r.aEid
          endUs = r.endUs; endEid = r.endEid; nRows = r.nRows
          nPlus = r.nPlus; measAll = r.measAll; measPlus = r.measPlus
      }

    def reset(): Unit = active = false
  }

  /** Parse a textual pattern — the surface a MATCH_RECOGNIZE user
    * writes:
    *
    * {{{
    *   view click+ purchase within 24h
    *   relaxed signup view+ purchase within 48h
    *   view (click|error)+ purchase within 24h
    *   view click{1,2} error? purchase within 24h
    * }}}
    *
    * Grammar: optional leading `relaxed`; whitespace-separated steps —
    * a type or a `(a|b|c)` alternation set, with an optional greedy
    * quantifier suffix `+`, `?`, `{n}`, `{n,}`, `{n,m}` — and an
    * optional trailing `within <N><s|m|h|d>`. All of [[Pattern]]'s
    * exactness `require`s apply to the result. Load-bearing under the
    * oracle gate: q216's registered pattern goes through this parser.
    */
  def parse(text: String): Pattern = {
    val toks = text.trim.split("\\s+").toList.filter(_.nonEmpty)
    require(toks.nonEmpty, "empty pattern")
    val (relaxed, rest) =
      if (toks.head.equalsIgnoreCase("relaxed")) (true, toks.tail)
      else (false, toks)
    val (stepToks, within) = rest.reverse match {
      case dur :: w :: restR if w.equalsIgnoreCase("within") =>
        (restR.reverse, parseDuration(dur))
      case _ => (rest, Unbounded)
    }
    require(stepToks.nonEmpty, s"no steps in pattern '$text'")
    Pattern(stepToks.map(parseStep), within, relaxed)
  }

  private val durRe = "^(\\d+)([smhd])$".r

  private def parseDuration(d: String): Long = d match {
    case durRe(n, u) =>
      n.toLong * (u match {
        case "s" => 1000000L
        case "m" => 60L * 1000000L
        case "h" => 3600L * 1000000L
        case "d" => 86400L * 1000000L
      })
    case _ => throw new IllegalArgumentException(
      s"bad duration '$d' — want <N><s|m|h|d>, e.g. 24h")
  }

  private val repRange = "^\\{(\\d+)(,(\\d*))?\\}$".r

  private def parseStep(tok: String): Step = {
    val (body, min, max) =
      if (tok.endsWith("+")) (tok.dropRight(1), 1, Step.Inf)
      else if (tok.endsWith("?")) (tok.dropRight(1), 0, 1)
      else {
        val brace = tok.indexOf('{')
        if (brace >= 0) tok.substring(brace) match {
          case repRange(a, null, _) =>
            (tok.take(brace), a.toInt, a.toInt) // {n}
          case repRange(a, _, "") =>
            (tok.take(brace), a.toInt, Step.Inf) // {n,}
          case repRange(a, _, b) =>
            (tok.take(brace), a.toInt, b.toInt) // {n,m}
          case q => throw new IllegalArgumentException(
            s"bad quantifier '$q' in step '$tok'")
        }
        else (tok, 1, 1)
      }
    require(body.nonEmpty, s"empty step in '$tok'")
    val types =
      if (body.startsWith("(") && body.endsWith(")"))
        body.substring(1, body.length - 1).split('|').toSeq
          .map(_.trim).filter(_.nonEmpty)
      else Seq(body)
    require(types.nonEmpty, s"no event types in step '$tok'")
    Step(types, min, max)
  }

  private def flatStepOf(p: Pattern): Map[String, Int] =
    p.steps.zipWithIndex
      .flatMap { case (st, i) => st.eventTypes.map(_ -> i) }
      .toMap

  /** Compile a [[Pattern]] to its O(1)-state single-thread stepper.
    * Disjoint step sets flatten to one type → step map. Time-bounded
    * relaxed patterns cannot be honored by a single thread — they go
    * through [[matcherFor]] / [[ThreadMatcher]] instead.
    */
  def compile(p: Pattern): Nfa = {
    require(!p.needsThreads,
      "time-bounded relaxed patterns need the concurrent-thread " +
        "matcher (use matchPattern, which dispatches); the single-" +
        "thread NFA cannot honor them exactly")
    new Nfa(flatStepOf(p), p.steps.map(_.minRep).toArray,
      p.steps.map(_.maxRep).toArray, p.withinUs, p.relaxed)
  }

  /** CONCURRENT-THREAD matcher for time-bounded RELAXED patterns — the
    * Flink-CEP state shape. Every step-0 row spawns an independent
    * attempt thread (attempts are definitionally independent until a
    * match COMMITS); a thread advances by the same consume/advance/
    * skip transition as the NFA, dies on timeout (no row beyond
    * anchor+T can ever extend it) — completing first if its trailing
    * `+` is satisfied — and COMPLETED attempts are HELD until no live
    * attempt with an earlier anchor could still preempt them
    * (MATCH_RECOGNIZE decides attempts in anchor order, not
    * completion order). Committing a match drops every thread and
    * held match anchored at or before its last row (AFTER MATCH SKIP
    * PAST LAST ROW); attempts anchored later survive, because their
    * walks never depended on the committed one. State per key =
    * live threads + held matches, both bounded by the number of
    * anchor rows inside the `within` window — exactly the bound any
    * time-windowed CEP engine carries. Round12Spec pins this fold
    * against the attempt-at-every-row reference matcher on randomized
    * sequences and preemption fixtures.
    */
  final class ThreadMatcher(
      stepOf: Map[String, Int],
      minR: Array[Int],
      maxR: Array[Int],
      within: Long,
  ) extends KeyMatcher {
    private val nSteps = maxR.length

    private final class Th(val aUs: Long, val aEid: Long) {
      var stepIdx, consumed = 0
      var endUs, endEid = 0L
      var nRows, nPlus, measAll, measPlus = 0L
      def core: MatchCore =
        MatchCore(aUs, endUs, nRows, nPlus, measAll, measPlus, aEid,
          endEid)
      def trailingSatisfied: Boolean =
        stepIdx < nSteps && consumed >= minR(stepIdx) &&
          (stepIdx + 1 until nSteps).forall(minR(_) == 0)
      /** row-order compare of this thread's ANCHOR vs a position */
      def anchorLeq(us: Long, eid: Long): Boolean =
        aUs < us || (aUs == us && aEid <= eid)
      def anchorLt(o: Th): Boolean =
        aUs < o.aUs || (aUs == o.aUs && aEid < o.aEid)
    }

    // both kept in anchor (= spawn) order
    private var threads = List.empty[Th]
    private var held = List.empty[Th]

    private def commitSweep(out: scala.collection.mutable.Buffer[MatchCore])
        : Unit = {
      var go = true
      while (go && held.nonEmpty) {
        val m = held.head // earliest-anchored completed attempt
        if (threads.exists(_.anchorLt(m))) go = false // may preempt
        else {
          out += m.core
          // skip past last row: drop everything anchored ≤ the end
          held = held.tail.filterNot(_.anchorLeq(m.endUs, m.endEid))
          threads = threads.filterNot(_.anchorLeq(m.endUs, m.endEid))
        }
      }
    }

    /** Consume `row` into thread `t` at step `k`; true if completed. */
    private def consumeInto(t: Th, k: Int, us: Long, eid: Long,
        meas: Long): Boolean = {
      t.stepIdx = k; t.consumed += 1
      t.endUs = us; t.endEid = eid
      t.nRows += 1; t.measAll += meas
      if (maxR(k) > 1) { t.nPlus += 1; t.measPlus += meas }
      if (t.consumed == maxR(k)) { t.stepIdx = k + 1; t.consumed = 0 }
      t.stepIdx == nSteps
    }

    /** Threads `nowUs` proves dead resolve: a satisfied trailing `+`
      * completes with what it holds, the rest drop.
      */
    private def timeoutSweep(nowUs: Long): Unit = {
      val (timedOut, live) = threads.partition(t => nowUs - t.aUs > within)
      threads = live
      val completedByTimeout = timedOut.filter(_.trailingSatisfied)
      if (completedByTimeout.nonEmpty)
        held = (held ++ completedByTimeout)
          .sortBy(t => (t.aUs, t.aEid))
    }

    override def onTime(nowUs: Long): Seq[MatchCore] = {
      val out = scala.collection.mutable.Buffer.empty[MatchCore]
      timeoutSweep(nowUs)
      commitSweep(out)
      out.toSeq
    }

    override def nextDeadlineUs: Option[Long] =
      if (threads.isEmpty) None
      else Some(threads.iterator.map(_.aUs).min + within)

    override def snapshotRows: Seq[MatcherSnap] =
      threads.map(t => MatcherSnap(1, t.stepIdx, t.consumed, t.aUs,
        t.aEid, t.endUs, t.endEid, t.nRows, t.nPlus, t.measAll,
        t.measPlus)) ++
        held.map(t => MatcherSnap(2, t.stepIdx, t.consumed, t.aUs,
          t.aEid, t.endUs, t.endEid, t.nRows, t.nPlus, t.measAll,
          t.measPlus))

    override def restoreRows(rows: Seq[MatcherSnap]): Unit = {
      def thaw(r: MatcherSnap): Th = {
        val t = new Th(r.aUs, r.aEid)
        t.stepIdx = r.stepIdx; t.consumed = r.consumed
        t.endUs = r.endUs; t.endEid = r.endEid
        t.nRows = r.nRows; t.nPlus = r.nPlus
        t.measAll = r.measAll; t.measPlus = r.measPlus
        t
      }
      threads = rows.filter(_.kind == 1).map(thaw)
        .sortBy(t => (t.aUs, t.aEid)).toList
      held = rows.filter(_.kind == 2).map(thaw)
        .sortBy(t => (t.aUs, t.aEid)).toList
    }

    override def step(us: Long, eid: Long, tpe: String, meas: Long)
        : Seq[MatchCore] = {
      val out = scala.collection.mutable.Buffer.empty[MatchCore]
      // 1) timeout sweep at this row's time
      timeoutSweep(us)
      // 2) advance every live thread (disjoint steps ⇒ deterministic)
      stepOf.get(tpe).foreach { sIdx =>
        val stillLive = List.newBuilder[Th]
        threads.foreach { t =>
          val k = t.stepIdx
          val canAdvance = sIdx > k && t.consumed >= minR(k) &&
            (k + 1 until sIdx).forall(minR(_) == 0)
          val done =
            if (sIdx == k && t.consumed < maxR(k))
              consumeInto(t, k, us, eid, meas)
            else if (canAdvance) {
              t.consumed = 0
              consumeInto(t, sIdx, us, eid, meas)
            } else false // relaxed: irrelevant row is skipped
          if (done)
            held = (held :+ t).sortBy(x => (x.aUs, x.aEid))
          else stillLive += t
        }
        threads = stillLive.result()
        // 3) spawn a fresh attempt on every step-0 row
        if (sIdx == 0) {
          val t = new Th(us, eid)
          if (consumeInto(t, 0, us, eid, meas))
            held = (held :+ t).sortBy(x => (x.aUs, x.aEid))
          else threads = threads :+ t
        }
      }
      commitSweep(out)
      out.toSeq
    }

    override def finish(): Seq[MatchCore] = {
      val out = scala.collection.mutable.Buffer.empty[MatchCore]
      held = (held ++ threads.filter(_.trailingSatisfied))
        .sortBy(t => (t.aUs, t.aEid))
      threads = Nil // incomplete attempts die at key end
      commitSweep(out)
      reset()
      out.toSeq
    }

    override def reset(): Unit = { threads = Nil; held = Nil }
  }

  /** The right matcher for a pattern: the O(1)-state NFA when a single
    * thread is exact, the bounded concurrent-thread fold when the
    * pattern is relaxed AND time-bounded.
    */
  def matcherFor(p: Pattern): KeyMatcher =
    if (p.needsThreads)
      new ThreadMatcher(flatStepOf(p), p.steps.map(_.minRep).toArray,
        p.steps.map(_.maxRep).toArray, p.withinUs)
    else compile(p)

  /** Compile `pattern` and run it over `events` (schema: user_id, ts,
    * event_id, event_type), returning one row per match ordered by
    * (user_id, start_us). Rows are matched in (us, event_id) order per
    * user — the engine-wide deterministic sequence order.
    *
    * `sessionGapUs` scopes matching to SESSIONS (MATCH_RECOGNIZE's
    * PARTITION BY user composed with the q20 inactivity-gap rule
    * without materializing session ids): an inter-row gap > the bound
    * closes the key exactly like end-of-data — satisfied greedy tails
    * emit, open attempts die — and matching restarts fresh, so no
    * match ever spans a session boundary.
    *
    * `keyCol` is MATCH_RECOGNIZE's PARTITION BY — any column works as
    * the sequence key (machines, sessions, documents); the output's
    * `user_id` column carries it.
    */
  def matchPattern(events: DataFrame, pattern: Pattern,
      sessionGapUs: Option[Long] = None,
      keyCol: String = "user_id"): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val rows = events
      .select(col(keyCol).as("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .repartition(col("user_id"))
      .sortWithinPartitions("user_id", "us", "event_id")
      .as[(Long, Long, Long, String)]
    implicit val enc = Encoders.product[SeqMatch]
    rows
      .mapPartitions { it =>
        val matcher = matcherFor(pattern)
        new Iterator[SeqMatch] {
          // matches queue as they complete — bounded per row by the
          // commit sweep, never a per-partition buffer
          private val pend = scala.collection.mutable.Queue.empty[SeqMatch]
          private var flushed = false
          private var curUser = Long.MinValue

          private def push(ms: Seq[MatchCore]): Unit =
            ms.foreach(m => pend += SeqMatch(curUser, m.startUs,
              m.endUs, m.nRows, m.nPlus))

          private var prevUs = Long.MinValue

          private def consume(r: (Long, Long, Long, String)): Unit = {
            if (r._1 != curUser) {
              push(matcher.finish()); curUser = r._1; matcher.reset()
            } else if (sessionGapUs.exists(g => r._2 - prevUs > g)) {
              // inactivity gap: the session ends exactly like the key
              push(matcher.finish()); matcher.reset()
            }
            prevUs = r._2
            push(matcher.step(r._2, r._3, r._4, 0L))
          }

          def hasNext: Boolean = {
            while (pend.isEmpty && it.hasNext) consume(it.next())
            if (pend.isEmpty && !flushed) {
              flushed = true; push(matcher.finish())
            }
            pend.nonEmpty
          }
          def next(): SeqMatch = pend.dequeue()
        }
      }
      .toDF()
      .orderBy(col("user_id"), col("start_us"))
  }

  /** One measured match (the MEASURES output shape). */
  final case class SeqMatchM(user_id: Long, start_us: Long,
      end_us: Long, n_rows: Long, n_plus: Long, meas_all: Long,
      meas_plus: Long)

  /** [[matchPattern]] with MEASURES: `measure` (any integer-valued
    * Column, e.g. cents) is summed over every row the match consumes
    * (`meas_all`) and over the one-or-more steps' rows (`meas_plus`) —
    * the aggregate-over-the-match half of MATCH_RECOGNIZE
    * (`MEASURES SUM(x)`), computed inside the same single fold at zero
    * extra passes. Integer sums, so the closed-form oracle replays
    * them exactly as prefix-sum differences.
    */
  def matchPatternMeasured(
      events: DataFrame,
      pattern: Pattern,
      measure: org.apache.spark.sql.Column,
      keyCol: String = "user_id",
  ): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val rows = events
      .select(col(keyCol).as("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"),
        measure.cast("long").as("meas"))
      .repartition(col("user_id"))
      .sortWithinPartitions("user_id", "us", "event_id")
      .as[(Long, Long, Long, String, Long)]
    implicit val enc = Encoders.product[SeqMatchM]
    rows
      .mapPartitions { it =>
        val matcher = matcherFor(pattern)
        new Iterator[SeqMatchM] {
          private val pend =
            scala.collection.mutable.Queue.empty[SeqMatchM]
          private var flushed = false
          private var curUser = Long.MinValue

          private def push(ms: Seq[MatchCore]): Unit =
            ms.foreach(m => pend += SeqMatchM(curUser, m.startUs,
              m.endUs, m.nRows, m.nPlus, m.measAll, m.measPlus))

          private def consume(r: (Long, Long, Long, String, Long))
              : Unit = {
            if (r._1 != curUser) {
              push(matcher.finish()); curUser = r._1; matcher.reset()
            }
            push(matcher.step(r._2, r._3, r._4, r._5))
          }

          def hasNext: Boolean = {
            while (pend.isEmpty && it.hasNext) consume(it.next())
            if (pend.isEmpty && !flushed) {
              flushed = true; push(matcher.finish())
            }
            pend.nonEmpty
          }
          def next(): SeqMatchM = pend.dequeue()
        }
      }
      .toDF()
      .orderBy(col("user_id"), col("start_us"))
  }

  /** One ALL ROWS PER MATCH output row: a consumed row tagged with its
    * match (the anchor timestamp identifies it within the key) and the
    * step that consumed it (MATCH_RECOGNIZE's CLASSIFIER()).
    */
  final case class SeqMatchRowOut(user_id: Long, start_us: Long,
      us: Long, event_id: Long, event_type: String, step: Int)

  // private[graft], not private: an object-private Scala class is
  // emitted PACKAGE-PRIVATE in bytecode, and whole-stage-codegen'd
  // classes live in another package — Janino then refuses the (public)
  // accessor as inaccessible and every projection over this row falls
  // back to interpreted mode (the bench log's recurring
  // "No applicable constructor/method found ... MatchBounds.b_user()"
  // CompileException). private[graft] erases to public bytecode, which
  // keeps the deserialized bounds inside codegen (r21, guide §4-class
  // non-codegen-expression hunt).
  private[graft] final case class MatchBounds(b_user: Long, start_us: Long,
      start_eid: Long, end_us: Long, end_eid: Long)

  /** ALL ROWS PER MATCH — MATCH_RECOGNIZE's other output mode: instead
    * of one aggregated row per match ([[matchPattern]]), every row a
    * match CONSUMED comes back tagged with its match and its step
    * (CLASSIFIER). STRICT contiguity only (enforced): a strict match
    * consumes exactly the rows between its boundary rows, so the
    * per-row output is the bounded match table joined back to the
    * events by row RANGE — the fold stays O(1)-state and emits only
    * (start, end) boundary ids, never buffering a match's rows. (A
    * relaxed match interleaves skipped rows inside its span; its
    * per-row mode would need the fold to carry consumed-row lists —
    * state O(match length) — which this engine declines the same way
    * it declines time-bounded single-thread relaxed matching.)
    * The step classifier is a type→step decode, exact because step
    * predicates are disjoint.
    *
    * Scale: the fold is [[matchPattern]]'s; the join back is a
    * per-user equi-join whose pair fan-out is (rows/user) ×
    * (matches/user) before the range filter — both per-key bounded,
    * the q55/q204 blocked-join budget.
    */
  def matchPatternRows(events: DataFrame, pattern: Pattern,
      keyCol: String = "user_id"): DataFrame = {
    require(!pattern.relaxed,
      "ALL ROWS PER MATCH requires strict contiguity — a relaxed " +
        "match's consumed rows are not a contiguous range (see doc)")
    val s = events.sparkSession
    import s.implicits._
    val rows = events
      .select(col(keyCol).as("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .repartition(col("user_id"))
      .sortWithinPartitions("user_id", "us", "event_id")
      .as[(Long, Long, Long, String)]
    implicit val enc = Encoders.product[MatchBounds]
    val bounds = rows
      .mapPartitions { it =>
        val matcher = matcherFor(pattern)
        new Iterator[MatchBounds] {
          private val pend =
            scala.collection.mutable.Queue.empty[MatchBounds]
          private var flushed = false
          private var curUser = Long.MinValue
          private def push(ms: Seq[MatchCore]): Unit =
            ms.foreach(m => pend += MatchBounds(curUser, m.startUs,
              m.startEid, m.endUs, m.endEid))
          private def consume(r: (Long, Long, Long, String)): Unit = {
            if (r._1 != curUser) {
              push(matcher.finish()); curUser = r._1; matcher.reset()
            }
            push(matcher.step(r._2, r._3, r._4, 0L))
          }
          def hasNext: Boolean = {
            while (pend.isEmpty && it.hasNext) consume(it.next())
            if (pend.isEmpty && !flushed) {
              flushed = true; push(matcher.finish())
            }
            pend.nonEmpty
          }
          def next(): MatchBounds = pend.dequeue()
        }
      }
      .toDF()
    val e = events.select(col(keyCol).as("user_id"),
      unix_micros(col("ts")).as("us"),
      col("event_id"), col("event_type"))
    val stepExpr = pattern.steps.zipWithIndex
      .foldLeft(lit(-1)) { case (acc, (st, i)) =>
        when(col("event_type").isin(st.eventTypes: _*), i).otherwise(acc)
      }
    e.join(bounds,
        col("user_id") === col("b_user") &&
          struct(col("us"), col("event_id")) >=
          struct(col("start_us"), col("start_eid")) &&
          struct(col("us"), col("event_id")) <=
          struct(col("end_us"), col("end_eid")))
      .select(col("user_id"), col("start_us"), col("us"),
        col("event_id"), col("event_type"), stepExpr.as("step"))
      .orderBy(col("user_id"), col("start_us"), col("us"),
        col("event_id"))
  }

  /** q216: the funnel pattern `view click+ purchase WITHIN 24h` — at
    * least one click strictly between a view and a purchase, no other
    * event interleaved, purchase within 24h of the view. On the sf0.01
    * fixture both the repetition and the time bound genuinely bind
    * (93 structural matches, 17 with ≥2 clicks, 60 inside 24h).
    *
    * Oracle: strict contiguity + disjoint predicates collapse the NFA
    * to a closed form the oracle replays with plain windows — a match
    * is exactly a purchase row whose immediately-preceding contiguous
    * click run is non-empty and is itself immediately preceded by a
    * view within the bound (skip-past-last-row is automatic: matches
    * of disjoint-type steps cannot share rows). Round12Spec separately
    * pins `matchPattern` ≡ a backtracking reference matcher on random
    * sequences, so the general engine — not just this pattern — is
    * gated.
    */
  private def q216(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // the textual surface, load-bearing under the oracle gate
    matchPattern(Tables.events(s, d),
      parse("view click+ purchase within 24h"))
      .select($"user_id", $"start_us", $"end_us",
        $"n_plus".as("n_clicks"))
      .orderBy($"user_id", $"start_us")
  }

  private val q216Sql =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) AS us, event_id, event_type,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(ts), event_id) AS i
      |  FROM events),
      |m AS (
      |  SELECT user_id, us, event_type, i,
      |    MAX(CASE WHEN event_type <> 'click' THEN i END) OVER (
      |      PARTITION BY user_id ORDER BY i
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pb
      |  FROM e)
      |SELECT b.user_id, a.us AS start_us, b.us AS end_us,
      |  CAST(b.i - b.pb - 1 AS BIGINT) AS n_clicks
      |FROM m b JOIN e a ON a.user_id = b.user_id AND a.i = b.pb
      |WHERE b.event_type = 'purchase' AND a.event_type = 'view'
      |  AND b.i - b.pb - 1 >= 1
      |  AND b.us - a.us <= 86400000000
      |ORDER BY b.user_id, a.us""".stripMargin

  /** q221: trailing-`+` pattern `purchase error+ WITHIN 12h` — the
    * post-purchase error burst (checkout succeeded, then the session
    * degraded), exercising the GREEDY-tail path of the NFA: the match
    * has no terminating `once` step, so it completes only when a row
    * arrives that cannot extend it (wrong type, or beyond the bound) or
    * the key's stream ends — the deferred-emission branch q216 never
    * takes.
    *
    * Oracle closed form: each purchase row, joined to the contiguous
    * error run that starts immediately after it (rows strictly before
    * the next non-error row), truncated to the 12h bound; ≥1 error
    * required. Time-ordering makes the bound truncation a plain filter
    * (an in-run error beyond the bound ends the match; no later in-run
    * error can be back inside it).
    */
  private def q221(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    matchPattern(
      Tables.events(s, d),
      Pattern(
        Seq(Step("purchase", oneOrMore = false),
          Step("error", oneOrMore = true)),
        withinUs = 12L * 3600L * 1000000L))
      .select($"user_id", $"start_us", $"end_us",
        $"n_plus".as("n_errors"))
      .orderBy($"user_id", $"start_us")
  }

  private val q221Sql =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) AS us, event_id, event_type,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(ts), event_id) AS i
      |  FROM events),
      |r AS (
      |  SELECT user_id, us, event_type, i,
      |    COALESCE(MIN(CASE WHEN event_type <> 'error' THEN i END) OVER (
      |      PARTITION BY user_id ORDER BY i
      |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING),
      |      MAX(i) OVER (PARTITION BY user_id) + 1) AS ne
      |  FROM e)
      |SELECT p.user_id, p.us AS start_us,
      |  MAX(er.us) AS end_us,
      |  CAST(COUNT(*) AS BIGINT) AS n_errors
      |FROM r p JOIN e er
      |  ON er.user_id = p.user_id AND er.i > p.i AND er.i < p.ne
      |  AND er.us - p.us <= 43200000000
      |WHERE p.event_type = 'purchase'
      |GROUP BY p.user_id, p.i, p.us
      |ORDER BY p.user_id, p.us""".stripMargin

  /** q223: q216's pattern with MEASURES — each funnel match carries the
    * cents spent on its clicks and across the whole match, accumulated
    * inside the NFA fold (no join-back to the matched rows). The
    * oracle extends q216's closed form with per-user click-cents
    * PREFIX SUMS: the clicks strictly between the anchoring view and
    * the purchase are exactly the prefix-sum difference cc(purchase) −
    * cc(view) (neither endpoint is a click, so both endpoints' own
    * contributions are zero) — integer arithmetic end to end.
    */
  private def q223(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    matchPatternMeasured(
      Tables.events(s, d),
      Pattern(
        Seq(Step("view", oneOrMore = false),
          Step("click", oneOrMore = true),
          Step("purchase", oneOrMore = false)),
        withinUs = 24L * 3600L * 1000000L),
      expr("CAST(ROUND(value * 100) AS BIGINT)"))
      .select($"user_id", $"start_us", $"end_us",
        $"n_plus".as("n_clicks"),
        $"meas_plus".as("click_cents"),
        $"meas_all".as("total_cents"))
      .orderBy($"user_id", $"start_us")
  }

  private val q223Sql =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) AS us, event_id, event_type,
      |    CAST(ROUND(value * 100) AS BIGINT) AS cents,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(ts), event_id) AS i
      |  FROM events),
      |m AS (
      |  SELECT user_id, us, event_type, i, cents,
      |    MAX(CASE WHEN event_type <> 'click' THEN i END) OVER (
      |      PARTITION BY user_id ORDER BY i
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pb,
      |    CAST(SUM(CASE WHEN event_type = 'click' THEN cents
      |      ELSE 0 END) OVER (
      |      PARTITION BY user_id ORDER BY i
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS cc
      |  FROM e)
      |SELECT b.user_id, a.us AS start_us, b.us AS end_us,
      |  CAST(b.i - b.pb - 1 AS BIGINT) AS n_clicks,
      |  CAST(b.cc - a.cc AS BIGINT) AS click_cents,
      |  CAST(b.cc - a.cc + a.cents + b.cents AS BIGINT) AS total_cents
      |FROM m b JOIN m a ON a.user_id = b.user_id AND a.i = b.pb
      |WHERE b.event_type = 'purchase' AND a.event_type = 'view'
      |  AND b.i - b.pb - 1 >= 1
      |  AND b.us - a.us <= 86400000000
      |ORDER BY b.user_id, a.us""".stripMargin

  /** q225: ALTERNATION — the step predicate as a type SET:
    * `view (click|error)+ purchase WITHIN 24h`, the "any engagement or
    * failure between view and purchase" funnel. On sf0.01 the
    * alternation genuinely binds: 145 matches vs q216's 60, 85 of them
    * containing at least one error in the run. The error count per
    * match comes from the MEASURES mechanism with an indicator measure
    * (1 for error rows) — alternation and measures COMPOSE in the one
    * fold. Oracle: the same closed form with `NOT IN`/`IN` run
    * boundaries plus an error-indicator prefix sum.
    */
  private def q225(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    matchPatternMeasured(
      Tables.events(s, d),
      Pattern(
        Seq(Step("view", oneOrMore = false),
          Step(Seq("click", "error"), oneOrMore = true),
          Step("purchase", oneOrMore = false)),
        withinUs = 24L * 3600L * 1000000L),
      when($"event_type" === "error", 1L).otherwise(0L))
      .select($"user_id", $"start_us", $"end_us",
        $"n_plus".as("n_mid"),
        $"meas_plus".as("n_errors"))
      .orderBy($"user_id", $"start_us")
  }

  private val q225Sql =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) AS us, event_id, event_type,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(ts), event_id) AS i
      |  FROM events),
      |m AS (
      |  SELECT user_id, us, event_type, i,
      |    MAX(CASE WHEN event_type NOT IN ('click', 'error') THEN i
      |      END) OVER (
      |      PARTITION BY user_id ORDER BY i
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pb,
      |    CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY i
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS ec
      |  FROM e)
      |SELECT b.user_id, a.us AS start_us, b.us AS end_us,
      |  CAST(b.i - b.pb - 1 AS BIGINT) AS n_mid,
      |  CAST(b.ec - a.ec AS BIGINT) AS n_errors
      |FROM m b JOIN m a ON a.user_id = b.user_id AND a.i = b.pb
      |WHERE b.event_type = 'purchase' AND a.event_type = 'view'
      |  AND b.i - b.pb - 1 >= 1
      |  AND b.us - a.us <= 86400000000
      |ORDER BY b.user_id, a.us""".stripMargin

  /** q226: RELAXED CONTIGUITY (Flink CEP's `followedBy`) —
    * `signup view+ purchase`, EVENTUALLY-semantics: any number of
    * irrelevant rows may interleave; an attempt is anchored at the
    * key's earliest un-consumed signup and can only end by completing
    * (time-unbounded by the Pattern require — a timeout could orphan
    * viable later anchors, which only concurrent threads could honor
    * exactly; unbounded, the earliest anchor provably dominates).
    * Skip-past-last-row then realigns the scan, so the single-thread
    * pass remains exact for ANY pattern shape, leading-`+` included.
    *
    * The oracle is the strongest device in the family: DuckDB replays
    * the AUTOMATON ITSELF — the per-row transition function as a
    * recursive CTE over row numbers (q218's recursion shape), firing
    * match columns on completing rows. No closed form needed, so this
    * oracle pattern extends to every machine this module can compile.
    */
  private def q226(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    matchPattern(
      Tables.events(s, d),
      Pattern(
        Seq(Step("signup", oneOrMore = false),
          Step("view", oneOrMore = true),
          Step("purchase", oneOrMore = false)),
        withinUs = Unbounded, relaxed = true))
      .select($"user_id", $"start_us", $"end_us",
        $"n_plus".as("n_views"))
      .orderBy($"user_id", $"start_us")
  }

  private val q226Sql =
    """WITH RECURSIVE e AS (
      |  SELECT user_id, epoch_us(ts) AS us, event_id, event_type,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(ts), event_id) AS i
      |  FROM events),
      |rec AS (
      |  SELECT user_id, i,
      |    CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END AS s,
      |    CASE WHEN event_type = 'signup' THEN us END AS start_us,
      |    CAST(0 AS BIGINT) AS nv,
      |    FALSE AS fired,
      |    CAST(NULL AS BIGINT) AS m_start,
      |    CAST(NULL AS BIGINT) AS m_end,
      |    CAST(NULL AS BIGINT) AS m_nv
      |  FROM e WHERE i = 1
      |  UNION ALL
      |  SELECT nx.user_id, nx.i,
      |    CASE
      |      WHEN r.s = 0 AND nx.event_type = 'signup' THEN 1
      |      WHEN r.s = 1 AND nx.event_type = 'view' THEN 2
      |      WHEN r.s = 2 AND nx.event_type = 'purchase' THEN 0
      |      ELSE r.s END AS s,
      |    CASE
      |      WHEN r.s = 0 AND nx.event_type = 'signup' THEN nx.us
      |      WHEN r.s = 2 AND nx.event_type = 'purchase' THEN NULL
      |      ELSE r.start_us END AS start_us,
      |    CASE
      |      WHEN r.s = 1 AND nx.event_type = 'view' THEN 1
      |      WHEN r.s = 2 AND nx.event_type = 'view' THEN r.nv + 1
      |      WHEN r.s = 2 AND nx.event_type = 'purchase' THEN 0
      |      ELSE r.nv END AS nv,
      |    (r.s = 2 AND nx.event_type = 'purchase') AS fired,
      |    CASE WHEN r.s = 2 AND nx.event_type = 'purchase'
      |      THEN r.start_us END AS m_start,
      |    CASE WHEN r.s = 2 AND nx.event_type = 'purchase'
      |      THEN nx.us END AS m_end,
      |    CASE WHEN r.s = 2 AND nx.event_type = 'purchase'
      |      THEN r.nv END AS m_nv
      |  FROM rec r JOIN e nx
      |    ON nx.user_id = r.user_id AND nx.i = r.i + 1)
      |SELECT user_id, m_start AS start_us, m_end AS end_us,
      |  m_nv AS n_views
      |FROM rec WHERE fired ORDER BY user_id, m_start""".stripMargin

  /** q227: TIME-BOUNDED RELAXED matching — `signup view+ purchase
    * WITHIN 48h`, eventually-semantics under a deadline: the full CEP
    * shape q226 documented as needing concurrent attempt threads, now
    * run on [[ThreadMatcher]] (state bounded by anchors-in-window). On
    * sf0.01 every dimension binds: 306 matches vs q226's 606
    * unbounded (the deadline kills ~half), 54 with ≥2 views.
    *
    * Oracle: per-anchor attempt outcomes are CLOSED-FORM under this
    * pattern (v1 = first view after the anchor, p = first purchase
    * after v1 — both plain window MINs over following rows — complete
    * iff p lands within the deadline; greedy view count is a prefix-sum
    * difference), and AFTER MATCH SKIP PAST LAST ROW is a per-row
    * recursion carrying ONE integer (the scan pointer): a row fires
    * iff it is a complete anchor at or past the pointer, which then
    * jumps past the match end — q218's recursion shape with the
    * attempt table precomputed.
    */
  private def q227(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    matchPattern(
      Tables.events(s, d),
      Pattern(
        Seq(Step("signup", oneOrMore = false),
          Step("view", oneOrMore = true),
          Step("purchase", oneOrMore = false)),
        withinUs = 48L * 3600L * 1000000L, relaxed = true))
      .select($"user_id", $"start_us", $"end_us",
        $"n_plus".as("n_views"))
      .orderBy($"user_id", $"start_us")
  }

  private val q227Sql =
    """WITH RECURSIVE e AS (
      |  SELECT user_id, epoch_us(ts) AS us, event_id, event_type,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(ts), event_id) AS i
      |  FROM events),
      |w AS (
      |  SELECT *,
      |    MIN(CASE WHEN event_type = 'view' THEN i END) OVER (
      |      PARTITION BY user_id ORDER BY i
      |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
      |    MIN(CASE WHEN event_type = 'purchase' THEN i END) OVER (
      |      PARTITION BY user_id ORDER BY i
      |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS np,
      |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY i
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS vc
      |  FROM e),
      |info AS (
      |  -- per-row attempt outcome: for signup anchors, the walk's end
      |  -- row and view count; complete iff the purchase beats the
      |  -- 48h deadline from the anchor
      |  SELECT a.user_id, a.i, a.us,
      |    (a.event_type = 'signup' AND p.i IS NOT NULL
      |      AND p.us - a.us <= 172800000000) AS complete,
      |    p.i AS end_i, p.us AS end_us,
      |    p.vc - v.vc + 1 AS n_views
      |  FROM w a
      |  LEFT JOIN w v ON v.user_id = a.user_id AND v.i = a.nv
      |  LEFT JOIN w p ON p.user_id = a.user_id AND p.i = v.np),
      |rec AS (
      |  -- scan pointer s: a row fires iff it is a complete anchor at
      |  -- or past s; firing jumps s past the match end
      |  SELECT user_id, i,
      |    CASE WHEN complete THEN end_i + 1 ELSE 1 END AS s,
      |    complete AS fired,
      |    CASE WHEN complete THEN us END AS m_start,
      |    CASE WHEN complete THEN end_us END AS m_end,
      |    CASE WHEN complete THEN n_views END AS m_nv
      |  FROM info WHERE i = 1
      |  UNION ALL
      |  SELECT nx.user_id, nx.i,
      |    CASE WHEN nx.complete AND nx.i >= r.s THEN nx.end_i + 1
      |      ELSE r.s END AS s,
      |    (nx.complete AND nx.i >= r.s) AS fired,
      |    CASE WHEN nx.complete AND nx.i >= r.s THEN nx.us END
      |      AS m_start,
      |    CASE WHEN nx.complete AND nx.i >= r.s THEN nx.end_us END
      |      AS m_end,
      |    CASE WHEN nx.complete AND nx.i >= r.s THEN nx.n_views END
      |      AS m_nv
      |  FROM rec r JOIN info nx
      |    ON nx.user_id = r.user_id AND nx.i = r.i + 1)
      |SELECT user_id, m_start AS start_us, m_end AS end_us,
      |  CAST(m_nv AS BIGINT) AS n_views
      |FROM rec WHERE fired ORDER BY user_id, m_start""".stripMargin

  /** q229: ALL ROWS PER MATCH + CLASSIFIER over q216's pattern — each
    * funnel match exploded to its consumed rows with the step that
    * consumed them (0 = view anchor, 1 = click run, 2 = purchase).
    * Oracle: q216's closed-form match table joined back to the rows by
    * index range, classifier = the type decode.
    */
  private def q229(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    matchPatternRows(
      Tables.events(s, d),
      Pattern(
        Seq(Step("view", oneOrMore = false),
          Step("click", oneOrMore = true),
          Step("purchase", oneOrMore = false)),
        withinUs = 24L * 3600L * 1000000L))
  }

  private val q229Sql =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) AS us, event_id, event_type,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(ts), event_id) AS i
      |  FROM events),
      |m AS (
      |  SELECT user_id, us, event_type, i,
      |    MAX(CASE WHEN event_type <> 'click' THEN i END) OVER (
      |      PARTITION BY user_id ORDER BY i
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pb
      |  FROM e),
      |mt AS (
      |  SELECT b.user_id AS mu, a.us AS start_us, a.i AS ai, b.i AS bi
      |  FROM m b JOIN e a ON a.user_id = b.user_id AND a.i = b.pb
      |  WHERE b.event_type = 'purchase' AND a.event_type = 'view'
      |    AND b.i - b.pb - 1 >= 1
      |    AND b.us - a.us <= 86400000000)
      |SELECT r.user_id, t.start_us, r.us, r.event_id, r.event_type,
      |  CASE r.event_type WHEN 'view' THEN 0 WHEN 'click' THEN 1
      |    ELSE 2 END AS step
      |FROM mt t JOIN e r
      |  ON r.user_id = t.mu AND r.i BETWEEN t.ai AND t.bi
      |ORDER BY r.user_id, t.start_us, r.us, r.event_id""".stripMargin

  /** q230: the full quantifier algebra in one pattern —
    * `view click{1,2} error? purchase WITHIN 24h`: BOUNDED greedy
    * repetition (a third click kills the attempt) and an OPTIONAL step
    * (the purchase may advance straight over the un-consumed error
    * slot). On sf0.01 every quantifier binds: 67 matches, 6 hitting
    * the {1,2} cap, 7 consuming the optional error. `n_errors` rides
    * the MEASURES channel (error-indicator over all consumed rows).
    * Oracle: strict contiguity keeps the closed form — a purchase
    * whose click/error span back to the anchoring view satisfies the
    * count ranges AND the order (every click before every error),
    * checked with span aggregates.
    */
  private def q230(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    matchPatternMeasured(
      Tables.events(s, d),
      Pattern(
        Seq(Step("view", oneOrMore = false),
          Step.rep("click", 1, 2),
          Step.opt("error"),
          Step("purchase", oneOrMore = false)),
        withinUs = 24L * 3600L * 1000000L),
      when($"event_type" === "error", 1L).otherwise(0L))
      .select($"user_id", $"start_us", $"end_us",
        $"n_plus".as("n_clicks"),
        $"meas_all".as("n_errors"))
      .orderBy($"user_id", $"start_us")
  }

  private val q230Sql =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) AS us, event_id, event_type,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(ts), event_id) AS i
      |  FROM events),
      |m AS (
      |  SELECT user_id, us, event_type, i,
      |    MAX(CASE WHEN event_type NOT IN ('click', 'error') THEN i
      |      END) OVER (
      |      PARTITION BY user_id ORDER BY i
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pb
      |  FROM e),
      |cand AS (
      |  SELECT b.user_id, a.us AS start_us, b.us AS end_us,
      |    a.i AS ai, b.i AS bi
      |  FROM m b JOIN m a ON a.user_id = b.user_id AND a.i = b.pb
      |  WHERE b.event_type = 'purchase' AND a.event_type = 'view'
      |    AND b.us - a.us <= 86400000000),
      |sp AS (
      |  SELECT c.user_id, c.start_us, c.end_us,
      |    COALESCE(SUM(CASE WHEN r.event_type = 'click' THEN 1
      |      ELSE 0 END), 0) AS cc,
      |    COALESCE(SUM(CASE WHEN r.event_type = 'error' THEN 1
      |      ELSE 0 END), 0) AS ec,
      |    MAX(CASE WHEN r.event_type = 'click' THEN r.i END) AS mxc,
      |    MIN(CASE WHEN r.event_type = 'error' THEN r.i END) AS mne
      |  FROM cand c LEFT JOIN e r
      |    ON r.user_id = c.user_id AND r.i > c.ai AND r.i < c.bi
      |  GROUP BY 1, 2, 3)
      |SELECT user_id, start_us, end_us,
      |  CAST(cc AS BIGINT) AS n_clicks, CAST(ec AS BIGINT) AS n_errors
      |FROM sp
      |WHERE cc BETWEEN 1 AND 2 AND ec <= 1
      |  AND (ec = 0 OR mxc < mne)
      |ORDER BY user_id, start_us""".stripMargin

  /** q231: SESSION-SCOPED matching — q216's funnel required to
    * complete inside ONE activity session (8h inactivity gap): the
    * matcher resets at every gap, so the funnel a user completes
    * across a multi-day return visit no longer counts. On sf0.01 the
    * scoping genuinely binds: 26 of q216's 60 matches survive. The
    * oracle composes q216's closed form with the gap condition — a
    * strict match is session-contained iff NO consecutive-row gap
    * inside its span exceeds the bound (the reset-at-gap automaton and
    * the filtered closed form coincide for anchored strict patterns:
    * a reset can only fire on a gap row, and any structural candidate
    * spanning that gap is exactly what the filter removes).
    */
  private def q231(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    matchPattern(
      Tables.events(s, d),
      Pattern(
        Seq(Step("view", oneOrMore = false),
          Step("click", oneOrMore = true),
          Step("purchase", oneOrMore = false)),
        withinUs = 24L * 3600L * 1000000L),
      sessionGapUs = Some(8L * 3600L * 1000000L))
      .select($"user_id", $"start_us", $"end_us",
        $"n_plus".as("n_clicks"))
      .orderBy($"user_id", $"start_us")
  }

  private val q231Sql =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) AS us, event_id, event_type,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(ts), event_id) AS i,
      |    epoch_us(ts) - LAG(epoch_us(ts)) OVER (
      |      PARTITION BY user_id
      |      ORDER BY epoch_us(ts), event_id) AS gap
      |  FROM events),
      |m AS (
      |  SELECT user_id, us, event_type, i,
      |    MAX(CASE WHEN event_type <> 'click' THEN i END) OVER (
      |      PARTITION BY user_id ORDER BY i
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pb
      |  FROM e),
      |cand AS (
      |  SELECT b.user_id, a.us AS start_us, b.us AS end_us,
      |    a.i AS ai, b.i AS bi, CAST(b.i - b.pb - 1 AS BIGINT) AS nc
      |  FROM m b JOIN e a ON a.user_id = b.user_id AND a.i = b.pb
      |  WHERE b.event_type = 'purchase' AND a.event_type = 'view'
      |    AND b.i - b.pb - 1 >= 1
      |    AND b.us - a.us <= 86400000000)
      |SELECT c.user_id, c.start_us, c.end_us, c.nc AS n_clicks
      |FROM cand c JOIN e r
      |  ON r.user_id = c.user_id AND r.i > c.ai AND r.i <= c.bi
      |GROUP BY 1, 2, 3, 4
      |HAVING MAX(r.gap) <= 28800000000
      |ORDER BY c.user_id, c.start_us""".stripMargin

  /** q239: TOKEN-MOTIF MINING — the matcher pointed at a SECOND
    * domain: documents' token sequences, keyed by `doc_id`, position
    * as the sequence axis (`keyCol` + a synthesized µs timestamp —
    * PARTITION BY is generic, not user-bound). The motif
    * `(scan|row|table|key) (filter|hash|value|part|a)+
    * (join|merge|batch)` — an anchor vocabulary, a one-or-more middle
    * run, a closing vocabulary, all through [[parse]] — is the lexical
    * n-gram-with-variable-middle extraction text mining reaches for
    * beyond fixed n-grams (q68/q124/q132 count exact grams only). 71
    * motifs at sf0.01, 8 with a multi-token middle. Oracle: q216's
    * closed form on the renumbered token table.
    */
  private def q239(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val toks = Tables
      .documents(s, d)
      .select($"doc_id",
        posexplode(split($"text", " ")).as(Seq("pos", "tok")))
      .where(length($"tok") > 0)
      .select($"doc_id", timestamp_micros($"pos".cast("long")).as("ts"),
        $"pos".cast("long").as("event_id"), $"tok".as("event_type"))
    matchPattern(toks,
      parse("(scan|row|table|key) (filter|hash|value|part|a)+ " +
        "(join|merge|batch)"),
      keyCol = "doc_id")
      .select($"user_id".as("doc_id"), $"start_us".as("start_pos"),
        $"end_us".as("end_pos"), $"n_plus".as("n_mid"))
      .orderBy($"doc_id", $"start_pos")
  }

  private val q239Sql =
    """WITH e AS (
      |  SELECT d.doc_id, g.i - 1 AS pos, d.l[g.i] AS tok,
      |    ROW_NUMBER() OVER (PARTITION BY d.doc_id ORDER BY g.i)
      |      AS rn
      |  FROM (SELECT doc_id, string_split(text, ' ') AS l
      |        FROM documents) d,
      |    UNNEST(generate_series(1, len(d.l))) AS g(i)
      |  WHERE len(d.l[g.i]) > 0),
      |m AS (
      |  SELECT doc_id, pos, tok, rn,
      |    MAX(CASE WHEN tok NOT IN
      |      ('filter', 'hash', 'value', 'part', 'a') THEN rn END)
      |      OVER (PARTITION BY doc_id ORDER BY rn
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pb
      |  FROM e)
      |SELECT b.doc_id, a.pos AS start_pos, b.pos AS end_pos,
      |  CAST(b.rn - b.pb - 1 AS BIGINT) AS n_mid
      |FROM m b JOIN m a ON a.doc_id = b.doc_id AND a.rn = b.pb
      |WHERE b.tok IN ('join', 'merge', 'batch')
      |  AND a.tok IN ('scan', 'row', 'table', 'key')
      |  AND b.rn - b.pb - 1 >= 1
      |ORDER BY b.doc_id, a.pos""".stripMargin

  /** Contiguous frequent-episode MINING — discovery, the inverse of
    * everything above: the matchers run patterns the user DECLARES,
    * this recovers the frequent patterns a stream CONTAINS without
    * being told them. The reference exists to feed systems that learn
    * sequences from the stream (`/root/reference/README.md:3-6`,
    * planted dictionary `eventstream.py:140-183`), and recovering that
    * dictionary is the canonical downstream task — Round14Spec proves
    * this function run on the generator's own multi-stream output
    * returns EXACTLY the 8 planted length-10 patterns and nothing
    * else, with the least planted support multiply above the most
    * frequent non-planted 10-gram (so the support cut is not
    * delicate).
    *
    * Shape: per-key sequences via ONE window (the q104 single-exchange
    * discipline — partition by key, partition-local sort, maxLen−1
    * `lead`s share one Window operator), every contiguous episode of
    * length in [minLen, maxLen] emitted as a '>'-joined string, then
    * a hash aggregate per (len, episode) with map-side combine.
    * Support floors prune BEFORE anything leaves the aggregate:
    * absolute `minSupport` and/or relative `relPerMille` (support ·
    * 1000 ≥ rows · relPerMille, the data-size-independent form).
    * Scale: the shuffle carries (episode, count) pairs bounded by the
    * observed-gram vocabulary, never event rows; no all-pairs, no
    * self-join (the classic Apriori join is unnecessary for CONTIGUOUS
    * episodes — windows enumerate them directly).
    */
  def mineEpisodes(
      df: DataFrame,
      keyCol: String,
      orderCols: Seq[String],
      typeCol: String,
      minLen: Int = 2,
      maxLen: Int = 4,
      minSupport: Long = 1L,
      relPerMille: Long = 0L): DataFrame = {
    require(minLen >= 2 && maxLen >= minLen && maxLen <= 32,
      s"mineEpisodes: need 2 <= minLen <= maxLen <= 32, " +
        s"got [$minLen, $maxLen]")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(orderCols.map(col): _*)
    // materialize the leads in a Project FIRST — Spark rejects window
    // expressions nested inside a Generate (explode)
    val stepCols = (0 until maxLen).map(j => s"_s$j")
    val withSteps = (1 until maxLen).foldLeft(
      df.withColumn("_s0", col(typeCol).cast("string"))) {
      case (acc, j) =>
        acc.withColumn(s"_s$j",
          lead(col(typeCol), j).over(w).cast("string"))
    }
    // one struct per candidate length; NULL episode where the window
    // runs off the key's sequence tail (last step NULL ⟹ incomplete)
    val cands = (minLen to maxLen).map { l =>
      struct(
        lit(l.toLong).as("len"),
        when(col(stepCols(l - 1)).isNotNull,
          concat_ws(">", stepCols.take(l).map(col): _*)).as("episode"))
    }
    val n = df.count()
    val floor = math.max(minSupport,
      if (relPerMille > 0L) n * relPerMille / 1000L else 1L)
    withSteps.select(col(keyCol), explode(array(cands: _*)).as("c"))
      .select(col(keyCol), col("c.len"), col("c.episode"))
      .where(col("episode").isNotNull)
      .groupBy(col("len"), col("episode"))
      .agg(count(lit(1)).as("support"),
        countDistinct(col(keyCol)).as("n_keys"))
      .where(col("support") >= floor)
      .orderBy(col("len"), col("support").desc, col("episode"))
  }

  /** GAP-TOLERANT episode mining — [[mineEpisodes]]' robustness
    * upgrade: an episode's steps may be separated by up to `maxGap`
    * positions (an interleaved noise event no longer breaks the
    * count), the MINEPI-style windowed-occurrence measure: support =
    * number of (anchor, offsets) windows realizing the episode, so
    * overlapping occurrences all count — deterministic, and exactly
    * what the lead-enumeration computes. For len ∈ {2, 3} and small
    * maxGap the occurrence windows are a FIXED offset set (o₁ ≤ g;
    * o₁ < o₂ ≤ o₁ + g — g + g² combinations), so the whole miner is
    * still ONE window of maxGap·2 leads + one hash aggregate: no NFA,
    * no self-join, no state. Round14Spec pins the counts against a
    * brute-force subsequence scan and shows the robustness property
    * the operator exists for: interleaved noise collapses contiguous
    * trigram support but leaves gappy support intact.
    */
  def mineGappyEpisodes(
      df: DataFrame,
      keyCol: String,
      orderCols: Seq[String],
      typeCol: String,
      len: Int,
      maxGap: Int,
      minSupport: Long = 1L,
      relPerMille: Long = 0L): DataFrame = {
    require(len == 2 || len == 3,
      s"mineGappyEpisodes: len must be 2 or 3, got $len")
    require(maxGap >= 1 && maxGap <= 8,
      s"mineGappyEpisodes: need 1 <= maxGap <= 8, got $maxGap")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(orderCols.map(col): _*)
    val maxOff = if (len == 2) maxGap else 2 * maxGap
    val withSteps = (1 to maxOff).foldLeft(
      df.withColumn("_s0", col(typeCol).cast("string"))) {
      case (acc, j) =>
        acc.withColumn(s"_s$j",
          lead(col(typeCol), j).over(w).cast("string"))
    }
    val cands =
      if (len == 2)
        (1 to maxGap).map { o =>
          when(col(s"_s$o").isNotNull,
            concat_ws(">", col("_s0"), col(s"_s$o")))
        }
      else
        for {
          o1 <- 1 to maxGap
          o2 <- (o1 + 1) to (o1 + maxGap)
        } yield when(col(s"_s$o2").isNotNull,
          concat_ws(">", col("_s0"), col(s"_s$o1"), col(s"_s$o2")))
    val n = df.count()
    val floor = math.max(minSupport,
      if (relPerMille > 0L) n * relPerMille / 1000L else 1L)
    withSteps
      .select(col(keyCol), explode(array(cands: _*)).as("episode"))
      .where(col("episode").isNotNull)
      .groupBy(col("episode"))
      .agg(count(lit(1)).as("support"),
        countDistinct(col(keyCol)).as("n_keys"))
      .where(col("support") >= floor)
      .orderBy(col("support").desc, col("episode"))
  }

  /** q266: GAP-TOLERANT episode mining over the events table —
    * q261's contiguous trigrams miss any behavioral motif a stray
    * interleaved event interrupts; here `view → click → purchase`
    * counts with up to 2 positions between consecutive steps (the
    * MINEPI windowed-occurrence measure). Same single-window plan.
    */
  private def q266(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mineGappyEpisodes(
      Tables.events(s, d)
        .select($"user_id", $"ts", $"event_id", $"event_type"),
      keyCol = "user_id",
      orderCols = Seq("ts", "event_id"),
      typeCol = "event_type",
      len = 3, maxGap = 2,
      relPerMille = 5L)
  }

  private val q266Sql = {
    val pairs = for {
      o1 <- 1 to 2
      o2 <- (o1 + 1) to (o1 + 2)
    } yield s"""SELECT user_id,
      |    event_type || '>' || t$o1 || '>' || t$o2 AS episode
      |  FROM seqd WHERE t$o2 IS NOT NULL""".stripMargin
    s"""WITH seqd AS (
      |  SELECT user_id, event_type,
      |    lead(event_type, 1) OVER w AS t1,
      |    lead(event_type, 2) OVER w AS t2,
      |    lead(event_type, 3) OVER w AS t3,
      |    lead(event_type, 4) OVER w AS t4
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |eps AS (
      |  ${pairs.mkString("\n  UNION ALL\n  ")})
      |SELECT episode, CAST(COUNT(*) AS BIGINT) AS support,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_keys
      |FROM eps GROUP BY 1
      |HAVING COUNT(*) >= (SELECT COUNT(*) * 5 // 1000 FROM events)
      |ORDER BY support DESC, episode""".stripMargin
  }

  /** q279: MARKOV SEQUENCE MODEL + per-user sequence surprisal — the
    * "learn the stream's dynamics" primitive the reference exists to
    * benchmark (`README.md:3-6`): fit the first-order transition model
    * P(next | prev) over every per-user consecutive pair (order =
    * ts, event_id — the shared deterministic total order), add-one
    * smoothed over the observed type vocabulary, then score every user
    * by total and mean negative log-likelihood of their own sequence
    * under that model. High avg_nll = the user whose behavior the
    * corpus-level dynamics explain worst — the sequence-anomaly ranking
    * a fraud/bot triage pipeline starts from.
    *
    * Exactness: the model term is rounded to integer micro-nats ONCE
    * per (prev, cur) cell — `ROUND(-1e6 * LN((c+1)/(n+V)))`, positive
    * so HALF_UP ≡ DuckDB half-away, LN correctly rounded on identical
    * IEEE operands in identical order — and users then integer-sum
    * k × cell. No cross-row float folds anywhere.
    *
    * Scale: one event-cardinality aggregate to the (user, prev, cur)
    * grain (map-side combinable), the model is ≤|V|² rows (broadcast
    * back), the vocabulary scalar is a 1-row broadcast touching only
    * the model rows, per-user scoring is a second bounded aggregate
    * behind a broadcast join. No event-grain joins, no windows wider
    * than the lag.
    */
  private def q279(s: SparkSession, d: String): DataFrame =
    markovSurprisal(Tables.events(s, d))

  /** The q279 core over any (user_id, ts, event_id, event_type) frame —
    * exposed so Round14Spec can drive planted sequences (a perfectly
    * repetitive user must score strictly lower avg_nll than an erratic
    * one under the jointly-fitted model).
    */
  private[graft] def markovSurprisal(ev: DataFrame): DataFrame = {
    val s = ev.sparkSession
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val big = ev
      .select($"user_id", $"ts", $"event_id", $"event_type".as("cur"))
      .withColumn("prev", lag($"cur", 1).over(w))
      .where($"prev".isNotNull)
      .groupBy($"user_id", $"prev", $"cur").agg(count(lit(1)).as("k"))
    surprisalFromBigrams(big, ev)
  }

  /** q279's model + scoring over a prepared per-user bigram-count
    * frame `big(user_id, prev, cur, k)` — shared by the batch lag
    * window (q279) and the streaming bigram extractor (q281), so the
    * streaming twin's only novel stage is HOW the bigrams were counted.
    * `ev` supplies the type vocabulary for the smoothing denominator.
    */
  private[graft] def surprisalFromBigrams(
      big: DataFrame, ev: DataFrame): DataFrame = {
    val s = big.sparkSession
    import s.implicits._
    val mat = big.groupBy($"prev", $"cur").agg(sum($"k").as("c"))
      .withColumn("n", sum($"c").over(Window.partitionBy($"prev")))
    val vocab = ev
      .agg(countDistinct($"event_type").as("v")).withColumn("one", lit(1))
    val model = mat.withColumn("one", lit(1))
      .join(broadcast(vocab), Seq("one"))
      .withColumn("nll_micro",
        expr("CAST(ROUND(-1000000.0 * LN((c + 1.0) / (n + v))) AS BIGINT)"))
      .select($"prev", $"cur", $"nll_micro")
    big
      .join(broadcast(model), Seq("prev", "cur"))
      .groupBy($"user_id")
      .agg(sum($"k").as("n_trans"),
        sum($"k" * $"nll_micro").as("nll_sum_micro"))
      .withColumn("avg_nll_micro", expr("nll_sum_micro DIV n_trans"))
      .orderBy($"user_id")
  }

  /** Shared DuckDB CTE chain fitting the per-user bigram counts and
    * the transition matrix (through `mat(prev, cur, c, n)`) — the fit
    * is identical for every query over it (q279 surprisal, q311
    * serving), so the chain lives once.
    */
  private val markovMatCtes: String =
    """seqd AS (
      |  SELECT user_id, event_type AS cur,
      |    lag(event_type) OVER (PARTITION BY user_id
      |                          ORDER BY ts, event_id) AS prev
      |  FROM events),
      |big AS (
      |  SELECT user_id, prev, cur, CAST(COUNT(*) AS BIGINT) AS k
      |  FROM seqd WHERE prev IS NOT NULL GROUP BY 1, 2, 3),
      |mat AS (
      |  SELECT prev, cur, SUM(k) AS c,
      |    SUM(SUM(k)) OVER (PARTITION BY prev) AS n
      |  FROM big GROUP BY 1, 2)""".stripMargin

  private val q279Sql =
    s"""WITH $markovMatCtes,
      |voc AS (SELECT COUNT(DISTINCT event_type) AS v FROM events),
      |model AS (
      |  SELECT prev, cur,
      |    CAST(ROUND(-1000000.0 * LN((c + 1.0) / (n + v))) AS BIGINT)
      |      AS nll_micro
      |  FROM mat, voc)
      |SELECT b.user_id, CAST(SUM(b.k) AS BIGINT) AS n_trans,
      |  CAST(SUM(b.k * m.nll_micro) AS BIGINT) AS nll_sum_micro,
      |  CAST(SUM(b.k * m.nll_micro) // SUM(b.k) AS BIGINT)
      |    AS avg_nll_micro
      |FROM big b JOIN model m ON b.prev = m.prev AND b.cur = m.cur
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- q311: next-event serving ---------------------------------------

  /** q311: NEXT-EVENT SERVING — the step the Markov family trains for
    * and never ran: q279 FITS the transition matrix, q280 EVALUATES it
    * point-in-time, q286 CALIBRATES it; q311 SERVES it — for every
    * user, the top-3 predicted next events given their LAST observed
    * event, with exact integer-ppm transition scores. Per user: one
    * max_by over (ts, event_id) picks the serving context; the fitted
    * ≤|V|² matrix broadcasts into the user-grain join; ranking is
    * (count DESC, type ASC) — deterministic in both engines; the score
    * is 10⁶·c // n in DECIMAL(38,0)/HUGEINT (overflow-proof at any
    * event count). The serving shape IS the production shape: one
    * event-grain aggregate per leg, then user-grain work against a
    * broadcast model. ABSENT-IN-REF (the reference generates the
    * sequences; this serves their fitted model).
    */
  private[graft] def nextEventServing(ev: DataFrame): DataFrame = {
    val s = ev.sparkSession
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val mat = ev
      .select($"user_id", $"ts", $"event_id", $"event_type".as("cur"))
      .withColumn("prev", lag($"cur", 1).over(w))
      .where($"prev".isNotNull)
      .groupBy($"prev", $"cur").agg(count(lit(1)).as("c"))
      .withColumn("n", sum($"c").over(Window.partitionBy($"prev")))
    // COLD-START back-off: a user whose last type never occurs as a
    // CONTEXT (it only ever ended sequences) gets the global type
    // marginal instead of silently vanishing from the serving table;
    // the `source` column says which model answered. The back-off
    // meets the |V|-row marginal through a constant equi-key
    // (broadcast hash join over a bounded dim — never a cartesian).
    val marg = ev
      .groupBy($"event_type".as("cur")).agg(count(lit(1)).as("c"))
      .withColumn("n", sum($"c").over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
    val last = ev
      .groupBy($"user_id")
      .agg(max_by($"event_type", struct($"ts", $"event_id"))
        .as("last_type"))
    val fromModel = last
      .join(broadcast(mat), $"last_type" === $"prev")
      .select($"user_id", $"last_type", $"cur", $"c", $"n",
        lit("bigram").as("source"))
    val fromMarginal = last
      .join(broadcast(mat.select($"prev".as("last_type")).distinct()),
        Seq("last_type"), "left_anti")
      .withColumn("one", lit(1))
      .join(broadcast(marg.withColumn("one", lit(1))), "one")
      .select($"user_id", $"last_type", $"cur", $"c", $"n",
        lit("marginal").as("source"))
    fromModel.unionByName(fromMarginal)
      .withColumn("rnk", row_number().over(
        Window.partitionBy($"user_id").orderBy($"c".desc, $"cur")))
      .filter($"rnk" <= 3)
      .select($"user_id", $"last_type", $"rnk".cast("long").as("rnk"),
        $"cur".as("predicted_next"),
        expr("CAST((CAST(c AS DECIMAL(38,0)) * 1000000) DIV n AS LONG)")
          .as("score_ppm"),
        $"source")
      .orderBy($"user_id", $"rnk")
  }

  private def q311(s: SparkSession, d: String): DataFrame =
    nextEventServing(graft.Tables.events(s, d))

  private val q311Sql =
    s"""WITH $markovMatCtes,
      |marg AS (
      |  SELECT event_type AS cur, CAST(COUNT(*) AS BIGINT) AS c,
      |    CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS n
      |  FROM events GROUP BY 1),
      |lastev AS (
      |  SELECT user_id,
      |    first(event_type ORDER BY ts DESC, event_id DESC) AS last_type
      |  FROM events GROUP BY user_id),
      |from_model AS (
      |  SELECT l.user_id, l.last_type, m.cur,
      |    CAST(m.c AS BIGINT) AS c, CAST(m.n AS BIGINT) AS n,
      |    'bigram' AS source
      |  FROM lastev l JOIN mat m ON m.prev = l.last_type),
      |from_marg AS (
      |  SELECT l.user_id, l.last_type, g.cur, g.c, g.n,
      |    'marginal' AS source
      |  FROM lastev l, marg g
      |  WHERE NOT EXISTS (
      |    SELECT 1 FROM mat m WHERE m.prev = l.last_type)),
      |cand AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY c DESC, cur) AS rnk
      |  FROM (SELECT * FROM from_model
      |        UNION ALL SELECT * FROM from_marg) u)
      |SELECT user_id, last_type, rnk, cur AS predicted_next,
      |  CAST(CAST(c AS HUGEINT) * 1000000 // n AS BIGINT) AS score_ppm,
      |  source
      |FROM cand WHERE rnk <= 3
      |ORDER BY user_id, rnk""".stripMargin

  /** q280: NEXT-EVENT PREDICTION with a point-in-time holdout — train
    * the q279 transition matrix ONLY on events before Jan 25 and grade
    * its argmax predictor on the held-out tail (lag computed WITHIN the
    * holdout, so no feature crosses the split — the same leakage
    * discipline as q278). Per previous-event row: the model's pick
    * (max count, lexicographic tie-break — deterministic in both
    * engines), evaluation support, hits, and accuracy in ppm. The
    * marginal row ('(none)') would appear only for holdout prevs the
    * training window never saw — coalesced, not dropped, so schema and
    * semantics survive thinner slices.
    *
    * Scale: both legs are the one map-side-combinable bigram aggregate
    * on partition-prunable date predicates; the trained model is ≤|V|²
    * rows broadcast into the holdout-grain join.
    */
  private def q280(s: SparkSession, d: String): DataFrame =
    nextEventEval(Tables.events(s, d),
      java.sql.Timestamp.valueOf("2024-01-25 00:00:00"))

  /** The q280 core — exposed so Round14Spec can plant a deterministic
    * training chain and require the holdout accuracy row to be exact.
    */
  private[graft] def nextEventEval(
      ev: DataFrame, splitTs: java.sql.Timestamp): DataFrame = {
    val s = ev.sparkSession
    import s.implicits._
    val split = lit(splitTs)
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    def bigrams(df: DataFrame): DataFrame = df
      .select($"user_id", $"ts", $"event_id", $"event_type".as("cur"))
      .withColumn("prev", lag($"cur", 1).over(w))
      .where($"prev".isNotNull)
    val rankW = Window.partitionBy($"prev").orderBy($"c".desc, $"cur")
    val modelDf = bigrams(ev.where($"ts" < split))
      .groupBy($"prev", $"cur").agg(count(lit(1)).as("c"))
      .withColumn("rk", row_number().over(rankW))
      .where($"rk" === 1)
      .select($"prev", $"cur".as("predicted"))
    bigrams(ev.where($"ts" >= split))
      .join(broadcast(modelDf), Seq("prev"), "left")
      .withColumn("predicted", coalesce($"predicted", lit("(none)")))
      .groupBy($"prev", $"predicted")
      .agg(count(lit(1)).as("n_eval"),
        sum(when($"cur" === $"predicted", 1L).otherwise(0L)).as("n_correct"))
      .withColumn("acc_ppm", expr("(n_correct * 1000000) DIV n_eval"))
      .orderBy($"prev")
  }

  private val q280Sql =
    """WITH train AS (
      |  SELECT user_id, event_type AS cur,
      |    lag(event_type) OVER (PARTITION BY user_id
      |                          ORDER BY ts, event_id) AS prev
      |  FROM events WHERE ts < TIMESTAMP '2024-01-25 00:00:00'),
      |model AS (
      |  SELECT prev, cur AS predicted FROM (
      |    SELECT prev, cur, COUNT(*) AS c,
      |      ROW_NUMBER() OVER (PARTITION BY prev
      |                         ORDER BY COUNT(*) DESC, cur) AS rk
      |    FROM train WHERE prev IS NOT NULL GROUP BY prev, cur)
      |  WHERE rk = 1),
      |holdout AS (
      |  SELECT user_id, event_type AS cur,
      |    lag(event_type) OVER (PARTITION BY user_id
      |                          ORDER BY ts, event_id) AS prev
      |  FROM events WHERE ts >= TIMESTAMP '2024-01-25 00:00:00')
      |SELECT h.prev, COALESCE(m.predicted, '(none)') AS predicted,
      |  CAST(COUNT(*) AS BIGINT) AS n_eval,
      |  CAST(SUM(CASE WHEN h.cur = COALESCE(m.predicted, '(none)')
      |                THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
      |  CAST((SUM(CASE WHEN h.cur = COALESCE(m.predicted, '(none)')
      |                 THEN 1 ELSE 0 END) * 1000000) // COUNT(*) AS BIGINT)
      |    AS acc_ppm
      |FROM holdout h LEFT JOIN model m ON h.prev = m.prev
      |WHERE h.prev IS NOT NULL
      |GROUP BY 1, 2 ORDER BY 1""".stripMargin

  /** One q282 output row: the Viterbi MAP decode summary of one user's
    * event sequence under the two-regime HMM.
    */
  final case class ViterbiRow(user_id: Long, n_events: Long,
      map_cost_micro: Long, map_state: String, n_burst_steps: Long,
      n_switches: Long)

  /** q282: VITERBI REGIME DECODING — exact MAP decoding of each user's
    * event sequence under a two-regime HMM (calm/burst) with FIXED
    * integer micro-nat cost matrices (−10⁶·ln p, literals identical in
    * both engines: uniform prior 693147; stay 105361 / switch 2302585;
    * calm emits view 798508, click 1386294, signup 1897120, purchase
    * 2302585, error 2995732; burst emits error 916291, click 1203973,
    * view 1897120, purchase 2302585, signup 2995732; unseen types floor
    * at 13815511 ≈ −ln 1e-6). The DP is pure integer add/min, so the
    * decode is EXACT — no runtime ln/exp anywhere — and the oracle
    * replays the identical recurrence as a recursive CTE (q214's
    * device). Instead of backpointers, each of the two alive hypotheses
    * carries its own running (burst-steps, switches) counters — O(1)
    * state per user, no O(n²) path strings — which is exact because a
    * 2-state Viterbi keeps exactly 2 survivor paths. Ties prefer calm
    * (strict `<` from the burst side), identically in both engines.
    *
    * Scale: the q214/q237 per-key fold — one hash exchange to
    * co-locate each user's events, one in-partition sort, then a
    * single-pass streaming fold with constant per-user state. The
    * cost is the sort; nothing is collected and no state grows with
    * sequence length.
    */
  private def q282(s: SparkSession, d: String): DataFrame =
    viterbiRegimes(Tables.events(s, d))

  /** The q282 decoder over any (user_id, ts, event_id, event_type)
    * frame — exposed so Round14Spec can drive planted regimes (a pure
    * view run must decode all-calm; a long error burst must decode
    * burst with exactly two switches around it).
    */
  private[graft] def viterbiRegimes(ev: DataFrame): DataFrame = {
    val s = ev.sparkSession
    import s.implicits._
    val seqd = ev
      .select($"user_id", unix_micros($"ts").as("us"), $"event_id",
        $"event_type")
      .repartition($"user_id")
      .sortWithinPartitions($"user_id", $"us", $"event_id")
      .as[(Long, Long, Long, String)]
    implicit val enc = Encoders.product[ViterbiRow]
    seqd.mapPartitions { it =>
      val buf = it.buffered
      new Iterator[ViterbiRow] {
        def hasNext: Boolean = buf.hasNext
        def next(): ViterbiRow = {
          val u = buf.head._1
          var n = 0L
          // per-state: cost, burst-steps, switches of the best path in
          var c0 = 693147L; var b0 = 0L; var w0 = 0L
          var c1 = 693147L; var b1 = 0L; var w1 = 0L
          var first = true
          while (buf.hasNext && buf.head._1 == u) {
            val t = buf.next()._4
            val e0 = emitCalm(t)
            val e1 = emitBurst(t)
            if (first) {
              c0 += e0; c1 += e1; b1 += 1L
              first = false
            } else {
              // into state 0: stay from 0 vs switch from 1 (tie → calm)
              val from1to0 = c1 + 2302585L
              val s0 = c0 + 105361L
              val n0 =
                if (from1to0 < s0) (from1to0 + e0, b1, w1 + 1L)
                else (s0 + e0, b0, w0)
              // into state 1: switch from 0 vs stay from 1 (tie → calm)
              val from0to1 = c0 + 2302585L
              val s1 = c1 + 105361L
              val n1 =
                if (s1 < from0to1) (s1 + e1, b1 + 1L, w1)
                else (from0to1 + e1, b0 + 1L, w0 + 1L)
              c0 = n0._1; b0 = n0._2; w0 = n0._3
              c1 = n1._1; b1 = n1._2; w1 = n1._3
            }
            n += 1L
          }
          if (c0 <= c1) ViterbiRow(u, n, c0, "calm", b0, w0)
          else ViterbiRow(u, n, c1, "burst", b1, w1)
        }
      }
    }.toDF().orderBy($"user_id")
  }

  private def emitCalm(t: String): Long = t match {
    case "view" => 798508L
    case "click" => 1386294L
    case "signup" => 1897120L
    case "purchase" => 2302585L
    case "error" => 2995732L
    case _ => 13815511L
  }

  private def emitBurst(t: String): Long = t match {
    case "error" => 916291L
    case "click" => 1203973L
    case "view" => 1897120L
    case "purchase" => 2302585L
    case "signup" => 2995732L
    case _ => 13815511L
  }

  private val q282Sql =
    """WITH RECURSIVE idx AS (
      |  SELECT user_id, event_type,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |                       ORDER BY ts, event_id) AS i,
      |    COUNT(*) OVER (PARTITION BY user_id) AS n
      |  FROM events),
      |em AS (
      |  SELECT user_id, i, n,
      |    CASE event_type WHEN 'view' THEN 798508
      |      WHEN 'click' THEN 1386294 WHEN 'signup' THEN 1897120
      |      WHEN 'purchase' THEN 2302585 WHEN 'error' THEN 2995732
      |      ELSE 13815511 END AS e0,
      |    CASE event_type WHEN 'error' THEN 916291
      |      WHEN 'click' THEN 1203973 WHEN 'view' THEN 1897120
      |      WHEN 'purchase' THEN 2302585 WHEN 'signup' THEN 2995732
      |      ELSE 13815511 END AS e1
      |  FROM idx),
      |rec AS (
      |  SELECT user_id, i, n,
      |    693147 + e0 AS c0, CAST(0 AS BIGINT) AS b0,
      |      CAST(0 AS BIGINT) AS w0,
      |    693147 + e1 AS c1, CAST(1 AS BIGINT) AS b1,
      |      CAST(0 AS BIGINT) AS w1
      |  FROM em WHERE i = 1
      |  UNION ALL
      |  SELECT x.user_id, x.i, x.n,
      |    CASE WHEN r.c1 + 2302585 < r.c0 + 105361
      |      THEN r.c1 + 2302585 + x.e0 ELSE r.c0 + 105361 + x.e0
      |      END AS c0,
      |    CASE WHEN r.c1 + 2302585 < r.c0 + 105361
      |      THEN r.b1 ELSE r.b0 END AS b0,
      |    CASE WHEN r.c1 + 2302585 < r.c0 + 105361
      |      THEN r.w1 + 1 ELSE r.w0 END AS w0,
      |    CASE WHEN r.c1 + 105361 < r.c0 + 2302585
      |      THEN r.c1 + 105361 + x.e1 ELSE r.c0 + 2302585 + x.e1
      |      END AS c1,
      |    CASE WHEN r.c1 + 105361 < r.c0 + 2302585
      |      THEN r.b1 + 1 ELSE r.b0 + 1 END AS b1,
      |    CASE WHEN r.c1 + 105361 < r.c0 + 2302585
      |      THEN r.w1 ELSE r.w0 + 1 END AS w1
      |  FROM rec r JOIN em x ON x.user_id = r.user_id AND x.i = r.i + 1)
      |SELECT user_id, CAST(n AS BIGINT) AS n_events,
      |  CAST(CASE WHEN c0 <= c1 THEN c0 ELSE c1 END AS BIGINT)
      |    AS map_cost_micro,
      |  CASE WHEN c0 <= c1 THEN 'calm' ELSE 'burst' END AS map_state,
      |  CAST(CASE WHEN c0 <= c1 THEN b0 ELSE b1 END AS BIGINT)
      |    AS n_burst_steps,
      |  CAST(CASE WHEN c0 <= c1 THEN w0 ELSE w1 END AS BIGINT)
      |    AS n_switches
      |FROM rec WHERE i = n ORDER BY user_id""".stripMargin

  /** q286: PREDICTION CALIBRATION for the q280 next-event model — "when
    * the model says 40%, is it right 40% of the time?": every holdout
    * transition is scored with the TRAINED model's add-one-smoothed
    * probability of its own argmax pick (`p_hat_ppm = (c+1)·10⁶ DIV
    * (n+V)` — exact integer), bucketed into 1%-wide confidence bins, and
    * each bucket reports predicted-confidence bounds vs realized accuracy.
    * The reliability table is how a serving stack decides whether the
    * model's confidence is actionable — the sequence-model counterpart
    * of q247's isotonic calibration audit.
    *
    * Exactness/scale: train and holdout legs are q280's bigram
    * aggregates (partition-prunable timestamp predicates); the model
    * (argmax row per prev + its integer p_hat) is ≤|V| rows broadcast
    * into the holdout join; the bucket rollup is map-side combinable.
    * Everything is integer DIV arithmetic — no floats anywhere.
    */
  private def q286(s: SparkSession, d: String): DataFrame =
    predictionCalibration(Tables.events(s, d))

  private[graft] def predictionCalibration(ev: DataFrame): DataFrame = {
    val s = ev.sparkSession
    import s.implicits._
    val split = lit(java.sql.Timestamp.valueOf("2024-01-25 00:00:00"))
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    def bigrams(df: DataFrame): DataFrame = df
      .select($"user_id", $"ts", $"event_id", $"event_type".as("cur"))
      .withColumn("prev", lag($"cur", 1).over(w))
      .where($"prev".isNotNull)
    val train = bigrams(ev.where($"ts" < split))
    val vocab = ev.agg(countDistinct($"event_type").as("v"))
      .withColumn("one", lit(1))
    val rankW = Window.partitionBy($"prev").orderBy($"c".desc, $"cur")
    val model = train
      .groupBy($"prev", $"cur").agg(count(lit(1)).as("c"))
      .withColumn("n", sum($"c").over(Window.partitionBy($"prev")))
      .withColumn("rk", row_number().over(rankW))
      .where($"rk" === 1)
      .withColumn("one", lit(1))
      .join(broadcast(vocab), Seq("one"))
      .withColumn("p_hat_ppm", expr("((c + 1) * 1000000) DIV (n + v)"))
      .select($"prev", $"cur".as("predicted"), $"p_hat_ppm")
    bigrams(ev.where($"ts" >= split))
      .join(broadcast(model), Seq("prev"))
      .groupBy(expr("p_hat_ppm DIV 10000").as("bucket"))
      .agg(count(lit(1)).as("n_eval"),
        min($"p_hat_ppm").as("p_hat_min_ppm"),
        max($"p_hat_ppm").as("p_hat_max_ppm"),
        sum(when($"cur" === $"predicted", 1L).otherwise(0L))
          .as("n_correct"))
      .withColumn("acc_ppm", expr("(n_correct * 1000000) DIV n_eval"))
      .orderBy($"bucket")
  }

  private val q286Sql =
    """WITH train AS (
      |  SELECT user_id, event_type AS cur,
      |    lag(event_type) OVER (PARTITION BY user_id
      |                          ORDER BY ts, event_id) AS prev
      |  FROM events WHERE ts < TIMESTAMP '2024-01-25 00:00:00'),
      |voc AS (SELECT COUNT(DISTINCT event_type) AS v FROM events),
      |model AS (
      |  SELECT prev, cur AS predicted,
      |    CAST(((c + 1) * 1000000) // (n + v) AS BIGINT) AS p_hat_ppm
      |  FROM (
      |    SELECT prev, cur, COUNT(*) AS c,
      |      SUM(COUNT(*)) OVER (PARTITION BY prev) AS n,
      |      ROW_NUMBER() OVER (PARTITION BY prev
      |                         ORDER BY COUNT(*) DESC, cur) AS rk
      |    FROM train WHERE prev IS NOT NULL GROUP BY prev, cur), voc
      |  WHERE rk = 1),
      |holdout AS (
      |  SELECT user_id, event_type AS cur,
      |    lag(event_type) OVER (PARTITION BY user_id
      |                          ORDER BY ts, event_id) AS prev
      |  FROM events WHERE ts >= TIMESTAMP '2024-01-25 00:00:00')
      |SELECT p_hat_ppm // 10000 AS bucket,
      |  CAST(COUNT(*) AS BIGINT) AS n_eval,
      |  CAST(MIN(p_hat_ppm) AS BIGINT) AS p_hat_min_ppm,
      |  CAST(MAX(p_hat_ppm) AS BIGINT) AS p_hat_max_ppm,
      |  CAST(SUM(CASE WHEN h.cur = m.predicted THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_correct,
      |  CAST((SUM(CASE WHEN h.cur = m.predicted THEN 1 ELSE 0 END)
      |    * 1000000) // COUNT(*) AS BIGINT) AS acc_ppm
      |FROM holdout h JOIN model m ON h.prev = m.prev
      |WHERE h.prev IS NOT NULL
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q261: SEQUENTIAL PATTERN MINING over the events table — "what
    * behavioral episodes does the product actually have?": every
    * contiguous per-user episode of length 2..4 (order = ts with
    * event_id tie-break, the deterministic total order both engines
    * share) with support ≥ 0.5% of all events. n_keys carries how many
    * distinct users exhibit the episode — frequency concentrated in
    * one power user and frequency spread across the base are different
    * findings. Oracle: the same lead-window n-gram counts in DuckDB.
    */
  private def q261(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mineEpisodes(
      Tables.events(s, d)
        .select($"user_id", $"ts", $"event_id", $"event_type"),
      keyCol = "user_id",
      orderCols = Seq("ts", "event_id"),
      typeCol = "event_type",
      minLen = 2, maxLen = 4,
      relPerMille = 5L)
  }

  private val q261Sql =
    """WITH seqd AS (
      |  SELECT user_id, event_type,
      |    lead(event_type, 1) OVER w AS t1,
      |    lead(event_type, 2) OVER w AS t2,
      |    lead(event_type, 3) OVER w AS t3
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |eps AS (
      |  SELECT user_id, CAST(2 AS BIGINT) AS len,
      |    event_type || '>' || t1 AS episode
      |  FROM seqd WHERE t1 IS NOT NULL
      |  UNION ALL
      |  SELECT user_id, 3, event_type || '>' || t1 || '>' || t2
      |  FROM seqd WHERE t2 IS NOT NULL
      |  UNION ALL
      |  SELECT user_id, 4,
      |    event_type || '>' || t1 || '>' || t2 || '>' || t3
      |  FROM seqd WHERE t3 IS NOT NULL)
      |SELECT len, episode, CAST(COUNT(*) AS BIGINT) AS support,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_keys
      |FROM eps GROUP BY 1, 2
      |HAVING COUNT(*) >= (SELECT COUNT(*) * 5 // 1000 FROM events)
      |ORDER BY len, support DESC, episode""".stripMargin

  /** q292: SEQUENTIAL RULES from the mined episodes — the actionable
    * output a miner exists to produce: each frequent episode P·x
    * becomes the rule "after P, expect x" with
    * `conf_ppm = supp(P·x)·10⁶ DIV supp(P)` and
    * `lift_milli = conf_ppm·1000 DIV base_ppm(x)` (how much the prefix
    * RAISES x over its base rate — a conf-only ranking just echoes the
    * most common event). Supports are raw occurrence counts (q261's
    * definition; a prefix at a sequence tail still counts, stated
    * semantics shared by both engines).
    *
    * The key structural fact making this ONE broadcast join over the
    * mined table: contiguous-episode support is ANTI-MONOTONE — every
    * occurrence of P·x contains an occurrence of P at the same start,
    * so supp(P) ≥ supp(P·x) ≥ floor and the antecedent of every
    * surviving rule is guaranteed to have survived the same mining
    * floor (length-1 prefixes come from the plain type histogram). No
    * corpus re-scan beyond q261's own aggregate + two type rollups;
    * everything downstream of the miner is vocabulary-sized. All
    * ratios are truncating integer DIV on ppm/milli units, and the
    * two-stage lift (ppm ratios first, both ≤ 10⁶, then their milli
    * quotient) keeps every product within Long at ANY corpus size —
    * lift as supp·n·10⁹/(supp_P·cnt_x) would overflow at ~10¹²
    * events.
    */
  private def q292(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
      .select($"user_id", $"ts", $"event_id", $"event_type")
    val eps = mineEpisodes(ev,
      keyCol = "user_id", orderCols = Seq("ts", "event_id"),
      typeCol = "event_type", minLen = 2, maxLen = 4,
      relPerMille = 5L)
      .localCheckpoint()
    val n = ev.count()
    val t1 = ev.groupBy($"event_type".cast("string").as("p_ep"))
      .agg(count(lit(1)).as("p_sup"))
    val prefixes = t1.unionByName(
      eps.select($"episode".as("p_ep"), $"support".as("p_sup")))
    val base = ev.groupBy($"event_type".cast("string").as("cons"))
      .agg(count(lit(1)).as("c_cnt"))
    eps
      .withColumn("antecedent", regexp_replace($"episode", ">[^>]*$", ""))
      .withColumn("consequent", regexp_extract($"episode", "([^>]*)$", 1))
      .join(broadcast(prefixes), $"antecedent" === $"p_ep")
      .join(broadcast(base), $"consequent" === $"cons")
      .select($"len", $"antecedent", $"consequent", $"support",
        expr("support * 1000000 DIV p_sup").as("conf_ppm"),
        expr(s"c_cnt * 1000000 DIV ${n}L").as("base_ppm"))
      .withColumn("lift_milli", expr("conf_ppm * 1000 DIV base_ppm"))
      .orderBy($"len", $"conf_ppm".desc, $"antecedent", $"consequent")
  }

  private val q292Sql =
    """WITH seqd AS (
      |  SELECT user_id, event_type,
      |    lead(event_type, 1) OVER w AS t1,
      |    lead(event_type, 2) OVER w AS t2,
      |    lead(event_type, 3) OVER w AS t3
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |eg AS (
      |  SELECT user_id, CAST(2 AS BIGINT) AS len,
      |    event_type || '>' || t1 AS episode
      |  FROM seqd WHERE t1 IS NOT NULL
      |  UNION ALL
      |  SELECT user_id, 3, event_type || '>' || t1 || '>' || t2
      |  FROM seqd WHERE t2 IS NOT NULL
      |  UNION ALL
      |  SELECT user_id, 4,
      |    event_type || '>' || t1 || '>' || t2 || '>' || t3
      |  FROM seqd WHERE t3 IS NOT NULL),
      |sup AS (
      |  SELECT len, episode, CAST(COUNT(*) AS BIGINT) AS support
      |  FROM eg GROUP BY 1, 2
      |  HAVING COUNT(*) >= (SELECT COUNT(*) * 5 // 1000 FROM events)),
      |pre AS (
      |  SELECT event_type AS p_ep, CAST(COUNT(*) AS BIGINT) AS p_sup
      |  FROM events GROUP BY 1
      |  UNION ALL SELECT episode, support FROM sup),
      |base AS (
      |  SELECT event_type AS cons, CAST(COUNT(*) AS BIGINT) AS c_cnt
      |  FROM events GROUP BY 1),
      |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events)
      |SELECT s.len,
      |  regexp_replace(s.episode, '>[^>]*$', '') AS antecedent,
      |  regexp_extract(s.episode, '([^>]*)$', 1) AS consequent,
      |  s.support,
      |  CAST(s.support * 1000000 // p.p_sup AS BIGINT) AS conf_ppm,
      |  CAST(b.c_cnt * 1000000 // nn.n AS BIGINT) AS base_ppm,
      |  CAST((s.support * 1000000 // p.p_sup) * 1000 //
      |    (b.c_cnt * 1000000 // nn.n) AS BIGINT) AS lift_milli
      |FROM sup s
      |JOIN pre p ON p.p_ep = regexp_replace(s.episode, '>[^>]*$', '')
      |JOIN base b ON b.cons = regexp_extract(s.episode, '([^>]*)$', 1),
      |  nn
      |ORDER BY len, conf_ppm DESC, antecedent, consequent""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("q216_match_recognize", q216, Some(q216Sql)),
    QueryDef("q221_match_trailing_plus", q221, Some(q221Sql)),
    // STREAMING MATCH_RECOGNIZE under the oracle gate: the incremental
    // NFA (per-key watermark-matured fold in transformWithState) must
    // hash-match the SAME DuckDB closed form as batch q216 — streaming
    // sequence matching ≡ batch sequence matching.
    QueryDef("q222_stream_match",
      (s, d) => graft.streaming.Streams.streamPatternMatch(s, d),
      Some(q216Sql)),
    QueryDef("q223_match_measures", q223, Some(q223Sql)),
    QueryDef("q225_match_alternation", q225, Some(q225Sql)),
    QueryDef("q226_match_relaxed", q226, Some(q226Sql)),
    QueryDef("q227_match_relaxed_timed", q227, Some(q227Sql)),
    // STREAMING time-bounded relaxed matching: the ThreadMatcher's
    // live/held attempts persist per key as MatcherSnap rows, the
    // watermark both MATURES buffered rows and ADVANCES TIME
    // (onTime resolves decided attempts so held matches commit on
    // quiet keys, with the wake timer at the next attempt deadline);
    // the oracle is LITERALLY q227's recursion.
    QueryDef("q228_stream_match_timed",
      (s, d) => graft.streaming.Streams.streamPatternMatch(s, d,
        Some(Pattern(
          Seq(Step("signup", oneOrMore = false),
            Step("view", oneOrMore = true),
            Step("purchase", oneOrMore = false)),
          withinUs = 48L * 3600L * 1000000L, relaxed = true)),
        plusAlias = "n_views"),
      Some(q227Sql)),
    QueryDef("q229_match_all_rows", q229, Some(q229Sql)),
    QueryDef("q230_match_quantifiers", q230, Some(q230Sql)),
    QueryDef("q231_match_sessions", q231, Some(q231Sql)),
    QueryDef("q239_token_motifs", q239, Some(q239Sql)),
    QueryDef("q261_episode_mining", q261, Some(q261Sql)),
    QueryDef("q292_episode_rules", q292, Some(q292Sql)),
    QueryDef("q266_gappy_episodes", q266, Some(q266Sql)),
    QueryDef("q279_markov_surprisal", q279, Some(q279Sql)),
    QueryDef("q311_next_event_serving", q311, Some(q311Sql)),
    QueryDef("q280_next_event_eval", q280, Some(q280Sql)),
    // STREAMING Markov surprisal under the oracle gate: the stateful
    // bigram extractor (EpisodeMineProcessor at L=2 — the carry tail
    // IS the lag-1 context) feeds the SAME model+scoring core, so the
    // oracle is LITERALLY q279's SQL.
    QueryDef("q281_stream_markov",
      (s, d) => graft.streaming.Streams.streamMarkovSurprisal(s, d),
      Some(q279Sql)),
    QueryDef("q282_viterbi_regimes", q282, Some(q282Sql)),
    QueryDef("q286_prediction_calibration", q286, Some(q286Sql)),
    // STREAMING episode mining: the per-user gram fold runs live in
    // transformWithState (watermark-matured, tail-carried), emissions
    // are increments, and the read-side sum + support floor reproduce
    // the batch miner row-for-row — the oracle is LITERALLY q261's
    // SQL. The reference's "learn sequences lifelong and online"
    // deployment (README.md:3-6), under the driver's hash gate.
    QueryDef("q267_stream_episode_mining",
      (s, d) => graft.streaming.Streams.streamEpisodeMining(s, d),
      Some(q261Sql)),
  )
}
