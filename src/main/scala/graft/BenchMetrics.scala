package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Cumulative task-metrics counters for the bench harness (r18 verdict
  * item 1: the round artifact must carry per-query spill / memory /
  * CPU evidence, so a 15× in-session blowup arrives self-diagnosed).
  *
  * One listener for the whole session; the harness snapshots the
  * monotone counters around each timed query (after draining the
  * listener bus — see [[org.apache.spark.graft.BusSync]]) and records
  * the delta. `peakExecutionMemory` is a per-task high-water mark, not
  * a monotone counter, so it is tracked as a resettable max instead of
  * a delta.
  *
  * The diagnosis table the columns support:
  *   - wall ≈ cpu/32 and cpu matches the standalone floor → healthy.
  *   - wall ≫ run/32 → task-slot starvation (something else holds the
  *     scheduler's slots) or scheduling delay.
  *   - run ≫ cpu → tasks waiting on I/O / spill / lock, not compute.
  *   - cpu ≫ standalone floor × 32 → the PLAN is doing more work
  *     in-session than standalone (state-dependent re-plan).
  *   - spill > 0 → memory pressure from accumulated session caches.
  */
final class BenchMetricsListener extends SparkListener {
  val memSpill = new AtomicLong
  val diskSpill = new AtomicLong
  val runMs = new AtomicLong
  val cpuNs = new AtomicLong
  val tasks = new AtomicLong
  val shufWrite = new AtomicLong
  val shufRead = new AtomicLong
  val peak = new AtomicLong

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    val m = e.taskMetrics
    if (m != null) {
      memSpill.addAndGet(m.memoryBytesSpilled)
      diskSpill.addAndGet(m.diskBytesSpilled)
      runMs.addAndGet(m.executorRunTime)
      cpuNs.addAndGet(m.executorCpuTime)
      tasks.incrementAndGet()
      shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      peak.accumulateAndGet(m.peakExecutionMemory, math.max(_, _))
      ()
    }
  }

  def snap(): BenchSnap = BenchSnap(
    memSpill.get, diskSpill.get, runMs.get, cpuNs.get, tasks.get,
    shufWrite.get, shufRead.get)

  def resetPeak(): Unit = peak.set(0L)
}

/** Immutable counter snapshot; `delta` gives one query's attribution. */
final case class BenchSnap(
    memSpill: Long, diskSpill: Long, runMs: Long, cpuNs: Long,
    tasks: Long, shufWrite: Long, shufRead: Long) {
  def delta(prev: BenchSnap): BenchSnap = BenchSnap(
    memSpill - prev.memSpill, diskSpill - prev.diskSpill,
    runMs - prev.runMs, cpuNs - prev.cpuNs, tasks - prev.tasks,
    shufWrite - prev.shufWrite, shufRead - prev.shufRead)

  /** Compact JSON array (MB / ms / count grain — full precision is not
    * load-bearing for a diagnosis that reads in orders of magnitude):
    * [spillMemMB, spillDiskMB, peakMB, runMs, cpuMs, tasks,
    *  shufWriteMB, shufReadMB]. */
  def json(peakBytes: Long): String = {
    def mb(b: Long): Long = b >> 20
    s"[${mb(memSpill)},${mb(diskSpill)},${mb(peakBytes)},$runMs," +
      s"${cpuNs / 1000000L},$tasks,${mb(shufWrite)},${mb(shufRead)}]"
  }
}
