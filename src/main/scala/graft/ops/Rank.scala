package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed replacements for partition-less windows — the ONE shared
  * implementation of the two-pass prefix-sum device that
  * [[Corpus.resumableSchedule]] (q319) and the sppmi grand total (r16)
  * each proved out: a `row_number().over(Window.orderBy(...))` or a
  * running `sum().over(Window.orderBy(...))` funnels its ENTIRE input
  * through one task, so any corpus-sized rank/cumulation must instead
  * (1) range-partition on the order key, (2) collect the BOUNDED
  * per-partition totals (nParts rows) to the driver, (3) broadcast the
  * running offsets back and combine them with a per-partition window —
  * the same answer, computed on all executors. Round17Spec locks both
  * that the registered plans carry no partition-less `WindowExec` and
  * that no new `Window.orderBy`/`Window.rowsBetween` source site
  * appears outside the audited bounded-frame allowlist.
  */
private[graft] object Rank {

  /** Global 0-based rank of each row under the total order `orderCols`
    * — value-identical to
    * `row_number().over(Window.orderBy(orderCols: _*)) - 1` whenever
    * the composite key is unique (callers tie-break with doc_id etc.),
    * but planned as a range shuffle + nParts-bounded driver collect +
    * per-partition ranks, so the sort never collapses to one task.
    * The input is persisted across the two passes (partition
    * assignment must not be recomputed between them — the
    * resumableSchedule discipline) and the result is localCheckpointed
    * so downstream reuse cannot observe a re-sampled range partitioning
    * after the unpersist.
    */
  def globalRank(
      in: DataFrame,
      orderCols: Seq[Column],
      rankName: String,
      nParts: Int = 32): DataFrame =
    twoPass(in, orderCols, lit(1L), rankName, inclusive = false, nParts)

  /** Running (inclusive) global sum of `valueCol` under the total order
    * `orderCols` — value-identical to
    * `sum(valueCol).over(Window.orderBy(orderCols).rowsBetween(
    * unboundedPreceding, currentRow))` for a unique key, planned the
    * same two-pass way.
    */
  def runningSum(
      in: DataFrame,
      orderCols: Seq[Column],
      valueCol: Column,
      outName: String,
      nParts: Int = 32): DataFrame =
    twoPass(in, orderCols, valueCol, outName, inclusive = true, nParts)

  private def twoPass(
      in: DataFrame,
      orderCols: Seq[Column],
      valueCol: Column,
      outName: String,
      inclusive: Boolean,
      nParts: Int = 32): DataFrame = {
    val spark = in.sparkSession
    import spark.implicits._
    val parted = in
      .withColumn("_v", valueCol.cast("long"))
      .repartitionByRange(nParts, orderCols: _*)
      .withColumn("_pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // pass 1: per-partition totals — nParts rows, a bounded collect
      val counts = parted
        .groupBy($"_pid").agg(sum($"_v").as("_cnt"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1)))
        .sortBy(_._1)
      // running offsets: empty partitions are absent and contribute 0
      val offs = counts.map(_._1)
        .zip(counts.scanLeft(0L)(_ + _._2))
        .toSeq
      val offDf = broadcast(offs.toDF("_pid", "_off"))
      // pass 2: offset + per-partition prefix (the window IS
      // partitioned — each frame is one range partition, ~1/nParts of
      // the input). Range partitioning makes ascending pid the global
      // key order, so offset + local prefix ≡ the global window.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"_pid").orderBy(orderCols: _*)
      val local =
        if (inclusive)
          sum($"_v").over(w.rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow))
        else row_number().over(w).cast("long") - 1L
      parted
        .join(offDf, "_pid")
        .withColumn(outName, $"_off" + local)
        .drop("_pid", "_off", "_v")
        .localCheckpoint()
    } finally parted.unpersist()
  }
}
