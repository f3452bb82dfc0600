package graft

import org.apache.spark.sql.SparkSession

/** Scale-adaptive session tuning shared by the harness entrypoints
  * (Bench, Verify, TimeQ) so the bench and the oracle plan identically.
  *
  * The one non-default setting (r21, guide §2.2/§2.4 — measured, see
  * OPTIMIZATION_r21.md):
  *
  *   - `coalescePartitions.parallelismFirst = false`: with the default
  *     `true`, AQE sizes post-shuffle coalescing to
  *     totalBytes/defaultParallelism (floored at 1 MB) "to maximize
  *     parallelism" — which at this suite's shuffle masses keeps every
  *     exchange split across MB-ish slivers whose per-task overhead
  *     dominates their compute. `false` makes AQE respect the advisory
  *     target instead — the setting Spark's own SQL-performance docs
  *     recommend. Partition counts then DERIVE from measured shuffle
  *     bytes at runtime: a 100 TB exchange still fans out to thousands
  *     of reducers, a 40 KB ledger commit collapses to one task. The
  *     r20 scaling block proved the tax: the 8-core full suite BEAT the
  *     32-core one by 72 s because 16/18 sampled queries were
  *     coordination-bound, not compute-bound, at bench SFs.
  *
  *   - advisory partition size: env-parameterised
  *     (`SPARK_GRAFT_AQE_ADVISORY`), local default 2m. The LOCAL value
  *     is sized so the bench's heaviest genuinely-parallel reduce
  *     (gen_detect_10m, 81 MB shuffled) keeps ≥ `defaultParallelism`
  *     reduce partitions (81 MB / 2 MB = 40 ≥ 32) — measured: the 64m
  *     default collapsed it to 2 tasks and DOUBLED its wall time,
  *     while 2m matches its parallelism-first number (3.3 s) and keeps
  *     the full coordination win everywhere else. A production
  *     deployment sizes this to the 64–256 MB range the guide
  *     recommends (partitions in the 100 MB–1 GB band at TB shuffle
  *     masses); the env knob is that dial.
  *
  * The initial `spark.sql.shuffle.partitions` stays `$SPARK_GRAFT_CPUS`
  * per the bench contract — these settings only govern how AQE
  * re-partitions at runtime from OBSERVED sizes, which is exactly the
  * "scale-adaptive rather than a constant" requirement.
  */
object SessionTuning {
  def aqeConfigs: Seq[(String, String)] = Seq(
    "spark.sql.adaptive.coalescePartitions.parallelismFirst" ->
      sys.env.getOrElse("SPARK_GRAFT_AQE_PARFIRST", "false"),
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" ->
      sys.env.getOrElse("SPARK_GRAFT_AQE_ADVISORY", "2m"),
  )

  def apply(b: SparkSession.Builder): SparkSession.Builder =
    aqeConfigs.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }
}
