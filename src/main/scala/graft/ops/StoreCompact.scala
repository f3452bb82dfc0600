package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Nightly-append fragmentation + compaction for the CROSS-RUN dedup
  * stores (r18 verdict item 2) — the q321 discipline packaged as one
  * verb so the passage- (q336), signature- (q337) and chunk- (q348)
  * stores each get the maintenance lifecycle their production shape
  * implies: a long-lived store takes per-delta appends, fragments into
  * piles of small files, and must be rewritable into size-targeted
  * files WITHOUT changing a row or losing partition pruning.
  *
  * The verb stages the store into the layout a month of appends
  * produces, runs [[Corpus.compactPartitionedStore]], proves the
  * collapse in-plan, and returns the compacted frame for the caller's
  * readout — which is gated by the SAME oracle/spec as the original
  * store (q321's rule: a compaction is correct iff the served result
  * is indistinguishable).
  *
  * Staging layout (miniature of the nightly pattern):
  *   - partition column `pb` = pmod(hash(slot), 8) — the store's
  *     natural hash-distribution lifted into `partitionBy` directories
  *     so pruning works at 100 TB;
  *   - bucket 0 is written ONCE as a single right-sized file — the
  *     byte-carry arm: the compactor must SKIP it (hard-copy, zero
  *     decode/shuffle/encode), proven by layout equality below;
  *   - buckets 1–7 get a base write plus two delta APPENDs, each
  *     sprayed over 8 tasks — ≥ 3 small files per directory, the
  *     over-fragmented majority that pays the rewrite.
  *
  * In-plan proofs (q321-style `require`s, executed every run):
  *   partition-layout preservation, the size-derived file target, the
  *   ≥ 3× collapse where the arithmetic says input was fragmented, at
  *   least one SKIPPED directory, and the skipped directory's
  *   (files, bytes) carried over exactly.
  */
object StoreCompact {

  private[graft] def fragmentCompactServe(
      s: SparkSession, store: DataFrame, slotCol: String, root: String,
      targetBytes: Long = 256L * 1024): DataFrame = {
    import s.implicits._
    val frag = s"$root/fragmented"
    val tidy = s"$root/compacted"
    // rebuilt per run (the registered query IS the maintenance drill —
    // q321's contract); stale prior attempts must not double-count
    graft.streaming.Streams.deleteStaged(java.nio.file.Paths.get(root))
    val bucketed = store.withColumn("pb", pmod(hash(col(slotCol)), lit(8)))
    // the right-sized byte-carry arm is only PROVABLY exercised when
    // bucket pb=0 exists: on a degenerate store where nothing hashes to
    // 0 the layout/skip requires below would compare None==None and pass
    // vacuously (r19 advice) — fail the drill loudly instead
    require(bucketed.where($"pb" === 0).limit(1).count() == 1L,
      s"store compaction drill under $root staged no pb=0 rows — the " +
        "byte-carry skip arm would be vacuous; use a store with more slots")
    // delta slicing on a SALTED hash so it is independent of pb
    val slice = pmod(hash(col(slotCol), lit(101)), lit(10))
    bucketed.where($"pb" === 0).coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("pb").parquet(frag)
    for (deltaPred <- Seq(slice < 8, slice === 8, slice === 9))
      bucketed.where($"pb" =!= 0 && deltaPred).repartition(8)
        .write.mode(org.apache.spark.sql.SaveMode.Append)
        .partitionBy("pb").parquet(frag)
    val (before, after, skipped) = Corpus.compactPartitionedStore(
      s, frag, tidy, "pb", slotCol, targetBytes)
    require(before.dirs.keySet == after.dirs.keySet,
      s"store compaction changed the partition layout under $root: " +
        s"${before.dirs.keySet} -> ${after.dirs.keySet}")
    val nOutTarget = before.dirs.values
      .map { case (_, b) =>
        math.max(1L, (b + targetBytes - 1) / targetBytes) }
      .sum
    require(after.files <= nOutTarget,
      s"store compactor under $root wrote ${after.files} files " +
        s"for target $nOutTarget")
    if (nOutTarget <= before.files / 3)
      require(after.files <= before.files / 3,
        s"store compaction under $root left ${after.files} " +
          s"of ${before.files} files")
    require(skipped >= 1,
      s"store compaction under $root skipped no directory — the " +
        "right-sized byte-carry arm is untested")
    require(before.dirs.get("pb=0") == after.dirs.get("pb=0"),
      s"store compaction under $root rewrote the right-sized pb=0 " +
        s"directory: ${before.dirs.get("pb=0")} -> " +
        s"${after.dirs.get("pb=0")}")
    s.read.parquet(tidy).drop("pb")
  }
}
