package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned commit-log store — the ONE implementation of the
  * copy-on-write / append-only snapshot-chain discipline that r14 had
  * hand-rolled four times (q107 upsert, q125 tombstone, q152 dual-sink
  * fanout, q291 triangle deltas). An Iceberg-class miniature:
  *
  *   - a commit is a directory `<prefix><id>` under `root`, installed
  *     by writing to a private temp dir and ONE atomic rename — a
  *     crash between write and rename leaves only dead temp files, a
  *     crash after leaves a complete commit; there is no in-between
  *     (the crash-safe commit every table format builds on);
  *   - the directory listing IS the log — recovery reads `versions()`,
  *     never driver state, so a batch replayed under foreachBatch's
  *     at-least-once contract re-derives its true predecessor
  *     (`latestBefore(id)` — its own prior attempt is superseded
  *     output, not input) and OVERWRITES its own commit id with
  *     byte-identical content;
  *   - reads are by version: `asOf(v)` = the newest commit ≤ v
  *     (snapshot/copy-on-write stores: q107/q125, time travel q304),
  *     `deltasUpTo(v)` = the union of all commits ≤ v (append-only
  *     stores: q152/q291);
  *   - `retention` bounds disk: after committing `id`, keep `id` plus
  *     its `retention − 1` newest predecessors and vacuum the rest
  *     (retention 2 = snapshot + the predecessor a single-batch replay
  *     needs; `Int.MaxValue` = full history, what time travel wants).
  *     Retention only applies to snapshot chains — a delta chain's
  *     state IS the union, so delta stores use full retention.
  *
  * At 100 TB the same layout holds on an object store: the atomic
  * rename becomes the metadata-pointer swap, versions() the commit-log
  * listing, and every reader is partition-pruned to the version dirs
  * it names.
  */
final class StoreLog(
    val root: java.nio.file.Path,
    prefix: String = "v",
    retention: Int = Int.MaxValue) {

  private val namePat = (java.util.regex.Pattern.quote(prefix) + "\\d+").r

  /** Committed version ids, ascending — from the directory listing
    * alone (the listing IS the log; temp dirs never match).
    */
  def versions(): Seq[Long] =
    if (!java.nio.file.Files.exists(root)) Seq.empty
    else scala.util.Using.resource(java.nio.file.Files.list(root)) { fs =>
      import scala.jdk.CollectionConverters._
      fs.iterator().asScala
        .map(_.getFileName.toString)
        .collect {
          case s if namePat.matches(s) => s.drop(prefix.length).toLong
        }
        .toSeq.sorted
    }

  def latest(): Option[Long] = versions().lastOption

  /** The newest committed version strictly below `id` — the true
    * predecessor of a (possibly replayed) commit `id`.
    */
  def latestBefore(id: Long): Option[Long] = versions().filter(_ < id).lastOption

  def path(id: Long): String = root.resolve(s"$prefix$id").toString

  /** Install commit `id`: `write` stages into a private temp dir, then
    * ONE atomic rename publishes it; an existing commit with the same
    * id (a prior attempt of a replayed batch) is superseded. Vacuums
    * beyond `retention` afterwards.
    */
  def commit(id: Long)(write: java.nio.file.Path => Unit): Unit = {
    java.nio.file.Files.createDirectories(root)
    val tmp = root.resolve(s"tmp_$prefix$id")
    Streams.deleteStaged(tmp)
    write(tmp)
    val dst = root.resolve(s"$prefix$id")
    Streams.deleteStaged(dst)
    java.nio.file.Files.move(tmp, dst,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    if (retention != Int.MaxValue) {
      val keep = (versions().filter(_ < id).takeRight(retention - 1) :+ id).toSet
      versions().filterNot(keep)
        .foreach(v => Streams.deleteStaged(root.resolve(s"$prefix$v")))
    }
  }

  /** Single-table commit sugar: the commit dir IS the parquet dir. */
  def commitTable(id: Long, df: DataFrame, parts: Int = 1): Unit =
    commit(id)(tmp => df.coalesce(parts).write.parquet(tmp.toString))

  /** COMPARE-AND-SWAP commit — the MULTI-WRITER discipline plain
    * [[commit]] deliberately lacks (its id comes from a replayed
    * batch, so overwriting its own prior attempt is the point). Two
    * maintenance jobs racing on a pointer table (a compaction and a
    * cutover, the r17-verdict scenario) must instead serialize:
    * `commitNext(expected)` publishes version `expected + 1` ONLY if
    * `expected` is still the newest committed version, and returns
    * None when another writer got there first — the loser re-reads the
    * log and retries (or aborts) instead of silently clobbering a swap
    * it never saw. Atomicity is the rename itself: the staged dir is
    * moved WITHOUT deleting an existing target, and rename(2) onto an
    * existing non-empty directory fails (commit dirs are never empty),
    * so of two racers past the optimistic pre-check exactly ONE
    * rename lands — readers observe the old pointer or a complete new
    * one, never a torn or doubly-applied swap. Each attempt stages
    * into its own temp dir (racing stagers must not share scratch).
    * On an object store the same contract is a conditional PUT
    * (if-match on the pointer object's version).
    */
  def commitNext(expected: Option[Long])(
      write: java.nio.file.Path => Unit): Option[Long] = {
    if (latest() != expected) return None
    val id = expected.getOrElse(0L) + 1L
    java.nio.file.Files.createDirectories(root)
    val tmp = root.resolve(s"tmp_cas_$prefix${id}_${System.nanoTime()}")
    val dst = root.resolve(s"$prefix$id")
    try {
      write(tmp)
      java.nio.file.Files.move(tmp, dst,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      Some(id)
    } catch {
      // "lost the race" must be VERIFIED, never inferred from the
      // exception class alone (ENOTEMPTY surfaces as a plain
      // FileSystemException): the conclusion holds iff the winner's
      // commit dir is now at dst. Any other failure — staging write
      // error, disk full, permissions — PROPAGATES instead of
      // masquerading as contention: a caller following the loser
      // protocol (re-read, retry) against a persistent I/O error
      // would livelock on a log whose head never moved. Either way
      // the attempt's staging dir is reclaimed — unlike commit()'s
      // fixed-name tmp, each attempt mints a fresh name, so nothing
      // else would ever clean it.
      case e: Throwable =>
        Streams.deleteStaged(tmp)
        val lostRace = e.isInstanceOf[java.nio.file.FileSystemException] &&
          java.nio.file.Files.exists(dst)
        if (lostRace) None else throw e
    }
  }

  /** Snapshot read: the newest commit ≤ `id` (None if nothing is
    * committed at or below it). `sub` selects a table inside a
    * multi-table commit.
    */
  def asOf(spark: SparkSession, id: Long, sub: String = ""): Option[DataFrame] =
    versions().filter(_ <= id).lastOption.map(v => readOne(spark, v, sub))

  /** Snapshot read of the newest commit. */
  def readLatest(spark: SparkSession, sub: String = ""): Option[DataFrame] =
    latest().map(v => readOne(spark, v, sub))

  /** Delta read: the union of the named commits (None when empty) —
    * append-only state at version v is `deltasUpTo` over
    * `versions().filter(_ <= v)`.
    */
  def readMany(
      spark: SparkSession, ids: Seq[Long],
      sub: String = ""): Option[DataFrame] =
    if (ids.isEmpty) None
    else Some(spark.read.parquet(ids.map(i => subPath(i, sub)): _*))

  def deltasUpTo(
      spark: SparkSession, id: Long, sub: String = ""): Option[DataFrame] =
    readMany(spark, versions().filter(_ <= id), sub)

  private def subPath(id: Long, sub: String): String =
    if (sub.isEmpty) path(id) else s"${path(id)}/$sub"

  private def readOne(spark: SparkSession, id: Long, sub: String): DataFrame =
    spark.read.parquet(subPath(id, sub))
}
