package graft.ops

import org.apache.spark.sql.SparkSession

/** Build-if-absent guard for the deterministic staged stores (the
  * q181/q184/q200/q260 offline-build/online-serve family): the builders
  * are pure functions of the source table, so a present marker means
  * the store's content is exactly what a rebuild would write. The
  * marker is a STORE-LEVEL completion file written by this guard AFTER
  * the whole builder returns — guarding on any sub-store's own
  * `_SUCCESS` would pass forever on a store whose build crashed between
  * sub-writes and never self-heal (the r12 advice finding;
  * Round13Spec drives the exact crash window).
  */
private[graft] object StoreGuard {

  /** Canonical store-root keying for build-if-absent stores:
    * `<base>/<prefix>_<bucketTag of "dir:mtime:len:fp[:extra]">`, with
    * mtime/length taken from `dir/sourceName` — ONE implementation of
    * the freshness-key recipe the derived stores were each hand-rolling
    * (round-16 stores use this; the remaining inline mtime+length
    * sites migrated in r17 — migration changes a store's tag, so each
    * migrated store rebuilds once and the pre-migration dir becomes
    * dead weight under target/ until a manual clean).
    *
    * `fp` is a CRC32 of the source's first and last 4 KiB (r17, the
    * r16 advice): mtime+length alone would silently serve a stale
    * store after a same-length rewrite inside filesystem mtime
    * granularity. Two 4 KiB reads per storeRoot call — parquet footer
    * + header cover both the schema and the row-group index, so any
    * realistic rewrite moves the fingerprint.
    */
  def storeRoot(s: SparkSession, base: String, prefix: String,
      dir: String, sourceName: String, extra: String = ""): String = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$sourceName")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    val suffix = if (extra.isEmpty) "" else s":$extra"
    s"$base/${prefix}_" + Scale.bucketTag(
      s"$dir:${st.getModificationTime}:${st.getLen}:" +
        s"${edgeFingerprint(fs, p, st.getLen)}$suffix")
  }

  /** CRC32 over the first and last `block` bytes of `p` (whole file
    * when shorter) — the cheap content component of the store key.
    */
  private[graft] def edgeFingerprint(
      fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path,
      len: Long,
      block: Int = 4096): Long = {
    val crc = new java.util.zip.CRC32()
    val in = fs.open(p)
    try {
      val head = new Array[Byte](math.min(block.toLong, len).toInt)
      in.readFully(0L, head)
      crc.update(head)
      if (len > block) {
        val tail = new Array[Byte](block)
        in.readFully(len - block, tail)
        crc.update(tail)
      }
    } finally in.close()
    crc.getValue
  }

  def ensureBuilt(s: SparkSession, root: String)(build: => Unit): Unit = {
    val p = new org.apache.hadoop.fs.Path(root, "_GRAFT_STORE_COMPLETE")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) {
      build
      fs.create(p, true).close()
    }
  }

  /** Vacuum a SUPERSEDED build-if-absent store: delete the named
    * payload dirs AND the completion marker together — a marker left
    * behind over vacuumed data would make every future `ensureBuilt`
    * skip the rebuild and then crash reading the missing payload,
    * forever (exactly the "passes forever on a crashed store" failure
    * the marker exists to prevent). With the marker gone, a direct
    * caller self-heals by rebuilding from source. Idempotent.
    */
  def vacuumStore(s: SparkSession, root: String, payload: String*): Unit = {
    payload.foreach(sub => graft.streaming.Streams.deleteStaged(
      java.nio.file.Paths.get(root, sub)))
    val m = new org.apache.hadoop.fs.Path(root, "_GRAFT_STORE_COMPLETE")
    val fs = m.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(m)) fs.delete(m, false)
  }
}
