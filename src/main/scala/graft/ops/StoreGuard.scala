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
    val suffix = if (extra.isEmpty) "" else s":$extra"
    s"$base/${prefix}_" + Scale.bucketTag(
      s"$dir:${sourceFreshness(s, dir, sourceName)}$suffix")
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

  /** Vacuum a SUPERSEDED build-if-absent store: delete the completion
    * marker FIRST, then the named payload dirs. Marker-first is the
    * crash-safe order — a crash after the payload delete but before
    * the marker delete would leave a marker over missing data, making
    * every future `ensureBuilt` skip the rebuild and then crash
    * reading the missing payload, forever (exactly the "passes forever
    * on a crashed store" failure the marker exists to prevent); a
    * crash after the marker delete merely costs one rebuild
    * (self-heal — the leftover payload is overwritten by the
    * SaveMode.Overwrite builders). All deletion through the Hadoop
    * filesystem of the root, so the same code is correct on a
    * non-local store. Idempotent.
    */
  def vacuumStore(s: SparkSession, root: String, payload: String*): Unit = {
    val conf = s.sparkContext.hadoopConfiguration
    val m = new org.apache.hadoop.fs.Path(root, "_GRAFT_STORE_COMPLETE")
    val fs = m.getFileSystem(conf)
    if (fs.exists(m)) fs.delete(m, false)
    payload.foreach { sub =>
      val p = new org.apache.hadoop.fs.Path(root, sub)
      if (fs.exists(p)) fs.delete(p, true)
    }
  }

  /** Delete SUPERSEDED sibling store roots: every directory under
    * `base` named `<prefix>_<tag>` whose full name is not in `keep`.
    * Safe ONLY when the caller enumerates every LIVE tag of the prefix
    * — true for freshness-keyed single-store prefixes (the tag is a
    * pure function of the current source, so any other tag is provably
    * stale: the r17-advice dead-weight finding), and REQUIRED for the
    * erasure-family stores, where a stale sibling is not mere dead
    * weight but a RETAINED COPY of rows a later erase physically
    * removed (the source rewrites, the store root moves, and the
    * pre-rewrite root — erased rows included — would sit on disk
    * forever). Version-keyed prefixes (regivf — one live root PER
    * registry version, rollback is a store lookup) must NOT sweep.
    */
  def sweepStaleSiblings(
      s: SparkSession, base: String, prefix: String,
      keep: Set[String]): Unit = {
    val b = new org.apache.hadoop.fs.Path(base)
    val fs = b.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(b)) {
      fs.listStatus(b).foreach { st =>
        val n = st.getPath.getName
        if (st.isDirectory && n.startsWith(s"${prefix}_") && !keep(n))
          fs.delete(st.getPath, true)
      }
    }
  }

  /** PHYSICAL-ERASURE transaction — the ONE implementation of the
    * rewrite-then-vacuum discipline the erase verbs (q326/q329/q331)
    * share: the erased store lives at `<baseRoot>/<erasedTag>` (the
    * tag encodes the erasure PREDICATE, so changing the erase set can
    * never serve a store built under the old one); building it
    * (1) ensures the superseded base exists, (2) runs the caller's
    * rewrite, (3) vacuums the base INSIDE the build block (payload and
    * marker — see [[vacuumStore]]'s ordering argument) so a completed
    * erased marker certifies the base is already gone. A crash at any
    * point self-heals: before the vacuum the base still exists to
    * rebuild from; after it, the next entry re-ensures the base from
    * source (its marker was vacuumed too). The trailing steady-state
    * sweep re-vacuums on EVERY call, so an out-of-band base rebuild
    * (test staging drives one deliberately) cannot leave the erased
    * rows resurrected past the next erase read. Returns the erased
    * root.
    */
  def eraseRewrite(
      s: SparkSession, baseRoot: String, erasedTag: String,
      payloads: Seq[String])(ensureBase: => Any)(
      rewrite: String => Unit): String = {
    val erased = s"$baseRoot/$erasedTag"
    ensureBuilt(s, erased) {
      ensureBase
      rewrite(erased)
      vacuumStore(s, baseRoot, payloads: _*)
    }
    vacuumStore(s, baseRoot, payloads: _*)
    erased
  }

  /** Freshness key of ONE source file — mtime, length, and the edge
    * fingerprint — THE shared recipe: [[storeRoot]] folds it for the
    * primary source and multi-source stores (the mf4 family) fold it
    * for their secondary sources, so a recipe change cannot silently
    * leave one source with a weaker staleness guarantee.
    */
  def sourceFreshness(
      s: SparkSession, dir: String, sourceName: String): String = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$sourceName")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    s"${st.getModificationTime}:${st.getLen}:" +
      s"${edgeFingerprint(fs, p, st.getLen)}"
  }
}
