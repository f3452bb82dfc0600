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
    // the name carries TWO tags: the SOURCE-DIR tag, then the
    // freshness tag. r21 fix: the sweep below used to treat every
    // same-prefix sibling as superseded, but a sibling keyed to a
    // DIFFERENT source dir (another SF) is live for that SF — a verify
    // at sf0.01 was sweeping the sf0.1 erasure stores (and vice
    // versa), forcing a full store rebuild on every SF-alternating
    // run. The dir tag makes "superseded sibling of THIS source"
    // distinguishable from "live store of another source". Migration
    // note: the rename orphans every pre-r21 single-tag root once;
    // [[sweepStaleSiblings]] deletes those old-format roots for
    // swept prefixes.
    s"$base/${prefix}_" + dirTag(dir) + "_" + Scale.bucketTag(
      s"$dir:${sourceFreshness(s, dir, sourceName)}$suffix")
  }

  /** Stable tag of a source DIRECTORY alone (no freshness component) —
    * the sweep scope for per-source store families.
    */
  private[graft] def dirTag(dir: String): String =
    Scale.bucketTag(s"dir:$dir")

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

  /** Delete SUPERSEDED sibling store roots of `prefix` FOR SOURCE
    * `dir`: every directory under `base` named
    * `<prefix>_<dirTag(dir)>_<freshTag>` whose full name is not in
    * `keep` — the freshness tag is a pure function of the current
    * source, so any other freshness tag UNDER THE SAME DIR is provably
    * stale. Sweeping is REQUIRED for the erasure-family stores, where
    * a stale sibling is not mere dead weight but a RETAINED COPY of
    * rows a later erase physically removed. Siblings keyed to OTHER
    * source dirs are NOT superseded — they are live stores of other
    * SFs, and sweeping them (the pre-r21 behaviour) forced a full
    * rebuild on every SF-alternating run. Pre-migration single-tag
    * roots (`<prefix>_<hex>` with no dir component) are deleted
    * unconditionally — every one is orphaned by the r21 rename.
    * Version-keyed prefixes (regivf — one live root PER registry
    * version, rollback is a store lookup) must NOT sweep.
    */
  def sweepStaleSiblings(
      s: SparkSession, base: String, prefix: String, dir: String,
      keep: Set[String]): Unit = {
    val b = new org.apache.hadoop.fs.Path(base)
    val fs = b.getFileSystem(s.sparkContext.hadoopConfiguration)
    val scoped = s"${prefix}_${dirTag(dir)}_"
    val oldFormat = s"^${java.util.regex.Pattern.quote(prefix)}_[0-9a-f]+$$".r
    if (fs.exists(b)) {
      fs.listStatus(b).foreach { st =>
        val n = st.getPath.getName
        val stale = (n.startsWith(scoped) && !keep(n)) ||
          oldFormat.findFirstIn(n).nonEmpty
        if (st.isDirectory && stale) fs.delete(st.getPath, true)
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
