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
    * `<base>/<prefix>_<bucketTag of "dir:mtime:len[:extra]">`, with
    * mtime/length taken from `dir/sourceName` — ONE implementation of
    * the freshness-key recipe the derived stores were each hand-rolling
    * (round-16 stores use this; older sites carry byte-identical
    * inline copies and can migrate without changing their tags).
    */
  def storeRoot(s: SparkSession, base: String, prefix: String,
      dir: String, sourceName: String, extra: String = ""): String = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$sourceName")
    val st = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      .getFileStatus(p)
    val suffix = if (extra.isEmpty) "" else s":$extra"
    s"$base/${prefix}_" + Scale.bucketTag(
      s"$dir:${st.getModificationTime}:${st.getLen}$suffix")
  }

  def ensureBuilt(s: SparkSession, root: String)(build: => Unit): Unit = {
    val p = new org.apache.hadoop.fs.Path(root, "_GRAFT_STORE_COMPLETE")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) {
      build
      fs.create(p, true).close()
    }
  }
}
