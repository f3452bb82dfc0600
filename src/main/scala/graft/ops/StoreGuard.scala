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
  def ensureBuilt(s: SparkSession, root: String)(build: => Unit): Unit = {
    val p = new org.apache.hadoop.fs.Path(root, "_GRAFT_STORE_COMPLETE")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) {
      build
      fs.create(p, true).close()
    }
  }
}
