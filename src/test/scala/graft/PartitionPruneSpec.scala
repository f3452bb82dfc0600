package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hive-style partitioned layout: `partitionBy` on write, partition
  * PRUNING on read. At 100 TB this is the difference between scanning a
  * corpus and scanning one shard of it — a filter on the partition column
  * must eliminate directories at planning time (PartitionFilters), not
  * read-then-drop rows (PushedFilters), and the pruned read must return
  * exactly what an unpartitioned filter returns.
  */
class PartitionPruneSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("partitionBy write + filtered read prunes partitions at the scan") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_part").toString + "/events_by_type"

    val ev = Tables.events(spark, sf)
    ev.write.partitionBy("event_type").parquet(dir)

    val back = spark.read.parquet(dir).filter($"event_type" === "click")
    val expected = ev.filter($"event_type" === "click")

    // identical content (modulo column order — partition col moves last)
    val cols = expected.columns.sorted.map(col(_))
    assert(back.select(cols: _*).except(expected.select(cols: _*)).count() == 0)
    assert(expected.select(cols: _*).except(back.select(cols: _*)).count() == 0)
    assert(back.count() == expected.count() && back.count() > 0)

    // the filter must be a partition filter (directory pruning), not a
    // data filter evaluated per row
    val p = back.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") &&
      "PartitionFilters: \\[[^\\]]*event_type".r.findFirstIn(p).isDefined,
      s"event_type not in PartitionFilters:\n$p")

    // physical proof via scan metrics: the pruned scan reads strictly
    // fewer files than the directory holds
    back.collect()
    val scan = back.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.getOrElse(fail("no FileSourceScanExec leaf"))
    val scanned = scan.metrics("numFiles").value
    val allFiles = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(f => f.toString.endsWith(".parquet"))
      .count()
    assert(scanned > 0 && scanned < allFiles,
      s"pruning read $scanned of $allFiles files")
  }
}
