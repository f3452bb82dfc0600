package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc SQL entry point with the engine's extensions installed via the
  * standard `spark.sql.extensions` config — demonstrates (and smoke-tests)
  * the GraftExtensions path exactly as a cluster deployment would load it.
  *
  * Usage: runMain graft.SqlRunner "SELECT ..."
  * Tables: the sf0.001 test tables are registered as temp views.
  */
object SqlRunner {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: graft.SqlRunner <sql...>")
      sys.exit(2)
    }
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      Tables.load(spark, "/root/testdata/sf0.001", t)
        .createOrReplaceTempView(t)
    }
    Tables.events(spark, "/root/testdata/sf0.001")
      .createOrReplaceTempView("events")
    spark.sql(args.mkString(" ")).show(50, truncate = false)
    spark.stop()
  }
}
