package graft.tools
import org.apache.spark.sql.SparkSession

/** EXECUTED-plan inspector: runs each named query (its own
  * QueryExecution, via collect) and prints the FINAL adaptive plan —
  * the only place AQE decisions (AQEShuffleRead coalescing, runtime
  * join rewrites) are visible; `explain("formatted")` before execution
  * shows `isFinalPlan=false` and none of them. Used for the r21
  * session-tuning evidence in plans/r21/.
  *
  * Usage: runMain graft.tools.ExplainExec <sfDir> <queryName...>
  */
object ExplainExec {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = graft.SessionTuning(SparkSession.builder()
      .master("local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').foreach { kv =>
      val i = kv.indexOf('=')
      if (i > 0) spark.conf.set(kv.take(i).trim, kv.drop(i + 1).trim)
    })
    args.drop(1).foreach { n =>
      println(s"\n========== $n (executed, final adaptive plan) ==========")
      try {
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        df.collect(): Unit
        val plan = df.queryExecution.executedPlan
        println(plan.toString)
        // the toString hides HOW FAR each AQEShuffleRead coalesced —
        // print the post-coalesce partition count per exchange
        def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
          p match {
            case a: org.apache.spark.sql.execution.adaptive
                  .AQEShuffleReadExec =>
              println(s"[aqe] AQEShuffleRead partitions=" +
                s"${a.partitionSpecs.length}")
            case a: org.apache.spark.sql.execution.adaptive
                  .AdaptiveSparkPlanExec =>
              walk(a.executedPlan)
            case q: org.apache.spark.sql.execution.adaptive
                  .QueryStageExec =>
              walk(q.plan)
            case _ =>
          }
          p.children.foreach(walk)
        }
        walk(plan)
      } catch { case e: Throwable => println(s"failed: $e") }
    }
    spark.stop()
  }
}
