package graft.tools
import org.apache.spark.sql.SparkSession
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = graft.SessionTuning(SparkSession.builder()
      .master("local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // A/B experiment passthrough: SPARK_GRAFT_CONF="k=v;k=v" sets
    // runtime SQL confs on the session before any timing — the local
    // measurement harness for config candidates (guide §1)
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').foreach { kv =>
      val i = kv.indexOf('=')
      if (i > 0) spark.conf.set(kv.take(i).trim, kv.drop(i + 1).trim)
    })
    // optional microbatch profile: SPARK_GRAFT_STREAMPROF=1 prints each
    // progress event's durationMs map (triggerExecution, queryPlanning,
    // walCommit, addBatch, ...) — where a streaming harness's wall
    // clock actually goes
    if (sys.env.contains("SPARK_GRAFT_STREAMPROF"))
      spark.streams.addListener(
        new org.apache.spark.sql.streaming.StreamingQueryListener {
          import org.apache.spark.sql.streaming.StreamingQueryListener._
          def onQueryStarted(e: QueryStartedEvent): Unit =
            println(s"[sq] started ${e.id}")
          def onQueryProgress(e: QueryProgressEvent): Unit = {
            val p = e.progress
            println(s"[sq] batch=${p.batchId} rows=${p.numInputRows} " +
              s"durations=${p.durationMs}")
          }
          def onQueryTerminated(e: QueryTerminatedEvent): Unit =
            println(s"[sq] terminated")
        })
    // optional job profile: SPARK_GRAFT_JOBPROF=1 prints every job's
    // wall ms + task count — is a harness many tiny sequential jobs
    // (driver/scheduler-bound) or a few real ones?
    if (sys.env.contains("SPARK_GRAFT_JOBPROF"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          private val t0 = new java.util.concurrent.ConcurrentHashMap[
            Int, (Long, Int, String)]()
          override def onJobStart(
              e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            t0.put(e.jobId,
              (System.nanoTime(), e.stageInfos.map(_.numTasks).sum,
                e.stageInfos.lastOption.map(_.name).getOrElse("?")))
          override def onJobEnd(
              e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val s = t0.remove(e.jobId)
            if (s != null)
              println(f"[job] id=${e.jobId} wall=${
                (System.nanoTime() - s._1) / 1e6}%.0fms tasks=${s._2} " +
                s"site=${s._3}")
          }
        })
    graft.ops.Graph.coPurchaseEdges(spark, "/root/testdata/sf0.1").count()
    for (q <- args(0).split(","); r <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.1").count()
      println(f"[t] $q rep$r: ${(System.nanoTime()-t0)/1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
