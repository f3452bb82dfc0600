package graft.gen

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Export/iteration sinks + spec-keyed result cache (≡ reference ops
  * #9-#11 and the pickle cache, SURVEY.md §2.a).
  */
object Sinks {

  /** ≡ `EventStream.to_csv` (`eventstream.py:417-427`): header
    * `timestamp,event_type,is_pattern`, bool as 0/1.
    *
    * By default written as a directory of part files (the distributed
    * writer — correct at scale). `singleFile = true` gives byte-level
    * layout parity with the reference's one-file output via
    * `coalesce(1)` — driver-sized streams only; at 100 TB a single
    * file is the wrong ask.
    */
  def toCsv(
      ds: Dataset[Event],
      path: String,
      singleFile: Boolean = false,
  ): Unit = {
    val ordered = ds.orderBy("seq")
      .select(
        col("ts").as("timestamp"),
        col("event_type"),
        col("is_pattern").cast("int").as("is_pattern"),
      )
    (if (singleFile) ordered.coalesce(1) else ordered).write
      .mode("overwrite")
      .option("header", "true")
      .csv(path)
  }

  /** Columnar export for downstream analytics (replaces `to_numpy`,
    * `eventstream.py:413-415`, which materializes on one machine).
    */
  def toParquet(ds: Dataset[Event], path: String): Unit =
    ds.write.mode("overwrite").parquet(path)

  /** ≡ `EventStream.stream()` (`eventstream.py:429-432`): lazy in-order
    * row iterator — one partition streamed to the driver at a time.
    */
  def stream(ds: Dataset[Event]): Iterator[Event] = {
    import scala.jdk.CollectionConverters._
    ds.orderBy("seq").toLocalIterator().asScala
  }

  /** Deterministic cache key over ALL semantic knobs INCLUDING the pattern
    * matrices — deliberately fixing the reference quirk where two
    * different PatternSets of equal shape collide in the cache
    * (`eventstream.py:249-264`, SURVEY.md §3.3).
    */
  def specKey(spec: StreamSpec, exactMode: Boolean = true): String = {
    val p = spec.patterns
    val body = Seq(
      "v2",
      p.types.map(_.mkString(",")).mkString(";"),
      p.gaps.map(_.mkString(",")).mkString(";"),
      spec.nTypes, spec.totalEvents, spec.randomRatio,
      spec.patternJitterDist, spec.patternJitter,
      spec.randIntervalDist, spec.randIntervalBase, spec.randLow,
      spec.randHigh, spec.randJitterDist, spec.randJitter,
      spec.density, spec.seed,
      // drift + generation mode are semantic too: with density on, exact
      // and block mode differ by design (true-clock vs expected-clock
      // density), and drift changes every type draw — omitting any of
      // these from the key would silently serve a stale cached stream.
      spec.typeDriftAmp, spec.typeDriftPeriod, exactMode,
    ).mkString("|")
    java.security.MessageDigest
      .getInstance("MD5")
      .digest(body.getBytes("UTF-8"))
      .map("%02x".format(_))
      .mkString
  }

  /** ≡ the pickle result cache (`eventstream.py:267-284`): parquet under a
    * spec-hash directory; hit → read, miss → generate + write + read back
    * (so downstream plans scan parquet either way).
    */
  def generateCached(
      spark: SparkSession,
      spec: StreamSpec,
      cacheDir: String,
      exactMode: Boolean = true,
      regenerate: Boolean = false,
  ): DataFrame = {
    val dir  = s"$cacheDir/stream_${specKey(spec, exactMode)}"
    val okFile = new java.io.File(s"$dir/_SUCCESS")
    if (regenerate || !okFile.exists()) {
      val ds =
        if (exactMode) StreamGen.exact(spark, spec)
        else StreamGen.block(spark, spec)
      ds.write.mode("overwrite").parquet(dir)
    }
    spark.read.parquet(dir)
  }
}
