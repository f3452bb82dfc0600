package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `BINARY` payloads with typed
  * metadata, batch "decode" → fixed-width feature vectors.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * clearly-marked DETERMINISTIC STUB (`fakeDecodeFeatures`) — what is
  * real and load-bearing is the Spark side a production pipeline needs:
  * binary columns flowing through parquet-friendly schemas, per-partition
  * batch processing (`mapPartitions`, the Scala analogue of
  * `mapInPandas` batch shape), typed metadata extraction as pure
  * expressions, and bounded-size feature output (ARRAY<DOUBLE>(8)).
  * Swapping the stub for a real JNI/codec call changes one function.
  */
object Multimodal {

  /** Asset row after metadata extraction. */
  final case class Asset(
      doc_id: Long,
      source: String,
      payload: Array[Byte],
      n_bytes: Int,
  )

  final case class AssetFeatures(
      doc_id: Long,
      source: String,
      n_bytes: Int,
      features: Array[Double],
  )

  /** Stand-in asset table: text bytes as the opaque payload (the real
    * pipeline would read image/audio bytes from parquet exactly like
    * this — `BINARY` column + metadata columns).
    */
  def assets(s: SparkSession, d: String): DataFrame =
    Tables
      .documents(s, d)
      .select(
        col("doc_id"),
        col("source"),
        encode(col("text"), "UTF-8").as("payload"),
      )
      .withColumn("n_bytes", octet_length(col("payload")))

  /** STUB decode kernel: deterministic 8-bucket byte-mean "features" in
    * place of a real image/audio decode. Replace with the codec call;
    * signature and batch shape stay identical.
    */
  def fakeDecodeFeatures(payload: Array[Byte]): Array[Double] = {
    val nBuckets = 8
    val sums   = new Array[Double](nBuckets)
    val counts = new Array[Int](nBuckets)
    var i = 0
    while (i < payload.length) {
      val b = i % nBuckets
      sums(b) += (payload(i) & 0xFF)
      counts(b) += 1
      i += 1
    }
    Array.tabulate(nBuckets)(b =>
      if (counts(b) == 0) 0.0 else sums(b) / counts(b))
  }

  /** Batch feature extraction: one partition = one decode batch (the
    * mapInPandas shape) — codec state would be initialized once per
    * partition, not per row.
    */
  def withFeatures(s: SparkSession, d: String): DataFrame = {
    implicit val enc = Encoders.product[AssetFeatures]
    assets(s, d)
      .as(Encoders.product[Asset])
      .mapPartitions { it =>
        // per-partition codec init would go here
        it.map(a =>
          AssetFeatures(a.doc_id, a.source, a.n_bytes,
            fakeDecodeFeatures(a.payload)))
      }
      .toDF()
  }

  /** Strided frame sampling over the binary payload — the video/audio
    * frame-sample shape: one asset row explodes into its every-`stride`-th
    * fixed-width frame (a pure generator expression: `sequence` →
    * `explode` → binary `substr`, no UDF, so sampling is a projection
    * that scales as a scan). A real decoder replaces the byte-slice with
    * a codec frame read; the row-explosion plumbing is the part that
    * matters at 100 TB (frame tables are written `partitionBy` source /
    * bucketed by doc for the downstream feature joins).
    */
  def sampleFrames(
      assetsDf: DataFrame,
      frameBytes: Int = 256,
      stride: Int = 4,
  ): DataFrame = {
    val nFrames = expr(s"(n_bytes + ${frameBytes - 1}) DIV $frameBytes")
    assetsDf
      .withColumn("fi",
        explode(sequence(lit(0L), greatest(nFrames - 1, lit(0L)),
          lit(stride.toLong))))
      .withColumn("frame",
        col("payload").substr(col("fi") * frameBytes + 1, lit(frameBytes)))
      .select(col("doc_id"), col("source"), col("fi").as("frame_idx"),
        col("frame"))
  }

  /** Nearest-neighbor 2-D downsample of a row-major byte grid — the
    * image-resize shape. The payload is treated as `width`-byte rows;
    * the output keeps every `sy`-th row and every `sx`-th byte within
    * it, rebuilt with nested `transform`/`sequence` + 1-byte substrings
    * (pure codegen'd expressions, no UDF — resize is a projection that
    * scales as a scan, exactly like [[sampleFrames]]). A real decoder
    * swaps the byte-grid arithmetic for pixel rows; the plumbing
    * (metadata-driven dims, per-row striding, reassembly) is identical.
    * Out-of-range 1-byte substrings yield "" in both Spark and DuckDB,
    * so the ragged last row needs no special casing.
    */
  def resizeGrid(
      assetsDf: DataFrame,
      width: Int = 64,
      sx: Int = 2,
      sy: Int = 2,
  ): DataFrame = {
    val wOut = (width + sx - 1) / sx
    assetsDf
      .withColumn("txt", decode(col("payload"), "UTF-8"))
      .withColumn("h_out",
        expr(s"((n_bytes + ${width - 1}) DIV $width + ${sy - 1}) DIV $sy"))
      .withColumn("resized", expr(
        s"""array_join(transform(
           |  sequence(0L, greatest(h_out - 1, 0L)), r ->
           |    array_join(transform(sequence(0, ${wOut - 1}), c ->
           |      substring(txt, cast(r * $sy * $width + c * $sx + 1
           |        as int), 1)), '')), '')""".stripMargin))
      .select(col("doc_id"), col("source"), col("n_bytes"),
        col("resized"))
  }

  /** Resize end-to-end, oracle-checkable on the ASCII corpus: distinct
    * md5 over the resized payloads certifies every output byte, and the
    * exact output length pins the dimension arithmetic.
    */
  private def q86(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    resizeGrid(assets(s, d))
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_assets"),
        sum(length($"resized")).as("sum_out_bytes"),
        countDistinct(md5($"resized")).as("n_distinct"),
      )
      .orderBy($"source")
  }

  private val q86Sql =
    """WITH dims AS (
      |  SELECT doc_id, source, text,
      |    ((length(text) + 63) // 64 + 1) // 2 AS h_out
      |  FROM documents),
      |resized AS (
      |  SELECT doc_id, source,
      |    COALESCE(list_aggregate(flatten(
      |      list_transform(generate_series(0, greatest(h_out - 1, 0)),
      |        r -> list_transform(generate_series(0, 31),
      |          c -> substring(text, CAST(r*2*64 + c*2 + 1 AS INT), 1)))),
      |      'string_agg', ''), '') AS resized
      |  FROM dims)
      |SELECT source, COUNT(*) AS n_assets,
      |  CAST(SUM(length(resized)) AS BIGINT) AS sum_out_bytes,
      |  COUNT(DISTINCT md5(resized)) AS n_distinct
      |FROM resized GROUP BY source ORDER BY source""".stripMargin

  /** Metadata aggregation — pure expressions over the binary column, so
    * it is SQL-oracle-checkable (octet_length of UTF-8 text payload).
    */
  private def q50(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    assets(s, d)
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_assets"),
        sum($"n_bytes").as("total_bytes"),
        round(avg($"n_bytes"), 4).as("avg_bytes"),
        max($"n_bytes").cast("long").as("max_bytes"), // int64: dtype parity
      )
      .orderBy($"source")
  }

  private val q50Sql =
    """SELECT source, COUNT(*) AS n_assets,
      |  CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
      |  ROUND(AVG(n_bytes), 4) AS avg_bytes,
      |  MAX(n_bytes) AS max_bytes
      |FROM (SELECT source, octet_length(encode(text)) AS n_bytes
      |      FROM documents) t
      |GROUP BY source ORDER BY source""".stripMargin

  /** Feature pipeline end-to-end (stub decode → per-source feature
    * stats). No SQL oracle — the decode kernel is engine-side code; the
    * row-count/schema check plus MultimodalSpec cover it.
    */
  private def q51(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    withFeatures(s, d)
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n"),
        round(avg(element_at($"features", 1)), 4).as("avg_f0"),
        round(avg(element_at($"features", 8)), 4).as("avg_f7"),
        round(avg($"n_bytes"), 4).as("avg_bytes"),
      )
      .orderBy($"source")
  }

  /** Frame-sampling end-to-end, oracle-checkable: the corpus is ASCII
    * (verified per SF), so byte-slicing the BINARY payload here equals
    * character-slicing the VARCHAR in DuckDB, md5 included.
    */
  private def q52(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    sampleFrames(assets(s, d))
      .groupBy($"source")
      .agg(
        countDistinct($"doc_id").as("n_docs"),
        count(lit(1)).as("n_frames"),
        countDistinct(md5($"frame")).as("n_distinct_frames"),
        sum(octet_length($"frame")).cast("long").as("sum_frame_bytes"),
      )
      .orderBy($"source")
  }

  private val q52Sql =
    """SELECT source, COUNT(DISTINCT doc_id) AS n_docs,
      |  COUNT(*) AS n_frames,
      |  COUNT(DISTINCT md5(frame)) AS n_distinct_frames,
      |  CAST(SUM(length(frame)) AS BIGINT) AS sum_frame_bytes
      |FROM (
      |  SELECT doc_id, source,
      |    substring(text, CAST(i*256+1 AS INT), 256) AS frame
      |  FROM documents,
      |    unnest(generate_series(0,
      |      greatest((length(text) + 255) // 256 - 1, 0), 4)) AS t(i)
      |) x GROUP BY source ORDER BY source""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("q50_mm_metadata", q50, Some(q50Sql)),
    QueryDef("q51_mm_features", q51, None),
    QueryDef("q52_mm_frames", q52, Some(q52Sql)),
    QueryDef("q86_mm_resize", q86, Some(q86Sql)),
  )
}
