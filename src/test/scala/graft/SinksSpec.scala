package graft

import graft.gen._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class SinksSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private def spec = GenQueries.demoSpec(2000L)

  test("csv sink: reference header/format, lossless roundtrip") {
    val tmp = Files.createTempDirectory("graft_csv").toString
    val ds = StreamGen.exact(spark, spec)
    Sinks.toCsv(ds, s"$tmp/out")
    val back = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(s"$tmp/out")
    assert(back.columns.toSeq ==
      Seq("timestamp", "event_type", "is_pattern"))
    assert(back.count() == 2000)
    // bool encoded as 0/1 like the reference's %d format
    val flags = back.select(col("is_pattern")).distinct()
      .collect().map(_.get(0).toString).toSet
    assert(flags.subsetOf(Set("0", "1")))
    val nPattern = back.filter(col("is_pattern") === 1).count()
    assert(nPattern == StreamGen.exactIterator(spec).count(_.is_pattern))
  }

  test("spec-keyed cache: miss generates, hit reads back identically") {
    val tmp = Files.createTempDirectory("graft_cache").toString
    val first  = Sinks.generateCached(spark, spec, tmp)
    val firstN = first.count()
    assert(firstN == 2000)
    val dir = new java.io.File(tmp).listFiles().filter(_.isDirectory)
    assert(dir.length == 1 && dir.head.getName.startsWith("stream_"))
    val mtime = dir.head.lastModified()
    // hit: no regeneration (directory untouched), same content
    val second = Sinks.generateCached(spark, spec, tmp)
    assert(second.count() == firstN)
    assert(dir.head.lastModified() == mtime)
    // different seed → different cache key, both retained
    Sinks.generateCached(spark, spec.copy(seed = 99L), tmp)
    assert(new java.io.File(tmp).listFiles().count(_.isDirectory) == 2)
  }

  test("cache key includes pattern CONTENTS (reference bug fixed)") {
    // same shape, different pattern matrices → different keys
    val a = spec
    val b = spec.copy(patterns = Patterns.generate(PatternSpec(
      nPatterns = 8, patternLength = 10, nTypes = 6,
      gapDist = Rng.IntervalDist.Uniform, gapLow = 3, gapHigh = 9,
      seed = 555L)))
    assert(Sinks.specKey(a) != Sinks.specKey(b))
  }
}
