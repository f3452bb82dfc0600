package graft.tools

import org.apache.spark.sql.SparkSession

/** Regenerates the `Text.unigramPieces` plan constant: runs the
  * bounded-driver Viterbi-EM trainer over a corpus and prints the
  * piece table as Scala source to paste into `ops/Text.scala`.
  *
  * Usage: runMain graft.tools.TrainUnigram [sfDir]
  */
object TrainUnigram {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val pieces =
      graft.ops.Text.learnUnigramPieces(graft.Tables.documents(spark, sfDir))
    println("  private[graft] val unigramPieces: Seq[(String, Long)] = Seq(")
    pieces.grouped(4).foreach { g =>
      println("    " + g.map { case (p, c) => s""""$p" -> ${c}L""" }
        .mkString(", ") + ",")
    }
    println("  )")
    spark.stop()
  }
}
