package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-4 queries, independent of the DuckDB
  * oracle (which checks cross-engine parity, not meaning): recompute
  * the claimed invariants in plain Scala on sf0.001.
  */
class Round4Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q87 bloom prefilter changes nothing vs the plain semi-join") {
    import spark.implicits._
    val got = run("q87_bloom_semi").collect().map(_.toString).toSeq
    val urgent = Tables.orders(spark, sf)
      .filter($"o_orderpriority" === "1-URGENT").select($"o_orderkey")
    val plain = Tables.lineitem(spark, sf)
      .join(urgent, $"l_orderkey" === $"o_orderkey", "left_semi")
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_items"), sum($"l_quantity").as("sum_qty"))
      .orderBy($"l_returnflag")
      .collect().map(_.toString).toSeq
    assert(got.nonEmpty && got == plain)
  }

  test("q91 merged HLL sketch equals the direct sketch and tracks exact") {
    val r = run("q91_hll_merge").collect()
    assert(r.length == 1)
    val row = r.head
    val merged = row.getLong(1)
    val direct = row.getLong(2)
    val exact  = row.getLong(4)
    assert(row.getBoolean(3), s"merged $merged != direct $direct")
    assert(row.getLong(0) > 1L, "needs >1 sketch for the merge to mean anything")
    assert(math.abs(merged - exact).toDouble / exact <= 0.05,
      s"estimate $merged vs exact $exact drifts >5%")
  }

  test("q90 stratified sample matches an md5 recomputation") {
    import spark.implicits._
    def hex1(id: Long): Char = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.charAt(0)
    }
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"lang").as[(Long, String)].collect()
    val expected = docs.groupBy(_._2).view.mapValues { ds =>
      val kept = ds.count { case (id, lang) =>
        val h = hex1(id)
        lang match {
          case "en" => h <= '3'
          case "zh" => h <= '7'
          case _    => h <= 'b'
        }
      }
      (ds.size.toLong, kept.toLong)
    }.toMap
    val got = run("q90_stratified_sample").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected)
    // the rates genuinely differ per stratum (en downsampled hardest)
    val enRate = got("en")._2.toDouble / got("en")._1
    val frRate = got("fr")._2.toDouble / got("fr")._1
    assert(enRate < frRate)
  }

  test("q89 masking removes exactly the digit-run characters") {
    import spark.implicits._
    val names = Tables.customer(spark, sf)
      .select($"c_name").as[String].collect()
    val removed = names.map { n =>
      n.length - n.replaceAll("[0-9]+", "<ID>").length
    }.sum.toLong
    val got = run("q89_pii_mask").collect()
      .map(r => r.getLong(3)).sum
    assert(got == removed && removed != 0L)
  }
}
