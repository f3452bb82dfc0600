package graft

import graft.functions.WelfordAgg
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WelfordSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("Welford aggregator matches builtin avg/var_samp across layouts") {
    import spark.implicits._
    val vals = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select($"l_extendedprice").as[Double]
    for (parts <- Seq(1, 7, 32)) {
      val ds = vals.repartition(parts)
      val got = ds.select(WelfordAgg.of.toColumn).first()
      val exp = ds.agg(count(lit(1)), avg($"l_extendedprice"),
        var_samp($"l_extendedprice")).first()
      assert(got.n == exp.getLong(0))
      assert(math.abs(got.mean - exp.getDouble(1)) < 1e-9 *
        math.abs(exp.getDouble(1)))
      assert(math.abs(got.varSamp - exp.getDouble(2)) < 1e-6 *
        math.abs(exp.getDouble(2)),
        s"parts=$parts: ${got.varSamp} vs ${exp.getDouble(2)}")
    }
  }

  test("grouped usage via groupByKey") {
    import spark.implicits._
    val byFlag = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select($"l_returnflag", $"l_quantity").as[(String, Double)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(WelfordAgg.of.toColumn)
      .collect()
      .toMap
    assert(byFlag.keySet == Set("A", "N", "R"))
    byFlag.values.foreach(s => assert(s.n > 0 && s.varSamp > 0))
  }
}
