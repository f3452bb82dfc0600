package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 review items, locked: the PageRank skew path must be exact
  * (salted ≡ unsalted, bit-for-bit) and actually salted at plan level,
  * the sweep's dst-aggregation must combine map-side, and the minhash
  * operator must release its sketch cache when it returns.
  */
class Round6Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** Hub graph: src 0 holds half of all edges (the straggler shape
    * `skewSalts` exists for); the rest are light fan-outs converging on
    * shared dsts so ranks are non-trivial at every node class.
    */
  private def hubEdges = {
    import spark.implicits._
    val hub  = (1 to 400).map(d => (0L, d.toLong))
    val rest = (1 to 400).map(i => (i.toLong, ((i % 37) + 401).toLong))
    (hub ++ rest).toDF("src", "dst")
  }

  test("pageRank skewSalts=4 reproduces unsalted ranks exactly") {
    def ranks(salts: Int): Map[Long, Long] =
      ops.Graph.pageRank(hubEdges, iters = 3, skewSalts = salts)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val plain  = ranks(1)
    val salted = ranks(4)
    // integer fixed-point arithmetic → the salted sweep must be EQUAL,
    // not approximately equal: salting only redistributes join rows
    assert(plain.size == 438 && plain.values.exists(_ != 150000L))
    assert(salted == plain, {
      val diff = plain.keySet.filter(k => plain.get(k) != salted.get(k))
      s"salted ranks diverge at ids $diff"
    })
  }

  test("salted static edge table partitions on (src, _salt)") {
    val e = hubEdges.distinct()
    val p = ops.Graph.saltedDegEdges(e, 4)
      .queryExecution.executedPlan.toString
    assert(
      "hashpartitioning\\(src#\\d+L?, _salt#\\d+".r.findFirstIn(p).isDefined,
      s"static side not partitioned on (src, _salt):\n$p")
  }

  test("sweep dst-aggregation is two-phase and the salted join keys on _salt") {
    val e = hubEdges.distinct()
    val degEdges = ops.Graph.saltedDegEdges(e, 4)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val ranks = nodes.select(col("id"), lit(1000000L).as("r"))
    val p = ops.Graph.step(nodes, degEdges, ranks, identity, 4)
      .queryExecution.executedPlan.toString
    // a hub dst never straggles the rollup: partial aggregation ships at
    // most one row per dst per map task (the Graph.scala skew argument)
    assert(p.contains("partial_sum"),
      s"dst rollup lost its map-side combine:\n$p")
    // and the sweep join's equality keys include the salt
    assert("_salt#\\d+".r.findFirstIn(p).isDefined,
      s"salted sweep join lost its _salt key:\n$p")
  }

  test("q35 releases its sketch cache when the operator returns") {
    // a leaked DataFrame cache shows up as a NAMED persistent RDD
    // (CachedRDDBuilder names its buffers); the eager localCheckpoint
    // that q35 legitimately returns registers an unnamed one
    def pinned: Set[Int] = spark.sparkContext.getPersistentRDDs
      .values.filter(_.name != null).map(_.id).toSet
    val before = pinned
    val n = SparkEntry.queries("q35_minhash_pairs")(spark, sf).count()
    assert(n >= 0L)
    val leaked = pinned -- before
    assert(leaked.isEmpty, s"q35 left cached RDDs pinned: $leaked")
  }
}
