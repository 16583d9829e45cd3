package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic gates for the round-7 twenty-ninth batch: the embed-rate
  * capacity curve — the default rung pinned EXACTLY equal to the
  * served wm_capacity report, carrier counts pinned to the selection
  * target formula, and the ladder laws. */
class R8cOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)

  test("wm_rate_curve: default rung equals wm_capacity; targets and ladder laws hold") {
    val rows = run("wm_rate_curve").collect().sortBy(_.getAs[Double]("embed_rate"))
    assert(rows.map(_.getAs[Double]("embed_rate")).toSeq == Seq(0.05, 0.10, 0.15, 0.20))
    val n = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet").count()
    rows.foreach { r =>
      val rate = r.getAs[Double]("embed_rate")
      // carrier count is exactly the selection target
      val target = math.max(math.floor(n * rate).toLong, 16L)
      assert(r.getAs[Long]("n_carriers") == target, s"rate $rate target")
      val minR = r.getAs[Long]("min_redundancy")
      assert(r.getAs[Long]("vote_tolerance") == (if (minR > 0) (minR - 1) / 2 else 0L))
      assert(math.abs(r.getAs[Double]("mean_redundancy") - target / 16.0) < 1e-3)
      assert(r.getAs[Long]("n_blocks_covered") <= 16L)
      assert(math.abs(r.getAs[Double]("corpus_share") -
        math.floor(target.toDouble / n * 1e4 + 0.5) / 1e4) < 1e-9)
    }
    // more budget never selects fewer carriers
    val nc = rows.map(_.getAs[Long]("n_carriers"))
    assert(nc.sliding(2).forall { case Array(a, b) => a <= b }, "carriers monotone in rate")
    // the default rung must agree with the served single-rate report
    val cap = run("wm_capacity").collect()
    val r10 = rows.find(_.getAs[Double]("embed_rate") == 0.10).get
    assert(r10.getAs[Long]("n_carriers") == cap.map(_.getAs[Long]("n_carriers")).sum,
      "rung 0.10 carriers = wm_capacity total")
    assert(r10.getAs[Long]("min_redundancy") == cap.head.getAs[Long]("min_redundancy"),
      "rung 0.10 min redundancy = wm_capacity floor")
    assert(r10.getAs[Long]("n_blocks_covered") == cap.length.toLong,
      "rung 0.10 covered blocks = wm_capacity rows")
  }
}
