package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic gates for the round-7 tenth batch: seasonal-adjusted
  * robust anomaly, priority SLA compliance. */
class R7kOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)

  private def q(x: Double, dec: Int): Double = {
    val m = math.pow(10, dec)
    (if (x >= 0) math.floor(x * m + 0.5) else -math.floor(-x * m + 0.5)) / m
  }

  test("events_anomaly_seasonal: dow means, residual median/MAD, and flags match the JVM mirror") {
    Tables.register(spark, TestSpark.Sf)
    val daily = spark.sql("select ts div 1000000000 div 86400 as day, count(*) as x from events group by 1")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val m = daily.length
    val byDow = daily.groupBy { case (d, _) => (d + 4) % 7 }
    val dowMean = byDow.view.mapValues(ds => ds.map(_._2).sum.toDouble / ds.length).toMap
    val res = daily.map { case (d, x) => (d, x, x - dowMean((d + 4) % 7)) }
    def lowerMed(xs: Seq[(Double, Long)]): Double =
      xs.sortBy(identity).apply((m * 0.5).ceil.toInt - 1)._1
    val med = lowerMed(res.toSeq.map(t => (t._3, t._1)))
    val mad = lowerMed(res.toSeq.map(t => (math.abs(t._3 - med), t._1)))
    val rows = run("events_anomaly_seasonal").collect()
    assert(rows.length == m)
    rows.foreach { r =>
      val day = r.getAs[Long]("day")
      val (_, x, rr) = res.find(_._1 == day).get
      assert(r.getAs[Long]("n_events") == x)
      assert(r.getAs[Long]("dow") == (day + 4) % 7)
      assert(math.abs(r.getAs[Double]("dow_mean") - q(dowMean((day + 4) % 7), 4)) < 1e-9)
      assert(math.abs(r.getAs[Double]("residual") - q(rr, 4)) < 1e-9)
      if (mad > 0) {
        val z = 0.6745 * (rr - med) / mad
        assert(math.abs(r.getAs[Double]("robust_z") - q(z, 4)) < 1e-9, s"day $day")
        assert(r.getAs[Int]("is_outlier") == (if (math.abs(z) > 3.5) 1 else 0))
      } else assert(r.isNullAt(r.fieldIndex("robust_z")))
    }
    // deseasonalizing centers the residuals: their median sits near zero
    assert(math.abs(med) <= daily.map(_._2).max.toDouble)
  }

  test("q_priority_sla: latency censuses and compliance shares match the JVM mirror") {
    Tables.register(spark, TestSpark.Sf)
    val lat = spark.sql(
      """select o.o_orderpriority,
        |  (unix_seconds(cast(l.l_shipdate as timestamp_ltz))
        |   - unix_seconds(cast(o.o_orderdate as timestamp_ltz))) div 86400 as ld
        |from orders o join lineitem l on l.l_orderkey = o.o_orderkey""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byPri = lat.groupBy(_._1)
    val rows = run("q_priority_sla").collect()
    assert(rows.length == byPri.size)
    rows.foreach { r =>
      val pri = r.getAs[String]("priority")
      val ls = byPri(pri).map(_._2)
      val n = ls.length
      assert(r.getAs[Long]("n_lines") == n.toLong)
      assert(math.abs(r.getAs[Double]("mean_latency_days") - q(ls.sum.toDouble / n, 4)) < 1e-9)
      for ((col, dd) <- Seq(("pct_within_30d", 30), ("pct_within_60d", 60), ("pct_within_90d", 90)))
        assert(math.abs(r.getAs[Double](col) - q(ls.count(_ <= dd).toDouble / n, 4)) < 1e-9, s"$pri $col")
      assert(r.getAs[Long]("max_latency_days") == ls.max)
      // compliance shares are monotone in the horizon
      assert(r.getAs[Double]("pct_within_30d") <= r.getAs[Double]("pct_within_60d") + 1e-9)
      assert(r.getAs[Double]("pct_within_60d") <= r.getAs[Double]("pct_within_90d") + 1e-9)
    }
  }
}
