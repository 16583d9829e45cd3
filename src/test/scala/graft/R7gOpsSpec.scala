package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic gates for the round-7 sixth batch: Benford first-digit
  * audit, Theil–Sen robust trend, exact dyadic EWMA. */
class R7gOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)

  private def q(x: Double, dec: Int): Double = {
    val m = math.pow(10, dec)
    (if (x >= 0) math.floor(x * m + 0.5) else -math.floor(-x * m + 0.5)) / m
  }

  test("q_benford: digit census, shares, and the quantized chi2 match the JVM mirror") {
    Tables.register(spark, TestSpark.Sf)
    val prices = spark.sql("select l_extendedprice from lineitem where l_extendedprice > 0")
      .collect().map(_.getDouble(0))
    val digits = prices.map { p =>
      val cents = math.floor(p * 100 + 0.5).toLong
      cents.toString.charAt(0).asDigit.toLong
    }
    val census = (1L to 9L).map(dg => dg -> digits.count(_ == dg).toLong).toMap
    val n = digits.length.toLong
    val chi6 = (1L to 9L).map { dg =>
      val p = math.log10(1 + 1.0 / dg)
      val t = (census(dg) - n * p) * (census(dg) - n * p) / (n * p) * 1e6
      math.floor(t + 0.5).toLong // terms are positive
    }.sum
    val rows = run("q_benford").collect()
    assert(rows.length == 9)
    rows.foreach { r =>
      val dg = r.getAs[Long]("digit")
      assert(r.getAs[Long]("n_obs") == census(dg), s"digit $dg")
      assert(math.abs(r.getAs[Double]("obs_share") - q(census(dg).toDouble / n, 6)) < 1e-9)
      assert(math.abs(r.getAs[Double]("exp_share") - q(math.log10(1 + 1.0 / dg), 6)) < 1e-9)
      assert(math.abs(r.getAs[Double]("chi2") - q(chi6.toDouble / 1e6, 4)) < 1e-9)
    }
    // census conservation + Benford's own law: shares sum to 1
    assert(rows.map(_.getAs[Long]("n_obs")).sum == n)
    assert(math.abs(rows.map(_.getAs[Double]("exp_share")).sum - 1.0) < 1e-4)
  }

  test("q_theilsen: median pairwise slope, intercept, and cents-grid OLS match the JVM mirror") {
    Tables.register(spark, TestSpark.Sf)
    val mon = spark.sql(
      "select year(o_orderdate) * 12 + month(o_orderdate) as t, o_totalprice from orders")
      .collect().map(r => (r.getInt(0).toLong, r.getDouble(1)))
      .groupBy(_._1).view.mapValues { vs =>
        vs.map(v => BigDecimal(v._2).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
      }.toMap.toSeq.sortBy(_._1)
    val m = mon.length
    def lowerMed(xs: Seq[Double]): Double = xs((m * 0.5).ceil.toInt - 1)
    val pairs = for {
      (ti, ri) <- mon; (tj, rj) <- mon if tj > ti
    } yield (ti, tj, (rj - ri) / (tj - ti))
    val p = pairs.length
    val slope = pairs.sortBy { case (ti, tj, sl) => (sl, ti, tj) }
      .apply((p * 0.5).ceil.toInt - 1)._3
    val icept = lowerMed(mon.map { case (t, r) => r - slope * t }
      .zip(mon.map(_._1)).sortBy(identity).map(_._1))
    val t0 = mon.map(_._1).min
    val cents = mon.map { case (t, r) => (t - t0, math.floor(r * 100 + 0.5).toLong) }
    val (st, stt, sc, stc) = cents.foldLeft((0L, 0L, 0L, 0L)) {
      case ((a, b, c, dd), (tr, cv)) => (a + tr, b + tr * tr, c + cv, dd + tr * cv)
    }
    val ols = (m * stc - st * sc).toDouble / (m * stt - st * st).toDouble / 100
    val r = run("q_theilsen").collect().head
    assert(r.getAs[Long]("n_months") == m.toLong)
    assert(r.getAs[Long]("n_pairs") == p.toLong)
    assert(math.abs(r.getAs[Double]("ts_slope") - q(slope, 2)) < 1e-9)
    assert(math.abs(r.getAs[Double]("ts_intercept") - q(icept, 2)) < 1e-9)
    assert(math.abs(r.getAs[Double]("ols_slope") - q(ols, 2)) < 1e-9)
    assert(math.abs(r.getAs[Double]("robust_gap") - q(slope - ols, 2)) < 1e-9)
  }

  test("events_ewma: the dyadic recursion S_t = (S_{t-1} + x_t)/2 is reproduced exactly") {
    Tables.register(spark, TestSpark.Sf)
    val daily = spark.sql("select ts div 1000000000 as sec from events")
      .collect().map(_.getLong(0) / 86400)
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq.sortBy(_._1)
    // mirror via the recursion itself — the query computes the closed
    // form M_t / 2^t; equality proves the two are the same sequence
    var s = daily.head._2.toDouble
    val expected = daily.zipWithIndex.map { case ((day, x), i) =>
      if (i > 0) s = (s + x) / 2
      (day, x, s)
    }
    val rows = run("events_ewma").collect().sortBy(_.getAs[Long]("day"))
    assert(rows.length == daily.length)
    rows.zip(expected).zipWithIndex.foreach { case ((r, (day, x, ew)), i) =>
      assert(r.getAs[Long]("day") == day)
      assert(r.getAs[Long]("n_events") == x)
      assert(math.abs(r.getAs[Double]("ewma") - q(ew, 4)) < 1e-9, s"day $day")
      if (i == 0) assert(r.isNullAt(r.fieldIndex("forecast")))
      else {
        val prev = expected(i - 1)._3
        assert(math.abs(r.getAs[Double]("forecast") - q(prev, 4)) < 1e-9)
        assert(math.abs(r.getAs[Double]("residual") - q(x - prev, 4)) < 1e-9)
      }
    }
  }
}
