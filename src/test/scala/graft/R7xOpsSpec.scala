package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic gates for the round-7 twenty-fourth batch: Welch's t on
  * event value (moments, t, and the Welch–Satterthwaite df refolded)
  * and the quantile-sketch bin-count curve (every level's
  * interpolated estimate and the exact order statistics re-derived).
  */
class R7xOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)

  private def q(x: Double, dec: Int): Double = {
    val m = math.pow(10, dec)
    (if (x >= 0) math.floor(x * m + 0.5) else -math.floor(-x * m + 0.5)) / m
  }
  private def qL(x: Double): Long =
    (if (x >= 0) math.floor(x + 0.5) else -math.floor(-x + 0.5)).toLong

  // ---------------- events_ab_value_ttest ----------------

  test("events_ab_value_ttest: moments, Welch's t, and the Satterthwaite df refold") {
    Tables.register(spark, TestSpark.Sf)
    val ev = spark.sql("select user_id % 2 as v, value from events").collect()
      .map(r => (r.getAs[Long]("v"), qL(r.getAs[Double]("value") * 100)))
    val byV = ev.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    def stats(v: Long) = {
      val xs = byV(v)
      val n = xs.length.toLong
      val s1 = xs.sum; val s2 = xs.map(x => x * x).sum
      val mean = s1.toDouble / n / 100
      val vr = (n.toDouble * s2 - s1.toDouble * s1) / (n.toDouble * (n - 1)) / 10000
      (n, mean, vr)
    }
    val (an, am, av) = stats(0)
    val (bn, bm, bv) = stats(1)
    val se2 = av / an + bv / bn
    val t = (am - bm) / math.sqrt(se2)
    val df = se2 * se2 / ((av / an) * (av / an) / (an - 1) + (bv / bn) * (bv / bn) / (bn - 1))
    val rows = run("events_ab_value_ttest").collect().sortBy(_.getAs[Long]("variant"))
    assert(rows.length == 2)
    val exp = Seq((0L, an, am, av), (1L, bn, bm, bv))
    rows.zip(exp).foreach { case (r, (v, n, m, vr)) =>
      assert(r.getAs[Long]("variant") == v)
      assert(r.getAs[Long]("n_events") == n)
      assert(math.abs(r.getAs[Double]("mean_value") - q(m, 4)) < 1e-9)
      assert(math.abs(r.getAs[Double]("var_value") - q(vr, 4)) < 1e-9)
      assert(math.abs(r.getAs[Double]("t_stat") - q(t, 4)) < 1e-9)
      assert(math.abs(r.getAs[Double]("df_welch") - q(df, 2)) < 1e-9)
      assert(r.getAs[Long]("significant") == (if (math.abs(q(t, 4)) > 1.96) 1L else 0L))
    }
    // Welch df lands between min(n)-1 and the pooled n-2
    assert(df >= math.min(an, bn) - 1 - 1e-6 && df <= an + bn - 2 + 1e-6)
  }

  // ---------------- sketch_quantile_curve ----------------

  test("sketch_quantile_curve: every level's estimate and the exact order statistics re-derive") {
    Tables.register(spark, TestSpark.Sf)
    val xs = spark.sql("select cast(l_extendedprice as double) as x from lineitem")
      .collect().map(_.getAs[Double]("x"))
    val n = xs.length.toLong
    val (mn, mx) = (xs.min, xs.max)
    val sorted = xs.sorted
    val quantiles = Seq(("p50", 0.5), ("p90", 0.9), ("p99", 0.99))
    val rows = run("sketch_quantile_curve").collect()
    assert(rows.length == 9)
    rows.foreach { r =>
      val lv = r.getAs[Long]("n_bins").toInt
      val lbl = r.getAs[String]("quantile")
      val qv = quantiles.find(_._1 == lbl).get._2
      val rank = math.ceil(qv * n).toLong
      val exact = sorted((rank - 1).toInt)
      assert(math.abs(r.getAs[Double]("exact_v") - exact) < 1e-6, s"$lv/$lbl exact")
      // re-derive the interpolated estimate from the level's histogram
      def bin(x: Double) = math.min(lv - 1L, math.max(0L, math.floor((x - mn) * lv / (mx - mn)).toLong))
      val bc = xs.groupBy(bin).view.mapValues(_.length.toLong).toMap
      val bins = bc.keys.toSeq.sorted
      var cum = 0L
      val (tbin, cumBefore, c) = bins.iterator.map { b =>
        val before = cum; cum += bc(b); (b, before, bc(b))
      }.find { case (_, before, cc) => before + cc >= rank }.get
      val approx = q(mn + (tbin + (rank - cumBefore).toDouble / c) * (mx - mn) / lv, 4)
      assert(math.abs(r.getAs[Double]("approx_v") - approx) < 1e-9, s"$lv/$lbl approx")
      assert(math.abs(r.getAs[Double]("rel_err") - q(math.abs(approx - exact) / exact, 6)) < 1e-9)
    }
    // the sketch's real guarantee (pointwise monotonicity in b is NOT
    // one — interpolation luck can favor a coarse bin): the estimate
    // and the exact value share the target bin, so the error is
    // bounded by one bin width at every level
    rows.foreach { r =>
      val lv = r.getAs[Long]("n_bins")
      val binW = (mx - mn) / lv
      assert(math.abs(r.getAs[Double]("approx_v") - r.getAs[Double]("exact_v")) <= binW + 1e-6,
        s"level $lv exceeds its bin-width bound")
    }
  }
}
