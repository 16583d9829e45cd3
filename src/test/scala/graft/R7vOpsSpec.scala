package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic gates for the round-7 twenty-second batch: one-way ANOVA
  * on event value (grid moments, both sums of squares, F and η²
  * refolded), the sample-ratio-mismatch gate (the reduced two-variant
  * χ² identity verified), and the burst-rate census (per-user peaks
  * and the ladder refolded). */
class R7vOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)

  private def q(x: Double, dec: Int): Double = {
    val m = math.pow(10, dec)
    (if (x >= 0) math.floor(x * m + 0.5) else -math.floor(-x * m + 0.5)) / m
  }
  private def qL(x: Double): Long =
    (if (x >= 0) math.floor(x + 0.5) else -math.floor(-x + 0.5)).toLong

  // ---------------- events_value_anova ----------------

  test("events_value_anova: grid moments, both sums of squares, F and eta-squared refold") {
    Tables.register(spark, TestSpark.Sf)
    val ev = spark.sql("select event_type, value from events").collect()
      .map(r => (r.getAs[String]("event_type"), qL(r.getAs[Double]("value") * 100)))
    val byT = ev.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val nt = ev.length.toLong
    val st = ev.map(_._2).sum
    val k = byT.size.toLong
    val gmean = st.toDouble / nt / 100
    val terms = byT.map { case (t, xs) =>
      val n = xs.length.toLong
      val s1 = xs.sum
      val s2 = xs.map(x => x * x).sum
      val meanT = s1.toDouble / n / 100
      val ssbQ = qL(n * (meanT - gmean) * (meanT - gmean) * 10000)
      val sswQ = qL((s2.toDouble / 10000 - s1.toDouble * s1 / n / 10000) * 10000)
      t -> (n, meanT, ssbQ, sswQ)
    }
    val ssb = terms.values.map(_._3).sum
    val ssw = terms.values.map(_._4).sum
    val f = (ssb.toDouble / (k - 1)) / (ssw.toDouble / (nt - k))
    val rows = run("events_value_anova").collect()
    assert(rows.length == k)
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val (n, meanT, _, _) = terms(t)
      assert(r.getAs[Long]("n_events") == n, s"$t n")
      assert(math.abs(r.getAs[Double]("mean_value") - q(meanT, 4)) < 1e-9, s"$t mean")
      assert(math.abs(r.getAs[Double]("grand_mean") - q(gmean, 4)) < 1e-9)
      assert(r.getAs[Long]("df_between") == k - 1)
      assert(r.getAs[Long]("df_within") == nt - k)
      assert(math.abs(r.getAs[Double]("f_stat") - q(f, 4)) < 1e-9, s"$t F")
      assert(math.abs(r.getAs[Double]("eta_squared") - q(ssb.toDouble / (ssb + ssw), 6)) < 1e-9)
    }
    // decomposition sanity: both components non-negative on the grid
    assert(ssb >= 0L && ssw > 0L)
  }

  // ---------------- events_ab_srm_check ----------------

  test("events_ab_srm_check: the reduced two-variant chi-square identity verifies") {
    Tables.register(spark, TestSpark.Sf)
    val users = spark.sql("select distinct user_id from events").collect()
      .map(_.getAs[Long]("user_id"))
    val na = users.count(_ % 2 == 0).toLong
    val nb = users.count(_ % 2 == 1).toLong
    val chi2 = (na - nb).toDouble * (na - nb) / (na + nb)
    // the reduction: sum over both variants of (2n_v - N)^2 / (2N)
    // equals (n_a - n_b)^2 / N exactly
    val full = (math.pow(2.0 * na - (na + nb), 2) + math.pow(2.0 * nb - (na + nb), 2)) /
      (2.0 * (na + nb))
    assert(math.abs(full - chi2) < 1e-9)
    val rows = run("events_ab_srm_check").collect().sortBy(_.getAs[Long]("variant"))
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("n_users") == na)
    assert(rows(1).getAs[Long]("n_users") == nb)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("expected_users") - q((na + nb) / 2.0, 1)) < 1e-9)
      assert(math.abs(r.getAs[Double]("chi2") - q(chi2, 4)) < 1e-9)
      assert(r.getAs[Long]("srm_flag") == (if (chi2 > 3.841) 1L else 0L))
    }
  }

  // ---------------- events_rate_peaks ----------------

  test("events_rate_peaks: per-user peaks and the power-of-two census refold") {
    Tables.register(spark, TestSpark.Sf)
    val ev = spark.sql("select user_id, ts div 1000000000 div 60 as mnt from events")
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("mnt")))
    val peaks = ev.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .groupBy(_._1._1).view.mapValues(_.values.max).toMap
    def bucket(p: Long): Long =
      if (p <= 0) 0L else math.min(39L, (63 - java.lang.Long.numberOfLeadingZeros(p)).toLong)
    val byB = peaks.values.groupBy(bucket)
    val nu = peaks.size.toLong
    val over10 = peaks.values.count(_ > 10L).toLong
    val over100 = peaks.values.count(_ > 100L).toLong
    val rows = run("events_rate_peaks").collect()
    assert(rows.length == byB.size)
    rows.foreach { r =>
      val b = r.getAs[Long]("log2_bucket")
      val in = byB(b)
      assert(r.getAs[Long]("bucket_lo") == (1L << b))
      assert(r.getAs[Long]("n_users") == in.size.toLong, s"b=$b")
      assert(r.getAs[Long]("max_peak") == in.max)
      assert(math.abs(r.getAs[Double]("user_share") - q(in.size.toDouble / nu, 4)) < 1e-9)
      assert(r.getAs[Long]("n_over_10") == over10)
      assert(r.getAs[Long]("n_over_100") == over100)
    }
    assert(rows.map(_.getAs[Long]("n_users")).sum == nu)
  }
}
