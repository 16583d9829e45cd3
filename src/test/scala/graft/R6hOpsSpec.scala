package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic gates for the round-6 events batch: the trend × seasonality
  * forecast (closed-form multiplicative decomposition, fully mirrored)
  * and the inter-event-gap bot detector (per-user moment sums
  * recounted in exact integarithmetic).
  */
class R6hOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)

  private lazy val events: Array[(Long, Long, Long)] = {
    Tables.register(spark, TestSpark.Sf)
    spark.sql("select user_id, ts, event_id from events").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("ts") / 1000000000L,
        r.getAs[Long]("event_id")))
  }

  test("events_forecast: 7-day multiplicative forecast matches the closed-form mirror") {
    val daily = events.map(_._2 / 86400L).groupBy(identity)
      .map { case (day, vs) => day -> vs.length.toLong }
    val d0 = daily.keys.min; val dmax = daily.keys.max
    val m = daily.size.toLong
    val sx = daily.keys.map(_ - d0).sum
    val sy = daily.values.sum
    val sxy = daily.map { case (day, n) => (day - d0) * n }.sum
    val sxx = daily.keys.map(day => (day - d0) * (day - d0)).sum
    val prof = daily.toSeq.groupBy(_._1 % 7)
      .map { case (dow, ds) => dow -> (ds.size.toLong, ds.map(_._2).sum) }
    val gt = prof.values.map(_._2).sum.toDouble
    val gd = prof.values.map(_._1).sum.toDouble
    val rows = run("events_forecast").collect()
    assert(rows.length == 7)
    rows.foreach { r =>
      val h = r.getAs[Long]("horizon_days")
      val day = dmax + h
      assert(r.getAs[Long]("day") == day && r.getAs[Long]("dow") == day % 7)
      val trend = ((sy * sxx - sx * sxy).toDouble + (m * sxy - sx * sy).toDouble * (day - d0)) /
        (m * sxx - sx * sx).toDouble
      val (nd, tot) = prof(day % 7)
      val idx = (tot.toDouble / nd) / (gt / gd)
      assert(math.abs(r.getAs[Double]("trend") - trend) < 1e-3)
      assert(math.abs(r.getAs[Double]("seasonal_idx") - idx) < 1e-3)
      assert(math.abs(r.getAs[Double]("forecast") - trend * idx) < 0.011)
    }
    // a sane forecast on real data: positive daily volumes
    assert(rows.forall(_.getAs[Double]("forecast") > 0.0))
  }

  test("events_bot_detect: per-user gap moments match the exact-integer mirror") {
    val expect = events.groupBy(_._1).flatMap { case (uid, es) =>
      val secs = es.toSeq.map(e => (e._2, e._3)).sortBy(identity).map(_._1)
      val gaps = secs.zip(secs.tail).map { case (a, b) => b - a }
      if (gaps.length >= 5) {
        val n = gaps.length.toLong
        val sg = gaps.sum
        val sgg = gaps.map(g => g * g).sum
        Some(uid -> (n, sg, sgg))
      } else None
    }
    val rows = run("events_bot_detect").collect()
    assert(rows.length == expect.size && rows.nonEmpty)
    rows.foreach { r =>
      val (n, sg, sgg) = expect(r.getAs[Long]("user_id"))
      assert(r.getAs[Long]("n_gaps") == n)
      assert(math.abs(r.getAs[Double]("mean_gap_s") - sg.toDouble / n) < 0.011)
      val cv = if (sg > 0) math.sqrt((n * sgg - sg * sg).toDouble) / sg else 0.0
      assert(math.abs(r.getAs[Double]("gap_cv") - cv) < 1e-3)
      val bot = (sg > 0 && cv < 0.3) || sg == 0
      assert((r.getAs[Long]("bot_like") == 1L) == bot)
    }
    // the synthetic corpus is organic traffic: bursty users dominate
    assert(rows.count(_.getAs[Long]("bot_like") == 1L) < rows.length / 2)
  }

  test("events_cohort_matrix: the weekly cohort triangle matches the mirror") {
    val wk = events.map(e => (e._1, e._2 / 604800L))
    val first = wk.groupBy(_._1).map { case (u, es) => u -> es.map(_._2).min }
    val act = wk.map { case (u, w) => (first(u), w - first(u), u) }.distinct
    val mx = act.groupBy(a => (a._1, a._2)).map { case (k, as) => k -> as.length.toLong }
    val cs = mx.collect { case ((c, 0L), n) => c -> n }
    val rows = run("events_cohort_matrix").collect()
    assert(rows.length == mx.size && rows.nonEmpty)
    rows.foreach { r =>
      val k = (r.getAs[Long]("cohort_wk"), r.getAs[Long]("age_wk"))
      assert(r.getAs[Long]("n_active") == mx(k))
      assert(r.getAs[Long]("n_cohort") == cs(k._1))
      assert(math.abs(r.getAs[Double]("retention") - mx(k).toDouble / cs(k._1)) < 0.00011)
      // retention is a share of the cohort
      assert(r.getAs[Long]("n_active") <= r.getAs[Long]("n_cohort"))
    }
    // age 0 is by definition full retention
    rows.filter(_.getAs[Long]("age_wk") == 0L)
      .foreach(r => assert(r.getAs[Double]("retention") == 1.0))
  }

  test("events_changepoint: the CUSUM argmax and level shift match the exact-integer mirror") {
    val daily = events.map(_._2 / 86400L).groupBy(identity)
      .map { case (day, vs) => day -> vs.length.toLong }
    val m = daily.size.toLong
    val s = daily.values.sum
    val sorted = daily.toSeq.sortBy(_._1)
    val cums = sorted.scanLeft((0L, 0L, 0L)) { case ((_, cn, rn), (day, n)) =>
      (day, cn + n, rn + 1)
    }.tail
    val (cpDay, peak) = cums.map { case (day, cn, rn) =>
      (day, math.abs(m * cn - rn * s))
    }.maxBy { case (day, ad) => (ad, -day) }
    val before = sorted.filter(_._1 <= cpDay); val after = sorted.filter(_._1 > cpDay)
    val row = run("events_changepoint").collect().head
    assert(row.getAs[Long]("cp_day") == cpDay)
    assert(row.getAs[Long]("n_days") == m)
    assert(math.abs(row.getAs[Double]("cusum_peak") - peak.toDouble / m) < 0.011)
    val mb = before.map(_._2).sum.toDouble / before.length
    val ma = after.map(_._2).sum.toDouble / after.length
    assert(math.abs(row.getAs[Double]("mean_before") - mb) < 0.011)
    assert(math.abs(row.getAs[Double]("mean_after") - ma) < 0.011)
    assert(math.abs(row.getAs[Double]("level_shift") - (ma - mb)) < 0.021)
  }
}
