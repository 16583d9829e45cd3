package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic gates for the round-7 fifth batch: activity heatmap,
  * median/MAD robust anomaly, per-type Fano overdispersion. Each test
  * re-derives the full report in the JVM from the raw events and pins
  * every row. */
class R7fOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)

  private def q(x: Double, dec: Int): Double = {
    val m = math.pow(10, dec)
    (if (x >= 0) math.floor(x * m + 0.5) else -math.floor(-x * m + 0.5)) / m
  }

  private def events(): Array[(Long, Long, String)] = {
    Tables.register(spark, TestSpark.Sf)
    spark.sql("select user_id, ts div 1000000000 as sec, event_type from events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
  }

  test("events_heatmap: every dow x hour cell matches the JVM census") {
    val ev = events()
    val cells = ev.groupBy { case (_, sec, _) =>
      ((sec / 86400 + 4) % 7, sec % 86400 / 3600)
    }
    val total = ev.length.toDouble
    val rows = run("events_heatmap").collect()
    assert(rows.length == cells.size)
    rows.foreach { r =>
      val key = (r.getAs[Long]("dow"), r.getAs[Long]("hour"))
      assert(key._1 >= 0 && key._1 <= 6 && key._2 >= 0 && key._2 <= 23)
      val cell = cells(key)
      assert(r.getAs[Long]("n_events") == cell.length.toLong, s"cell $key")
      assert(r.getAs[Long]("n_users") == cell.map(_._1).distinct.length.toLong, s"cell $key")
      assert(math.abs(r.getAs[Double]("pct_events") -
        q(100.0 * cell.length / total, 4)) < 1e-9, s"cell $key")
    }
    // the census is complete: cells partition the event stream
    assert(rows.map(_.getAs[Long]("n_events")).sum == ev.length.toLong)
  }

  test("events_anomaly_mad: median, MAD, and modified z match the JVM mirror") {
    val ev = events()
    val daily = ev.groupBy(_._2 / 86400).view.mapValues(_.length.toLong).toMap
    val m = daily.size
    // lower median: rank ceil(m/2) in (value, day) order
    def lowerMed(xs: Seq[(Long, Long)]): Long = {
      val sorted = xs.sortBy(identity).map(_._1)
      sorted((m * 0.5).ceil.toInt - 1)
    }
    val med = lowerMed(daily.toSeq.map { case (d, x) => (x, d) })
    val mad = lowerMed(daily.toSeq.map { case (d, x) => (math.abs(x - med), d) })
    val rows = run("events_anomaly_mad").collect()
    assert(rows.length == m)
    rows.foreach { r =>
      val day = r.getAs[Long]("day")
      val x = daily(day)
      assert(r.getAs[Long]("n_events") == x)
      assert(r.getAs[Long]("median_events") == med)
      assert(r.getAs[Long]("mad") == mad)
      if (mad > 0) {
        val z = 0.6745 * (x - med) / mad.toDouble
        assert(math.abs(r.getAs[Double]("robust_z") - q(z, 4)) < 1e-9, s"day $day")
        assert(r.getAs[Int]("is_outlier") == (if (math.abs(z) > 3.5) 1 else 0))
      } else {
        assert(r.isNullAt(r.fieldIndex("robust_z")))
        assert(r.getAs[Int]("is_outlier") == 0)
      }
    }
    // exactly half the days (lower-median convention) sit at or below the median
    assert(rows.count(r => r.getAs[Long]("n_events") <= med) >= (m + 1) / 2)
  }

  test("events_fano: per-type daily moments and dispersion match the JVM mirror") {
    val ev = events()
    val days = ev.map(_._2 / 86400).distinct.sorted
    val byType = ev.groupBy(_._3)
    val rows = run("events_fano").collect()
    assert(rows.length == byType.size)
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val perDay = byType(t).groupBy(_._2 / 86400).view.mapValues(_.length.toLong).toMap
      val xs = days.map(d => perDay.getOrElse(d, 0L))
      val m = xs.length.toLong
      val s = xs.sum
      val qq = xs.map(x => x * x).sum
      assert(r.getAs[Long]("n_days") == m, s"type $t")
      assert(math.abs(r.getAs[Double]("mean_daily") - q(s.toDouble / m, 4)) < 1e-9, s"type $t")
      val fano = (m * qq - s * s).toDouble / m / s
      val cv2 = (m * qq - s * s).toDouble / s / s
      assert(math.abs(r.getAs[Double]("fano") - q(fano, 4)) < 1e-9, s"type $t")
      assert(math.abs(r.getAs[Double]("cv2") - q(cv2, 4)) < 1e-9, s"type $t")
      assert(r.getAs[Int]("overdispersed") == (if (fano > 1.0) 1 else 0), s"type $t")
    }
  }
}
