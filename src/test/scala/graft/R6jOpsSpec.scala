package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic gates for the round-6 time-series batch: the exact-integer
  * daily-series autocorrelation (double-precision ACF mirror) and the
  * Kaplan–Meier conversion-survival curve (unquantized KM product
  * mirror + the estimator's structural laws).
  */
class R6jOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)

  private lazy val eventRows: Array[(Long, String, Double, Long)] = {
    Tables.register(spark, TestSpark.Sf)
    spark.sql("select user_id, event_type, value, ts div 1000000000 as sec from events")
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[Double]("value"), r.getAs[Long]("sec") / 86400))
  }

  test("events_autocorr: integer-exact ACF matches the double-precision mirror") {
    val daily = eventRows.groupBy(_._4).toSeq.sortBy(_._1).map(_._2.length.toDouble)
    val m = daily.length
    val mu = daily.sum / m
    val den = daily.map(x => (x - mu) * (x - mu)).sum
    val rows = run("events_autocorr").collect()
    assert(rows.length == 7)
    rows.foreach { r =>
      val k = r.getAs[Long]("lag").toInt
      assert(r.getAs[Long]("n_pairs") == (m - k).toLong)
      val num = (k until m).map(t => (daily(t) - mu) * (daily(t - k) - mu)).sum
      assert(math.abs(r.getAs[Double]("acf") - num / den) < 0.00011, s"lag $k")
    }
    // every |r_k| is a valid correlation
    rows.foreach(r => assert(math.abs(r.getAs[Double]("acf")) <= 1.0 + 1e-9))
  }

  test("events_survival: KM curve matches the unquantized product mirror") {
    val lastDay = eventRows.map(_._4).max
    val byUser = eventRows.groupBy(_._1)
    // (duration, censored) per user: death = first purchase value>=180
    val life = byUser.toSeq.map { case (_, es) =>
      val d0 = es.map(_._4).min
      val tp = es.filter(e => e._2 == "purchase" && e._3 >= 180).map(_._4).minOption
      tp match {
        case Some(t) => (t - d0, false)
        case None    => (lastDay - d0, true)
      }
    }
    val n = life.size
    val byDur = life.groupBy(_._1).toSeq.sortBy(_._1)
    var atRisk = n.toLong
    var surv = 1.0
    val expect = byDur.map { case (dur, ls) =>
      val dEv = ls.count(!_._2).toLong
      val dCs = ls.count(_._2).toLong
      val row = (dur, atRisk, dEv, dCs, { if (dEv > 0) surv *= 1.0 - dEv.toDouble / atRisk; surv })
      atRisk -= ls.size
      row
    }
    val got = run("events_survival").collect()
      .map(r => (r.getAs[Long]("dur_days"), r.getAs[Long]("n_risk"),
        r.getAs[Long]("n_conversions"), r.getAs[Long]("n_censored"),
        r.getAs[Double]("survival"))).sortBy(_._1)
    assert(got.length == expect.length)
    got.zip(expect).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._3 == e._3 && g._4 == e._4, s"dur ${e._1}")
      assert(math.abs(g._5 - e._5) < 5e-4, s"survival at dur ${e._1}: got ${g._5} want ${e._5}")
    }
    // structural laws: risk sets shrink, survival never increases,
    // everyone leaves exactly once
    assert(got.map(_._2).toSeq == got.map(_._2).sortBy(-_).toSeq)
    assert(got.map(_._5).toSeq == got.map(_._5).sortBy(x => -x).toSeq)
    assert(got.map(r => r._3 + r._4).sum == n.toLong)
    assert(got.head._2 == n.toLong)
    // the censoring is real on this corpus: some users never convert
    assert(got.map(_._4).sum > 0 && got.map(_._3).sum > 0)
  }
}
