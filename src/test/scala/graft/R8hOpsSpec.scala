package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic gates for the round-7 thirty-fourth batch: the recall@k
  * curve (both rankings re-derived, pooled recall refolded, k=10 rung
  * pinned to the served ann_recall_eval), the exact two-sample KS test
  * (integer CDF race refolded per language pair), and explicit
  * grouping sets (every level recounted from the base table). */
class R8hOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)

  private def q(x: Double, dec: Int): Double = {
    val m = math.pow(10, dec)
    (if (x >= 0) math.floor(x * m + 0.5) else -math.floor(-x * m + 0.5)) / m
  }

  test("ann_recall_at_k_curve: k=10 rung consistent with ann_recall_eval; monotone hit counts; exact pooled ratio") {
    val rows = run("ann_recall_at_k_curve").collect().sortBy(_.getAs[Long]("k"))
    assert(rows.map(_.getAs[Long]("k")).toSeq == Seq(1L, 5L, 10L, 20L))
    // pooled recall = total_hits / (k * |Q|), |Q| = 5 fixed queries
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("recall_at_k") -
        q(r.getAs[Long]("total_hits").toDouble / (r.getAs[Long]("k") * 5.0), 4)) < 1e-9)
    }
    // hits can only accumulate as k widens
    val hits = rows.map(_.getAs[Long]("total_hits"))
    hits.sliding(2).foreach { case Array(a, b) => assert(a <= b) }
    // the k=10 rung must agree with the served per-query recall audit
    val eval10 = run("ann_recall_eval").collect().map(_.getAs[Long]("hits")).sum
    assert(rows.find(_.getAs[Long]("k") == 10L).get.getAs[Long]("total_hits") == eval10)
  }

  test("text_ks_length: integer CDF race, D, and the critical gate refold per language pair") {
    Tables.register(spark, TestSpark.Sf)
    val docs = spark.sql("select lang, n_chars from documents").collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_chars")))
    val byLang = docs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val langs = byLang.keys.toSeq.sorted
    val rows = run("text_ks_length").collect()
    assert(rows.length == langs.size * (langs.size - 1) / 2)
    rows.foreach { r =>
      val (la, lb) = (r.getAs[String]("lang_a"), r.getAs[String]("lang_b"))
      assert(la < lb)
      val (xa, xb) = (byLang(la), byLang(lb))
      val (na, nb) = (xa.size.toLong, xb.size.toLong)
      assert(r.getAs[Long]("n_a") == na && r.getAs[Long]("n_b") == nb)
      val vals = (xa ++ xb).distinct.sorted
      assert(r.getAs[Long]("n_values") == vals.size.toLong)
      val dint = vals.map(v => math.abs(xa.count(_ <= v) * nb - xb.count(_ <= v) * na)).max
      val d = dint.toDouble / (na.toDouble * nb)
      val crit = 1.358 * math.sqrt((na + nb).toDouble / (na.toDouble * nb))
      assert(math.abs(r.getAs[Double]("ks_d") - q(d, 6)) < 1e-9, s"$la-$lb")
      assert(math.abs(r.getAs[Double]("ks_crit_95") - q(crit, 6)) < 1e-9, s"$la-$lb")
      assert(r.getAs[Long]("reject_h0") == (if (d > crit) 1L else 0L), s"$la-$lb")
    }
  }

  test("events_grouping_sets: every explicit level recounted from the base table") {
    Tables.register(spark, TestSpark.Sf)
    val ev = spark.sql(
      """select event_type, (ts div 1000000000 div 86400 + 4) % 7 as dow,
        |  (ts div 1000000000 % 86400) div 3600 as hod, value from events""".stripMargin)
      .collect().map(r => (r.getAs[String]("event_type"), r.getAs[Long]("dow"),
        r.getAs[Long]("hod"), BigDecimal(r.getAs[Double]("value")).setScale(4, BigDecimal.RoundingMode.HALF_UP)))
    val rows = run("events_grouping_sets").collect()
    // exactly the four declared sets appear, tagged by sentinel shape
    def level(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("event_type") != "ALL", r.getAs[Long]("dow") >= 0, r.getAs[Long]("hour_of_day") >= 0)
    assert(rows.map(level).toSet == Set((true, true, false), (true, false, true),
      (false, true, false), (false, false, true)))
    rows.foreach { r =>
      val mine = ev.filter { case (t, dw, h, _) =>
        (r.getAs[String]("event_type") == "ALL" || t == r.getAs[String]("event_type")) &&
          (r.getAs[Long]("dow") < 0 || dw == r.getAs[Long]("dow")) &&
          (r.getAs[Long]("hour_of_day") < 0 || h == r.getAs[Long]("hour_of_day"))
      }
      assert(r.getAs[Long]("n") == mine.size.toLong)
    }
    // marginals conserve the corpus
    assert(rows.filter(r => r.getAs[String]("event_type") == "ALL" && r.getAs[Long]("dow") >= 0)
      .map(_.getAs[Long]("n")).sum == ev.length.toLong)
  }
}
