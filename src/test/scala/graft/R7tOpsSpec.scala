package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic gates for the round-7 twentieth batch: the open order-line
  * backlog (the full day-grain interval sweep re-walked from raw
  * orders/lineitem; non-negativity, ends-flat, and the inverted-line
  * census pinned), cohort LTV (decimal-exact value sums and the
  * payback cumulative refolded), and the adjacent-word entropy rate
  * (both entropies refolded from a JVM bigram census). */
class R7tOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)

  private def q(x: Double, dec: Int): Double = {
    val m = math.pow(10, dec)
    (if (x >= 0) math.floor(x * m + 0.5) else -math.floor(-x * m + 0.5)) / m
  }
  private def qL(x: Double): Long =
    (if (x >= 0) math.floor(x + 0.5) else -math.floor(-x + 0.5)).toLong
  private def lnq(x: Long): Long = qL(math.log(x.toDouble) * 1e9)

  // ---------------- q_open_lines_backlog ----------------

  test("q_open_lines_backlog: the day-grain sweep re-walks; non-negative, ends flat, census holds") {
    Tables.register(spark, TestSpark.Sf)
    val li = spark.sql(
      """select unix_seconds(cast(o.o_orderdate as timestamp_ltz)) div 86400 as od,
        |       unix_seconds(cast(l.l_shipdate as timestamp_ltz)) div 86400 as sd
        |from orders o join lineitem l on l.l_orderkey = o.o_orderkey""".stripMargin)
      .collect().map(r => (r.getAs[Long]("od"), r.getAs[Long]("sd")))
    val nInv = li.count { case (od, sd) => sd < od }.toLong
    val valid = li.filter { case (od, sd) => sd >= od }
    val opened = valid.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val closed = valid.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val days = (opened.keySet ++ closed.keySet).toSeq.sorted
    var bk = 0L
    val mirror = days.map { d =>
      val (o, c) = (opened.getOrElse(d, 0L), closed.getOrElse(d, 0L))
      bk += o - c
      (d, o, c, bk)
    }
    val peak = mirror.map(_._4).max
    val rows = run("q_open_lines_backlog").collect().sortBy(_.getAs[Long]("day"))
    assert(rows.length == mirror.size)
    rows.zip(mirror).foreach { case (r, (d, o, c, b)) =>
      assert(r.getAs[Long]("day") == d)
      assert(r.getAs[Long]("n_opened") == o, s"day=$d opened")
      assert(r.getAs[Long]("n_closed") == c, s"day=$d closed")
      assert(r.getAs[Long]("backlog_eod") == b, s"day=$d backlog")
      assert(r.getAs[Long]("peak_backlog") == peak)
      assert(r.getAs[Long]("n_inverted") == nInv)
      // a line cannot close before it opened: backlog never dips negative
      assert(b >= 0L, s"day=$d negative backlog")
    }
    // every valid line opens once and closes once: the sweep ends flat
    assert(mirror.last._4 == 0L)
    assert(rows.map(_.getAs[Long]("n_opened")).sum == valid.length.toLong)
  }

  // ---------------- events_cohort_ltv ----------------

  test("events_cohort_ltv: decimal-exact value sums and the payback cumulative refold") {
    Tables.register(spark, TestSpark.Sf)
    val ev = spark.sql(
      "select user_id, ts div 1000000000 div 604800 as wk, value from events")
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("wk"), r.getAs[Double]("value")))
    val w0 = ev.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val cells = ev.groupBy(e => (w0(e._1), e._2 - w0(e._1)))
    val mirror = cells.map { case ((cw, age), es) =>
      val v = es.map(e => BigDecimal(e._3).setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum
      (cw, age) -> (es.map(_._1).distinct.size.toLong, v)
    }
    val rows = run("events_cohort_ltv").collect()
    assert(rows.length == mirror.size)
    val cohortN = mirror.collect { case ((cw, 0L), (n, _)) => cw -> n }
    rows.foreach { r =>
      val key = (r.getAs[Long]("cohort_wk"), r.getAs[Long]("age_wk"))
      val (nAct, v) = mirror(key)
      assert(r.getAs[Long]("n_active") == nAct, s"$key active")
      assert(r.getAs[Long]("n_cohort") == cohortN(key._1), s"$key cohort")
      assert(math.abs(r.getAs[Double]("period_value") -
        v.setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9, s"$key value")
      val cum = (0L to key._2).flatMap(a => mirror.get((key._1, a)).map(_._2)).sum
      assert(math.abs(r.getAs[Double]("cum_value") -
        cum.setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9, s"$key cum")
      assert(math.abs(r.getAs[Double]("ltv_per_user") -
        q(cum.toDouble / cohortN(key._1), 4)) < 1e-9, s"$key ltv")
    }
  }

  // ---------------- text_entropy_rate ----------------

  test("text_entropy_rate: both entropies refold from a JVM bigram census") {
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet").collect()
      .map(_.getAs[String]("text"))
    val census = collection.mutable.Map.empty[(String, String), Long]
    docs.foreach { t =>
      val ws = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
      ws.iterator.zip(ws.iterator.drop(1)).foreach { p =>
        census(p) = census.getOrElse(p, 0L) + 1L
      }
    }
    val byW1 = census.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val nn = census.values.sum
    val num = census.map { case ((w1, _), c) => c * (lnq(byW1(w1)) - lnq(c)) }.sum
    val snn = byW1.values.map(n => n * lnq(n)).sum
    val rows = run("text_entropy_rate").collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("n_bigrams") == nn)
    assert(r.getAs[Long]("n_first_words") == byW1.size.toLong)
    val hu = (nn * lnq(nn) - snn).toDouble / (nn.toDouble * 1e9)
    val hc = num.toDouble / (nn.toDouble * 1e9)
    assert(math.abs(r.getAs[Double]("h_unigram") - q(hu, 6)) < 1e-9)
    assert(math.abs(r.getAs[Double]("h_conditional") - q(hc, 6)) < 1e-9)
    assert(math.abs(r.getAs[Double]("mutual_info") -
      q(((nn * lnq(nn) - snn) - num).toDouble / (nn.toDouble * 1e9), 6)) < 1e-9)
    assert(math.abs(r.getAs[Double]("conditional_share") -
      q(num.toDouble / (nn * lnq(nn) - snn).toDouble, 4)) < 1e-9)
    // conditioning on the previous word cannot add uncertainty beyond
    // the first-vs-second-word marginal edge effect (per-doc boundary
    // words shift ~|docs|/|bigrams| of the mass between the two
    // marginals, so the bound carries that slack)
    assert(hc <= hu + 0.05)
  }
}
