package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic gates for the round-7 thirtieth batch: difference-in-
  * differences (2×2 cell moments, estimate, SE, t refolded) and the
  * A/B MDE/power planner (formulas refolded, consistent with the
  * served events_ab_test counts). */
class R8dOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)

  private def q(x: Double, dec: Int): Double = {
    val m = math.pow(10, dec)
    (if (x >= 0) math.floor(x * m + 0.5) else -math.floor(-x * m + 0.5)) / m
  }
  private def qL(x: Double): Long =
    (if (x >= 0) math.floor(x + 0.5) else -math.floor(-x + 0.5)).toLong

  test("q_promo_did: cell moments, estimate, SE, and t refold from the JVM 2x2 grid") {
    Tables.register(spark, TestSpark.Sf)
    val li = spark.sql(
      """select case when p.p_type = 'PROMO' then 1 else 0 end as treated,
        |  case when l.l_shipdate >= timestamp '1998-01-01 00:00:00' then 1 else 0 end as post,
        |  l.l_discount as dc
        |from lineitem l join part p on p.p_partkey = l.l_partkey""".stripMargin)
      .collect().map(r => ((r.getAs[Int]("treated"), r.getAs[Int]("post")), qL(r.getAs[Double]("dc") * 100)))
    val cells = li.groupBy(_._1).view.mapValues { xs =>
      val v = xs.map(_._2)
      (v.length.toLong, v.sum, v.map(x => x * x).sum)
    }.toMap
    def mean(c: (Long, Long, Long)) = c._2.toDouble / c._1 / 100
    def vr(c: (Long, Long, Long)) = (c._1 * c._3 - c._2 * c._2).toDouble / (c._1.toDouble * c._1 * 10000)
    val (tr, tp, cr, cp) = (cells((1, 0)), cells((1, 1)), cells((0, 0)), cells((0, 1)))
    val did = (mean(tp) - mean(tr)) - (mean(cp) - mean(cr))
    val se = math.sqrt(vr(tp) / tp._1 + vr(tr) / tr._1 + vr(cp) / cp._1 + vr(cr) / cr._1)
    val rows = run("q_promo_did").collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val c = cells((r.getAs[Long]("treated").toInt, r.getAs[Long]("post").toInt))
      assert(r.getAs[Long]("n_items") == c._1)
      assert(math.abs(r.getAs[Double]("mean_discount") - q(mean(c), 6)) < 1e-9)
      assert(math.abs(r.getAs[Double]("treated_delta") - q(mean(tp) - mean(tr), 6)) < 1e-9)
      assert(math.abs(r.getAs[Double]("control_delta") - q(mean(cp) - mean(cr), 6)) < 1e-9)
      assert(math.abs(r.getAs[Double]("did_estimate") - q(did, 6)) < 1e-9)
      assert(math.abs(r.getAs[Double]("did_se") - q(se, 6)) < 1e-9)
      assert(math.abs(r.getAs[Double]("did_t") - q(did / se, 4)) < 1e-9)
    }
  }

  test("events_ab_power: MDE, required n, and flags refold; counts match events_ab_test") {
    val ab = run("events_ab_test").collect().head
    val (na, ca) = (ab.getAs[Long]("n_a"), ab.getAs[Long]("clicks_a"))
    val (nb, cb) = (ab.getAs[Long]("n_b"), ab.getAs[Long]("clicks_b"))
    val r = run("events_ab_power").collect().head
    assert(r.getAs[Long]("n_a") == na && r.getAs[Long]("n_b") == nb)
    val pp = (ca + cb).toDouble / (na + nb)
    val diff = ca.toDouble / na - cb.toDouble / nb
    val mde = 2.8016 * math.sqrt(pp * (1 - pp) * (1.0 / na + 1.0 / nb))
    assert(math.abs(r.getAs[Double]("p_pooled") - q(pp, 6)) < 1e-9)
    assert(math.abs(r.getAs[Double]("mde_abs") - q(mde, 6)) < 1e-9)
    assert(math.abs(r.getAs[Double]("mde_rel") - q(mde / pp, 4)) < 1e-9)
    assert(math.abs(r.getAs[Double]("observed_diff") - q(diff, 6)) < 1e-9)
    if (math.abs(diff) > 1e-12) {
      val reqN = math.ceil(2 * pp * (1 - pp) * math.pow(2.8016 / diff, 2)).toLong
      assert(r.getAs[Long]("required_n_per_arm") == reqN)
    } else assert(r.isNullAt(r.fieldIndex("required_n_per_arm")))
    assert(r.getAs[Long]("powered_flag") == (if (math.abs(diff) >= mde) 1L else 0L))
    // MDE shrinks with n: sanity bound against a doubled-n hypothetical
    val mde2 = 2.8016 * math.sqrt(pp * (1 - pp) * (0.5 / na + 0.5 / nb))
    assert(mde2 < mde)
  }
}
