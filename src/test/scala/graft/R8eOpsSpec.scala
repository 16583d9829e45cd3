package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Prf

/** Semantic gates for the round-7 thirty-first batch: CUPED variance
  * reduction (pooled θ, adjusted means/variances, both z's refolded),
  * the Poisson-bootstrap CI (all 40 replica means re-derived through
  * the JVM PRF + integer-grid inverse CDF), multi-window SLO burn
  * rates (rolling censuses refolded), the hubness census (skewness
  * from JVM power sums over the oracle-checked in-degrees), Spearman
  * midranks (tie-corrected ranks re-derived), and customer deciles
  * (grid-rank deciles re-derived, conservation pinned). */
class R8eOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)

  private def q(x: Double, dec: Int): Double = {
    val m = math.pow(10, dec)
    (if (x >= 0) math.floor(x * m + 0.5) else -math.floor(-x * m + 0.5)) / m
  }
  private def qL(x: Double): Long =
    (if (x >= 0) math.floor(x + 0.5) else -math.floor(-x + 0.5)).toLong

  test("events_ab_cuped: theta, adjusted means/variances, and both z's refold in the JVM") {
    Tables.register(spark, TestSpark.Sf)
    val ev = spark.sql(
      "select user_id, ts div 1000000000 as sec, value from events")
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[Long]("sec") / 86400, qL(r.getAs[Double]("value") * 100)))
    val users = ev.groupBy(_._1).map { case (u, xs) =>
      (u % 2,
        xs.filter(_._2 < 19738).map(_._3).sum,
        xs.filter(_._2 >= 19738).map(_._3).sum)
    }.toSeq
    case class M(n: Long, sx: Long, sy: Long, sxy: Long, sxx: Long, syy: Long)
    def mo(us: Seq[(Long, Long, Long)]) = M(us.size.toLong,
      us.map(_._2).sum, us.map(_._3).sum, us.map(t => t._2 * t._3).sum,
      us.map(t => t._2 * t._2).sum, us.map(t => t._3 * t._3).sum)
    val (a, b) = (mo(users.filter(_._1 == 0)), mo(users.filter(_._1 == 1)))
    val p = mo(users)
    val th = (p.n.toDouble * p.sxy.toDouble - p.sx.toDouble * p.sy.toDouble) /
      (p.n.toDouble * p.sxx.toDouble - p.sx.toDouble * p.sx.toDouble)
    def mean(s: Long, n: Long) = s.toDouble / n / 100
    def vr(m: M, aa: Long, bb: Long, sab: Long) =
      (m.n.toDouble * sab.toDouble - aa.toDouble * bb.toDouble) / (m.n.toDouble * (m.n - 1))
    def meanAdj(m: M) = mean(m.sy, m.n) - th * (mean(m.sx, m.n) - mean(p.sx, p.n))
    def varAdj(m: M) =
      (vr(m, m.sy, m.sy, m.syy) - 2 * th * vr(m, m.sx, m.sy, m.sxy) +
        th * th * vr(m, m.sx, m.sx, m.sxx)) / 10000
    def varRaw(m: M) = vr(m, m.sy, m.sy, m.syy) / 10000
    val diffAdj = meanAdj(a) - meanAdj(b)
    val zAdj = diffAdj / math.sqrt(varAdj(a) / a.n + varAdj(b) / b.n)
    val rows = run("events_ab_cuped").collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      val m = if (r.getAs[Long]("variant") == 0) a else b
      assert(r.getAs[Long]("n_users") == m.n)
      assert(math.abs(r.getAs[Double]("mean_pre") - q(mean(m.sx, m.n), 4)) < 1e-9)
      assert(math.abs(r.getAs[Double]("mean_post") - q(mean(m.sy, m.n), 4)) < 1e-9)
      assert(math.abs(r.getAs[Double]("mean_adjusted") - q(meanAdj(m), 4)) < 1e-9)
      assert(math.abs(r.getAs[Double]("var_raw") - q(varRaw(m), 4)) < 1e-9)
      assert(math.abs(r.getAs[Double]("var_adjusted") - q(varAdj(m), 4)) < 1e-9)
      assert(math.abs(r.getAs[Double]("theta") - q(th, 6)) < 1e-9)
      assert(math.abs(r.getAs[Double]("diff_adjusted") - q(diffAdj, 4)) < 1e-9)
      assert(math.abs(r.getAs[Double]("z_adjusted") - q(zAdj, 4)) < 1e-9)
    }
    // CUPED leaves the point difference nearly intact only when the
    // pre-period means balance; the invariant that always holds is the
    // variance identity var_adj = var_raw·(1 − ρ²) at the pooled level,
    // which the per-arm ratio approximates — pin the ratio is ≤ 1 + eps
    // cannot be asserted on unplanted data, so pin internal consistency:
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("var_ratio") -
        q(varAdj(if (r.getAs[Long]("variant") == 0) a else b) /
          varRaw(if (r.getAs[Long]("variant") == 0) a else b), 4)) < 1e-9)
    }
  }

  test("events_boot_ci: every replica mean re-derived through the JVM PRF inverse-CDF weights") {
    Tables.register(spark, TestSpark.Sf)
    val rows = spark.sql(
      "select event_id, value from events where event_type = 'purchase'")
      .collect().map(r => (r.getAs[Long]("event_id"), qL(r.getAs[Double]("value") * 100)))
    def weight(chunk: Long): Long =
      if (chunk < 1507) 0 else if (chunk < 3014) 1 else if (chunk < 3767) 2
      else if (chunk < 4018) 3 else if (chunk < 4081) 4 else if (chunk < 4094) 5 else 6
    val means = (0 until 40).map { rep =>
      val g = rep / 5; val shift = 12 * (rep % 5)
      var swx = 0L; var sw = 0L
      rows.foreach { case (id, x) =>
        val h = Prf.prf("boot", g, id)
        val w = weight((h >> shift) & 0xfffL)
        swx += w * x; sw += w
      }
      swx.toDouble / sw / 100
    }
    val sorted = means.zipWithIndex.sortBy { case (m, i) => (m, i) }.map(_._1)
    val lo = sorted(0)   // ceil(40·0.025) = 1 → rank 1
    val hi = sorted(38)  // ceil(40·0.975) = 39 → rank 39
    val qs = means.map(m => qL(m * 10000))
    val bN = qs.size.toLong
    val se = math.sqrt((bN.toDouble * qs.map(v => v * v).sum -
      qs.sum.toDouble * qs.sum) / (bN.toDouble * (bN - 1))) / 10000
    val r = run("events_boot_ci").collect().head
    assert(r.getAs[Long]("n_rows") == rows.length.toLong)
    assert(r.getAs[Long]("n_replicas") == 40L)
    val point = rows.map(_._2).sum.toDouble / rows.length / 100
    assert(math.abs(r.getAs[Double]("point_mean") - q(point, 4)) < 1e-9)
    assert(math.abs(r.getAs[Double]("boot_lo_95") - q(lo, 4)) < 1e-9)
    assert(math.abs(r.getAs[Double]("boot_hi_95") - q(hi, 4)) < 1e-9)
    assert(math.abs(r.getAs[Double]("boot_se") - q(se, 4)) < 1e-9)
    assert(lo <= hi && r.getAs[Long]("point_in_ci") == (if (point >= lo && point <= hi) 1L else 0L))
  }

  test("events_slo_burn: rolling 1h/6h/24h burn rates and alert flags refold") {
    Tables.register(spark, TestSpark.Sf)
    val ev = spark.sql(
      "select ts div 1000000000 as sec, event_type from events")
      .collect().map(r => (r.getAs[Long]("sec") / 3600, r.getAs[String]("event_type")))
    val byHour = ev.groupBy(_._1).map { case (h, xs) =>
      h -> (xs.size.toLong, xs.count(_._2 == "error").toLong)
    }
    val hours = byHour.keys.toSeq.sorted
    def roll(h: Long, w: Int) = {
      val in = hours.filter(x => x >= h - (w - 1) && x <= h).map(byHour)
      (in.map(_._2).sum, in.map(_._1).sum)
    }
    val rows = run("events_slo_burn").collect()
    assert(rows.length == hours.size)
    rows.foreach { r =>
      val h = r.getAs[Long]("hour_idx")
      val (n, ne) = byHour(h)
      assert(r.getAs[Long]("n_events") == n && r.getAs[Long]("n_errors") == ne)
      def burn(w: Int) = { val (e, t) = roll(h, w); e.toDouble / t / 0.25 }
      assert(math.abs(r.getAs[Double]("burn_1h") - q(burn(1), 4)) < 1e-9)
      assert(math.abs(r.getAs[Double]("burn_6h") - q(burn(6), 4)) < 1e-9)
      assert(math.abs(r.getAs[Double]("burn_24h") - q(burn(24), 4)) < 1e-9)
      assert(r.getAs[Long]("page_alert") ==
        (if (burn(1) > 2.0 && burn(6) > 2.0) 1L else 0L))
      assert(r.getAs[Long]("ticket_alert") ==
        (if (burn(6) > 1.5 && burn(24) > 1.5) 1L else 0L))
    }
  }

  test("graph_hubness: skewness and hub/antihub censuses refold from the served in-degrees") {
    val indeg = run("wm_in_degree").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("in_degree"))).toMap
    Tables.register(spark, TestSpark.Sf)
    val ids = spark.sql("select vec_id from embeddings").collect()
      .map(_.getAs[Long]("vec_id"))
    val c = ids.map(id => indeg.getOrElse(id, 0L))
    val n = c.length.toLong
    val (s1, s2, s3) = (c.sum, c.map(x => x * x).sum, c.map(x => x * x * x).sum)
    val mean = s1.toDouble / n
    val vr = s2.toDouble / n - mean * mean
    val m3 = s3.toDouble / n - 3 * mean * (s2.toDouble / n) + 2 * mean * mean * mean
    val r = run("graph_hubness").collect().head
    assert(r.getAs[Long]("n_nodes") == n)
    assert(r.getAs[Long]("k") == 16L)
    assert(math.abs(r.getAs[Double]("mean_k_occurrence") - q(mean, 4)) < 1e-9)
    assert(r.getAs[Long]("max_k_occurrence") == c.max)
    assert(math.abs(r.getAs[Double]("skewness_sk") - q(m3 / (vr * math.sqrt(vr)), 4)) < 1e-9)
    assert(r.getAs[Long]("n_hubs") == c.count(_ >= 32).toLong)
    assert(r.getAs[Long]("n_antihubs") == c.count(_ == 0).toLong)
    assert(math.abs(r.getAs[Double]("hub_in_edge_share") -
      q(c.filter(_ >= 32).sum.toDouble / s1, 4)) < 1e-9)
    // every kNN edge lands somewhere: total in-degree = total edges
    assert(s1 == indeg.values.sum)
  }

  test("q_spearman: tie-corrected midranks re-derived; rho vs r consistency") {
    Tables.register(spark, TestSpark.Sf)
    val li = spark.sql("select l_discount, l_quantity from lineitem")
      .collect().map(r => (qL(r.getAs[Double]("l_discount") * 100), qL(r.getAs[Double]("l_quantity"))))
    def ranks2(vs: Seq[Long]): Map[Long, Long] = {
      val cnt = vs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val sorted = cnt.keys.toSeq.sorted
      val cum = sorted.scanLeft(0L)((acc, v) => acc + cnt(v))
      sorted.zip(cum).map { case (v, below) => v -> (2 * below + cnt(v) + 1) }.toMap
    }
    val (rx, ry) = (ranks2(li.map(_._1)), ranks2(li.map(_._2)))
    val n = li.length.toLong
    def pearson(xs: Seq[(Long, Long)]): Double = {
      val sx = xs.map(_._1).sum; val sy = xs.map(_._2).sum
      val sxy = xs.map(t => t._1 * t._2).sum
      val sxx = xs.map(t => t._1 * t._1).sum; val syy = xs.map(t => t._2 * t._2).sum
      (n.toDouble * sxy - sx.toDouble * sy) /
        math.sqrt((n.toDouble * sxx - sx.toDouble * sx) * (n.toDouble * syy - sy.toDouble * sy))
    }
    val rho = pearson(li.map { case (x, y) => (rx(x), ry(y)) })
    val rr = pearson(li)
    val r = run("q_spearman").collect().head
    assert(r.getAs[Long]("n_rows") == n)
    assert(math.abs(r.getAs[Double]("rho_spearman") - q(rho, 6)) < 1e-9)
    assert(math.abs(r.getAs[Double]("r_pearson") - q(rr, 6)) < 1e-9)
    assert(math.abs(rho) <= 1.0 + 1e-12 && math.abs(rr) <= 1.0 + 1e-12)
  }

  test("q_customer_deciles: grid-rank deciles re-derived; conservation and monotone shares") {
    Tables.register(spark, TestSpark.Sf)
    val cs = spark.sql(
      "select o_custkey, cast(sum(cast(o_totalprice as decimal(18,2)) * 100) as bigint) as cents " +
        "from orders group by o_custkey")
      .collect().map(r => (r.getAs[Long]("o_custkey"), r.getAs[Long]("cents")))
    val n = cs.length.toLong
    val ranked = cs.sortBy { case (ck, c) => (-c, ck) }.zipWithIndex
    val dec = ranked.groupBy { case (_, i) => i.toLong * 10 / n }
      .view.mapValues(_.map(_._1._2)).toMap
    val total = cs.map(_._2).sum
    val rows = run("q_customer_deciles").collect()
    assert(rows.map(_.getAs[Long]("n_customers")).sum == n)
    rows.foreach { r =>
      val d = r.getAs[Long]("decile")
      val cents = dec(d)
      assert(r.getAs[Long]("n_customers") == cents.size.toLong)
      assert(math.abs(r.getAs[Double]("total_spend") - q(cents.sum.toDouble / 100, 2)) < 1e-9)
      assert(math.abs(r.getAs[Double]("min_spend") - q(cents.min.toDouble / 100, 2)) < 1e-9)
      assert(math.abs(r.getAs[Double]("max_spend") - q(cents.max.toDouble / 100, 2)) < 1e-9)
      assert(math.abs(r.getAs[Double]("spend_share") - q(cents.sum.toDouble / total, 4)) < 1e-9)
    }
    // decile 0 = the top spenders: shares weakly decrease by construction
    val shares = rows.sortBy(_.getAs[Long]("decile")).map(_.getAs[Double]("spend_share"))
    shares.sliding(2).foreach { case Array(a, b) => assert(a >= b - 1e-9) }
    val cums = rows.sortBy(_.getAs[Long]("decile")).map(_.getAs[Double]("cum_spend_share"))
    assert(math.abs(cums.last - 1.0) < 2e-3)
  }
}
