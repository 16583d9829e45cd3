package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic gates for the round-7 thirteenth batch: the LID census
  * (every node's MLE re-derived from the served kNN sims on the same
  * 1e-9 ln grid), the power-law tail fit (α, its standard error, and
  * the KS distance re-derived from the served in-degree key), and the
  * Markov entropy rate (both entropies refolded from a JVM transition
  * census; the exact-bigint identities pinned). */
class R7mOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)

  private def q(x: Double, dec: Int): Double = {
    val m = math.pow(10, dec)
    (if (x >= 0) math.floor(x * m + 0.5) else -math.floor(-x * m + 0.5)) / m
  }
  private def qL(x: Double): Long =
    (if (x >= 0) math.floor(x + 0.5) else -math.floor(-x + 0.5)).toLong

  // ---------------- vec_lid ----------------

  test("vec_lid: per-node grid MLEs, bins, and the exact-sum mean match the served kNN graph") {
    val knn = run("wm_knn_edges").collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("rn"), r.getAs[Double]("sim")))
    val bySrc = knn.groupBy(_._1)
    val lids = bySrc.toSeq.map { case (_, rows) =>
      val kk = rows.map(_._2).max
      val sk = rows.find(_._2 == kk).get._3
      val st = rows.map { case (_, _, s) =>
        qL(math.log(math.max(1.0 - s, 1e-12) / math.max(1.0 - sk, 1e-12)) * 1e9)
      }.sum
      if (st < 0) Some(-2.0 * kk * 1e9 / st) else None
    }
    val defined = lids.flatten
    val nDegen = lids.count(_.isEmpty).toLong
    val byBin = defined.groupBy(l => math.min(math.floor(l).toLong, 100L))
    val nn = defined.size.toLong
    val sq = defined.map(l => qL(l * 1e6)).sum
    val rows = run("vec_lid").collect()
    assert(rows.length == byBin.size)
    rows.foreach { r =>
      val b = r.getAs[Long]("lid_bin")
      val in = byBin(b)
      assert(r.getAs[Long]("n_nodes") == in.size.toLong, s"bin=$b")
      assert(math.abs(r.getAs[Double]("node_share") - q(in.size.toDouble / nn, 4)) < 1e-9)
      assert(math.abs(r.getAs[Double]("mean_lid") - q(sq.toDouble / 1e6 / nn, 6)) < 1e-9)
      assert(r.getAs[Long]("n_degenerate") == nDegen)
    }
    assert(rows.map(_.getAs[Long]("n_nodes")).sum == nn)
    // LID of a d-dim corpus cannot exceed the ambient dimension by
    // orders of magnitude on average — the census mean stays sane
    assert(rows.head.getAs[Double]("mean_lid") > 0.0)
  }

  // ---------------- graph_powerlaw_fit ----------------

  test("graph_powerlaw_fit: alpha, its standard error, and the KS distance match the JVM fit") {
    val indeg = run("wm_in_degree").collect().map(_.getAs[Long]("in_degree"))
    val tail = indeg.filter(_ >= 2L)
    val n = tail.length.toLong
    val lnq2 = qL(math.log(2.0) * 1e9)
    val s = tail.map(c => qL(math.log(c.toDouble) * 1e9)).sum - n * lnq2
    val rows = run("graph_powerlaw_fit").collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("n_nodes") == indeg.length.toLong)
    assert(r.getAs[Long]("n_tail") == n)
    assert(r.getAs[Long]("d_min") == 2L)
    assert(math.abs(r.getAs[Double]("tail_share") - q(n.toDouble / indeg.length, 4)) < 1e-9)
    if (s > 0) {
      val alpha = 1.0 + n.toDouble * 1e9 / s
      assert(math.abs(r.getAs[Double]("alpha") - q(alpha, 6)) < 1e-9)
      assert(math.abs(r.getAs[Double]("alpha_se") - q((alpha - 1) / math.sqrt(n.toDouble), 6)) < 1e-9)
      // KS over the degree domain: exact empirical CCDF vs the fitted
      // CCDF computed on the same integer ln grid
      val byDeg = tail.groupBy(identity).view.mapValues(_.length.toLong).toSeq.sortBy(-_._1)
      var cum = 0L
      val ks = byDeg.map { case (c, m) =>
        cum += m
        val fitted = q(math.exp((1.0 - alpha) * (qL(math.log(c.toDouble) * 1e9) - lnq2) / 1e9), 6)
        math.abs(cum.toDouble / n - fitted)
      }.max
      assert(math.abs(r.getAs[Double]("ks_d") - q(ks, 4)) < 1e-9)
      // a kNN graph's in-degree tail decays: the MLE lands right of 1
      assert(alpha > 1.0)
    } else assert(r.isNullAt(r.fieldIndex("alpha")))
  }

  // ---------------- events_entropy_rate ----------------

  test("events_entropy_rate: both entropies refold from a JVM transition census; identities hold") {
    Tables.register(spark, TestSpark.Sf)
    val ev = spark.sql(
      "select user_id, event_id, event_type, ts div 1000000000 as sec from events")
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[String]("event_type"), r.getAs[Long]("sec")))
    val census = collection.mutable.Map.empty[(String, String), Long]
    ev.groupBy(_._1).foreach { case (_, es) =>
      val ord = es.sortBy(e => (e._4, e._2)).map(_._3)
      ord.iterator.zip(ord.iterator.drop(1)).foreach { p =>
        census(p) = census.getOrElse(p, 0L) + 1L
      }
    }
    def lnq(x: Long): Long = qL(math.log(x.toDouble) * 1e9)
    val bySrc = census.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val nn = census.values.sum
    val num = census.map { case ((s, _), c) => c * (lnq(bySrc(s)) - lnq(c)) }.sum
    val snn = bySrc.values.map(v => v * lnq(v)).sum
    val rows = run("events_entropy_rate").collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("n_transitions") == nn)
    assert(r.getAs[Long]("n_types") == bySrc.size.toLong)
    val hm = (nn * lnq(nn) - snn).toDouble / (nn.toDouble * 1e9)
    val hr = num.toDouble / (nn.toDouble * 1e9)
    assert(math.abs(r.getAs[Double]("h_marginal") - q(hm, 6)) < 1e-9)
    assert(math.abs(r.getAs[Double]("h_rate") - q(hr, 6)) < 1e-9)
    assert(math.abs(r.getAs[Double]("info_gain") -
      q(((nn * lnq(nn) - snn) - num).toDouble / (nn.toDouble * 1e9), 6)) < 1e-9)
    assert(math.abs(r.getAs[Double]("conditional_share") -
      q(num.toDouble / (nn * lnq(nn) - snn).toDouble, 4)) < 1e-9)
    // entropy bounds hold on the grid sums: 0 <= H_rate and
    // H_marginal <= ln|types| (+ grid slack)
    assert(hr >= -1e-6)
    assert(hm <= math.log(bySrc.size.toDouble) + 1e-6)
  }
}
