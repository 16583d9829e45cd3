package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic gates for the round-7 sixteenth batch: the Poisson
  * order-size GOF (census, truncated-renormalized masses, and the
  * grid chi-square refolded), BQ bit balance (the O(Dim) mean
  * pairwise Hamming identity verified against a BRUTE O(N²) pair
  * walk), and the forecast backtest (all three methods' predictions
  * and error sums re-derived from raw daily counts). */
class R7pOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)

  private def q(x: Double, dec: Int): Double = {
    val m = math.pow(10, dec)
    (if (x >= 0) math.floor(x * m + 0.5) else -math.floor(-x * m + 0.5)) / m
  }
  private def qL(x: Double): Long =
    (if (x >= 0) math.floor(x + 0.5) else -math.floor(-x + 0.5)).toLong

  // ---------------- q_order_size_fit ----------------

  test("q_order_size_fit: census, renormalized Poisson masses, and the grid chi-square refold") {
    Tables.register(spark, TestSpark.Sf)
    val ks = spark.sql("select count(*) as k from lineitem group by l_orderkey")
      .collect().map(_.getAs[Long]("k"))
    val n = ks.length.toLong
    val (sk, sk2) = (ks.sum, ks.map(k => k * k).sum)
    val lambda = sk.toDouble / n
    def fact(k: Int): Long = (1 to k).foldLeft(1L)(_ * _)
    val pz = q(math.exp(-lambda), 9)
    val obs = ks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    case class M(obs: Long, expn: Option[Double], chq: Option[Long])
    val mirror = obs.map { case (k, o) =>
      val pt =
        if (k <= 20 && pz < 1)
          Some(q(math.exp(-lambda) * math.pow(lambda, k.toDouble) / fact(k.toInt), 9) / (1 - pz))
        else None
      val expn = pt.map(n.toDouble * _)
      val chq = pt.filter(_ > 0).map { p =>
        val e = n.toDouble * p; qL((o - e) * (o - e) / e * 1e6)
      }
      k -> M(o, expn, chq)
    }
    val schq = mirror.values.flatMap(_.chq).sum
    val nTested = mirror.values.count(_.chq.isDefined).toLong
    val disp = (n * sk2 - sk * sk).toDouble / (n.toDouble * sk)
    val rows = run("q_order_size_fit").collect()
    assert(rows.length == mirror.size)
    rows.foreach { r =>
      val k = r.getAs[Long]("n_lineitems")
      val m = mirror(k)
      assert(r.getAs[Long]("n_orders") == m.obs, s"k=$k")
      m.expn.foreach(e => assert(math.abs(r.getAs[Double]("expected_n") - q(e, 4)) < 1e-9, s"k=$k expn"))
      assert(math.abs(r.getAs[Double]("lambda") - q(lambda, 6)) < 1e-9)
      assert(math.abs(r.getAs[Double]("dispersion_idx") - q(disp, 6)) < 1e-9)
      assert(math.abs(r.getAs[Double]("chi2_total") - q(schq.toDouble / 1e6, 4)) < 1e-9)
      assert(r.getAs[Long]("n_k_tested") == nTested)
    }
    assert(rows.map(_.getAs[Long]("n_orders")).sum == n)
    // zero-truncation reads as under-dispersion — the stated honest signal
    assert(disp < 1.0 + 1e-6)
  }

  // ---------------- vec_bq_bit_balance ----------------

  test("vec_bq_bit_balance: the O(Dim) mean-Hamming identity matches a brute O(N^2) pair walk") {
    val vecs = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet").collect()
      .map(r => r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray)
    val dim = vecs.head.length
    val n = vecs.length.toLong
    val bits = vecs.map(v => v.map(_ > 0))
    val ones = Array.tabulate(dim)(i => bits.count(_(i)).toLong)
    val crossSum = ones.map(o => o * (n - o)).sum
    val effq = ones.map { o =>
      val p = o.toDouble / n; qL(4 * p * (1 - p) * 1e6)
    }.sum
    val rows = run("vec_bq_bit_balance").collect()
    assert(rows.length == dim)
    rows.foreach { r =>
      val i = r.getAs[Long]("bit_idx").toInt - 1 // pos is 1-based
      assert(r.getAs[Long]("n_ones") == ones(i), s"bit=$i")
      val share = ones(i).toDouble / n
      assert(math.abs(r.getAs[Double]("ones_share") - q(share, 4)) < 1e-9)
      assert(math.abs(r.getAs[Double]("balance_dev") - q(math.abs(share - 0.5), 4)) < 1e-9)
      assert(math.abs(r.getAs[Double]("mean_pairwise_hamming") -
        q(crossSum.toDouble * 2 / (n.toDouble * (n - 1)), 4)) < 1e-9)
      assert(math.abs(r.getAs[Double]("effective_bits") - q(effq.toDouble / 1e6, 4)) < 1e-9)
    }
    // the identity the key exists for: the census formula equals the
    // brute pairwise mean Hamming, bit for bit
    var brute = 0L
    for (a <- bits.indices; b <- (a + 1) until bits.length) {
      var h = 0; var i = 0
      while (i < dim) { if (bits(a)(i) != bits(b)(i)) h += 1; i += 1 }
      brute += h
    }
    val bruteMean = brute.toDouble / (n.toDouble * (n - 1) / 2)
    assert(math.abs(bruteMean - crossSum.toDouble * 2 / (n.toDouble * (n - 1))) < 1e-9)
  }

  // ---------------- events_forecast_eval ----------------

  test("events_forecast_eval: all three methods' predictions and error sums re-derive") {
    Tables.register(spark, TestSpark.Sf)
    val daily = spark.sql(
      "select ts div 1000000000 div 86400 as day, count(*) as n from events group by 1")
      .collect().map(r => (r.getAs[Long]("day"), r.getAs[Long]("n"))).sortBy(_._1)
    val d0 = daily.map(_._1).min
    val dmax = daily.map(_._1).max
    val cut = dmax - 7
    val tr = daily.filter(_._1 <= cut)
    val te = daily.filter(_._1 > cut)
    val m = tr.length.toLong
    val sx = tr.map(t => t._1 - d0).sum
    val sy = tr.map(_._2).sum
    val sxy = tr.map(t => (t._1 - d0) * t._2).sum
    val sxx = tr.map(t => (t._1 - d0) * (t._1 - d0)).sum
    val prof = tr.groupBy(_._1 % 7).view.mapValues(g => (g.size.toLong, g.map(_._2).sum)).toMap
    val (gd, gt) = (prof.values.map(_._1).sum, prof.values.map(_._2).sum)
    val dailyMap = daily.toMap
    def trend(day: Long): Double =
      ((sy * sxx - sx * sxy).toDouble + (m * sxy - sx * sy).toDouble * (day - d0)) /
        (m * sxx - sx * sx).toDouble
    val trainMean = gt.toDouble / gd
    case class E(ae: Long, se: Long)
    val errs = te.flatMap { case (day, nD) =>
      val sidx = prof.get(day % 7)
        .map { case (nd, tot) => (tot.toDouble / nd) / trainMean }.getOrElse(1.0)
      val pModel = trend(day) * sidx
      val pLast = dailyMap.get(cut).map(_.toDouble).getOrElse(trainMean)
      val pSeas = dailyMap.get(day - 7).map(_.toDouble).getOrElse(trainMean)
      Seq("model" -> pModel, "naive_last" -> pLast, "seasonal_naive" -> pSeas).map {
        case (meth, p) => meth -> E(qL(math.abs(nD - p) * 1e6), qL((nD - p) * 1e6))
      }
    }.groupBy(_._1).view.mapValues(es => (es.size.toLong, es.map(_._2.ae).sum, es.map(_._2.se).sum)).toMap
    val rows = run("events_forecast_eval").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val meth = r.getAs[String]("method")
      val (nT, sae, sse) = errs(meth)
      assert(r.getAs[Long]("n_test") == nT, s"$meth n")
      assert(math.abs(r.getAs[Double]("mae") - q(sae.toDouble / 1e6 / nT, 4)) < 1e-9, s"$meth mae")
      assert(math.abs(r.getAs[Double]("mean_bias") - q(sse.toDouble / 1e6 / nT, 4)) < 1e-9, s"$meth bias")
    }
    assert(rows.forall(_.getAs[Long]("n_test") == 7L))
  }
}
