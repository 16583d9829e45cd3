package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic gates for the round-7 fifteenth batch: RRF ensemble
  * recall (each leg pinned identical to its standalone served key,
  * the fusion re-scored in the JVM, hits re-counted against a
  * re-derived exact truth table), the exponential interarrival fit
  * (λ, every bucket's expected mass, and the grid chi-square
  * refolded), and the lognormal length fit (grid moments and both
  * quantile ratios re-derived). */
class R7oOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)

  private def q(x: Double, dec: Int): Double = {
    val m = math.pow(10, dec)
    (if (x >= 0) math.floor(x * m + 0.5) else -math.floor(-x * m + 0.5)) / m
  }
  private def qL(x: Double): Long =
    (if (x >= 0) math.floor(x + 0.5) else -math.floor(-x + 0.5)).toLong

  // ---------------- ann_ensemble_recall ----------------

  test("ann_ensemble_recall: legs match the served keys, fusion re-scores in the JVM, hits recount") {
    val nrm = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet").collect()
      .map { r =>
        val v = r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray
        val n = math.sqrt(v.map(x => x * x).sum)
        r.getAs[Long]("vec_id") -> v.map(_ / n)
      }.toMap
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    val qids = sqlgen.Wm.QueryIds
    val truth = qids.map { qid =>
      qid -> nrm.keysIterator.filter(_ != qid)
        .map(c => (c, q(dot(nrm(qid), nrm(c)), 6)))
        .toSeq.sortBy { case (c, s) => (-s, c) }.take(10).map(_._1).toSet
    }.toMap
    def legOf(key: String): Map[(Long, Long), Long] =
      run(key).collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("neighbor_id")) -> r.getAs[Long]("rn")).toMap
    val legs = Map("lsh" -> legOf("vec_topk_lsh"), "ivf" -> legOf("vec_topk_ivf"),
      "bq" -> legOf("vec_topk_binary"))
    // RRF fusion exactly as served: fixed three-term score, cid tie-break
    val rrf = qids.flatMap { qid =>
      val cands = legs.values.flatMap(_.keys).filter(_._1 == qid).map(_._2).toSet
      cands.map { cid =>
        val s = Seq("lsh", "ivf", "bq").map(m =>
          legs(m).get((qid, cid)).map(r => 1.0 / (60 + r)).getOrElse(0.0)).sum
        (qid, cid, s)
      }.toSeq.sortBy { case (_, cid, s) => (-s, cid) }.take(10).map(t => (t._1, t._2))
    }
    val expHits = Map(
      "lsh" -> legs("lsh").keys.count { case (qid, cid) => truth(qid)(cid) },
      "ivf" -> legs("ivf").keys.count { case (qid, cid) => truth(qid)(cid) },
      "bq" -> legs("bq").keys.count { case (qid, cid) => truth(qid)(cid) },
      "rrf" -> rrf.count { case (qid, cid) => truth(qid)(cid) })
    val rows = run("ann_ensemble_recall").collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val m = r.getAs[String]("method")
      assert(r.getAs[Long]("hits") == expHits(m).toLong, s"method=$m")
      assert(math.abs(r.getAs[Double]("recall10") - q(expHits(m) / 50.0, 4)) < 1e-9)
      val nPairs = m match {
        case "rrf" => rrf.size.toLong
        case other => legs(other).size.toLong
      }
      assert(r.getAs[Long]("n_pairs") == nPairs, s"method=$m pairs")
    }
  }

  // ---------------- events_exp_fit ----------------

  test("events_exp_fit: lambda, expected masses, and the grid chi-square refold in the JVM") {
    Tables.register(spark, TestSpark.Sf)
    val ev = spark.sql("select user_id, event_id, ts div 1000000000 as sec from events")
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"), r.getAs[Long]("sec")))
    val gaps = ev.groupBy(_._1).values.flatMap { es =>
      val o = es.sortBy(e => (e._3, e._2)).map(_._3)
      o.iterator.zip(o.iterator.drop(1)).map { case (a, b) => b - a }
    }.filter(_ >= 1L).toSeq
    val n = gaps.size.toLong
    val sg = gaps.sum
    val lambda = n.toDouble / sg
    def bucket(g: Long): Long = math.min(39L, (63 - java.lang.Long.numberOfLeadingZeros(g)).toLong)
    val obs = gaps.groupBy(bucket).view.mapValues(_.size.toLong).toMap
    case class Exp(obs: Long, expn: Double, chq: Option[Long])
    val mirror = obs.map { case (b, o) =>
      val p = q(math.exp(-lambda * math.pow(2.0, b.toDouble)), 9) -
        q(math.exp(-lambda * math.pow(2.0, (b + 1).toDouble)), 9)
      val expn = n.toDouble * p
      val chq = if (p > 0) Some(qL((o - expn) * (o - expn) / expn * 1e6)) else None
      b -> Exp(o, expn, chq)
    }
    val schq = mirror.values.flatMap(_.chq).sum
    val nTested = mirror.values.count(_.chq.isDefined).toLong
    val rows = run("events_exp_fit").collect()
    assert(rows.length == mirror.size)
    rows.foreach { r =>
      val b = r.getAs[Long]("log2_bucket")
      val e = mirror(b)
      assert(r.getAs[Long]("bucket_lo_s") == (1L << b))
      assert(r.getAs[Long]("n_obs") == e.obs, s"b=$b obs")
      assert(math.abs(r.getAs[Double]("expected_n") - q(e.expn, 4)) < 1e-9, s"b=$b expn")
      assert(math.abs(r.getAs[Double]("lambda") - q(lambda, 9)) < 1e-12)
      assert(math.abs(r.getAs[Double]("mean_gap_s") - q(sg.toDouble / n, 4)) < 1e-9)
      assert(math.abs(r.getAs[Double]("chi2_total") - q(schq.toDouble / 1e6, 4)) < 1e-9)
      assert(r.getAs[Long]("n_buckets_tested") == nTested)
    }
    // the observed census conserves: bucket counts sum to all gaps
    assert(rows.map(_.getAs[Long]("n_obs")).sum == n)
  }

  // ---------------- text_length_lognormal ----------------

  test("text_length_lognormal: grid moments and both quantile ratios re-derive in the JVM") {
    val toks = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet").collect()
      .map(_.getAs[String]("text").toLowerCase.split("\\s+").count(_.nonEmpty).toLong)
    val pos = toks.filter(_ >= 1L)
    val nZero = toks.count(_ < 1L).toLong
    val l3 = pos.map(t => qL(math.log(t.toDouble) * 1000))
    val n = pos.length.toLong
    val (s1, s2) = (l3.sum, l3.map(x => x * x).sum)
    val mu = s1.toDouble / n / 1000
    val sigma = math.sqrt((n * s2 - s1 * s1).toDouble) / n.toDouble / 1000
    val sorted = pos.sorted
    def rankSel(pct: Int): Long = {
      val byV = sorted.groupBy(identity).view.mapValues(_.length.toLong).toSeq.sortBy(_._1)
      var cm = 0L
      byV.collectFirst { case (v, m) if { cm += m; cm * 100 >= n * pct } => v }.get
    }
    // lower median via the same cum*2 >= n selection
    val med = { var cm = 0L
      sorted.groupBy(identity).view.mapValues(_.length.toLong).toSeq.sortBy(_._1)
        .collectFirst { case (v, m) if { cm += m; cm * 2 >= n } => v }.get }
    val p84 = rankSel(84)
    val rows = run("text_length_lognormal").collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("n_docs") == n)
    assert(r.getAs[Long]("n_zero_docs") == nZero)
    assert(math.abs(r.getAs[Double]("mu_ln_tokens") - q(mu, 6)) < 1e-9)
    assert(math.abs(r.getAs[Double]("sigma_ln_tokens") - q(sigma, 6)) < 1e-9)
    assert(r.getAs[Long]("median_tokens") == med)
    assert(r.getAs[Long]("p84_tokens") == p84)
    assert(math.abs(r.getAs[Double]("fitted_median") - q(math.exp(mu), 4)) < 1e-9)
    assert(math.abs(r.getAs[Double]("median_ratio") - q(med / math.exp(mu), 4)) < 1e-9)
    assert(math.abs(r.getAs[Double]("fitted_p84") - q(math.exp(mu + sigma), 4)) < 1e-9)
    assert(math.abs(r.getAs[Double]("p84_ratio") - q(p84 / math.exp(mu + sigma), 4)) < 1e-9)
    // sane fit on natural-ish text: sigma positive, quantile ratios near 1
    assert(sigma > 0)
  }
}
