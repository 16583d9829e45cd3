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

  /** roundAway mirror: round-half-away-from-zero via floor. */
  private def rnd(x: Double, dec: Int): Double = {
    val m = math.pow(10, dec)
    (if (x >= 0) math.floor(x * m + 0.5) else -math.floor(-x * m + 0.5)) / m
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  private lazy val normVecs: Map[Long, Array[Double]] =
    spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet").collect().map { r =>
      val v = r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray
      val nrm = math.sqrt(dot(v, v))
      r.getAs[Long]("vec_id") -> v.map(_ / nrm)
    }.toMap

  test("graph_kcore: the 8-round peel equals the JVM fixpoint 8-core of the mutual graph") {
    val dirEdges = SparkEntry.queries("wm_knn_edges")(spark, TestSpark.Sf).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst"))).toSet
    val mutual = dirEdges.filter { case (a, b) => dirEdges.contains((b, a)) }
    var edges = mutual
    var rounds = 0
    var changed = true
    while (changed) {
      val deg = edges.toSeq.groupBy(_._1).map { case (v, es) => v -> es.size }
      val next = edges.filter { case (a, b) => deg(a) >= 8 && deg(b) >= 8 }
      changed = next != edges
      if (changed) rounds += 1
      edges = next
    }
    assert(rounds <= 8, s"peel needs $rounds rounds; the unrolled key has 8")
    val expect = edges.toSeq.groupBy(_._1).map { case (v, es) => v -> es.size.toLong }
    val got = run("graph_kcore").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("core_deg")).toMap
    assert(got == expect)
    // the peel bites: the 8-core is a strict subset of the mutual graph
    assert(got.nonEmpty && got.size < mutual.map(_._1).size)
    got.values.foreach(dg => assert(dg >= 8))
  }

  test("text_keywords_llr: quantized-xlnx LLR and per-source top-5 match the mirror") {
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("text")))
    val wf = docs.flatMap { case (s, t) =>
      t.toLowerCase.split("\\s+").filter(_.nonEmpty).map(w => (s, w))
    }.groupBy(identity).map { case ((s, w), xs) => (s, w) -> xs.length.toLong }
    val nSrc = wf.toSeq.groupBy(_._1._1).map { case (s, xs) => s -> xs.map(_._2).sum }
    val cWd = wf.toSeq.groupBy(_._1._2).map { case (w, xs) => w -> xs.map(_._2).sum }
    val n = wf.values.sum
    def xlnx(x: Long): Long =
      if (x > 0) x * math.round(rnd(math.log(x.toDouble) * 1e9, 0)) else 0L
    val t9 = wf.map { case ((s, w), k) =>
      (s, w) -> (xlnx(k) + xlnx(cWd(w) - k) + xlnx(nSrc(s) - k) +
        xlnx(n - nSrc(s) - (cWd(w) - k)) - xlnx(nSrc(s)) - xlnx(n - nSrc(s)) -
        xlnx(cWd(w)) - xlnx(n - cWd(w)) + xlnx(n))
    }
    val expect = t9.toSeq.groupBy(_._1._1).flatMap { case (s, xs) =>
      xs.sortBy { case ((_, w), t) => (-t, w) }.take(5).zipWithIndex.map {
        case (((_, w), t), i) => (s, w) -> (2.0 * t / 1e9, (i + 1).toLong)
      }
    }
    val got = run("text_keywords_llr").collect()
    assert(got.length == expect.size)
    got.foreach { r =>
      val key = (r.getAs[String]("source"), r.getAs[String]("word"))
      val (llr, rank) = expect(key)
      assert(r.getAs[Long]("rank") == rank, key)
      assert(math.abs(r.getAs[Double]("llr") - llr) < 2e-4, key)
      assert(r.getAs[Long]("n_in_source") == wf(key))
    }
  }

  test("events_new_vs_returning: daily census mirrors first-active-day; cumulative conserves") {
    val userDays = eventRows.map(e => (e._1, e._4)).distinct
    val d0 = userDays.groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).min }
    val got = run("events_new_vs_returning").collect()
      .map(r => r.getAs[Long]("day") -> (r.getAs[Long]("n_new"),
        r.getAs[Long]("n_returning"), r.getAs[Long]("cum_users"))).toMap
    userDays.groupBy(_._2).foreach { case (day, xs) =>
      val nNew = xs.count { case (u, d) => d0(u) == d }.toLong
      assert(got(day)._1 == nNew && got(day)._2 == xs.length - nNew, s"day $day")
    }
    // all users acquired exactly once; the cumulative curve tops out at the census
    assert(got.values.map(_._1).sum == d0.size.toLong)
    assert(got(got.keys.max)._3 == d0.size.toLong)
  }

  test("events_segment_migration: tier matrix matches the per-half median-cut mirror") {
    val days = eventRows.map(e => (e._1, e._4))
    val dMin = days.map(_._2).min
    def tiers(half: Int): Map[Long, String] = {
      val counts = days.filter(e => (if (e._2 < dMin + 15) 0 else 1) == half)
        .groupBy(_._1).map { case (u, xs) => u -> xs.length.toLong }
      val sorted = counts.values.toSeq.sorted
      val med = sorted(((sorted.size + 1) / 2 - 1).max(0)) // smallest x with cum >= ceil(n/2)
      counts.map { case (u, c) => u -> (if (c > med) "high" else "low") }
    }
    val t0 = tiers(0); val t1 = tiers(1)
    val users = days.map(_._1).distinct
    val expect = users.groupBy(u =>
      (t0.getOrElse(u, "absent"), t1.getOrElse(u, "absent")))
      .map { case (k, xs) => k -> xs.length.toLong }
    val got = run("events_segment_migration").collect()
      .map(r => (r.getAs[String]("tier_from"), r.getAs[String]("tier_to")) ->
        r.getAs[Long]("n_users")).toMap
    assert(got == expect)
    assert(got.values.sum == users.length.toLong)
  }

  test("multimodal_wav_features: decode inversion + feature semantics on constructed PCM") {
    import graft.operators.Wav
    // hand-checked features on an alternating buffer (the synthetic
    // corpus ramp has ZCR 0 — its crossing period exceeds clip length,
    // so adjacency sensitivity is pinned here instead)
    val f = Wav.features(Array[Short](5, -3, 4, -2))
    assert(f.zcr == 3 && f.energy == 54 && f.b2 == 4 && f.b4 == 4)
    // Walsh correlates flip with position: i in 4..7 gets weight -1 at k=2
    val g = Wav.features(Array[Short](1, 1, 1, 1, 1, 1, 1, 1))
    assert(g.zcr == 0 && g.energy == 8 && g.b2 == 0 && g.b4 == 8)
    // encode -> decode inverts: features from decoded bytes equal
    // features from the raw samples, for every synthetic shape
    Seq(0L, 1L, 2L).foreach { d =>
      val smp = Wav.synthSamples(d, 1000)
      val bytes = Wav.encodePcm16(Wav.synthRate(d), smp)
      assert(Wav.features(Wav.pcmSamples(bytes)) == Wav.features(smp), s"doc $d")
    }
    // the oracle-checked aggregate runs and covers every source x rate
    val rows = run("multimodal_wav_features").collect()
    assert(rows.map(r => (r.getAs[String]("source"), r.getAs[Long]("sample_rate"))).distinct.length == rows.length)
    rows.foreach(r => assert(r.getAs[Long]("total_energy") > 0))
  }

  test("graph_clustering_coeff: per-node cc matches the neighbor-set mirror; credit sums to 3x triangles") {
    val dirEdges = SparkEntry.queries("wm_knn_edges")(spark, TestSpark.Sf).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst")))
    val und = dirEdges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val nbr = und.toSeq.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
      .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).toSet }
    val got = run("graph_clustering_coeff").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("degree"), r.getAs[Long]("n_triangles"), r.getAs[Double]("local_cc"))).toMap
    assert(got.keySet == nbr.keySet)
    var triCredit = 0L
    got.foreach { case (v, (deg, t, cc)) =>
      val ns = nbr(v)
      assert(deg == ns.size.toLong, s"deg $v")
      val tExp = ns.toSeq.combinations(2).count { case Seq(x, y) =>
        und.contains((math.min(x, y), math.max(x, y)))
      }
      assert(t == tExp.toLong, s"triangles at $v")
      val ccExp = if (deg < 2) 0.0 else 2.0 * tExp / (deg * (deg - 1.0))
      assert(math.abs(cc - ccExp) < 1e-5, s"cc at $v")
      triCredit += t
    }
    // every triangle credited exactly three times
    val tri = SparkEntry.queries("graph_triangles")(spark, TestSpark.Sf)
      .collect().head.getAs[Long]("n_triangles")
    assert(triCredit == 3 * tri)
  }

  test("data_shard_manifest: per-cell census/checksums mirror the PRF; epochs reshuffle") {
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet").collect()
      .map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("text").toLowerCase.split("\\s+").count(_.nonEmpty)))
    val got = run("data_shard_manifest").collect()
      .map(r => (r.getAs[Long]("epoch"), r.getAs[Long]("shard")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"), r.getAs[Long]("checksum"))).toMap
    for (epoch <- 0 to 1) {
      val cells = docs.groupBy(d => graft.functions.Prf.prfMod(8, "shard", epoch, d._1))
      (0 until 8).foreach { s =>
        val members = cells.getOrElse(s.toLong, Array.empty)
        val (n, tk, ck) = got((epoch.toLong, s.toLong))
        assert(n == members.length.toLong, s"e$epoch s$s")
        assert(tk == members.map(_._2.toLong).sum, s"tokens e$epoch s$s")
        assert(ck == members.map(d => graft.functions.Prf.prfMod(1000000, "ck", d._1)).sum, s"ck e$epoch s$s")
      }
      // complete + disjoint partition of the corpus
      assert((0 until 8).map(s => got((epoch.toLong, s.toLong))._1).sum == docs.length.toLong)
    }
    // the reshuffle is real: the two epochs place docs differently
    assert((0 until 8).map(s => got((0L, s.toLong))._3) !=
      (0 until 8).map(s => got((1L, s.toLong))._3))
  }

  test("sketch_hll_curve: every register count's estimate matches the JVM register mirror") {
    val hashes = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet").collect()
      .flatMap(_.getAs[String]("text").toLowerCase.split("\\s+")).filter(_.nonEmpty)
      .distinct.map(w => graft.functions.Prf.prf("hll", w)).distinct
    def est(m: Int): Double = {
      val bits = 60 - (math.log(m) / math.log(2)).round.toInt
      val regs = new Array[Int](m)
      hashes.foreach { h =>
        val j = (h % m).toInt
        val w = h / m
        val rho = (1 to bits).find(r => w >= (1L << (bits - r))).getOrElse(bits + 1)
        if (rho > regs(j)) regs(j) = rho
      }
      val z = regs.map(mr => math.pow(2.0, -mr)).sum
      val v0 = regs.count(_ == 0)
      val alpha = m match { case 16 => 0.673; case 64 => 0.709; case _ => 0.7182726 }
      val raw = BigDecimal(alpha * m * m / z).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      if (v0 > 0 && raw <= 2.5 * m)
        BigDecimal(m * math.log(m.toDouble / v0)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      else raw
    }
    val got = run("sketch_hll_curve").collect()
      .map(r => r.getAs[Long]("m_registers").toInt -> (r.getAs[Long]("n_exact"), r.getAs[Double]("hll_est"))).toMap
    assert(got.keySet == Set(16, 64, 256))
    got.foreach { case (m, (ex, e)) =>
      assert(ex == hashes.length.toLong, s"m $m") // no 60-bit collisions at this corpus
      assert(math.abs(e - est(m)) < 1e-3, s"m $m: got $e want ${est(m)}")
    }
    // more registers, less error (monotone on this corpus)
    def err(m: Int) = math.abs(got(m)._2 - got(m)._1)
    assert(err(256) <= err(16))
  }

  test("graph_hops_reach: hop censuses equal the BFS mirror and expand monotonically") {
    val adj = SparkEntry.queries("wm_knn_edges")(spark, TestSpark.Sf).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst")))
      .groupBy(_._1).map { case (s, es) => s -> es.map(_._2).toSet }
    val qids = Seq(0L, 100L, 200L, 300L, 400L)
    val got = run("graph_hops_reach").collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("hops")) -> r.getAs[Long]("n_reached")).toMap
    qids.foreach { q =>
      var frontier = Set(q)
      for (h <- 1 to 4) {
        frontier = frontier ++ frontier.flatMap(v => adj.getOrElse(v, Set.empty))
        assert(got((q, h.toLong)) == frontier.size.toLong, s"qid $q hop $h")
      }
    }
    // reach never shrinks with hops
    qids.foreach(q => (1 to 3).foreach(h =>
      assert(got((q, h.toLong)) <= got((q, h.toLong + 1)))))
  }

  test("q_pareto_share: gridded Lorenz shares and Gini match the mirror") {
    val revs = spark.read.parquet(s"${TestSpark.Sf}/orders.parquet")
      .groupBy("o_custkey").sum("o_totalprice").collect()
      .map(r => BigDecimal(r.getAs[Double]("sum(o_totalprice)")).setScale(2, BigDecimal.RoundingMode.HALF_UP))
    val n = revs.length
    val buckets = revs.groupBy(r => (r.toDouble / 100).floor.toLong).toSeq.sortBy(_._1)
      .map { case (g, xs) => (g, xs.length.toLong, xs.sum) }
    val st = buckets.map(_._3).sum.toDouble
    var nBelow = 0L; var sBelow = BigDecimal(0)
    var terms = BigDecimal(0)
    buckets.foreach { case (_, nb, sb) =>
      terms += nb * (2 * sBelow + sb); nBelow += nb; sBelow += sb
    }
    val gini = 1.0 - terms.toDouble / (n * st)
    def topShare(k: Long): Double = {
      var need = k; var s = 0.0
      buckets.reverse.foreach { case (_, nb, sb) =>
        if (need > 0) {
          val take = math.min(need, nb)
          s += (if (take == nb) sb.toDouble else take * (sb.toDouble / nb))
          need -= take
        }
      }
      s / st
    }
    val row = run("q_pareto_share").collect().head
    assert(row.getAs[Long]("n_customers") == n.toLong)
    assert(math.abs(row.getAs[Double]("top10pct_share") - topShare(math.ceil(n * 0.1).toLong)) < 2e-4)
    assert(math.abs(row.getAs[Double]("top1pct_share") - topShare(math.ceil(n * 0.01).toLong)) < 2e-4)
    assert(math.abs(row.getAs[Double]("gini") - gini) < 2e-4)
    assert(row.getAs[Double]("gini") >= 0 && row.getAs[Double]("gini") < 1)
  }

  test("text_zipf_fit: the integer-moment OLS matches the mirror over the true top words") {
    val counts = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet").collect()
      .flatMap(_.getAs[String]("text").toLowerCase.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, xs) => (w, xs.length.toLong) }
    val top = counts.toSeq.sortBy { case (w, c) => (-c, w) }.take(100)
    val pts = top.zipWithIndex.map { case ((_, c), i) =>
      (math.round(rnd(math.log(i + 1.0) * 1e6, 0)), math.round(rnd(math.log(c.toDouble) * 1e6, 0)))
    }
    val nn = pts.length.toLong
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum; val syy = pts.map(p => p._2 * p._2).sum
    val slope = (nn * sxy - sx * sy).toDouble / (nn * sxx - sx * sx)
    val r2 = math.pow((nn * sxy - sx * sy).toDouble, 2) /
      ((nn * sxx - sx * sx).toDouble * (nn * syy - sy * sy))
    val row = run("text_zipf_fit").collect().head
    assert(row.getAs[Long]("n_words") == nn)
    assert(math.abs(row.getAs[Double]("zipf_slope") - slope) < 2e-4)
    assert(math.abs(row.getAs[Double]("r2") - r2) < 2e-4)
    assert(row.getAs[Double]("zipf_slope") <= 0.0)
  }

  test("events_attribution_markov: removal effects match the integer power-iteration mirror") {
    val evs = {
      Tables.register(spark, TestSpark.Sf)
      spark.sql("select user_id, event_type, ts div 1000000000 as sec, event_id from events")
        .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
          r.getAs[Long]("sec"), r.getAs[Long]("event_id")))
    }
    // journey transitions truncated at first purchase
    val trans = scala.collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
    evs.groupBy(_._1).foreach { case (_, es) =>
      val ordered = es.sortBy(e => (e._3, e._4))
      val cut = ordered.indexWhere(_._2 == "purchase")
      val j = if (cut >= 0) ordered.take(cut + 1) else ordered
      var prev = "start"
      j.foreach { e => trans((prev, e._2)) += 1; prev = e._2 }
      if (cut < 0) trans((ordered.last._2, "null")) += 1
    }
    val outc = trans.toSeq.groupBy(_._1._1).map { case (s, xs) => s -> xs.map(_._2).sum }
    val ppm = trans.map { case ((s, t), c) => (s, t) -> c * 1000000L / outc(s) }
    def conv(removed: Option[String]): (Long, Long) = {
      val vtm = scala.collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
      ppm.foreach { case ((s, t), p) =>
        if (!removed.contains(s)) {
          val t2 = if (removed.contains(t)) "null" else t
          vtm((s, t2)) += p
        }
      }
      vtm(("purchase", "purchase")) += 1000000L
      vtm(("null", "null")) += 1000000L
      var p = Map("start" -> 1000000000000L).withDefaultValue(0L)
      for (_ <- 1 to 8) {
        val nx = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
        vtm.foreach { case ((s, t), pm) => if (p(s) > 0) nx(t) += p(s) * pm / 1000000L }
        p = nx.toMap.withDefaultValue(0L)
      }
      (p("purchase"), p("purchase") + p("null"))
    }
    val (fullP, fullAb) = conv(None)
    val effs = Seq("view", "click", "signup", "error").map { c =>
      c -> (1.0 - conv(Some(c))._1.toDouble / fullP)
    }.toMap
    val sEff = effs.values.sum
    val got = run("events_attribution_markov").collect()
    assert(got.length == 4)
    got.foreach { r =>
      val c = r.getAs[String]("channel")
      assert(math.abs(r.getAs[Double]("conv_full") - fullP / 1e12) < 2e-6, c)
      assert(math.abs(r.getAs[Double]("removal_effect") - effs(c)) < 2e-6, c)
      assert(math.abs(r.getAs[Double]("attribution") - effs(c) / sEff) < 2e-4, c)
      assert(math.abs(r.getAs[Double]("mass_unabsorbed") - (1.0 - fullAb / 1e12)) < 2e-6, c)
      // removing a channel can only lose conversion paths
      assert(r.getAs[Double]("conv_removed") <= r.getAs[Double]("conv_full") + 1e-9, c)
    }
    // the shares are a proper attribution
    assert(math.abs(got.map(_.getAs[Double]("attribution")).sum - 1.0) < 1e-3)
  }

  test("wm_ber_curve: every noise level's BER matches the JVM attack+decode mirror; curve is monotone") {
    import graft.functions.{Prf, WmConst, WmDecode}
    // JVM twin of the SQL Irwin–Hall gaussian (Dialect.prfGauss)
    def gauss(parts: Any*): Double = {
      def chunks(h: Long) = (0 until 5).map(i => ((h >> (12 * i)) & 4095L).toDouble)
      val h1 = Prf.prf(("ih1" +: parts): _*)
      val h2 = Prf.prf(("ih2" +: parts): _*)
      val s = (chunks(h1) ++ chunks(h2)).sum + 5.0
      (s / 4096.0 - 5.0) * 1.0954451150103321
    }
    val steg = SparkEntry.queries("wm_embed")(spark, TestSpark.Sf).collect()
      .groupBy(_.getAs[Long]("vec_id")).map { case (id, rows) =>
        val v = new Array[Double](64)
        rows.foreach(r => v(r.getAs[Long]("pos").toInt - 1) = r.getAs[Double]("stego_val"))
        id -> v
      }
    val msg = WmConst.msgBits(graft.sqlgen.WmParams.Default.cipherB64)
    def errors(sigma: Double): Long = {
      val votes = scala.collection.mutable.Map[(Int, Int), Int]().withDefaultValue(0)
      steg.foreach { case (id, v) =>
        val atk = Array.tabulate(64)(p => v(p) + sigma * gauss("bwc", id, p + 1))
        WmDecode.decode(atk).foreach { case (blk, pb) =>
          pb.zipWithIndex.foreach { case (b, i) => votes((blk, i)) += 2 * b - 1 }
        }
      }
      (0 until 16).flatMap(blk => (0 until 16).map { i =>
        val vt = votes.get((blk, i))
        if (vt.isEmpty || (if (vt.get > 0) 1 else 0) != msg(blk)(8 + i)) 1L else 0L
      }).sum
    }
    val got = run("wm_ber_curve").collect()
      .map(r => r.getAs[Long]("sigma_centi") -> r.getAs[Long]("errors")).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 5L))
    Seq(1, 2, 3, 5).foreach { c =>
      assert(got(c.toLong) == errors(c / 100.0), s"sigma 0.0$c")
    }
    // the operating curve: more noise never decodes better, and the
    // QIM cliff sits inside the sampled range
    assert(got(1L) <= got(2L) && got(2L) <= got(3L) && got(3L) <= got(5L))
    assert(got(1L) < 26 && got(5L) > 128)
  }

  test("graph_assortativity: the integer-moment fold matches a double-precision Pearson mirror") {
    val dirEdges = SparkEntry.queries("wm_knn_edges")(spark, TestSpark.Sf).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst")))
    val und = dirEdges.filter(e => e._1 != e._2)
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val deg = und.toSeq.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .map { case (v, xs) => v -> xs.size.toDouble }
    // Pearson correlation of (source, target) degrees over DIRECTED copies
    val pairs = und.toSeq.flatMap { case (a, b) =>
      Seq((deg(a), deg(b)), (deg(b), deg(a)))
    }
    val n = pairs.size
    val mx = pairs.map(_._1).sum / n
    val cov = pairs.map { case (j, k) => (j - mx) * (k - mx) }.sum / n
    val vr = pairs.map { case (j, _) => (j - mx) * (j - mx) }.sum / n
    val row = run("graph_assortativity").collect().head
    assert(row.getAs[Long]("m_edges") == und.size.toLong)
    assert(math.abs(row.getAs[Double]("assortativity") - cov / vr) < 1e-5)
    assert(math.abs(row.getAs[Double]("assortativity")) <= 1.0 + 1e-9)
  }

  test("vec_pq_distortion: per-subspace MSE matches the codebook-reconstruction mirror") {
    val rows = run("vec_pq_distortion").collect()
    val books = spark.table("g_pq_ct").collect()
      .map(r => ((r.getAs[Number]("m").longValue, r.getAs[Number]("cell").longValue),
        r.getSeq[Double](r.fieldIndex("cv")).toArray)).toMap
    val codes = spark.table("g_pq_codes").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Number]("m").longValue,
        r.getAs[Number]("cell").longValue))
    assert(rows.map(_.getAs[Long]("subspace")).toSet == (0L until 8L).toSet)
    val byM = codes.groupBy(_._2)
    rows.foreach { r =>
      val m = r.getAs[Long]("subspace")
      val cs = byM(m)
      assert(r.getAs[Long]("n_vectors") == cs.length.toLong)
      assert(r.getAs[Long]("n_cells_used") == cs.map(_._3).distinct.length.toLong)
      val mses = cs.map { case (id, _, cell) =>
        val sv = normVecs(id).slice(m.toInt * 8, m.toInt * 8 + 8)
        val cv = books((m, cell))
        rnd(dot(sv, sv) - 2 * dot(sv, cv) + dot(cv, cv), 9)
      }
      assert(math.abs(r.getAs[Double]("mean_mse") - mses.sum / mses.length) < 2e-6, s"m $m")
      assert(math.abs(r.getAs[Double]("max_mse") - mses.max) < 1e-8, s"m $m")
      // reconstruction error is non-negative and small for unit subvectors
      assert(r.getAs[Double]("mean_mse") >= -1e-9 && r.getAs[Double]("mean_mse") < 1.0)
    }
  }

  test("graph_beam_curve: every width's recall matches a JVM beam-search mirror; curve is monotone") {
    val qids = Seq(0L, 100L, 200L, 300L, 400L)
    val adj = SparkEntry.queries("wm_knn_edges")(spark, TestSpark.Sf).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst")))
      .groupBy(_._1).map { case (s, es) => s -> es.map(_._2).toSet }
    val entries = SparkEntry.queries("wm_in_degree")(spark, TestSpark.Sf).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("in_degree")))
      .sortBy { case (id, deg) => (-deg, id) }.take(4).map(_._1)
    // Spark's round(): HALF_UP over the shortest decimal representation
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def beamTop10(qid: Long, beam: Int): Set[Long] = {
      val qn = normVecs(qid)
      var frontier: Seq[Long] = entries
      for (_ <- 1 to 3) {
        // e2 = kNN edges + self-loops, so the frontier survives expansion
        val cand = frontier.flatMap(c => adj.getOrElse(c, Set.empty) + c).distinct
        frontier = cand.map(c => (c, r6(dot(qn, normVecs(c)))))
          .sortBy { case (c, s) => (-s, c) }.take(beam).map(_._1)
      }
      frontier.filter(_ != qid)
        .map(c => (c, r6(dot(qn, normVecs(c))))).sortBy { case (c, s) => (-s, c) }
        .take(10).map(_._1).toSet
    }
    val brute = qids.map { q =>
      val qn = normVecs(q)
      q -> normVecs.keys.filter(_ != q).map(c => (c, r6(dot(qn, normVecs(c)))))
        .toSeq.sortBy { case (c, s) => (-s, c) }.take(10).map(_._1).toSet
    }.toMap
    val got = run("graph_beam_curve").collect()
      .map(r => r.getAs[Long]("beam") -> (r.getAs[Long]("hits"), r.getAs[Double]("recall10"))).toMap
    assert(got.keySet == Set(4L, 8L, 16L))
    Seq(4, 8, 16).foreach { b =>
      val hits = qids.map(q => (beamTop10(q, b) intersect brute(q)).size).sum.toLong
      assert(got(b.toLong)._1 == hits, s"beam $b")
      assert(math.abs(got(b.toLong)._2 - hits / 50.0) < 1e-9)
    }
    // wider beams never lose recall
    assert(got(4L)._1 <= got(8L)._1 && got(8L)._1 <= got(16L)._1)
  }

  test("wm_overwrite: pirate re-embed + dual extraction match the JVM embed/decode mirror") {
    import graft.functions.{WmConst, WmDecode, WmEmbed}
    import graft.sqlgen.WmParams
    val p2 = WmParams(message = "PIRATE-MARK-0002", key = "pirate-key")
    val carriers = SparkEntry.queries("wm_carriers")(spark, TestSpark.Sf).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("blk").toInt).toMap
    val steg = SparkEntry.queries("wm_embed")(spark, TestSpark.Sf).collect()
      .groupBy(_.getAs[Long]("vec_id")).map { case (id, rows) =>
        val v = new Array[Double](64)
        rows.foreach(r => v(r.getAs[Long]("pos").toInt - 1) = r.getAs[Double]("stego_val"))
        id -> v
      }
    // the pirate embed over every marked carrier, then both decodes
    val over = steg.map { case (id, v) => id -> WmEmbed.embed(v, carriers(id), p2) }
    def errs(cipher: String, decode: Array[Double] => Option[(Int, Array[Int])]): Map[Int, Int] = {
      val msg = WmConst.msgBits(cipher)
      val votes = scala.collection.mutable.Map[(Int, Int), Int]().withDefaultValue(0)
      over.values.foreach(v => decode(v).foreach { case (blk, pb) =>
        pb.zipWithIndex.foreach { case (b, i) => votes((blk, i)) += 2 * b - 1 }
      })
      (0 until 16).map(blk => blk -> (0 until 16).count { i =>
        val vt = votes.get((blk, i))
        vt.isEmpty || (if (vt.get > 0) 1 else 0) != msg(blk)(8 + i)
      }).toMap
    }
    val expOrig = errs(graft.sqlgen.WmParams.Default.cipherB64, v => WmDecode.decode(v))
    val expPir = errs(p2.cipherB64, v => WmDecode.decode(v, "pirate-key"))
    val got = run("wm_overwrite").collect()
    assert(got.length == 16)
    got.foreach { r =>
      val blk = r.getAs[Long]("blk").toInt
      assert(r.getAs[Long]("errors_original") == expOrig(blk).toLong, s"orig blk $blk")
      assert(r.getAs[Long]("errors_pirate") == expPir(blk).toLong, s"pirate blk $blk")
    }
    // the semantic finding: the pirate mark decodes clean while the
    // original is substantially corrupted
    assert(got.map(_.getAs[Long]("errors_pirate")).sum == 0L)
    assert(got.map(_.getAs[Long]("errors_original")).sum > 16L)
  }

  test("vec_kmeans_step: one Lloyd round matches the mirror and never increases inertia") {
    val rows = run("vec_kmeans_step").collect()
    val cents = spark.table("g_ivf_ct").collect()
      .map(r => r.getAs[Long]("cell") -> r.getSeq[Double](r.fieldIndex("cv")).toArray).toMap
    val members = spark.table("g_ivf_asg").collect()
      .map(r => (r.getAs[Long]("cell"), r.getAs[Long]("id")))
      .groupBy(_._1).map { case (c, xs) => c -> xs.map(x => normVecs(x._2)) }
    assert(rows.map(_.getAs[Long]("cell")).toSet == members.keySet)
    rows.foreach { r =>
      val cell = r.getAs[Long]("cell")
      val ms = members(cell)
      val cv = cents(cell)
      val dim = cv.length
      assert(r.getAs[Long]("n_members") == ms.length.toLong)
      val np = Array.tabulate(dim)(p => ms.map(v => rnd(v(p), 9)).sum / ms.length)
      val da = Array.tabulate(dim)(p => np(p) - cv(p))
      val sdot = ms.map(v => rnd(dot(v, cv), 6)).sum
      val cc2 = rnd(dot(cv, cv), 6)
      assert(math.abs(r.getAs[Double]("movement") - math.sqrt(dot(da, da))) < 1e-5, s"movement cell $cell")
      val before = ms.length * (1 + cc2) - 2 * sdot
      val after = ms.length * (1 - dot(np, np))
      assert(math.abs(r.getAs[Double]("inertia_before") - before) < 5e-4, s"before cell $cell")
      assert(math.abs(r.getAs[Double]("inertia_after") - after) < 5e-4, s"after cell $cell")
      // Lloyd monotonicity: the mean is the within-cell minimizer
      assert(r.getAs[Double]("inertia_after") <= r.getAs[Double]("inertia_before") + 1e-3,
        s"inertia increased in cell $cell")
    }
  }
}
