package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic gates for the round-7 eighteenth batch: day-over-day mix
  * shift (every day-pair's exact-grid JS refolded from raw events),
  * boilerplate coverage (threshold, per-doc percents, and both
  * per-source statistics re-derived from raw text), and the
  * cross-source near-dup matrix (censused from the independently
  * oracle-checked pair key). */
class R7rOpsSpec extends AnyFunSuite {
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

  // ---------------- events_mix_shift ----------------

  test("events_mix_shift: every day-pair's exact-grid JS refolds from raw events") {
    Tables.register(spark, TestSpark.Sf)
    val dt = spark.sql(
      "select ts div 1000000000 div 86400 as day, event_type, count(*) as c from events group by 1, 2")
      .collect().map(r => ((r.getAs[Long]("day"), r.getAs[String]("event_type")), r.getAs[Long]("c"))).toMap
    val byDay = dt.groupBy(_._1._1).map { case (d, m) =>
      d -> m.map { case ((_, t), c) => t -> c }
    }
    val days = byDay.keys.toSeq.sorted
    val pairs = days.zip(days.drop(1)).filter { case (a, b) => b == a + 1 }
    val rows = run("events_mix_shift").collect()
    assert(rows.length == pairs.size)
    rows.foreach { r =>
      val (d2, d1) = (r.getAs[Long]("day"), r.getAs[Long]("prev_day"))
      assert(d2 == d1 + 1)
      val (m1, m2) = (byDay(d1), byDay(d2))
      val (n1, n2) = (m1.values.sum, m2.values.sum)
      assert(r.getAs[Long]("n_prev") == n1)
      assert(r.getAs[Long]("n_events") == n2)
      var sp = 0L; var sq = 0L
      (m1.keySet ++ m2.keySet).foreach { t =>
        val c1 = m1.getOrElse(t, 0L); val c2 = m2.getOrElse(t, 0L)
        if (c1 > 0) sp += c1 * (lnq(2 * c1 * n2) - lnq(c1 * n2 + c2 * n1))
        if (c2 > 0) sq += c2 * (lnq(2 * c2 * n1) - lnq(c1 * n2 + c2 * n1))
      }
      val js = (sp.toDouble / n1 + sq.toDouble / n2) / 2.0 / 1e9
      assert(math.abs(r.getAs[Double]("js_nats") - q(js, 6)) < 1e-9, s"day=$d2")
      assert(math.abs(r.getAs[Double]("js_normalized") - q(js / math.log(2.0), 4)) < 1e-9)
      assert(js >= -1e-6 && js <= math.log(2.0) + 1e-6)
    }
  }

  // ---------------- text_boilerplate_share ----------------

  test("text_boilerplate_share: threshold, per-doc percents, and per-source stats re-derive") {
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"), r.getAs[String]("text")))
    val grams = docs.map { case (id, src, t) =>
      val ws = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
      (id, src, ws.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet)
    }.filter(_._3.nonEmpty)
    val df = grams.flatMap(_._3).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nDocs = grams.map(_._1).distinct.size.toLong
    val thr = math.max(5L, math.ceil(nDocs / 100.0).toLong)
    val boiler = df.filter(_._2 >= thr).keySet
    val perDoc = grams.map { case (_, src, sh) =>
      val nb = sh.count(boiler).toLong
      (src, sh.size.toLong, nb, nb * 100 / sh.size)
    }
    val bySrc = perDoc.groupBy(_._1)
    val rows = run("text_boilerplate_share").collect()
    assert(rows.length == bySrc.size)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val in = bySrc(src)
      val n = in.size.toLong
      assert(r.getAs[Long]("n_docs") == n, s"$src docs")
      val ssh = in.map { case (_, ns, nb, _) => qL(nb.toDouble / ns * 1e6) }.sum
      assert(math.abs(r.getAs[Double]("mean_boiler_share") - q(ssh.toDouble / 1e6 / n, 4)) < 1e-9, s"$src mean")
      val byPct = in.groupBy(_._4).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
      var cm = 0L
      val p90 = byPct.collectFirst { case (p, m) if { cm += m; cm * 10 >= n * 9 } => p }.get
      assert(r.getAs[Long]("p90_boiler_pct") == p90, s"$src p90")
      assert(r.getAs[Long]("n_boiler_vocab") == boiler.size.toLong)
    }
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
  }

  // ---------------- dedup_cross_source ----------------

  test("dedup_cross_source: the syndication census refolds from the oracle-checked pair key") {
    val src = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("source")).toMap
    val pairs = run("dedup_simhash_pairs").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Long]("hamming")))
    val canon = pairs.map { case (da, db, h) =>
      if (src(da) <= src(db)) (src(da), src(db), da, db, h) else (src(db), src(da), db, da, h)
    }
    val byPair = canon.groupBy(t => (t._1, t._2))
    val np = canon.length.toLong
    val nx = canon.count(t => t._1 != t._2).toLong
    val rows = run("dedup_cross_source").collect()
    assert(rows.length == byPair.size)
    rows.foreach { r =>
      val k = (r.getAs[String]("source_a"), r.getAs[String]("source_b"))
      val in = byPair(k)
      assert(k._1 <= k._2)
      assert(r.getAs[Long]("n_pairs") == in.size.toLong, s"$k")
      assert(r.getAs[Long]("n_docs_involved_a") == in.map(_._3).distinct.size.toLong)
      assert(r.getAs[Long]("n_docs_involved_b") == in.map(_._4).distinct.size.toLong)
      assert(math.abs(r.getAs[Double]("mean_hamming") - q(in.map(_._5).sum.toDouble / in.size, 4)) < 1e-9)
      assert(math.abs(r.getAs[Double]("cross_source_share") - q(nx.toDouble / np, 4)) < 1e-9)
    }
    assert(rows.map(_.getAs[Long]("n_pairs")).sum == np)
  }
}
