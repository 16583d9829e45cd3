package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic gates for the round-7 fourteenth batch: Jensen–Shannon
  * source pairs (both KL halves refolded from a JVM word census on
  * the same integer grid; the [0, ln 2] bound pinned), peak session
  * concurrency (the full two-level sweep re-derived from raw events;
  * conservation and the closed-at-the-end law pinned), and the
  * shingle-size curve (every width's doc-frequency census re-hashed
  * from raw text through the same md5-prefix ids). */
class R7nOpsSpec extends AnyFunSuite {
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

  private lazy val docs: Seq[(Long, String, String)] =
    spark.read.parquet(s"${TestSpark.Sf}/documents.parquet").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"), r.getAs[String]("text"))).toSeq
  private def words(t: String): Seq[String] =
    t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq

  // ---------------- text_js_divergence ----------------

  test("text_js_divergence: both KL halves refold from the JVM word census; JS stays in [0, ln 2]") {
    val wf = docs.flatMap { case (_, src, t) => words(t).map(src -> _) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bySrc = wf.groupBy(_._1._1).map { case (s, m) =>
      s -> m.map { case ((_, w), k) => w -> k }
    }
    val ns = bySrc.view.mapValues(_.values.sum).toMap
    val rows = run("text_js_divergence").collect()
    val srcs = ns.keys.toSeq.sorted
    assert(rows.length == srcs.size * (srcs.size - 1) / 2)
    rows.foreach { r =>
      val (s1, s2) = (r.getAs[String]("source_a"), r.getAs[String]("source_b"))
      assert(s1 < s2)
      val (n1, n2) = (ns(s1), ns(s2))
      assert(r.getAs[Long]("n_tokens_a") == n1)
      assert(r.getAs[Long]("n_tokens_b") == n2)
      val vocab = bySrc(s1).keySet ++ bySrc(s2).keySet
      var sp = 0L; var sq = 0L
      vocab.foreach { w =>
        val c1 = bySrc(s1).getOrElse(w, 0L)
        val c2 = bySrc(s2).getOrElse(w, 0L)
        if (c1 > 0) sp += c1 * (lnq(2 * c1 * n2) - lnq(c1 * n2 + c2 * n1))
        if (c2 > 0) sq += c2 * (lnq(2 * c2 * n1) - lnq(c1 * n2 + c2 * n1))
      }
      val js = (sp.toDouble / n1 + sq.toDouble / n2) / 2.0 / 1e9
      assert(math.abs(r.getAs[Double]("js_nats") - q(js, 6)) < 1e-9, s"$s1/$s2")
      assert(math.abs(r.getAs[Double]("js_normalized") - q(js / math.log(2.0), 4)) < 1e-9)
      // Lin 1991: JS is bounded by ln 2 (grid slack only)
      assert(js >= -1e-6 && js <= math.log(2.0) + 1e-6)
    }
  }

  // ---------------- events_peak_concurrency ----------------

  test("events_peak_concurrency: the two-level sweep matches a JVM interval walk; laws hold") {
    Tables.register(spark, TestSpark.Sf)
    val ev = spark.sql("select user_id, event_id, ts, ts div 1000000000 as sec from events")
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[Long]("ts"), r.getAs[Long]("sec")))
    // sessions exactly as served: new-session flags in (ts, event_id)
    // order, session ids accumulated in (sec, event_id) order
    val sessions = ev.groupBy(_._1).values.flatMap { es =>
      val byTs = es.sortBy(e => (e._3, e._2))
      val flags = byTs.zipWithIndex.map { case (e, i) =>
        val ns = if (i == 0 || e._4 - byTs(i - 1)._4 > 1800) 1 else 0
        e._2 -> ns // event_id -> new_s
      }.toMap
      val bySec = es.sortBy(e => (e._4, e._2))
      var sid = 0L
      val tagged = bySec.map { e =>
        sid += flags(e._2); (sid, e._4)
      }
      tagged.groupBy(_._1).values.map(g => (g.map(_._2).min, g.map(_._2).max))
    }.toSeq
    val net = collection.mutable.Map.empty[Long, (Long, Long, Long)] // sec -> (net, starts, ends)
    sessions.foreach { case (st, fin) =>
      val a = net.getOrElse(st, (0L, 0L, 0L)); net(st) = (a._1 + 1, a._2 + 1, a._3)
      val b = net.getOrElse(fin + 1, (0L, 0L, 0L)); net(fin + 1) = (b._1 - 1, b._2, b._3 + 1)
    }
    val byDay = net.toSeq.groupBy(_._1 / 86400)
    val dayAgg = byDay.toSeq.sortBy(_._1).map { case (day, rows0) =>
      val o = rows0.sortBy(_._1)
      var cum = 0L; var mx = Long.MinValue
      o.foreach { case (_, (n, _, _)) => cum += n; if (cum > mx) mx = cum }
      (day, cum, mx, o.map(_._2._2).sum, o.map(_._2._3).sum) // (day, dnet, mx, starts, ends)
    }
    var carry = 0L
    val expected = dayAgg.map { case (day, dnet, mx, st, en) =>
      val row = (day, st, en, carry + mx, carry + dnet)
      carry += dnet; row
    }
    val globalPeak = expected.map(_._4).max
    val rows = run("events_peak_concurrency").collect().sortBy(_.getAs[Long]("day"))
    assert(rows.length == expected.size)
    rows.zip(expected).foreach { case (r, (day, st, en, pk, eod)) =>
      assert(r.getAs[Long]("day") == day)
      assert(r.getAs[Long]("n_starts") == st, s"day=$day starts")
      assert(r.getAs[Long]("n_ends") == en, s"day=$day ends")
      assert(r.getAs[Long]("day_peak") == pk, s"day=$day peak")
      assert(r.getAs[Long]("eod_concurrency") == eod, s"day=$day eod")
      assert(r.getAs[Long]("global_peak") == globalPeak)
    }
    // conservation: every session opens once and closes once, and the
    // sweep ends flat
    assert(rows.map(_.getAs[Long]("n_starts")).sum == sessions.size.toLong)
    assert(rows.map(_.getAs[Long]("n_ends")).sum == sessions.size.toLong)
    assert(rows.last.getAs[Long]("eod_concurrency") == 0L)
    assert(rows.map(_.getAs[Long]("day_peak")).max == globalPeak)
  }

  // ---------------- dedup_shingle_curve ----------------

  test("dedup_shingle_curve: every width's df census re-hashes from raw text; monotone laws hold") {
    def md5p15(s: String): Long = {
      val dig = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(dig.map("%02x".format(_)).mkString.take(15), 16)
    }
    val widths = Seq(3, 5, 7, 9)
    val census = widths.map { w =>
      val docGrams = docs.map { case (id, _, t) =>
        val ws = words(t)
        id -> ws.sliding(w).filter(_.size == w).map(g => md5p15(g.mkString(" "))).toSet
      }
      val df = docGrams.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
      w -> df
    }.toMap
    val rows = run("dedup_shingle_curve").collect()
    assert(rows.map(_.getAs[Long]("shingle_w")).sorted.toSeq == widths.map(_.toLong))
    rows.foreach { r =>
      val w = r.getAs[Long]("shingle_w").toInt
      val df = census(w)
      val nSh = df.values.sum
      val nDis = df.size.toLong
      assert(r.getAs[Long]("n_shingles") == nSh, s"w=$w rows")
      assert(r.getAs[Long]("n_distinct") == nDis, s"w=$w distinct")
      assert(math.abs(r.getAs[Double]("distinct_ratio") - q(nDis.toDouble / nSh, 4)) < 1e-9)
      assert(r.getAs[Long]("collision_mass") == df.values.map(c => c * (c - 1) / 2).sum, s"w=$w mass")
      assert(r.getAs[Long]("max_df") == df.values.max)
      // p99 by ascending-df rank selection over the df domain
      val byDf = df.values.groupBy(identity).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
      var cm = 0L
      val p99 = byDf.collectFirst { case (d0, m) if { cm += m; cm * 100 >= nDis * 99 } => d0 }.get
      assert(r.getAs[Long]("p99_df") == p99, s"w=$w p99")
      val boiler = df.values.filter(_ >= 5).sum
      assert(math.abs(r.getAs[Double]("boilerplate_share") - q(boiler.toDouble / nSh, 4)) < 1e-9)
    }
    // Broder's trade-off is visible: longer shingles → fewer grams,
    // more of them unique, and strictly less candidate-pair mass
    val byW = rows.map(r => r.getAs[Long]("shingle_w") -> r).toMap
    val sh = widths.map(w => byW(w.toLong).getAs[Long]("n_shingles"))
    val cm2 = widths.map(w => byW(w.toLong).getAs[Long]("collision_mass"))
    assert(sh.sliding(2).forall { case Seq(a, b) => a >= b })
    assert(cm2.sliding(2).forall { case Seq(a, b) => a >= b })
  }
}
