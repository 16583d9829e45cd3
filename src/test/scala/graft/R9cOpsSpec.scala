package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-9 batch C:
  *
  *  - `decontaminate_ngram_curve` — the n-gram-length knob, pinned to
  *    an exact JVM mirror AND to the n=5 `decontaminate` key (same
  *    pair set, same shingle totals);
  *  - `text_lang_mix` — window-level code-switching profile, exact
  *    JVM mirror;
  *  - `events_periodogram` — quantized-trig DFT, exact JVM mirror +
  *    the weekly-cycle dominance the corpus genuinely carries.
  */
class R9cOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)
  private def r4(x: Double) = graft.operators.PcaSolve.roundAway(x, 4)

  private lazy val docs: Map[Long, Array[String]] = {
    Tables.register(spark, TestSpark.Sf)
    spark.sql("select doc_id, text from documents").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").toLowerCase.split("\\s+", -1)).toMap
  }

  test("decontaminate_ngram_curve: exact JVM mirror, monotone in n, n=5 row equals the decontaminate key") {
    def shingles(ws: Array[String], n: Int): Set[String] =
      if (ws.length < n) Set.empty
      else (0 to ws.length - n).map(i => ws.slice(i, i + n).mkString(" ")).toSet
    val rows = run("decontaminate_ngram_curve").collect()
      .map(r => r.getAs[Long]("n") -> r).toMap
    assert(rows.keySet == Set(5L, 8L, 13L))
    var prevPairs = Long.MaxValue
    for (n <- Seq(5, 8, 13)) {
      val ev = docs.filter(_._1 % 50 == 0).view.mapValues(shingles(_, n)).toMap
      val tr = docs.filter(_._1 % 50 != 0).view.mapValues(shingles(_, n)).toMap
      val pairs = for {
        (t, tg) <- tr.toSeq; (e, eg) <- ev.toSeq
        shared = tg.intersect(eg).size if shared > 0
      } yield ((t, e), shared.toLong)
      val r = rows(n.toLong)
      assert(r.getAs[Long]("n_contaminated_pairs") == pairs.size.toLong, s"n=$n pairs")
      assert(r.getAs[Long]("n_train_docs_flagged") == pairs.map(_._1._1).distinct.size.toLong)
      assert(r.getAs[Long]("n_eval_docs_flagged") == pairs.map(_._1._2).distinct.size.toLong)
      assert(r.getAs[Long]("total_shared_shingles") == pairs.map(_._2).sum, s"n=$n total")
      assert(r.getAs[Long]("n_contaminated_pairs") <= prevPairs, s"curve not monotone at n=$n")
      prevPairs = r.getAs[Long]("n_contaminated_pairs")
    }
    // cross-operator witness: the n=5 rung IS the decontaminate key
    val base = run("decontaminate").collect()
    assert(rows(5L).getAs[Long]("n_contaminated_pairs") == base.length.toLong)
    assert(rows(5L).getAs[Long]("total_shared_shingles") ==
      base.map(_.getAs[Long]("n_shared_shingles")).sum)
  }

  test("text_lang_mix: exact JVM mirror of windows, classification, majority, switches") {
    val stop = Map(
      "en" -> Set("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
      "de" -> Set("der", "die", "das", "und", "ist", "von", "mit", "ein", "zu", "den"),
      "fr" -> Set("le", "la", "les", "et", "est", "un", "une", "des", "dans", "que"),
      "es" -> Set("el", "los", "y", "es", "en", "un", "una", "de", "con", "por"))
    def classify(win: Seq[String]): String = {
      val h = Seq("en", "de", "fr", "es").map(l => l -> win.count(stop(l))).toMap
      if (h.values.sum == 0) "und"
      else if (h("en") >= h("de") && h("en") >= h("fr") && h("en") >= h("es")) "en"
      else if (h("de") >= h("fr") && h("de") >= h("es")) "de"
      else if (h("fr") >= h("es")) "fr" else "es"
    }
    val got = run("text_lang_mix").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got.size == docs.size)
    docs.foreach { case (id, ws) =>
      val wins = ws.grouped(16).toSeq
      val langs = wins.map(w => classify(w.toSeq))
      val cls = langs.filter(_ != "und")
      val r = got(id)
      assert(r.getAs[Long]("n_windows") == wins.size.toLong, s"doc $id windows")
      assert(r.getAs[Long]("n_classified") == cls.size.toLong, s"doc $id classified")
      assert(r.getAs[Long]("n_langs") == cls.distinct.size.toLong, s"doc $id langs")
      val switches = cls.sliding(2).count { case Seq(a, b) => a != b; case _ => false }
      assert(r.getAs[Long]("n_switches") == switches.toLong, s"doc $id switches")
      if (cls.isEmpty) {
        assert(r.getAs[String]("majority_lang") == "und")
        assert(r.getAs[java.lang.Double]("majority_share") == null)
      } else {
        val byL = cls.groupBy(identity).view.mapValues(_.size).toMap
        val best = byL.values.max
        val maj = byL.filter(_._2 == best).keys.min
        assert(r.getAs[String]("majority_lang") == maj, s"doc $id majority")
        assert(r.getAs[Double]("majority_share") == r4(best.toDouble / cls.size), s"doc $id share")
      }
    }
  }

  test("events_periodogram: exact JVM mirror; the weekly cycle dominates this corpus") {
    Tables.register(spark, TestSpark.Sf)
    val daily = spark.sql(
      "select ts div 1000000000 div 86400 as day, count(*) as n from events group by 1")
      .collect().map(r => r.getAs[Long]("day") -> r.getAs[Long]("n"))
    val m = daily.length.toLong
    val s = daily.map(_._2).sum
    val rows = run("events_periodogram").collect()
      .map(r => r.getAs[Long]("period_days") -> r).toMap
    assert(rows.keySet == Set(2L, 3L, 7L, 14L))
    val powers = Seq(2, 3, 7, 14).map { p =>
      val cosA = Array.tabulate(p)(k => Math.round(Math.cos(2 * Math.PI * k / p) * 1e6))
      val sinA = Array.tabulate(p)(k => Math.round(Math.sin(2 * Math.PI * k / p) * 1e6))
      var sc = 0L; var ss = 0L; var cc = 0L; var cs = 0L
      daily.foreach { case (day, n) =>
        val k = (day % p).toInt
        sc += n * cosA(k); ss += n * sinA(k); cc += cosA(k); cs += sinA(k)
      }
      val a = (m * sc - s * cc).toDouble / 1000000.0 / m
      val b = (m * ss - s * cs).toDouble / 1000000.0 / m
      p.toLong -> (a * a + b * b)
    }.toMap
    val tot = powers.values.sum
    powers.foreach { case (p, pw) =>
      assert(rows(p).getAs[Double]("power") == r4(pw), s"p=$p power")
      assert(rows(p).getAs[Double]("power_share") == r4(pw / tot), s"p=$p share")
    }
    // exactly one dominant row, and it is the mirrored argmax with
    // ties to the smallest period (period-7 dominance holds at sf0.01
    // where the dow profile has enough cycles; the 7-day sf0.001 slice
    // is too short to pin a corpus-specific winner — stated)
    val best = powers.values.max
    val expectDom = powers.filter(_._2 == best).keys.min
    assert(Seq(2L, 3L, 7L, 14L).map(p => rows(p).getAs[Long]("is_dominant")).sum == 1L)
    assert(rows(expectDom).getAs[Long]("is_dominant") == 1L,
      s"dominant row must be the argmax period $expectDom")
  }
}
