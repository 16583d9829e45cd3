package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic gates for the round-6 training-data batch: skip-gram
  * co-occurrence mining (full JVM recount of every pair at every
  * distance) and curriculum staging (ntile quartile manifest mirrored
  * with explicit tile arithmetic).
  */
class R6gOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)

  private lazy val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
    .selectExpr("doc_id", "text", "source").collect()
    .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"), r.getAs[String]("source")))

  test("text_cooccur: per-distance pair counts match a full JVM recount") {
    val counts = scala.collection.mutable.Map.empty[(String, String), Array[Long]]
    docs.foreach { case (_, text, _) =>
      val ws = text.toLowerCase.split("\\s+")
      for (i <- ws.indices; dist <- 1 to 3; if i + dist < ws.length) {
        val (a, b) = (ws(i), ws(i + dist))
        val key = if (a <= b) (a, b) else (b, a)
        val arr = counts.getOrElseUpdate(key, Array(0L, 0L, 0L))
        arr(dist - 1) += 1
      }
    }
    val ranked = counts.toSeq
      .map { case (k, a) => (k, a(0), a(1), a(2), a.sum) }
      .sortBy { case ((w1, w2), _, _, _, tot) => (-tot, w1, w2) }
    val top = ranked.take(20)
    val rows = run("text_cooccur").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val k = (r.getAs[String]("w1"), r.getAs[String]("w2"))
      val e = top(r.getAs[Long]("rn").toInt - 1)
      assert(e._1 == k, s"rank ${r.getAs[Long]("rn")}")
      assert(r.getAs[Long]("n_d1") == e._2 && r.getAs[Long]("n_d2") == e._3 &&
        r.getAs[Long]("n_d3") == e._4 && r.getAs[Long]("n_total") == e._5)
    }
  }

  test("data_curriculum: quartile manifest matches explicit tile arithmetic") {
    def round6(x: Double) = {
      val m = 1e6
      (if (x >= 0) math.floor(x * m + 0.5) else -math.floor(-x * m + 0.5)) / m
    }
    val scored = docs.map { case (id, text, source) =>
      val nWords = text.split("\\s+").length
      val nChars = text.length
      val nAlpha = text.count(c => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))
      val q = round6((if (nWords >= 20 && nWords <= 80) 1.0 else 0.5) * (nAlpha.toDouble / nChars))
      (source, id, nWords.toLong, q)
    }
    val expect = scored.groupBy(_._1).flatMap { case (source, ds) =>
      val sorted = ds.sortBy { case (_, id, _, q) => (q, id) }
      val n = sorted.length; val base = n / 4; val rem = n % 4
      // ntile(4): the first `rem` tiles get base+1 rows
      val stages = (1 to 4).flatMap(t =>
        Seq.fill(if (t <= rem) base + 1 else base)(t))
      sorted.zip(stages).groupBy(_._2).map { case (stage, rs) =>
        val qs = rs.map(_._1._4)
        (source, stage.toLong) ->
          (rs.length.toLong, rs.map(_._1._3).sum, qs.min, qs.max,
            qs.map(q => BigDecimal(q).setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / rs.length)
      }
    }
    val rows = run("data_curriculum").collect()
    assert(rows.length == expect.size && rows.nonEmpty)
    rows.foreach { r =>
      val (n, tok, qmin, qmax, avg) = expect((r.getAs[String]("source"), r.getAs[Long]("stage")))
      assert(r.getAs[Long]("n_docs") == n && r.getAs[Long]("n_tokens") == tok)
      assert(math.abs(r.getAs[Double]("min_quality") - qmin) < 1e-9)
      assert(math.abs(r.getAs[Double]("max_quality") - qmax) < 1e-9)
      assert(math.abs(r.getAs[Double]("avg_quality") - avg) < 0.00011)
    }
    // within a source, later stages are at least as clean: stage
    // boundaries are non-decreasing in quality
    rows.groupBy(_.getAs[String]("source")).values.foreach { rs =>
      val byStage = rs.sortBy(_.getAs[Long]("stage"))
      byStage.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Double]("max_quality") <= b.getAs[Double]("min_quality") + 1e-9)
        case _ => ()
      }
    }
  }

  test("text_langid_eval: confusion matrix matches a JVM vote mirror and conserves docs") {
    val stop = Map(
      "en" -> Set("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
      "de" -> Set("der", "die", "das", "und", "ist", "von", "mit", "ein", "zu", "den"),
      "fr" -> Set("le", "la", "les", "et", "est", "un", "une", "des", "dans", "que"),
      "es" -> Set("el", "los", "y", "es", "en", "un", "una", "de", "con", "por"))
    val truth = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .selectExpr("doc_id", "lang").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang")).toMap
    val expect = docs.map { case (id, text, _) =>
      val ws = text.toLowerCase.split("\\s+")
      def hits(l: String) = ws.count(stop(l))
      val (en, de, fr, es) = (hits("en"), hits("de"), hits("fr"), hits("es"))
      val pred =
        if (en >= de && en >= fr && en >= es) "en"
        else if (de >= fr && de >= es) "de"
        else if (fr >= es) "fr" else "es"
      (truth(id), pred)
    }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val rows = run("text_langid_eval").collect()
    val got = rows.map(r => (r.getAs[String]("true_lang"), r.getAs[String]("pred_lang")) ->
      r.getAs[Long]("n")).toMap
    assert(got == expect)
    // conservation + recall definition
    assert(got.values.sum == docs.length.toLong)
    val rowTot = got.groupBy(_._1._1).map { case (t, m) => t -> m.values.sum }
    rows.foreach { r =>
      val rec = r.getAs[Long]("n").toDouble / rowTot(r.getAs[String]("true_lang"))
      assert(math.abs(r.getAs[Double]("recall") - rec) < 0.00011)
    }
  }

  test("data_split: the hash split is the PRF mirror's and fractions track 80/10/10") {
    val expect = docs.map { case (id, text, source) =>
      val b = graft.functions.Prf.prfMod(100, "split", id)
      val split = if (b < 80) "train" else if (b < 90) "val" else "test"
      ((source, split), text.split("\\s+").length.toLong)
    }.groupBy(_._1).map { case (k, v) => k -> (v.length.toLong, v.map(_._2).sum) }
    val rows = run("data_split").collect()
    assert(rows.length == expect.size)
    rows.foreach { r =>
      val (n, tok) = expect((r.getAs[String]("source"), r.getAs[String]("split")))
      assert(r.getAs[Long]("n_docs") == n && r.getAs[Long]("n_tokens") == tok)
    }
    // realized global fractions stay near the intended 80/10/10 (the
    // PRF is uniform; 3-sigma binomial bounds at corpus size)
    val bySplit = rows.groupBy(_.getAs[String]("split")).view
      .mapValues(_.map(_.getAs[Long]("n_docs")).sum.toDouble).toMap
    val total = bySplit.values.sum
    assert(math.abs(bySplit("train") / total - 0.80) < 0.06)
    assert(math.abs(bySplit("val") / total - 0.10) < 0.05)
    assert(math.abs(bySplit("test") / total - 0.10) < 0.05)
  }

  test("sketch_f2_ams: the 16 signed sums and both moments match the exact mirror") {
    val freq = docs.flatMap(_._2.toLowerCase.split("\\s+"))
      .groupBy(identity).map { case (w, vs) => w -> vs.length.toLong }
    val f2 = freq.values.map(c => c * c).sum
    val zs = (0 until 16).map { t =>
      freq.map { case (w, c) =>
        c * (1 - 2 * graft.functions.Prf.prfMod(2, s"ams$t", w))
      }.sum
    }
    val est = zs.map(z => z.toDouble * z).sum / 16
    val row = run("sketch_f2_ams").collect().head
    assert(row.getAs[Long]("n_types") == freq.size.toLong)
    assert(row.getAs[Long]("f2_exact") == f2)
    assert(math.abs(row.getAs[Double]("f2_est") - est) < 0.5 + est * 1e-9)
    assert(math.abs(row.getAs[Double]("rel_err") - math.abs(est - f2) / f2) < 1e-3)
    // the AMS bound with 16 estimators: the mean lands within a few
    // standard errors of the truth (std err = sqrt(2/16) ~ 35%)
    assert(math.abs(est - f2) < 2.0 * f2)
  }

  test("text_centroid_classify: the per-source census matches a full Rocchio mirror") {
    def round6(x: Double) = {
      val m = 1e6
      (if (x >= 0) math.floor(x * m + 0.5) else -math.floor(-x * m + 0.5)) / m
    }
    val presence = docs.map { case (id, text, source) =>
      (id, source, text.toLowerCase.split("\\s+").toSet)
    }
    val df = scala.collection.mutable.Map.empty[(String, String), Long]
    presence.foreach { case (_, s, ws) =>
      ws.foreach(w => df((s, w)) = df.getOrElse((s, w), 0L) + 1L)
    }
    val norms = df.toSeq.groupBy(_._1._1)
      .map { case (s, es) => s -> math.sqrt(es.map(e => (e._2 * e._2).toDouble).sum) }
    val preds = presence.map { case (id, s, ws) =>
      val scores = norms.keys.flatMap { cand =>
        val dot = ws.toSeq.map(w => df.getOrElse((cand, w), 0L)).sum
        if (dot > 0)
          Some(cand -> round6(dot / (math.sqrt(ws.size.toDouble) * norms(cand))))
        else None
      }
      // max(struct(score, source)): score first, source string on ties
      val best = scores.maxBy { case (cand, sc) => (sc, cand) }._1
      (s, best)
    }
    val expect = preds.groupBy(_._1).map { case (s, ps) =>
      s -> (ps.length.toLong, ps.count(p => p._2 == s).toLong)
    }
    val rows = run("text_centroid_classify").collect()
    assert(rows.length == expect.size && rows.nonEmpty)
    rows.foreach { r =>
      val (n, correct) = expect(r.getAs[String]("true_source"))
      assert(r.getAs[Long]("n_docs") == n)
      assert(r.getAs[Long]("n_correct") == correct)
      assert(math.abs(r.getAs[Double]("accuracy") - correct.toDouble / n) < 0.00011)
    }
    // the classifier beats the 1/|sources| chance floor overall — the
    // centroids carry real signal
    val (tot, corr) = expect.values.foldLeft((0L, 0L)) { case ((a, b), (n, c)) => (a + n, b + c) }
    assert(corr.toDouble / tot > 1.0 / expect.size)
  }
}
