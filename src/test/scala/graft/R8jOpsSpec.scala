package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic gates for the round-7 thirty-sixth batch: the
  * attribution-window curve (interval pairs re-derived; the 1h rung
  * pinned to the served events_attribution), the explained-variance
  * ladder (trace mirrored from a JVM covariance, Rayleigh bounds vs a
  * full Jacobi eigensolve, conservation of shares), and tokenizer
  * fertility (per-language sums pinned to the served per-doc
  * text_bpe_encode output). */
class R8jOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)

  private def q(x: Double, dec: Int): Double = {
    val m = math.pow(10, dec)
    (if (x >= 0) math.floor(x * m + 0.5) else -math.floor(-x * m + 0.5)) / m
  }

  test("events_attribution_curve: pairs re-derived per rung; 1h rung equals the served interval join") {
    Tables.register(spark, TestSpark.Sf)
    val ev = spark.sql(
      "select event_id, user_id, ts div 1000000000 as sec, event_type from events")
      .collect().map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[Long]("sec"), r.getAs[String]("event_type")))
    val clicks = ev.filter(_._4 == "click")
    val purch = ev.filter(_._4 == "purchase")
    val byUserP = purch.groupBy(_._2)
    val pairs = clicks.flatMap { case (cid, u, cs, _) =>
      byUserP.getOrElse(u, Array.empty[(Long, Long, Long, String)])
        .filter(p => p._3 >= cs - 86400 && p._3 <= cs)
        .map(p => (cid, p._1, cs - p._3))
    }
    val rows = run("events_attribution_curve").collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val w = r.getAs[Long]("window_s")
      val in = pairs.filter(_._3 <= w)
      assert(r.getAs[Long]("n_pairs") == in.length.toLong, s"w $w")
      assert(r.getAs[Long]("n_credited_purchases") == in.map(_._2).distinct.length.toLong, s"w $w")
      assert(r.getAs[Long]("n_crediting_clicks") == in.map(_._1).distinct.length.toLong, s"w $w")
      assert(math.abs(r.getAs[Double]("purchase_coverage") -
        q(in.map(_._2).distinct.length.toDouble / purch.length, 4)) < 1e-9, s"w $w")
    }
    // the 1h rung IS the served events_attribution join
    val served = run("events_attribution").collect().length.toLong
    assert(rows.find(_.getAs[Long]("window_s") == 3600L).get.getAs[Long]("n_pairs") == served)
    // coverage can only grow with the window
    val cov = rows.sortBy(_.getAs[Long]("window_s")).map(_.getAs[Double]("purchase_coverage"))
    cov.sliding(2).foreach { case Array(a, b) => assert(a <= b + 1e-9) }
  }

  test("pca_variance_explained: trace mirrored, Rayleigh bounds vs Jacobi, shares conserve") {
    Tables.register(spark, TestSpark.Sf)
    // the same rounded 8x8 covariance corner in the JVM
    val vs = spark.sql("select cast(embedding as array<double>) as v from embeddings")
      .collect().map(_.getSeq[Double](0).toArray)
    val n = vs.length
    val mu = Array.tabulate(8)(i => vs.map(_(i)).sum / n)
    val c = Array.tabulate(8, 8)((i, j) =>
      q(vs.map(v => v(i) * v(j)).sum / n - mu(i) * mu(j), 6))
    val trace = (0 until 8).map(i => c(i)(i)).sum
    val (eig, _) = graft.operators.Pca.symmetricEigen(c)
    val rows = run("pca_variance_explained").collect()
    assert(rows.length == 3)
    val byC = rows.map(r => r.getAs[String]("component") -> r).toMap
    val (l1, l2) = (byC("pc1").getAs[Double]("lambda"), byC("pc2").getAs[Double]("lambda"))
    // trace matches the JVM covariance exactly at the rounding grid
    rows.foreach(r => assert(math.abs(r.getAs[Double]("total_variance") - q(trace, 6)) < 1e-5))
    // Rayleigh quotients are variational LOWER bounds on the true tops
    assert(l1 <= eig(0) + 1e-6 && l1 >= eig(0) * 0.9,
      s"lambda1 $l1 vs jacobi ${eig(0)}")
    assert(l2 <= l1 + 1e-9 && l2 <= eig(0) + 1e-6)
    assert(l1 > 0 && l2 > 0)
    // shares conserve: residual closes the ladder at exactly 1
    assert(byC("residual").getAs[Double]("cum_explained_share") == 1.0)
    assert(math.abs(byC("pc1").getAs[Double]("explained_share") - q(l1 / byC("pc1").getAs[Double]("total_variance"), 4)) < 1e-3)
    val shareSum = rows.map(_.getAs[Double]("explained_share")).sum
    assert(math.abs(shareSum - 1.0) < 2e-3)
  }

  test("text_bpe_fertility: per-language sums equal the served per-doc encode output") {
    Tables.register(spark, TestSpark.Sf)
    val enc = run("text_bpe_encode").collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Long]("n_words"), r.getAs[Long]("n_tokens_bpe"))).toMap
    val langOf = spark.sql("select doc_id, lang from documents").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang")).toMap
    val perLang = enc.toSeq.groupBy { case (id, _) => langOf(id) }
      .view.mapValues { xs => (xs.map(_._2._1).sum, xs.map(_._2._2).sum) }.toMap
    val rows = run("text_bpe_fertility").collect()
    assert(rows.map(_.getAs[String]("lang")).toSet == perLang.keySet)
    val fen = {
      val (w, t) = perLang("en"); t.toDouble / w
    }
    rows.foreach { r =>
      val (w, t) = perLang(r.getAs[String]("lang"))
      assert(r.getAs[Long]("n_words") == w, r.getAs[String]("lang"))
      assert(r.getAs[Long]("n_tokens") == t, r.getAs[String]("lang"))
      assert(math.abs(r.getAs[Double]("fertility") - q(t.toDouble / w, 4)) < 1e-9)
      assert(math.abs(r.getAs[Double]("fertility_vs_en") - q((t.toDouble / w) / fen, 4)) < 1e-9)
      assert(r.getAs[Double]("fertility") >= 1.0)
    }
    // the vocabulary was trained on the whole corpus but merges are
    // a-z only: non-latin-script languages tokenize as OOV singletons
    assert(rows.find(_.getAs[String]("lang") == "en").get.getAs[Double]("fertility_vs_en") == 1.0)
  }
}
