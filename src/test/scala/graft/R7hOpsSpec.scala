package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Prf

/** Semantic gates for the round-7 seventh batch: KMV pair overlap,
  * per-source KL divergence, Simpson diversity. */
class R7hOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)

  private def q(x: Double, dec: Int): Double = {
    val m = math.pow(10, dec)
    (if (x >= 0) math.floor(x * m + 0.5) else -math.floor(-x * m + 0.5)) / m
  }

  /** (source, word) -> count over the whitespace-split corpus. */
  private def sourceWords(): Map[(String, String), Long] = {
    Tables.register(spark, TestSpark.Sf)
    spark.sql(
      "select source, wd from (select source, split(lower(text), '\\\\s+') as ws from documents) " +
        "lateral view explode(ws) _e as wd")
      .collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
  }

  test("sketch_kmv_overlap: union sketch, jaccard estimate, and exact overlap match the JVM mirror") {
    val sw = sourceWords()
    val hashes = sw.keys.groupBy(_._1).view
      .mapValues(_.map(k => Prf.prf("kmv", k._2)).toSet).toMap
    val rows = run("sketch_kmv_overlap").collect()
    val srcs = hashes.keySet.toSeq.sorted
    assert(rows.length == srcs.size * (srcs.size - 1) / 2)
    rows.foreach { r =>
      val (sa, sb) = (r.getAs[String]("source_a"), r.getAs[String]("source_b"))
      assert(sa < sb)
      val (ha, hb) = (hashes(sa), hashes(sb))
      val inter = (ha & hb).size.toLong
      val union = (ha | hb).size.toLong
      assert(r.getAs[Long]("n_union_exact") == union, s"$sa/$sb")
      assert(math.abs(r.getAs[Double]("jaccard_exact") - q(inter.toDouble / union, 4)) < 1e-9)
      // the union sketch is the 64 smallest of the two 64-min shortlists
      val ka = ha.toSeq.sorted.take(64)
      val kb = hb.toSeq.sorted.take(64)
      val uk = (ka ++ kb).distinct.sorted.take(64)
      val nk = uk.length
      val nboth = uk.count(h => ka.contains(h) && kb.contains(h))
      val estU =
        if (nk < 64) nk.toDouble
        else 63.0 * 1152921504606846976.0 / (uk.last + 1).toDouble
      assert(math.abs(r.getAs[Double]("union_est") - q(estU, 4)) < 1e-9, s"$sa/$sb")
      assert(math.abs(r.getAs[Double]("jaccard_est") - q(nboth.toDouble / nk, 4)) < 1e-9, s"$sa/$sb")
      assert(math.abs(r.getAs[Double]("union_rel_err") -
        q(math.abs(estU - union) / union, 4)) < 1e-9, s"$sa/$sb")
    }
  }

  test("text_kl_divergence: the ln-grid bigint sum and both outputs match the JVM mirror") {
    val sw = sourceWords()
    def lg(x: Long): Long = {
      val v = math.log(x.toDouble) * 1e9
      (if (v >= 0) math.floor(v + 0.5) else -math.floor(-v + 0.5)).toLong
    }
    val bySrc = sw.groupBy(_._1._1)
    val cw = sw.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val n = sw.values.sum
    val rows = run("text_kl_divergence").collect()
    assert(rows.length == bySrc.size)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val wf = bySrc(src).map { case ((_, w), k) => (w, k) }
      val nSrc = wf.values.sum
      assert(r.getAs[Long]("n_tokens") == nSrc)
      assert(r.getAs[Long]("n_types") == wf.size.toLong)
      val s9 = wf.map { case (w, k) => k * (lg(k) - lg(nSrc) - lg(cw(w)) + lg(n)) }.sum
      val kl = s9.toDouble / nSrc / 1e9
      assert(math.abs(r.getAs[Double]("kl_nats") - q(kl, 6)) < 1e-9, src)
      assert(math.abs(r.getAs[Double]("perplexity_ratio") - q(math.exp(kl), 4)) < 2e-4, src)
      // Gibbs' inequality: KL >= 0, and a strict subset distribution diverges
      assert(r.getAs[Double]("kl_nats") >= 0.0, src)
    }
  }

  test("text_simpson: exact collision probability, diversity, and effective vocabulary") {
    val sw = sourceWords()
    val rows = run("text_simpson").collect()
    val bySrc = sw.groupBy(_._1._1)
    assert(rows.length == bySrc.size)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val ks = bySrc(src).values.toSeq
      val n = ks.sum
      val rep = ks.map(k => k * (k - 1)).sum
      assert(r.getAs[Long]("n_tokens") == n)
      assert(r.getAs[Long]("n_types") == ks.length.toLong)
      val lam = rep.toDouble / (n * (n - 1)).toDouble
      assert(math.abs(r.getAs[Double]("simpson_lambda") - q(lam, 6)) < 1e-9, src)
      assert(math.abs(r.getAs[Double]("diversity") - q(1.0 - lam, 6)) < 1e-9, src)
      if (rep > 0) {
        assert(math.abs(r.getAs[Double]("eff_vocab") -
          q((n * (n - 1)).toDouble / rep, 2)) < 1e-9, src)
      }
    }
  }
}
