package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic gates for the round-7 seventeenth batch: PQ codebook
  * balance (census, grid entropy, and dead codes re-derived from the
  * served code/codebook views) and minhash calibration (every bin
  * refolded from the independently oracle-checked verify stage). */
class R7qOpsSpec extends AnyFunSuite {
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

  // ---------------- vec_pq_codebook_balance ----------------

  test("vec_pq_codebook_balance: census, grid entropy, and dead codes match the served views") {
    val rows = run("vec_pq_codebook_balance").collect()
    // the run above ensured the chain views exist in this session
    val codes = spark.table("g_pq_codes").collect()
      .map(r => (r.getAs[Number](r.fieldIndex("m")).longValue,
        r.getAs[Number](r.fieldIndex("cell")).longValue))
    val book = spark.table("g_pq_ct").collect()
      .map(r => (r.getAs[Number](r.fieldIndex("m")).longValue,
        r.getAs[Number](r.fieldIndex("cell")).longValue)).distinct
    val usage = codes.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val byM = book.groupBy(_._1)
    assert(rows.length == byM.size)
    rows.foreach { r =>
      val m = r.getAs[Long]("subspace")
      val cells = byM(m)
      val cs = cells.map(c => usage.getOrElse(c, 0L))
      val n = cs.sum
      val slnk = cs.filter(_ > 0).map(c => c * lnq(c)).sum
      val h = (n * lnq(n) - slnk).toDouble / (n.toDouble * 1e9)
      assert(r.getAs[Long]("n_codes") == cells.size.toLong, s"m=$m codes")
      assert(r.getAs[Long]("n_dead") == cs.count(_ == 0).toLong, s"m=$m dead")
      assert(math.abs(r.getAs[Double]("usage_entropy") - q(h, 6)) < 1e-9, s"m=$m H")
      assert(math.abs(r.getAs[Double]("usage_perplexity") - q(math.exp(h), 4)) < 1e-9)
      assert(math.abs(r.getAs[Double]("max_code_share") - q(cs.max.toDouble / n, 4)) < 1e-9)
      // perplexity cannot exceed the number of LIVE codes
      assert(r.getAs[Double]("usage_perplexity") <= (cells.size - cs.count(_ == 0)) + 1e-6)
    }
    // every encoded (id, m) lands in a trained codebook cell
    assert(codes.forall(c => book.contains(c)))
  }

  // ---------------- dedup_minhash_calibration ----------------

  test("dedup_minhash_calibration: every bin refolds from the oracle-checked verify stage") {
    val verify = run("dedup_minhash_verify").collect()
      .map(r => (r.getAs[Double]("jaccard_est"), r.getAs[Double]("jaccard_true")))
    val byBin = verify.groupBy { case (_, jt) => math.floor(jt * 10).toLong }
    val rows = run("dedup_minhash_calibration").collect()
    assert(rows.length == byBin.size)
    rows.foreach { r =>
      val b = r.getAs[Long]("true_jaccard_decile")
      val in = byBin(b)
      val n = in.size.toLong
      val sest = in.map(p => qL(p._1 * 1e4)).sum
      val strue = in.map(p => qL(p._2 * 1e4)).sum
      val serr = in.map(p => qL(math.abs(p._1 - p._2) * 1e4)).sum
      assert(r.getAs[Long]("n_pairs") == n, s"bin=$b")
      assert(math.abs(r.getAs[Double]("bin_lo") - q(b / 10.0, 1)) < 1e-9)
      assert(math.abs(r.getAs[Double]("mean_est") - q(sest.toDouble / 1e4 / n, 4)) < 1e-9)
      assert(math.abs(r.getAs[Double]("mean_true") - q(strue.toDouble / 1e4 / n, 4)) < 1e-9)
      assert(math.abs(r.getAs[Double]("mean_abs_err") - q(serr.toDouble / 1e4 / n, 4)) < 1e-9)
      assert(math.abs(r.getAs[Double]("mean_bias") - q((sest - strue).toDouble / 1e4 / n, 4)) < 1e-9)
      // bias is bounded by the absolute error by the triangle inequality
      assert(math.abs(r.getAs[Double]("mean_bias")) <= r.getAs[Double]("mean_abs_err") + 1e-9)
    }
    assert(rows.map(_.getAs[Long]("n_pairs")).sum == verify.length.toLong)
  }
}
