package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sqlgen.{Gen, SparkDialect}

/** Recall receipts for the residual-IVFADC serving rung
  * (ann_recall_eval_ivfpq_res, §2 row 4d2) on a CLUSTERED corpus —
  * the IvfRecallSpec protocol: the driver's bench corpus is isotropic
  * (no partitioning ANN can reach high recall at a low probe fraction
  * there — a property of the data, stated in SURVEY §4), so the real
  * recall claim runs on a 50-cluster corpus with the shape of real
  * embedding corpora. The key computes recall against its own
  * in-query brute-cosine truth, so no JVM mirror is needed: the spec
  * gates the measured recall and the probed candidate fraction. */
class RpqRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val N = 4000
  private val Dim = 64
  private val NClusters = 50
  private val Sigma = 0.1

  test("residual IVFADC: pure-ADC recall in the PQ band, probing <= 15% of a clustered corpus") {
    import spark.implicits._
    graft.functions.DotProduct.register(spark)
    val rnd = new scala.util.Random(7)
    val cents = Array.fill(NClusters) {
      val c = Array.fill(Dim)(rnd.nextGaussian())
      val n = math.sqrt(c.map(x => x * x).sum)
      c.map(_ / n)
    }
    val corpus = Array.tabulate(N) { i =>
      val c = cents(i % NClusters)
      (i.toLong, c.map(x => (x + Sigma * rnd.nextGaussian()).toFloat).toSeq,
        (i % NClusters).toLong)
    }
    corpus.toSeq.toDF("vec_id", "embedding", "label")
      .createOrReplaceTempView("embeddings")
    try {
      val rows = spark.sql(new Gen(SparkDialect).sql("ann_recall_eval_ivfpq_res"))
        .collect()
      assert(rows.length == graft.sqlgen.Wm.QueryIds.size)
      val recalls = rows.map(_.getAs[Double]("recall10"))
      val cands = rows.map(_.getAs[Long]("n_cand"))
      val meanRecall = recalls.sum / recalls.length
      val maxFrac = cands.max.toDouble / N
      info(f"mean recall@10 = $meanRecall%.2f, max candidate fraction = $maxFrac%.3f")
      // measured 0.34 mean PURE-ADC recall at 7.8% candidates on this
      // corpus — IN the PQ band (index_recall_ladder: raw-PQ full-scan
      // 0.30) and ABOVE it, consistent with the measured residual
      // distortion win: within a probed cell the candidates differ by
      // the sigma=0.1 residual noise, which an 8x16 code budget
      // quantizes coarsely — the ADC stage is a shortlist builder (its
      // production serving pairs it with exact rerank, the
      // vec_topk_ivf_pq_rerank / ann_refine_curve pattern). The gates
      // pin the honest band, not an aspirational number.
      assert(meanRecall >= 0.25, s"mean recall@10 $meanRecall fell out of the PQ-ADC band")
      assert(maxFrac <= 0.15, s"candidate fraction $maxFrac — the rung must stay sublinear")
    } finally {
      // restore the real table for subsequent suites sharing the session
      Tables.register(spark, TestSpark.Sf)
      spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet")
        .createOrReplaceTempView("embeddings")
    }
  }
}
