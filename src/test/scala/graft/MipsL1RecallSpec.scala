package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.WmConst
import graft.sqlgen.{Gen, SparkDialect, Wm}

/** Recall/cost proof for the two r11 ANN rungs (`vec_topk_ip_lsh`,
  * `vec_topk_l1_lsh`) — the IvfRecallSpec protocol: the driver's bench
  * corpus is ISOTROPIC (near-10 L1 ≈ 6.5–7.8 vs median ≈ 9; same-label
  * cosine ≈ 0), where NO bucketing ANN separates near from far — the
  * oracle-gated recall evals report 0.0–0.4 there honestly, a property
  * of the data. This spec builds CLUSTERED corpora (the shape of real
  * embedding data), runs the REAL generated SQL against them, and pins
  * recall at a bounded candidate fraction.
  *
  * For MIPS the corpus also gets VARYING NORMS (the thing MIPS is
  * about): per-vector scale in [0.6, 1.8], so the exact top-10 is
  * norm-biased and the norm-augmentation coordinate genuinely routes. */
class MipsL1RecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val N = 3000
  private val Dim = 64
  private val NClusters = 50

  private def mkCorpus(sigma: Double, scaleNorms: Boolean): Array[(Long, Array[Double], Long)] = {
    val rnd = new scala.util.Random(11)
    val cents = Array.fill(NClusters) {
      val c = Array.fill(Dim)(rnd.nextGaussian())
      val n = math.sqrt(c.map(x => x * x).sum)
      c.map(_ / n)
    }
    Array.tabulate(N) { i =>
      val c = cents(i % NClusters)
      val raw = c.map(_ + sigma * rnd.nextGaussian())
      val n = math.sqrt(raw.map(x => x * x).sum)
      val unit = raw.map(_ / n)
      val scaled =
        if (scaleNorms) { val s = 0.6 + 1.2 * rnd.nextDouble(); unit.map(_ * s) }
        else unit
      (i.toLong, scaled, (i % NClusters).toLong)
    }
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }
  private def l1(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += math.abs(a(i) - b(i)); i += 1 }
    s
  }

  private def withCorpus[T](corpus: Array[(Long, Array[Double], Long)])(body: Map[Long, Array[Double]] => T): T = {
    import spark.implicits._
    graft.functions.DotProduct.register(spark)
    corpus.toSeq.map { case (id, v, l) => (id, v.map(_.toFloat).toSeq, l) }
      .toDF("vec_id", "embedding", "label").createOrReplaceTempView("embeddings")
    try body(corpus.map { case (id, v, _) => id -> v.map(x => x.toFloat.toDouble) }.toMap)
    finally {
      // restore the real table for subsequent suites sharing the session
      Tables.register(spark, TestSpark.Sf)
      spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet")
        .createOrReplaceTempView("embeddings")
    }
  }

  test("vec_topk_ip_lsh: recall@10 >= 0.3 at <= 15% candidates on a clustered varying-norm corpus") {
    withCorpus(mkCorpus(sigma = 0.05, scaleNorms = true)) { vecs =>
      val out = spark.sql(new Gen(SparkDialect).sql("vec_topk_ip_lsh")).collect()
        .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("neighbor_id")))
      // JVM bucket mirror for the candidate-fraction measurement
      val nrm = vecs.map { case (id, v) => id -> math.sqrt(dot(v, v)) }
      val m = nrm.values.max
      def bucket(t: Int, v: Array[Double], aug: Double): Long =
        (0 until Wm.LshPlanes).map { p =>
          val w = WmConst.mipsPlanesFor(t, p)
          if (dot(v, w.take(Dim)) + aug * w(Dim) > 0) 1L << p else 0L
        }.sum
      val byBucket = (0 until Wm.LshTables).flatMap { t =>
        vecs.toSeq.map { case (id, v) =>
          (t, bucket(t, v, math.sqrt(math.max(m * m - nrm(id) * nrm(id), 0.0)))) -> id }
      }.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      var recallSum = 0.0
      var candTot = 0
      Wm.QueryIds.foreach { q =>
        val qv = vecs(q.toLong)
        val cand = (0 until Wm.LshTables).flatMap(t =>
          byBucket.getOrElse((t, bucket(t, qv, 0.0)), Set.empty)).toSet - q.toLong
        candTot += cand.size
        val truth = vecs.keys.filter(_ != q.toLong).toSeq
          .map(c => (dot(qv, vecs(c)), c)).sortBy { case (s, c) => (-s, c) }
          .take(10).map(_._2).toSet
        val got = out.filter(_._1 == q.toLong).map(_._2).toSet
        recallSum += (got & truth).size.toDouble / 10
      }
      val recall = recallSum / Wm.QueryIds.size
      val frac = candTot.toDouble / (Wm.QueryIds.size * N)
      info(f"MIPS rung on clustered varying-norm corpus: recall@10=$recall%.2f candidates=${frac * 100}%.1f%%")
      // the augmented-cosine collision probability is IP/(|q|·M) by
      // construction — the scheme intentionally discounts lower-norm
      // candidates, so its recall ceiling at L=2/6-bit geometry sits
      // below the direction-only case; 0.36 at 1.5% candidates is the
      // measured operating point (the knob at scale is the shared
      // lshPlanes count — and the exact IP re-rank inside candidates
      // means widening L/bits converts directly into recall)
      assert(recall >= 0.3, f"recall $recall%.2f below 0.3")
      assert(frac <= 0.15, f"candidate fraction $frac%.3f above 15%%")
    }
  }

  test("vec_topk_l1_lsh: recall@10 >= 0.6 at <= 15% candidates on a tight clustered corpus") {
    withCorpus(mkCorpus(sigma = 0.04, scaleNorms = false)) { vecs =>
      val out = spark.sql(new Gen(SparkDialect).sql("vec_topk_l1_lsh")).collect()
        .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("neighbor_id")))
      val W = 6.0
      def hashes(t: Int, v: Array[Double]): Seq[Long] = (1 to 2).map { j =>
        val a = WmConst.cauchyFor(t, j)
        val b = WmConst.cauchyShiftFor(t, j) * W
        math.floor((dot(v, a) + b) / W).toLong
      }
      val byBucket = (0 until 2).flatMap { t =>
        vecs.toSeq.map { case (id, v) => (t, hashes(t, v)) -> id }
      }.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      var recallSum = 0.0
      var candTot = 0
      Wm.QueryIds.foreach { q =>
        val qv = vecs(q.toLong)
        val cand = (0 until 2).flatMap(t =>
          byBucket.getOrElse((t, hashes(t, qv)), Set.empty)).toSet - q.toLong
        candTot += cand.size
        val truth = vecs.keys.filter(_ != q.toLong).toSeq
          .map(c => (l1(qv, vecs(c)), c)).sortBy { case (s, c) => (s, c) }
          .take(10).map(_._2).toSet
        val got = out.filter(_._1 == q.toLong).map(_._2).toSet
        recallSum += (got & truth).size.toDouble / 10
      }
      val recall = recallSum / Wm.QueryIds.size
      val frac = candTot.toDouble / (Wm.QueryIds.size * N)
      info(f"L1 rung on tight clustered corpus: recall@10=$recall%.2f candidates=${frac * 100}%.1f%%")
      assert(recall >= 0.6, f"recall $recall%.2f below 0.6")
      assert(frac <= 0.15, f"candidate fraction $frac%.3f above 15%%")
    }
  }
}
