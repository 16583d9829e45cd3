package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.PcaSolve
import graft.sqlgen.{Gen, SparkDialect}

/** Round-9 batch I: PCA reconstruction-error OOD audit — JVM residual
  * mirror over the raw vectors + the solved axes, and the variance-
  * accounting identity against the eigensolve trace.
  */
class R9iOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def rr(x: Double, dec: Int) = PcaSolve.roundAway(x, dec)

  test("vec_pca_residual: exact JVM mirror + variance-accounting identity") {
    Tables.register(spark, TestSpark.Sf)
    val gen = new Gen(SparkDialect)
    val row = spark.sql(gen.pcaMomentsSql).collect()(0)
    val a = Array.tabulate(PcaSolve.Dim)(i => row.getAs[Double](s"a${i + 1}"))
    val e = PcaSolve.solve(a, (i, j) => row.getAs[Double](s"m${i + 1}_${j + 1}"))
    val sg1 = if (e.ev(0) < 0) -1.0 else 1.0
    val sg2 = if (e.v2(0) < 0) -1.0 else 1.0
    val w1 = e.ev.map(_ * sg1)
    val w2 = e.v2.map(_ * sg2)

    // per-row residual over the raw first-8-dim profile, quantized to
    // the 1e-6 grid exactly as the SQL does, folded per label
    val vecs = spark.sql(
      "select label, embedding from embeddings").collect()
    val acc = collection.mutable.Map.empty[Long, (Long, Long, Long)] // label -> (n, sum, max)
    vecs.foreach { r =>
      val lb = r.getAs[Int]("label").toLong
      val v = r.getSeq[Float](1)
      var tot = 0.0; var p1 = 0.0; var p2 = 0.0
      (0 until PcaSolve.Dim).foreach { i =>
        val c = v(i).toDouble - e.mu(i)
        tot += c * c; p1 += c * w1(i); p2 += c * w2(i)
      }
      val r6 = rr(math.max(tot - p1 * p1 - p2 * p2, 0.0) * 1e6, 0).toLong
      val (n, s, m) = acc.getOrElse(lb, (0L, 0L, 0L))
      acc(lb) = (n + 1, s + r6, math.max(m, r6))
    }
    val got = SparkEntry.queries("vec_pca_residual")(spark, TestSpark.Sf)
      .collect().map(r => r.getAs[Long]("label") ->
        (r.getAs[Long]("n_vectors"), r.getAs[Double]("mean_resid_energy"),
          r.getAs[Double]("max_resid_energy"))).toMap
    assert(got.keySet == acc.keySet + (-1L))
    acc.foreach { case (lb, (n, s, m)) =>
      assert(got(lb)._1 == n, s"label $lb n")
      assert(got(lb)._2 == rr(s.toDouble / n / 1e6, 6), s"label $lb mean")
      assert(got(lb)._3 == rr(m / 1e6, 6), s"label $lb max")
    }
    // the ALL rollup row aggregates every label
    val (nAll, sAll, mAll) = acc.values.foldLeft((0L, 0L, 0L)) {
      case ((n, s, m), (n2, s2, m2)) => (n + n2, s + s2, math.max(m, m2))
    }
    assert(got(-1L)._1 == nAll)
    assert(got(-1L)._2 == rr(sAll.toDouble / nAll / 1e6, 6))
    assert(got(-1L)._3 == rr(mAll / 1e6, 6))
    // variance accounting: mean residual energy == tr − λ₁ − λ₂ up to
    // axis rounding/convergence slop (the pca_variance_explained
    // residual component measures the same quantity from the moments)
    val expect = e.tr - e.lam1 - e.lam2
    assert(math.abs(got(-1L)._2 - expect) < 0.01,
      s"mean resid ${got(-1L)._2} vs tr-l1-l2 $expect")
    assert(got(-1L)._2 > 0)
  }
}
