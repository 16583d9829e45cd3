package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Pca
import graft.sqlgen.{Gen, SparkDialect}

/** `pca_project2d` (the oracle-checked in-SQL power-iteration PCA
  * corner) against the driver-side Jacobi eigensolver.
  *
  * On a WELL-CONDITIONED corpus (clear eigengaps) the SQL projection
  * must match the Jacobi projection per row — this is the convergence
  * proof. On the real bench corpus the 8-dim corner spectrum is
  * quasi-degenerate (adjacent eigenvalue ratios 0.95-0.99, measured),
  * where individual axes are ill-defined for ANY eigensolver — there
  * the spec asserts the degeneracy-robust properties: axis variances
  * bracket the top eigenvalues and the two axes are uncorrelated. */
class PcaProjectSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def rnd = new scala.util.Random(11)

  /** 500×64 corpus whose first 8 dims are an anisotropic gaussian with
    * strong spectral gaps, mixed by a fixed rotation (so eigenvectors
    * are not axis-aligned and have nonzero first components). */
  private def syntheticCorpus(): Array[(Long, Array[Double], Long)] = {
    val r = rnd
    val scales = Array(1.0, 0.7, 0.5, 0.35, 0.25, 0.18, 0.12, 0.08)
    // fixed rotation via Gram-Schmidt of seeded gaussians
    val basis = Array.fill(8)(Array.fill(8)(r.nextGaussian()))
    for (i <- 0 until 8) {
      for (j <- 0 until i) {
        val d = basis(i).zip(basis(j)).map { case (a, b) => a * b }.sum
        for (k <- 0 until 8) basis(i)(k) -= d * basis(j)(k)
      }
      val n = math.sqrt(basis(i).map(x => x * x).sum)
      for (k <- 0 until 8) basis(i)(k) /= n
    }
    Array.tabulate(500) { i =>
      val z = Array.tabulate(8)(k => scales(k) * r.nextGaussian())
      val head = Array.tabulate(8)(k => (0 until 8).map(m => z(m) * basis(m)(k)).sum)
      (i.toLong, head ++ Array.fill(56)(0.02 * r.nextGaussian()), 0L)
    }
  }

  /** Driver-side mirror: rounded 8×8 covariance corner → Jacobi →
    * first-component-positive sign → centered projection. */
  private def jacobiProject(vecs: Array[(Long, Array[Double])])
      : (Map[Long, (Double, Double)], Array[Double]) = {
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val n = vecs.length
    val mean = Array.tabulate(8)(i => vecs.map(_._2(i)).sum / n)
    val cov = Array.tabulate(8, 8)((i, j) =>
      r6(vecs.map(v => v._2(i) * v._2(j)).sum / n - mean(i) * mean(j)))
    val (vals, es) = Pca.symmetricEigen(cov)
    val axes = Array(es(0), es(1)).map(e => if (e(0) < 0) e.map(-_) else e)
    val mu6 = mean.map(r6)
    def proj(v: Array[Double], a: Array[Double]) =
      (0 until 8).map(i => v(i) * a(i)).sum - (0 until 8).map(i => mu6(i) * a(i)).sum
    (vecs.map { case (id, v) =>
      id -> (proj(v, axes(0)), proj(v, axes(1))) }.toMap,
      vals)
  }

  test("matches the Jacobi eigensolver on a well-conditioned corpus") {
    import spark.implicits._
    graft.functions.DotProduct.register(spark)
    val corpus = syntheticCorpus()
    corpus.toSeq.map { case (id, v, l) => (id, v.map(_.toFloat).toSeq, l) }
      .toDF("vec_id", "embedding", "label")
      .createOrReplaceTempView("embeddings")
    try {
      val sqlOut = spark.sql(new Gen(SparkDialect).sql("pca_project2d"))
        .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3))).toMap
      val (mirror, _) = jacobiProject(
        corpus.map { case (id, v, _) => id -> v.take(8).map(x => x.toFloat.toDouble) })
      var worst = 0.0
      for ((id, (p1, p2)) <- mirror) {
        val (q1, q2) = sqlOut(id)
        worst = math.max(worst, math.max(math.abs(p1 - q1), math.abs(p2 - q2)))
      }
      info(f"max |SQL - Jacobi| = $worst%.2e over ${mirror.size} rows")
      assert(worst < 2e-3, f"SQL power iteration diverges from Jacobi: $worst%.2e")
    } finally {
      Tables.register(spark, TestSpark.Sf)
      spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet")
        .createOrReplaceTempView("embeddings")
    }
  }

  test("real corpus: variances bracket the top eigenvalues, axes uncorrelated") {
    val out = SparkEntry.queries("pca_project2d")(spark, TestSpark.Sf)
      .collect().map(r => (r.getDouble(2), r.getDouble(3)))
    Tables.register(spark, TestSpark.Sf)
    val vecs = spark.sql(
      "select vec_id, cast(embedding as array<double>) as v from embeddings")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).take(8).toArray)
    val (_, vals) = jacobiProject(vecs)
    val n = out.length
    def varOf(xs: Array[Double]) = {
      val m = xs.sum / n; xs.map(x => (x - m) * (x - m)).sum / n
    }
    val v1 = varOf(out.map(_._1)); val v2 = varOf(out.map(_._2))
    assert(v1 >= v2 && v2 > 0)
    // quasi-degenerate spectrum: each axis variance must land inside
    // the top-3 eigenvalue band (any eigensolver's axes would)
    assert(v1 <= vals(0) * 1.02 && v1 >= vals(2) * 0.98,
      s"var(pc1)=$v1 outside [${vals(2)}, ${vals(0)}]")
    assert(v2 <= vals(0) * 1.02 && v2 >= vals(3) * 0.98,
      s"var(pc2)=$v2 outside [${vals(3)}, ${vals(0)}]")
    val m1 = out.map(_._1).sum / n; val m2 = out.map(_._2).sum / n
    val corr = out.map { case (a, b) => (a - m1) * (b - m2) }.sum / n /
      math.sqrt(v1 * v2)
    info(f"var(pc1)=$v1%.5f var(pc2)=$v2%.5f corr=$corr%.3f eig=[${vals(0)}%.5f, ${vals(1)}%.5f, ${vals(2)}%.5f]")
    assert(math.abs(corr) < 0.2, f"axes correlated: $corr%.3f")
  }
}
