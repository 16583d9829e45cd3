package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Gram, Pca}

/** True PCA 2-D projection (eigendecomposition → map-only projection),
  * the viz-parity step the reference runs via sklearn PCA. */
class PcaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("jacobi eigensolver diagonalizes a known symmetric matrix") {
    val (vals, vecs) = Pca.symmetricEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(vals(0) - 3.0) < 1e-10)
    assert(math.abs(vals(1) - 1.0) < 1e-10)
    val r = 1.0 / math.sqrt(2.0)
    assert(math.abs(vecs(0)(0) - r) < 1e-10 && math.abs(vecs(0)(1) - r) < 1e-10)
  }

  test("pc1/pc2 variances equal the top-2 eigenvalues and are uncorrelated") {
    Tables.register(spark, TestSpark.Sf)
    val df = spark.sql("select vec_id, embedding from embeddings")
    val cov = Gram.covarianceMatrix(df, "embedding", 64)
    val (vals, _) = Pca.symmetricEigen(cov)

    val p = Pca.project2d(df, "embedding", 64)
    assert(p.columns.contains("pc1") && p.columns.contains("pc2"))
    val stats = p.selectExpr(
      "avg(pc1)", "avg(pc2)",
      "avg(pc1 * pc1)", "avg(pc2 * pc2)", "avg(pc1 * pc2)").collect()(0)
    // centered
    assert(math.abs(stats.getDouble(0)) < 1e-8)
    assert(math.abs(stats.getDouble(1)) < 1e-8)
    // population variance along each axis = its eigenvalue
    assert(math.abs(stats.getDouble(2) - vals(0)) < 1e-6 * math.max(1.0, vals(0)))
    assert(math.abs(stats.getDouble(3) - vals(1)) < 1e-6 * math.max(1.0, vals(1)))
    // principal axes are uncorrelated
    assert(math.abs(stats.getDouble(4)) < 1e-6)
    // pc1 captures at least as much variance as pc2
    assert(stats.getDouble(2) >= stats.getDouble(3))
  }
}
