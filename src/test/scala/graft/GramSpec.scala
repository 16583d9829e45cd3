package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Gram

/** The one-pass treeAggregate covariance must agree with the
  * oracle-checked SQL formulation on its 8×8 corner. */
class GramSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("treeAggregate covariance matches the SQL pca_covariance corner") {
    Tables.register(spark, TestSpark.Sf)
    val vecs = spark.sql(
      "select cast(embedding as array<double>) as v from embeddings")
    val cov = Gram.covarianceMatrix(vecs, "v", 64)
    val sql = SparkEntry.queries("pca_covariance")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0).toInt, r.getLong(1).toInt) -> r.getDouble(2)).toMap
    assert(sql.size == 36)
    sql.foreach { case ((i, j), v) =>
      // SQL output is rounded to 6; sum-order differs between the two
      // formulations, so compare at that precision
      assert(math.abs(cov(i - 1)(j - 1) - v) < 2e-6,
        s"cov($i,$j): tree=${cov(i - 1)(j - 1)} sql=$v")
    }
    // symmetry + positive variance on the diagonal
    assert((0 until 64).forall(i => cov(i)(i) > 0))
    assert(math.abs(cov(3)(17) - cov(17)(3)) == 0.0)
  }

  test("raw array<float> column is accepted (no ClassCastException)") {
    Tables.register(spark, TestSpark.Sf)
    val raw = spark.sql("select embedding as v from embeddings limit 50")
    val cov = Gram.covarianceMatrix(raw, "v", 64)
    assert(cov(0)(0) >= 0)
  }

  test("short vectors fail with a clear error") {
    val df = spark.sql("select array(1.0d, 2.0d) as v")
    val e = intercept[org.apache.spark.SparkException] {
      Gram.covarianceMatrix(df, "v", 64)
    }
    assert(e.getMessage != null)
  }
}
