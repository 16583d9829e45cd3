package graft.operators

import org.apache.spark.sql.DataFrame

/** Distributed d×d Gram / covariance accumulation — the PCA first
  * stage at 100 TB (reference: the PCA branch of backend/app.py's
  * /api/vector_visualization).
  *
  * The SQL formulation (`pca_covariance`) is the oracle-checked
  * correctness baseline but replicates each row once per (i, j) pair —
  * d(d+1)/2 ≈ 2080× read amplification at d = 64. This operator reads
  * each partition once, accumulates the upper-triangular outer-product
  * sums and the per-dim sums into flat arrays, and treeAggregates the
  * d²-sized state — one pass, O(d²) merge traffic, the standard
  * distributed-PCA shape (per-partition imperative accumulation is the
  * documented "rarely" RDD case of the design rules).
  */
object Gram {

  /** (n, sum[d], upper-tri gramSum[d*(d+1)/2]) accumulated in one pass. */
  private def accumulate(df: DataFrame, vecCol: String, dim: Int)
      : (Long, Array[Double], Array[Double]) = {
    val tri = dim * (dim + 1) / 2
    df.select(vecCol).rdd.treeAggregate(
      (0L, new Array[Double](dim), new Array[Double](tri)))(
      seqOp = { case ((n, s, g), row) =>
        // accept array<float> as well as array<double> (the raw
        // embeddings column is float[]) and fail short vectors loudly
        val raw = row.getSeq[Any](0)
        require(raw != null && raw.length >= dim,
          s"vector length ${if (raw == null) "null" else raw.length} < dim $dim")
        val v = new Array[Double](dim)
        val rit = raw.iterator
        var x = 0
        while (x < dim) { v(x) = rit.next().asInstanceOf[Number].doubleValue(); x += 1 }
        var i = 0
        var k = 0
        while (i < dim) {
          s(i) += v(i)
          var j = i
          while (j < dim) { g(k) += v(i) * v(j); j += 1; k += 1 }
          i += 1
        }
        (n + 1, s, g)
      },
      combOp = { case ((n1, s1, g1), (n2, s2, g2)) =>
        var i = 0
        while (i < dim) { s1(i) += s2(i); i += 1 }
        i = 0
        while (i < g1.length) { g1(i) += g2(i); i += 1 }
        (n1 + n2, s1, g1)
      })
  }

  /** Population covariance matrix: cov(i,j) = E[xi·xj] − E[xi]·E[xj]. */
  def covarianceMatrix(df: DataFrame, vecCol: String, dim: Int): Array[Array[Double]] = {
    val (n, s, g) = accumulate(df, vecCol, dim)
    val cov = Array.ofDim[Double](dim, dim)
    var i = 0
    var k = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val c = g(k) / n - (s(i) / n) * (s(j) / n)
        cov(i)(j) = c; cov(j)(i) = c
        j += 1; k += 1
      }
      i += 1
    }
    cov
  }
}
