package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** True PCA 2-D projection — the reference's visualization reducer
  * (reference: database/pgvector/pg_func.py:921-931 reduce_dimensions
  * runs sklearn PCA(n_components=2); backend/app.py:329 serves it).
  *
  * Distributed shape: one [[Gram]] pass accumulates the d×d covariance
  * (O(d²) merge traffic), the d×d eigenproblem is solved DRIVER-side
  * (d = 64 → trivial; this is the standard big-data PCA split — the
  * data-sized work is distributed, the d²-sized work is not worth
  * distributing), and the two principal axes ship back as broadcast
  * literals so the projection itself is two codegen'd dot products per
  * row — map-only, no shuffle, 100 TB-safe.
  *
  * Eigensolver: classical cyclic Jacobi rotations (public textbook
  * algorithm — Golub & Van Loan §8.5) — deterministic for a fixed
  * sweep order, no randomness, so repeated runs give identical axes.
  * Sign convention: each eigenvector's largest-|component| entry is
  * made positive (sklearn's svd_flip analog) for reproducibility.
  */
object Pca {

  /** Eigen-decomposition of a symmetric matrix by cyclic Jacobi.
    * Returns (eigenvalues desc, eigenvectors as rows, same order). */
  def symmetricEigen(a0: Array[Array[Double]], sweeps: Int = 50,
                     tol: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = Array.tabulate(n, n)((i, j) => a0(i)(j))
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (sweep < sweeps && off > tol) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (math.abs(apq) > tol / (n * n)) {
            // symmetric Schur 2x2: rotation zeroing a(p,q)
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1))
              case s   => s / (math.abs(theta) + math.sqrt(theta * theta + 1))
            }
            val c = 1.0 / math.sqrt(t * t + 1)
            val s = t * c
            var k = 0
            while (k < n) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < n) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    // sort by eigenvalue desc; eigenvector i = column i of v, returned
    // as a row with the sign convention applied
    val order = (0 until n).sortBy(i => -a(i)(i))
    val vals = order.map(i => a(i)(i)).toArray
    val vecs = order.map { i =>
      val col = Array.tabulate(n)(v(_)(i))
      val m = col.indices.maxBy(j => math.abs(col(j)))
      if (col(m) < 0) col.map(-_) else col
    }.toArray
    (vals, vecs)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j) * a(i)(j)
    s
  }

  /** dot(vecCol, literal axis) as a single codegen'd fold. */
  private def axisDot(vecCol: String, axis: Array[Double]): Column = {
    val lit = axis.mkString("array(", ", ", ")")
    expr(s"aggregate(zip_with(cast($vecCol as array<double>), $lit, (x, w) -> x * w), 0d, (s, t) -> s + t)")
  }

  /** PCA-project `vecCol` (length `dim`) onto the top-2 principal axes
    * of its covariance; adds (pc1, pc2), centered like sklearn
    * (projection of x − mean). Two actions: the Gram pass, then the
    * map-only projection. */
  def project2d(df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    val cov = Gram.covarianceMatrix(df, vecCol, dim)
    val (_, vecs) = symmetricEigen(cov)
    val (a1, a2) = (vecs(0), vecs(1))
    // center via the axis-projected means (scalar offsets, not a d-vector
    // subtraction per row): (x - mu)·a = x·a - mu·a
    val withP = df
      .withColumn("_p1", axisDot(vecCol, a1))
      .withColumn("_p2", axisDot(vecCol, a2))
    val Array(m1, m2) = withP.agg(avg("_p1"), avg("_p2")).collect()(0) match {
      case r => Array(r.getDouble(0), r.getDouble(1))
    }
    withP
      .withColumn("pc1", col("_p1") - lit(m1))
      .withColumn("pc2", col("_p2") - lit(m2))
      .drop("_p1", "_p2")
  }
}
