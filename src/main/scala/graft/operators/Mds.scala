package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic landmark MDS 2-D layout — the engine's analog of the
  * reference's t-SNE visualization branch (reference: database/pgvector/
  * pg_func.py:921-931 reduce_dimensions(method="tsne"), served by
  * backend/app.py:329). t-SNE itself is stochastic gradient descent
  * (random init, random negative sampling) — unreproducible across runs
  * and engines by construction — so the engine ships the classical
  * landmark-MDS embedding instead: like t-SNE it lays points out by
  * PAIRWISE DISTANCE structure (not by global variance axes, which is
  * the PCA branch, operators.Pca), and unlike t-SNE it is closed-form
  * deterministic: identical runs give identical coordinates (MdsSpec).
  *
  * Distributed shape (de Silva & Tenenbaum 2004, "Sparse multi-
  * dimensional scaling using landmark points"):
  *  1. m landmarks picked by a keyed PRF rank over ids — an order-by +
  *     limit m (TakeOrderedAndProject — no global sort materialized);
  *  2. the m×m squared-distance matrix is double-centered and eigen-
  *     solved DRIVER-side (m is a constant ~32: this is the d²-sized
  *     work, same split as Pca);
  *  3. every corpus row gets its 2-D coordinates by the Nyström
  *     out-of-sample formula against the m broadcast landmarks —
  *     map-only, no shuffle, 100 TB-safe.
  */
object Mds {

  /** (vec_id, label, x, y) for every vector, m landmarks. */
  def project2d(spark: SparkSession, dir: String, m: Int = 32): DataFrame = {
    Tables.register(spark, dir)
    project2dOf(spark.sql(
      "select vec_id, label, cast(embedding as array<double>) as v from embeddings"), m)
  }

  /** Same over any (vec_id, label, v array<double>) frame. */
  def project2dOf(vecs: DataFrame, m: Int = 32): DataFrame = {
    val spark = vecs.sparkSession

    // 1. keyed deterministic landmark pick (PRF rank, id tiebreak)
    val marked = vecs.withColumn("_r",
      expr("cast(conv(substr(md5(concat_ws(':', 'mds', vec_id)), 1, 15), 16, 10) as bigint)"))
    val lm = marked.orderBy(col("_r"), col("vec_id")).limit(m)
      .select(col("vec_id"), col("v")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val lmv = lm.map(_._2)
    val mm = lmv.length
    require(mm >= 3, s"need >= 3 landmarks, got $mm")

    // 2. driver-side: squared distances, double-centering, eigensolve
    def sqd(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val d2 = Array.tabulate(mm, mm)((i, j) => sqd(lmv(i), lmv(j)))
    val rowMean = d2.map(r => r.sum / mm)
    val totMean = rowMean.sum / mm
    val b = Array.tabulate(mm, mm)((i, j) =>
      -0.5 * (d2(i)(j) - rowMean(i) - rowMean(j) + totMean))
    val (vals, vecsE) = Pca.symmetricEigen(b)
    require(vals(0) > 0 && vals(1) > 0,
      s"need 2 positive MDS eigenvalues, got ${vals(0)}, ${vals(1)}")

    // 3. Nyström projection, map-only against broadcast constants:
    //    y_k(x) = (u_k · (rowMean - d²(x, L_*))) / (2·√λ_k)
    val bc = spark.sparkContext.broadcast(
      (lmv, rowMean, vecsE(0), vecsE(1), math.sqrt(vals(0)), math.sqrt(vals(1))))
    import spark.implicits._
    vecs.select(col("vec_id"), col("label"), col("v"))
      .as[(Long, Long, Seq[Double])]
      .map { case (id, label, vSeq) =>
        val (lms, mu, u1, u2, s1, s2) = bc.value
        val v = vSeq.toArray
        var x = 0.0; var y = 0.0
        var j = 0
        while (j < lms.length) {
          val dj = mu(j) - sqd(v, lms(j))
          x += u1(j) * dj
          y += u2(j) * dj
          j += 1
        }
        (id, label, x / (2 * s1), y / (2 * s2))
      }
      .toDF("vec_id", "label", "x", "y")
  }
}
