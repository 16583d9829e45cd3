package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Mds

/** Landmark-MDS 2-D layout (the deterministic t-SNE-branch analog):
  * determinism across runs, landmark self-consistency (Nyström
  * projection of a landmark reproduces its own MDS coordinate), and
  * distance-structure preservation. */
class MdsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("identical runs give identical coordinates") {
    val a = Mds.project2d(spark, TestSpark.Sf).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    val b = Mds.project2d(spark, TestSpark.Sf).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(a == b, "MDS must be bit-deterministic across runs")
    assert(a.size > 0)
  }

  test("oracle route (vec_mds2d moment chain) matches the distance route") {
    // vec_mds2d solves the landmark scatter G = XcᵀXc/m (8×8, the
    // oracle-gated chain); Mds.project2dOf double-centers the m×m
    // squared-distance matrix B = XcXcᵀ and projects via Nyström.
    // The two are the SAME operator algebraically (B and G share
    // their nonzero spectrum; the Nyström coordinate collapses to the
    // centered projection), so on the same 8-dim input the layouts
    // must agree axis-for-axis up to sign and eigensolve rounding.
    val sf = TestSpark.Sf
    val chain = SparkEntry.queries("vec_mds2d")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    Tables.register(spark, sf)
    val df8 = spark.sql(
      "select vec_id, label, slice(cast(embedding as array<double>), 1, 8) as v from embeddings")
    val dist = Mds.project2dOf(df8).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(chain.keySet == dist.keySet)
    val ids = chain.keySet.toSeq.sorted
    def pearson(a: Seq[Double], b: Seq[Double]): Double = {
      val n = a.size
      val (ma, mb) = (a.sum / n, b.sum / n)
      val cov = a.zip(b).map { case (x, y) => (x - ma) * (y - mb) }.sum
      val sa = math.sqrt(a.map(x => (x - ma) * (x - ma)).sum)
      val sb = math.sqrt(b.map(x => (x - mb) * (x - mb)).sum)
      cov / (sa * sb)
    }
    val cx = pearson(ids.map(chain(_)._1), ids.map(dist(_)._1))
    val cy = pearson(ids.map(chain(_)._2), ids.map(dist(_)._2))
    info(f"axis correlations: |x| = ${math.abs(cx)}%.6f, |y| = ${math.abs(cy)}%.6f")
    assert(math.abs(cx) > 0.999, f"x-axis correlation ${cx}%.4f too weak")
    assert(math.abs(cy) > 0.999, f"y-axis correlation ${cy}%.4f too weak")
  }

  test("2-D distances correlate with full-space distances (2-D manifold corpus)") {
    // the bench corpus is isotropic 64-dim noise — NO 2-D layout can
    // rank-preserve its distances (measured spearman ≈ 0.1; even
    // random high-dim CLUSTER centroids are mutually near-equidistant,
    // so cluster corpora cap out ≈ 0.33). The honest capability test:
    // data with INTRINSIC 2-D structure (a plane embedded in 64-dim
    // plus small noise) must be laid out with high distance fidelity.
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    def unit() = {
      val c = Array.fill(64)(rnd.nextGaussian())
      val n = math.sqrt(c.map(x => x * x).sum); c.map(_ / n)
    }
    val u = unit()
    val w0 = unit()
    val du = w0.zip(u).map { case (a, b) => a * b }.sum
    val w = {
      val t = w0.zip(u).map { case (a, b) => a - du * b }
      val n = math.sqrt(t.map(x => x * x).sum); t.map(_ / n)
    }
    val corpus = Array.tabulate(600) { i =>
      val (a, b) = (rnd.nextGaussian(), rnd.nextGaussian())
      val v = Array.tabulate(64)(k => a * u(k) + b * w(k) + 0.03 * rnd.nextGaussian())
      (i.toLong, v.toSeq, 0L)
    }
    val df = corpus.toSeq.toDF("vec_id", "v", "label")
      .selectExpr("vec_id", "label", "cast(v as array<double>) as v")
    val out = Mds.project2dOf(df).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    val vecs = corpus.map { case (id, v, _) => id -> v.toArray }.toMap
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    // Spearman-ish check over a deterministic pair sample: the 2-D
    // layout must rank pairwise distances far better than chance
    val ids = vecs.keys.toSeq.sorted.take(60)
    val pairs = for (i <- ids.indices; j <- i + 1 until ids.length)
      yield (ids(i), ids(j))
    val full = pairs.map { case (a, b) => d2(vecs(a), vecs(b)) }
    val low = pairs.map { case (a, b) =>
      val (xa, ya) = out(a); val (xb, yb) = out(b)
      (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
    }
    def ranks(xs: Seq[Double]): Seq[Double] =
      xs.zipWithIndex.sortBy(_._1).zipWithIndex
        .sortBy(_._1._2).map(_._2.toDouble)
    val (rf, rl) = (ranks(full), ranks(low))
    val n = rf.size
    val mf = rf.sum / n; val ml = rl.sum / n
    val cov = rf.zip(rl).map { case (x, y) => (x - mf) * (y - ml) }.sum
    val sf = math.sqrt(rf.map(x => (x - mf) * (x - mf)).sum)
    val sl = math.sqrt(rl.map(x => (x - ml) * (x - ml)).sum)
    val spearman = cov / (sf * sl)
    info(f"spearman(full-d2, 2d-d2) = $spearman%.3f over ${n} pairs")
    assert(spearman > 0.9, f"rank correlation $spearman%.3f too weak")
  }
}
