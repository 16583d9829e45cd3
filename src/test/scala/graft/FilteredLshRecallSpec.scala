package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sqlgen.{Gen, SparkDialect}

/** Recall proof for the LSH-routed hybrid search
  * (`vec_topk_filtered_lsh`) — same methodology as IvfRecallSpec: the
  * bench corpus is isotropic (no partitioning ANN can recall well at
  * low probe cost there — a data property, not an index property), so
  * the recall gate runs the REAL generated SQL against a CLUSTERED
  * corpus with the shape of real embeddings (labels = clusters,
  * within-cluster cosine ≈ 0.6). The brute filtered variant is the
  * ground truth: both run label-filtered top-10 over the same data, so
  * recall = |lsh∩brute| / |brute| per query. */
class FilteredLshRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val N = 4000
  private val Dim = 64
  private val NClusters = 50
  private val Sigma = 0.1

  private lazy val corpus: Array[(Long, Array[Double], Long)] = {
    val rnd = new scala.util.Random(11)
    val cents = Array.fill(NClusters) {
      val c = Array.fill(Dim)(rnd.nextGaussian())
      val n = math.sqrt(c.map(x => x * x).sum)
      c.map(_ / n)
    }
    Array.tabulate(N) { i =>
      val c = cents(i % NClusters)
      (i.toLong, c.map(_ + Sigma * rnd.nextGaussian()), (i % NClusters).toLong)
    }
  }

  test("LSH-routed filtered search recalls the brute filtered top-10 on a clustered corpus") {
    import spark.implicits._
    graft.functions.DotProduct.register(spark)
    corpus.toSeq
      .map { case (id, v, l) => (id, v.map(_.toFloat).toSeq, l) }
      .toDF("vec_id", "embedding", "label")
      .createOrReplaceTempView("embeddings")
    try {
      def top(gen: Gen, name: String): Map[Long, Seq[Long]] =
        spark.sql(gen.sql(name)).collect()
          .map(r => (r.getLong(0), r.getLong(2), r.getLong(4)))
          .groupBy(_._1).view
          .mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
      def recallAt(planes: Int): Double = {
        val gen = new Gen(SparkDialect, lshPlanes = planes)
        val brute = top(gen, "vec_topk_filtered")
        val lsh = top(gen, "vec_topk_filtered_lsh")
        assert(brute.keySet == lsh.keySet)
        val rs = brute.map { case (q, b) => lsh(q).count(b.toSet).toDouble / b.length }
        rs.sum / rs.size
      }
      // recall is the §4 bucket-size knob: planes ≈ log2(N/target
      // bucket size). The bench default (6 planes, target 32/bucket)
      // trades recall for candidate cost; a serving deployment that
      // needs recall resizes to bigger buckets (fewer planes) or more
      // tables — measured here with the REAL generated SQL
      val rDefault = recallAt(6)
      val rServing = recallAt(4)
      info(f"recall@10: default 6 planes = $rDefault%.2f, serving 4 planes = $rServing%.2f")
      assert(rServing > rDefault,
        f"bigger buckets must lift recall: $rServing%.2f vs $rDefault%.2f")
      assert(rServing >= 0.55, f"serving-sized recall too low: $rServing%.2f")
      assert(rDefault >= 0.25, f"default-sized recall collapsed: $rDefault%.2f")
    } finally {
      // restore the real table for subsequent suites sharing the
      // session (Tables.register memoizes per (session, dir), so a
      // plain drop would leave the catalog empty)
      Tables.register(spark, TestSpark.Sf)
      spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet")
        .createOrReplaceTempView("embeddings")
    }
  }
}
