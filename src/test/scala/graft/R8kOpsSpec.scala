package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Prf

/** Semantic gates for the round-7 thirty-seventh batch: the
  * class-balancing downsample (PRF selection re-derived per label —
  * the exact SET, not just sizes) and metric winsorization (census
  * p99, capped moments, and the variance receipt refolded). */
class R8kOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)

  private def q(x: Double, dec: Int): Double = {
    val m = math.pow(10, dec)
    (if (x >= 0) math.floor(x * m + 0.5) else -math.floor(-x * m + 0.5)) / m
  }
  private def qL(x: Double): Long =
    (if (x >= 0) math.floor(x + 0.5) else -math.floor(-x + 0.5)).toLong

  test("sample_balanced: PRF selection re-derived per label; exact set pinned via checksum") {
    Tables.register(spark, TestSpark.Sf)
    val labs = spark.sql("select vec_id, cast(label as bigint) as label from embeddings")
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("label")))
    val byLab = labs.groupBy(_._2)
    val target = byLab.values.map(_.size).min
    val rows = run("sample_balanced").collect()
    assert(rows.length == byLab.size)
    rows.foreach { r =>
      val lab = r.getAs[Long]("label")
      val members = byLab(lab).map(_._1)
      assert(r.getAs[Long]("n_before") == members.length.toLong)
      assert(r.getAs[Long]("n_after") == target.toLong)
      assert(math.abs(r.getAs[Double]("keep_rate") -
        q(target.toDouble / members.length, 4)) < 1e-9)
      // the exact selected set: first `target` by (prf, id)
      val kept = members.map(id => (Prf.prf("bal", id), id)).sorted.take(target)
      assert(r.getAs[Long]("selection_checksum") == kept.map(_._1 % 1000000).sum)
    }
    // balanced by construction
    assert(rows.map(_.getAs[Long]("n_after")).toSet.size == 1)
  }

  test("events_metric_winsorize: census p99, capped moments, and variance receipt refold") {
    Tables.register(spark, TestSpark.Sf)
    val xs = spark.sql("select value from events where event_type = 'purchase'")
      .collect().map(r => qL(r.getAs[Double]("value") * 100))
    val n = xs.length.toLong
    val sorted = xs.sorted
    val cap = sorted(math.ceil(n * 0.99).toInt - 1)
    val capped = xs.map(x => math.min(x, cap))
    def mv(v: Array[Long]) = {
      val s1 = v.sum; val s2 = v.map(x => x * x).sum
      (s1.toDouble / n / 100,
        (n.toDouble * s2 - s1.toDouble * s1) / (n.toDouble * (n - 1)) / 10000,
        s1, s2)
    }
    val (mr, vr, s1, s2) = mv(xs)
    val (mc, vc, c1, c2) = mv(capped)
    val r = run("events_metric_winsorize").collect().head
    assert(r.getAs[Long]("n_rows") == n)
    assert(math.abs(r.getAs[Double]("p99_cap") - q(cap.toDouble / 100, 2)) < 1e-9)
    assert(r.getAs[Long]("n_capped") == xs.count(_ > cap).toLong)
    assert(math.abs(r.getAs[Double]("mean_raw") - q(mr, 4)) < 1e-9)
    assert(math.abs(r.getAs[Double]("mean_capped") - q(mc, 4)) < 1e-9)
    assert(math.abs(r.getAs[Double]("var_raw") - q(vr, 4)) < 1e-9)
    assert(math.abs(r.getAs[Double]("var_capped") - q(vc, 4)) < 1e-9)
    assert(math.abs(r.getAs[Double]("var_reduction") -
      q(1 - (n.toDouble * c2 - c1.toDouble * c1) / (n.toDouble * s2 - s1.toDouble * s1), 4)) < 1e-9)
    // capping can only shrink mean and variance
    assert(mc <= mr + 1e-12 && vc <= vr + 1e-12)
  }
}
