package graft

import org.scalatest.funsuite.AnyFunSuite
import java.time.{LocalDateTime, ZoneOffset}

/** Round-9 batch H: the degree-correlation profile knn(d) (exact
  * integer-ratio mirror, consistency with graph_assortativity's
  * moments) and the A/B uplift-by-pre-exposure-decile table (exact
  * cents mirror with the deterministic tie-block decile rule).
  */
class R9hOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)
  private def rr(x: Double, dec: Int) = graft.operators.PcaSolve.roundAway(x, dec)

  test("graph_knn_degree_curve: exact JVM mirror over the served undirected graph") {
    Tables.register(spark, TestSpark.Sf)
    WmCache.ensure(spark, TestSpark.Sf)
    val knn = spark.table("g_knn").collect()
      .map(r => r.getAs[Long]("src") -> r.getAs[Long]("dst"))
    val und = knn.filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val deg = (und.map(_._1) ++ und.map(_._2)).groupBy(identity)
      .map { case (v, xs) => v -> xs.size.toLong }
    val snd = (und ++ und.map(_.swap)).groupBy(_._1)
      .map { case (v, es) => v -> es.map(e => deg(e._2)).sum }
    val buckets = snd.groupBy { case (v, _) => deg(v) }
      .map { case (d0, m) => d0 -> (m.size.toLong, m.values.sum) }
    val got = run("graph_knn_degree_curve").collect()
      .map(r => r.getAs[Long]("degree") ->
        (r.getAs[Long]("n_nodes"), r.getAs[Long]("sum_neighbor_degree"),
          r.getAs[Double]("mean_neighbor_degree"))).toMap
    assert(got.keySet == buckets.keySet)
    buckets.foreach { case (d0, (n, s)) =>
      assert(got(d0)._1 == n, s"degree $d0 n_nodes")
      assert(got(d0)._2 == s, s"degree $d0 sum")
      assert(got(d0)._3 == rr(s.toDouble / (d0 * n), 4), s"degree $d0 mean")
    }
    // consistency with the assortativity moments: total edge-endpoint
    // mass Σ_d d·n_d equals 2m
    val m = und.size.toLong
    assert(buckets.map { case (d0, (n, _)) => d0 * n }.sum == 2 * m)
  }

  test("events_ab_uplift_deciles: exact cents mirror with tie-block deciles") {
    val ev = spark.read.parquet(s"${TestSpark.Sf}/events.parquet")
      .selectExpr("user_id", "event_type", "value", "cast(ts as string) as tss").collect()
      .map { r =>
        val day = LocalDateTime.parse(r.getAs[String]("tss").replace(' ', 'T'))
          .toEpochSecond(ZoneOffset.UTC) / 86400
        (r.getAs[Long]("user_id"), day, r.getAs[String]("event_type"),
          r.getAs[Double]("value"))
      }
    val users = ev.groupBy(_._1).map { case (uid, rows) =>
      val preN = rows.count(_._2 < 19746).toLong
      val postC = rows.filter(r => r._2 >= 19746 && r._3 == "purchase")
        .map(r => rr(r._4 * 100, 0).toLong).sum
      (uid, uid % 2, preN, postC)
    }.toSeq
    val n = users.size.toLong
    // tie-block decile: all users sharing pre_n land in the decile of
    // the block's start rank
    val census = users.groupBy(_._3).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
    var f = 0L
    val decileOf = census.map { case (preN, c) =>
      val d0 = (f * 10) / n; f += c; preN -> d0
    }.toMap
    // the output domain is FIXED at deciles 0..9 (r10: zero-filled
    // counts for unpopulated deciles — a tie-heavy tiny SF can leave
    // decile values unreached by any tie-block start rank)
    val cells = (0L to 9L).map { d0 =>
      val us = users.filter(u => decileOf(u._3) == d0)
      val ctrl = us.filter(_._2 == 0)
      val trt = us.filter(_._2 == 1)
      d0 -> (ctrl.size.toLong, trt.size.toLong,
        ctrl.map(_._4).sum, trt.map(_._4).sum)
    }.toMap
    val got = run("events_ab_uplift_deciles").collect()
      .map(r => r.getAs[Long]("decile") -> r).toMap
    assert(got.keySet == cells.keySet)
    assert(got.size == 10, "fixed 10-row decile domain")
    cells.foreach { case (d0, (nc, nt, cc, ct)) =>
      val r = got(d0)
      assert(r.getAs[Long]("n_control") == nc, s"decile $d0 n_control")
      assert(r.getAs[Long]("n_treat") == nt, s"decile $d0 n_treat")
      if (nc > 0)
        assert(r.getAs[Double]("mean_post_control") == rr(cc.toDouble / nc / 100, 4))
      else assert(r.isNullAt(r.fieldIndex("mean_post_control")))
      if (nt > 0)
        assert(r.getAs[Double]("mean_post_treat") == rr(ct.toDouble / nt / 100, 4))
      else assert(r.isNullAt(r.fieldIndex("mean_post_treat")))
      if (nc > 0 && nt > 0)
        assert(r.getAs[Double]("uplift") ==
          rr(ct.toDouble / nt / 100 - cc.toDouble / nc / 100, 4))
    }
    // deciles partition the user base
    assert(cells.values.map(c => c._1 + c._2).sum == n)
  }
}
