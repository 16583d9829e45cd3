package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Prf

/** Semantic gates for the round-6 batch-3 ops: the delete/tombstone
  * report's conservation laws re-derived from the served index views
  * and the JVM PRF mirror, the RFM segmentation mirrored end to end
  * (medians, segments, means), and the path-mining top-k recounted
  * from raw events.
  */
class R6cOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)

  // ---------------- vec_delete ----------------

  test("vec_delete: per-product rows and granules match the JVM tombstone mirror") {
    val rows = run("vec_delete").collect()
      .map(r => r.getAs[String]("index_name") ->
        (r.getAs[Long]("rows_before"), r.getAs[Long]("rows_after"),
          r.getAs[Long]("granules_before"), r.getAs[Long]("granules_after"),
          r.getAs[Long]("granules_emptied"))).toMap
    assert(rows.keySet == Set("lsh_buckets", "knn_graph", "ivf_flat", "pq8", "bq_sign"))

    val ids = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet")
      .collect().map(_.getAs[Long]("vec_id"))
    val del = ids.filter(id => Prf.prfMod(1048576, "vdel", id) < 104858).toSet
    val n = ids.length.toLong; val nd = del.size.toLong
    assert(nd > 0, "tombstone set empty — PRF selection broken")

    // exact row conservation for the 1-row/vector (and 8-, LshTables-)
    // products
    assert(rows("ivf_flat")._1 == n && rows("ivf_flat")._2 == n - nd)
    assert(rows("bq_sign")._1 == n && rows("bq_sign")._2 == n - nd)
    assert(rows("pq8")._1 == 8 * n && rows("pq8")._2 == 8 * (n - nd))
    assert(rows("lsh_buckets")._1 == 2 * n && rows("lsh_buckets")._2 == 2 * (n - nd))

    // kNN edges drop when EITHER endpoint is tombstoned — recount from
    // the served graph view (run() above materialized it)
    val edges = spark.table("g_knn").collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst")))
    val kept = edges.count { case (s, d) => !del.contains(s) && !del.contains(d) }
    assert(rows("knn_graph")._1 == edges.length.toLong)
    assert(rows("knn_graph")._2 == kept.toLong)
    val srcB = edges.map(_._1).distinct.length.toLong
    val srcA = edges.filter { case (s, d) => !del.contains(s) && !del.contains(d) }
      .map(_._1).distinct.length.toLong
    assert(rows("knn_graph")._3 == srcB && rows("knn_graph")._4 == srcA)
    assert(rows("knn_graph")._5 == srcB - srcA)

    rows.values.foreach { case (r0, r1, g0, g1, ge) =>
      assert(r1 <= r0 && g1 <= g0 && ge == g0 - g1)
    }
  }

  // ---------------- events_rfm ----------------

  test("events_rfm: medians, segments, and means match a full JVM mirror") {
    Tables.register(spark, TestSpark.Sf)
    val evs = spark.sql("select user_id, ts, value from events").collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[Long]("ts") / 1000000000L / 86400L,
        BigDecimal(r.getAs[Double]("value")).setScale(6, BigDecimal.RoundingMode.HALF_UP)))
    val mxDay = evs.map(_._2).max
    case class U(rec: Long, freq: Long, mon: BigDecimal, mg: Long)
    val users = evs.groupBy(_._1).map { case (uid, rs) =>
      val mon = rs.map(_._3).sum
      uid -> U(mxDay - rs.map(_._2).max, rs.length.toLong, mon,
        math.floor(mon.toDouble / 10.0).toLong)
    }
    def median(xs: Iterable[Long]): Long = {
      val sorted = xs.toSeq.sorted; val need = math.ceil(sorted.size * 0.5).toLong
      sorted.zipWithIndex.collectFirst { case (x, i) if i + 1 >= need => x }.get
    }
    val (rm, fm, mm) = (median(users.values.map(_.rec)),
      median(users.values.map(_.freq)), median(users.values.map(_.mg)))
    val segs = users.values.groupBy { u =>
      (if (u.rec <= rm) "R+" else "R-") + (if (u.freq > fm) "F+" else "F-") +
        (if (u.mg > mm) "M+" else "M-")
    }
    val rows = run("events_rfm").collect()
    assert(rows.map(_.getAs[Long]("n_users")).sum == users.size.toLong)
    assert(rows.length == segs.size)
    rows.foreach { r =>
      val s = segs(r.getAs[String]("segment"))
      assert(r.getAs[Long]("n_users") == s.size.toLong)
      assert(math.abs(r.getAs[Double]("avg_recency_days") -
        s.map(_.rec).sum.toDouble / s.size) < 0.011)
      assert(math.abs(r.getAs[Double]("avg_frequency") -
        s.map(_.freq).sum.toDouble / s.size) < 0.011)
      assert(math.abs(r.getAs[Double]("avg_monetary") -
        s.map(_.mon).sum.toDouble / s.size) < 0.011)
    }
  }

  // ---------------- events_paths ----------------

  test("events_paths: trigram counts and ranked top-k match a JVM mirror") {
    Tables.register(spark, TestSpark.Sf)
    val evs = spark.sql("select user_id, ts, event_id, event_type from events").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("ts") / 1000000000L,
        r.getAs[Long]("event_id"), r.getAs[String]("event_type")))
    val counts = evs.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
      val seq = rs.sortBy(r => (r._2, r._3)).map(_._4)
      seq.sliding(3).filter(_.size == 3).map(_.mkString(" > "))
    }.groupBy(identity).map { case (p, v) => p -> v.size.toLong }
    // rank = 1 + #strictly better (count desc, path asc); keep rank<=20
    val expect = counts.map { case (p, n) =>
      val rn = 1 + counts.count { case (q, m) => m > n || (m == n && q < p) }
      (p, n, rn.toLong)
    }.filter(_._3 <= 20L)
    val rows = run("events_paths").collect()
      .map(r => (r.getAs[String]("path"), r.getAs[Long]("n_occurrences"), r.getAs[Long]("rn")))
    assert(rows.toSet == expect.toSet, s"got ${rows.length} rows, want ${expect.size}")
  }
}
