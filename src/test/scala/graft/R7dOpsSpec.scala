package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic gates for the round-7 third batch: inter-event-time
  * histogram, pairwise-similarity histogram, embedding data drift. */
class R7dOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)

  private def q(x: Double, dec: Int): Double = {
    val m = math.pow(10, dec)
    (if (x >= 0) math.floor(x * m + 0.5) else -math.floor(-x * m + 0.5)) / m
  }

  test("events_inter_event_hist: log2 gap buckets match the JVM mirror") {
    Tables.register(spark, TestSpark.Sf)
    val ev = spark.sql(
      "select user_id, event_id, ts div 1000000000 as sec from events")
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[Long]("sec")))
    val gaps: Seq[Long] = ev.groupBy(_._1).values.flatMap { es =>
      val secs = es.sortBy(e => (e._3, e._2)).map(_._3)
      secs.zip(secs.drop(1)).map { case (a, b) => b - a }
    }.toSeq
    def bucket(g: Long): Long =
      if (g == 0) -1L else (63 - java.lang.Long.numberOfLeadingZeros(g)).toLong
    val expect = gaps.groupBy(bucket).view
      .mapValues(gs => (gs.length.toLong, q(gs.sum.toDouble / gs.length, 2))).toMap
    val rows = run("events_inter_event_hist").collect()
    assert(rows.length == expect.size && rows.nonEmpty)
    rows.foreach { r =>
      val (n, mean) = expect(r.getAs[Long]("bucket"))
      assert(r.getAs[Long]("n_gaps") == n, s"bucket ${r.getAs[Long]("bucket")}")
      assert(math.abs(r.getAs[Double]("mean_gap_s") - mean) < 1e-9)
      val b = r.getAs[Long]("bucket")
      assert(r.getAs[Long]("gap_lo_s") == (if (b == -1) 0L else 1L << b))
    }
    assert(rows.map(_.getAs[Long]("n_gaps")).sum == gaps.length.toLong)
  }

  private lazy val normVecs: Map[Long, Array[Double]] = {
    Tables.register(spark, TestSpark.Sf)
    spark.sql("select vec_id, cast(embedding as array<double>) as v from embeddings")
      .collect().map { r =>
        val v = r.getSeq[Double](1).toArray
        var ss = 0.0; var i = 0
        while (i < v.length) { ss += v(i) * v(i); i += 1 }
        val nrm = math.sqrt(ss)
        r.getLong(0) -> v.map(_ / nrm)
      }.toMap
  }

  test("vec_pairwise_dist_hist: translational-pair similarity bins match the JVM mirror") {
    import graft.functions.Prf
    val n = normVecs.keys.max + 1
    val deltas = (0 until 3).map(k => 1 + Prf.prf("pdh", k) % (n - 1))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val sims = for {
      id <- normVecs.keys.toSeq
      dl <- deltas
      ib = (id + dl) % n
      if ib != id
      vb <- normVecs.get(ib)
    } yield q(dot(normVecs(id), vb), 6)
    val expect = sims.groupBy(s => math.min(19L, math.floor((s + 1) * 10).toLong)).view
      .mapValues(ss => (ss.length.toLong,
        q(ss.map(BigDecimal(_)).sum.toDouble / ss.length, 4))).toMap
    val rows = run("vec_pairwise_dist_hist").collect()
    assert(rows.length == expect.size && rows.nonEmpty)
    rows.foreach { r =>
      val (cnt, mean) = expect(r.getAs[Long]("bin"))
      assert(r.getAs[Long]("n_pairs") == cnt, s"bin ${r.getAs[Long]("bin")}")
      assert(math.abs(r.getAs[Double]("mean_sim") - mean) < 1e-9)
    }
    assert(rows.map(_.getAs[Long]("n_pairs")).sum == sims.length.toLong)
  }

  test("vec_data_drift: per-dim half-corpus moments and z-shift match the JVM mirror") {
    Tables.register(spark, TestSpark.Sf)
    val raw = spark.sql("select vec_id, cast(embedding as array<double>) as v from embeddings")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val mx = raw.map(_._1).max
    val rows = run("vec_data_drift").collect()
    assert(rows.length == 64)
    rows.foreach { r =>
      val dim = r.getAs[Long]("dim").toInt // 1-based pos
      def half(h: Int) = raw.filter(x => (if (x._1 * 2 <= mx) 0 else 1) == h)
        .map(x => BigDecimal(q(x._2(dim - 1), 6)))
      val (h0, h1) = (half(0), half(1))
      def stats(vs: Seq[BigDecimal]) = {
        val c = vs.length
        val mu = (vs.sum.toDouble) / c
        val v = (vs.map(x => x * x).sum.toDouble) / c - mu * mu
        (c.toLong, mu, v)
      }
      val (c0, mu0, v0) = stats(h0)
      val (c1, mu1, v1) = stats(h1)
      assert(r.getAs[Long]("n_first") == c0 && r.getAs[Long]("n_second") == c1)
      assert(math.abs(r.getAs[Double]("mu_first") - mu0) < 1e-6)
      assert(math.abs(r.getAs[Double]("mu_second") - mu1) < 1e-6)
      assert(math.abs(r.getAs[Double]("std_pooled") - math.sqrt((v0 + v1) / 2)) < 1e-5)
      assert(math.abs(r.getAs[Double]("z_shift") -
        math.abs(mu0 - mu1) / math.sqrt((v0 + v1) / 2 + 1e-6)) < 1e-3)
      assert(r.getAs[Double]("z_shift") >= 0)
    }
    // the two halves partition the corpus
    assert(rows.head.getAs[Long]("n_first") + rows.head.getAs[Long]("n_second") == raw.length.toLong)
  }
}
