package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic gates for the round-7 twelfth batch: the scalar-quantization
  * bits ladder (full JVM re-quantization at every rung + the
  * monotone-mse law), the matryoshka prefix-dim recall curve (truth
  * table and every prefix shortlist re-derived from raw embeddings;
  * the dm=64 rung must be its own truth table), the kNN-graph
  * in-degree histogram (census recomputed from the independently
  * served in-degree key), and per-user behavioral entropy (exact
  * integer-grid entropy re-derived per user; single-type users are
  * EXACTLY zero). */
class R7lOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)

  private lazy val rawVectors: Map[Long, Array[Double]] =
    spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet").collect()
      .map { r =>
        r.getAs[Long]("vec_id") ->
          r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray
      }.toMap

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }
  private def normalize(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(dot(v, v)); v.map(_ / n)
  }
  private def q(x: Double, dec: Int): Double = {
    val m = math.pow(10, dec)
    (if (x >= 0) math.floor(x * m + 0.5) else -math.floor(-x * m + 0.5)) / m
  }
  private def qL(x: Double): Long =
    (if (x >= 0) math.floor(x + 0.5) else -math.floor(-x + 0.5)).toLong

  // ---------------- sq_bits_curve ----------------

  test("sq_bits_curve: every rung's mse/max-err/clamp census matches a full JVM re-quantization") {
    val rows = run("sq_bits_curve").collect()
    assert(rows.length == 4)
    // per-dimension min/max over the RAW (pre-normalization) values,
    // exactly the vec_quantize training grid
    val dim = rawVectors.head._2.length
    val mn = Array.fill(dim)(Double.MaxValue)
    val mx = Array.fill(dim)(Double.MinValue)
    rawVectors.values.foreach { v =>
      var i = 0
      while (i < dim) {
        if (v(i) < mn(i)) mn(i) = v(i)
        if (v(i) > mx(i)) mx(i) = v(i)
        i += 1
      }
    }
    val byBits = rows.map(r => r.getAs[Long]("bits") -> r).toMap
    assert(byBits.keySet == Set(2L, 4L, 6L, 8L))
    for (bits <- Seq(2, 4, 6, 8)) {
      val levels = 1L << bits
      var n = 0L; var se2 = 0L; var mae = 0.0; var clamped = 0L
      rawVectors.values.foreach { v =>
        var i = 0
        while (i < dim) {
          val (code, deq, cmax) =
            if (mx(i) == mn(i)) (0L, mn(i), 0L)
            else {
              val c = math.min(levels - 1L, math.max(0L,
                math.floor((v(i) - mn(i)) / (mx(i) - mn(i)) * levels).toLong))
              (c, mn(i) + (c + 0.5) / levels * (mx(i) - mn(i)), levels - 1L)
            }
          val e = v(i) - deq
          n += 1; se2 += qL(e * e * 1e12)
          if (math.abs(e) > mae) mae = math.abs(e)
          if (code == 0L || code == cmax) clamped += 1
          i += 1
        }
      }
      val r = byBits(bits.toLong)
      assert(r.getAs[Long]("n_levels") == levels)
      assert(math.abs(r.getAs[Double]("mse") - q(se2.toDouble / (n.toDouble * 1e12), 9)) < 1e-12, s"bits=$bits mse")
      assert(math.abs(r.getAs[Double]("max_abs_err") - q(mae, 6)) < 1e-9, s"bits=$bits mae")
      assert(r.getAs[Long]("n_clamped") == clamped, s"bits=$bits clamped")
      assert(math.abs(r.getAs[Double]("compression_x") - q(64.0 / bits, 2)) < 1e-9)
    }
    // the storage law the curve exists to show: each extra bit pair
    // strictly reduces reconstruction error
    val mseByBits = Seq(2L, 4L, 6L, 8L).map(b => byBits(b).getAs[Double]("mse"))
    assert(mseByBits.sliding(2).forall { case Seq(a, b) => a > b }, s"mse not decreasing: $mseByBits")
  }

  // ---------------- matryoshka_dim_curve ----------------

  test("matryoshka_dim_curve: per-dm hit counts match the JVM truth table; dm=64 is self-witnessing") {
    val rows = run("matryoshka_dim_curve").collect()
    assert(rows.length == 4)
    val nrm = rawVectors.map { case (id, v) => id -> normalize(v) }
    val qids = sqlgen.Wm.QueryIds
    // full-dim exact truth: top-10 by round6(cosine), cid tie-break
    def top10(score: Long => Double, qid: Long): Set[Long] =
      nrm.keysIterator.filter(_ != qid)
        .map(cid => (cid, score(cid)))
        .toSeq.sortBy { case (cid, s) => (-s, cid) }.take(10).map(_._1).toSet
    val truth = qids.map { qid =>
      qid -> top10(cid => q(dot(nrm(qid), nrm(cid)), 6), qid)
    }.toMap
    val byDm = rows.map(r => r.getAs[Long]("prefix_dim") -> r).toMap
    assert(byDm.keySet == Set(8L, 16L, 32L, 64L))
    for (dm <- Seq(8, 16, 32, 64)) {
      val pre = nrm.map { case (id, v) => id -> v.take(dm) }
      val pn = pre.map { case (id, p) => id -> math.sqrt(dot(p, p)) }
      val hits = qids.map { qid =>
        val sel = top10(cid => {
          val s =
            if (pn(qid) == 0 || pn(cid) == 0) 0.0
            else dot(pre(qid), pre(cid)) / (pn(qid) * pn(cid))
          q(s, 6)
        }, qid)
        (sel & truth(qid)).size
      }.sum
      val r = byDm(dm.toLong)
      assert(r.getAs[Long]("hits") == hits.toLong, s"dm=$dm hits")
      assert(math.abs(r.getAs[Double]("recall10") - q(hits / 50.0, 4)) < 1e-9)
      assert(math.abs(r.getAs[Double]("compression_x") - q(64.0 / dm, 2)) < 1e-9)
    }
    // the full-width slice IS the truth table: recall@10 = 1 by construction
    assert(byDm(64L).getAs[Double]("recall10") == 1.0)
  }

  // ---------------- graph_degree_hist ----------------

  test("graph_degree_hist: bucket census matches the served in-degree key; shares conserve") {
    val indeg = run("wm_in_degree").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("in_degree")).toMap
    val all = rawVectors.keysIterator.map(id => indeg.getOrElse(id, 0L)).toSeq
    def bucket(c: Long): Long =
      if (c == 0L) -1L else math.min(39L, (63 - java.lang.Long.numberOfLeadingZeros(c)).toLong)
    val census = all.groupBy(bucket).map { case (b, cs) =>
      b -> (cs.size.toLong, cs.sum)
    }
    val u = all.size.toLong
    val e = all.sum
    val rows = run("graph_degree_hist").collect().sortBy(_.getAs[Long]("log2_bucket"))
    assert(rows.length == census.size)
    var cum = 0L
    rows.foreach { r =>
      val b = r.getAs[Long]("log2_bucket")
      val (nn, ne) = census(b)
      cum += nn
      assert(r.getAs[Long]("bucket_min") == (if (b < 0) 0L else 1L << b))
      assert(r.getAs[Long]("n_nodes") == nn, s"bucket=$b nodes")
      assert(r.getAs[Long]("n_in_edges") == ne, s"bucket=$b edges")
      assert(math.abs(r.getAs[Double]("node_share") - q(nn.toDouble / u, 4)) < 1e-9)
      assert(math.abs(r.getAs[Double]("edge_share") - q(ne.toDouble / e, 4)) < 1e-9)
      assert(math.abs(r.getAs[Double]("cum_node_share") - q(cum.toDouble / u, 4)) < 1e-9)
    }
    // conservation: buckets partition ALL vectors and ALL graph edges
    assert(rows.map(_.getAs[Long]("n_nodes")).sum == u)
    assert(rows.map(_.getAs[Long]("n_in_edges")).sum == e)
    // the zero-in-degree row carries nodes but can carry no edges
    rows.find(_.getAs[Long]("log2_bucket") == -1L)
      .foreach(r => assert(r.getAs[Long]("n_in_edges") == 0L))
  }

  // ---------------- events_user_entropy ----------------

  test("events_user_entropy: integer-grid entropies, bins, and the exact-sum mean match per user") {
    Tables.register(spark, TestSpark.Sf)
    val perUser = spark.sql("select user_id, event_type, count(*) as k from events group by 1, 2")
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"), r.getAs[Long]("k")))
      .groupBy(_._1).map { case (uid, ts) => uid -> ts.map(_._3) }
    def lnq(x: Long): Long = qL(math.log(x.toDouble) * 1e9)
    val hs = perUser.map { case (uid, ks) =>
      val n = ks.sum
      val slnk = ks.map(k => k * lnq(k)).sum
      val h = q((n * lnq(n) - slnk).toDouble / (n.toDouble * 1e9), 6)
      (uid, h, ks.size)
    }.toSeq
    // the grid law: a single-type user's entropy is EXACTLY zero (the
    // n*lnq(n) terms cancel as integers — no float residue survives)
    hs.filter(_._3 == 1).foreach { case (uid, h, _) => assert(h == 0.0, s"user $uid") }
    val nu = hs.size.toLong
    val smq = hs.map(t => qL(t._2 * 1e6)).sum
    val byBin = hs.groupBy(t => math.floor(t._2 * 4).toLong)
    val rows = run("events_user_entropy").collect()
    assert(rows.length == byBin.size)
    rows.foreach { r =>
      val b = r.getAs[Long]("bin")
      val in = byBin(b)
      assert(math.abs(r.getAs[Double]("bin_lo_nats") - q(b / 4.0, 2)) < 1e-9)
      assert(r.getAs[Long]("n_users") == in.size.toLong)
      assert(r.getAs[Long]("n_single_type") == in.count(_._3 == 1).toLong)
      assert(math.abs(r.getAs[Double]("user_share") - q(in.size.toDouble / nu, 4)) < 1e-9)
      assert(math.abs(r.getAs[Double]("mean_entropy") - q(smq.toDouble / 1e6 / nu, 6)) < 1e-9)
    }
    assert(rows.map(_.getAs[Long]("n_users")).sum == nu)
  }
}
