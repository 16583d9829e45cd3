package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic gates for the round-7 twenty-fifth batch: the semantic-
  * dedup threshold ladder (every level refolded from the oracle-
  * checked pair key; survival monotone in θ) and the LPA convergence
  * curve (per-round labels and Newman modularity re-derived in the
  * JVM; round 3 pinned equal to the served graph_modularity). */
class R7yOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)

  private def q(x: Double, dec: Int): Double = {
    val m = math.pow(10, dec)
    (if (x >= 0) math.floor(x * m + 0.5) else -math.floor(-x * m + 0.5)) / m
  }
  private def qL(x: Double): Long =
    (if (x >= 0) math.floor(x + 0.5) else -math.floor(-x + 0.5)).toLong

  // ---------------- dedup_semantic_curve ----------------

  test("dedup_semantic_curve: every level refolds from the pair key; survival is monotone") {
    val pairs = run("dedup_embedding").collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Double]("cos_sim")))
    val rows = run("dedup_semantic_curve").collect().sortBy(_.getAs[Double]("cos_threshold"))
    assert(rows.map(_.getAs[Double]("cos_threshold")).toSeq == Seq(0.30, 0.35, 0.40, 0.45))
    rows.foreach { r =>
      val th = r.getAs[Double]("cos_threshold")
      val sv = pairs.filter(_._3 >= th)
      assert(r.getAs[Long]("n_pairs") == sv.length.toLong, s"th=$th pairs")
      val docs = (sv.map(_._1) ++ sv.map(_._2)).distinct.size.toLong
      assert(r.getAs[Long]("n_docs_involved") == docs, s"th=$th docs")
      val ssim = sv.map(p => qL(p._3 * 1e6)).sum
      assert(math.abs(r.getAs[Double]("mean_survivor_sim") -
        q(ssim.toDouble / 1e6 / sv.length, 4)) < 1e-9, s"th=$th mean")
    }
    val np = rows.map(_.getAs[Long]("n_pairs")).toSeq
    assert(np.sliding(2).forall { case Seq(a, b) => a >= b }, "pair survival not monotone")
  }

  // ---------------- graph_lpa_curve ----------------

  test("graph_lpa_curve: per-round labels and Newman modularity re-derive; round 3 = served") {
    val edges = run("wm_knn_edges").collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst")))
    val nodes = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet")
      .select("vec_id").collect().map(_.getAs[Long]("vec_id"))
    val adj = (edges ++ edges.map(_.swap) ++ nodes.map(n => (n, n)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    // the simple (deduped, undirected) edge set + degrees for Newman Q
    val und = edges.filter { case (s0, d0) => s0 != d0 }
      .map { case (s0, d0) => (math.min(s0, d0), math.max(s0, d0)) }.distinct
    val m = und.length.toLong
    val deg = (und.map(_._1) ++ und.map(_._2)).groupBy(identity).view.mapValues(_.size.toLong).toMap
    def modularity(lab: Map[Long, Long]): Double = {
      val intra = und.count { case (a, b) => lab(a) == lab(b) }.toLong
      val sds = lab.groupBy(_._2).values
        .map(g => g.keysIterator.map(v => deg.getOrElse(v, 0L)).sum).map(s0 => s0 * s0).sum
      intra.toDouble / m - sds.toDouble / (4.0 * m * m)
    }
    var lab: Map[Long, Long] = nodes.map(n => n -> n).toMap
    val perRound = (1 to 3).map { _ =>
      lab = nodes.map { n =>
        val votes = adj(n).map(lab).groupBy(identity).map { case (l, vs) => (l, vs.size) }
        n -> votes.maxBy { case (l, c) => (c.toLong, -l) }._1
      }.toMap
      (lab.values.toSet.size.toLong, modularity(lab))
    }
    val rows = run("graph_lpa_curve").collect().sortBy(_.getAs[Long]("n_rounds"))
    assert(rows.length == 3)
    rows.zip(perRound).zipWithIndex.foreach { case ((r, (nc, mq)), i) =>
      assert(r.getAs[Long]("n_rounds") == i + 1L)
      assert(r.getAs[Long]("n_communities") == nc, s"round ${i + 1} communities")
      assert(r.getAs[Long]("m_edges") == m)
      assert(math.abs(r.getAs[Double]("modularity") - q(mq, 6)) < 1e-9, s"round ${i + 1} Q")
    }
    // round 3 must equal the served modularity report exactly
    val served = run("graph_modularity").collect().head
    assert(rows.last.getAs[Double]("modularity") == served.getAs[Double]("modularity"))
    assert(rows.last.getAs[Long]("n_communities") == served.getAs[Long]("n_communities"))
    // propagation coarsens: community count never increases round over round
    assert(perRound.map(_._1).sliding(2).forall { case Seq(a, b) => a >= b })
  }
}
