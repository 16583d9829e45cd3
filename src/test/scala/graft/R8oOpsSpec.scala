package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-8 batch 5: the graph spectral estimate and the audio
  * perceptual-fingerprint dedup census. */
class R8oOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Sf = TestSpark.Sf

  test("graph_spectral: walk counts mirror exact JVM adjacency powers; Prony closed form matches") {
    val row = SparkEntry.queries("graph_spectral")(spark, Sf).collect()(0)
    // mirror the symmetrized simple edge set from the served kNN graph
    val knn = SparkEntry.queries("wm_knn_edges")(spark, Sf).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst")))
    val und = knn.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    val nodes = spark.read.parquet(s"$Sf/embeddings.parquet")
      .selectExpr("vec_id").collect().map(_.getLong(0))
    val adj = (und.toSeq.flatMap(e => Seq(e, e.swap))).groupBy(_._1)
      .view.mapValues(_.map(_._2)).toMap
    var r0 = nodes.map(_ -> 1L).toMap
    val ws = (1 to 4).map { _ =>
      val nx = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      r0.foreach { case (u, c) => adj.getOrElse(u, Seq.empty).foreach(v => nx(v) += c) }
      r0 = nodes.map(n => n -> nx(n)).toMap
      r0.values.sum
    }
    assert(row.getAs[Long]("n_edges") == und.size)
    assert(row.getAs[Long]("walks_1") == ws(0) && row.getAs[Long]("walks_2") == ws(1))
    assert(row.getAs[Long]("walks_3") == ws(2) && row.getAs[Long]("walks_4") == ws(3))
    assert(ws(0) == 2L * und.size, "1-walks = directed edge count")
    // Prony closed form from the same counts, exact double op order
    val (w1, w2, w3, w4) = (ws(0).toDouble, ws(1).toDouble, ws(2).toDouble, ws(3).toDouble)
    val det = w2 * w2 - w1 * w3
    assert(det != 0.0)
    val p = (w3 * w2 - w4 * w1) / det
    val q = (w2 * w4 - w3 * w3) / det
    def rA(x: Double, n: Int) = graft.operators.PcaSolve.roundAway(x, n)
    val l1 = (p + math.sqrt(p * p + 4 * q)) / 2
    val l2 = (p - math.sqrt(p * p + 4 * q)) / 2
    assert(row.getAs[Double]("lambda1_est") == rA(l1, 4))
    assert(row.getAs[Double]("lambda2_est") == rA(l2, 4))
    assert(row.getAs[Double]("spectral_gap") == rA(l1 - math.abs(l2), 4))
    // sanity: the dominant estimate sits inside the degree envelope
    val maxDeg = adj.values.map(_.size).max
    assert(l1 > 0 && l1 <= maxDeg + 1e-9, s"lambda1 $l1 vs max degree $maxDeg")
    assert(math.abs(l2) <= l1 + 1e-9)
  }

  test("graph_percolation_curve mirrors the JVM Molloy–Reed fold per rung") {
    val out = SparkEntry.queries("graph_percolation_curve")(spark, Sf).collect()
      .map(r => r.getAs[Long]("removal_pct") -> r).toMap
    assert(out.keySet == Set(0L, 1L, 2L, 5L))
    val und = SparkEntry.queries("wm_knn_edges")(spark, Sf).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst")))
      .filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    val n = spark.read.parquet(s"$Sf/embeddings.parquet").count()
    val deg = und.toSeq.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    def rA(x: Double, p: Int) = graft.operators.PcaSolve.roundAway(x, p)
    for (r <- Seq(0L, 1L, 2L, 5L)) {
      val k = n * r / 100
      val cuts = deg.values.toSeq.distinct.filter(d => deg.values.count(_ >= d) <= k)
      val dcut = if (cuts.isEmpty) deg.values.max + 1 else cuts.min
      val removed = deg.values.count(_ >= dcut).toLong
      val surE = und.filter(e => deg(e._1) < dcut && deg(e._2) < dcut)
      val sk = 2L * surE.size
      val sdeg = surE.toSeq.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
        .view.mapValues(_.size.toLong)
      val sk2 = sdeg.values.map(v => v * v).sum
      val row = out(r)
      assert(row.getAs[Long]("degree_cutoff") == dcut, s"rung $r cutoff")
      assert(row.getAs[Long]("n_removed") == removed)
      assert(row.getAs[Long]("n_edges_surviving") == surE.size.toLong)
      assert(row.getAs[Double]("edge_survival_share") == rA(sk / (2.0 * und.size), 4))
      assert(row.getAs[Double]("mean_surviving_degree") == rA(sk.toDouble / (n - removed), 4))
      if (sk > 0)
        assert(row.getAs[Double]("molloy_reed_kappa") == rA(sk2 / sk.toDouble, 4), s"rung $r kappa")
      assert(row.getAs[Long]("giant_component") == (if (sk > 0 && sk2 > 2 * sk) 1L else 0L))
    }
    // the bench graph is hub-resilient or it isn't — either way rung 0
    // must be the intact graph
    assert(out(0L).getAs[Double]("edge_survival_share") == 1.0)
  }

  test("q_cohort_revenue mirrors the JVM cohort fold exactly") {
    val out = SparkEntry.queries("q_cohort_revenue")(spark, Sf).collect()
      .map(r => (r.getAs[Long]("cohort_month"), r.getAs[Long]("age_months")) -> r).toMap
    val orders = spark.read.parquet(s"$Sf/orders.parquet")
      .selectExpr("o_custkey", "year(o_orderdate) * 12 + month(o_orderdate) as m",
        "cast(o_totalprice as decimal(18,2)) as rev").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getDecimal(2)))
    val m0 = orders.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val cells = orders.groupBy(o => (m0(o._1), o._2 - m0(o._1)))
    assert(out.size == cells.size)
    def rA(x: Double, n: Int) = graft.operators.PcaSolve.roundAway(x, n)
    val cohortSize = cells.collect { case ((c, 0L), os) => c -> os.map(_._1).distinct.length }
    val rev0 = cells.collect { case ((c, 0L), os) =>
      c -> os.map(_._3).reduce(_ add _) }
    cells.foreach { case ((c, age), os) =>
      val r = out((c, age))
      val nCust = os.map(_._1).distinct.length
      val rev = os.map(_._3).reduce(_ add _)
      assert(r.getAs[Long]("n_customers") == nCust, s"cell ($c, $age)")
      assert(r.getAs[Double]("revenue") == rA(rev.doubleValue(), 2), s"cell ($c, $age) revenue")
      assert(r.getAs[Double]("retention") == rA(nCust.toDouble / cohortSize(c), 4))
      assert(r.getAs[Double]("revenue_ratio") == rA(rev.doubleValue() / rev0(c).doubleValue(), 4))
    }
  }

  test("multimodal_audio_fp: census equals the container-free fingerprint census") {
    import graft.operators.Wav
    val out = SparkEntry.queries("multimodal_audio_fp")(spark, Sf).collect()
      .map(r => r.getAs[Long]("group_size") ->
        (r.getAs[Long]("n_groups"), r.getAs[Long]("n_clips"))).toMap
    // independent path: fingerprints straight from the synth formula,
    // NO WAV container round-trip — equality proves encode→decode
    // inverts on every sample the fingerprint touches
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
      .selectExpr("cast(doc_id as bigint)", "cast(n_chars as int)").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val census = docs.map { case (id, n) => Wav.fingerprint(Wav.synthSamplesAm(id, n)) }
      .groupBy(identity).map(_._2.length.toLong)
      .groupBy(identity).view.mapValues(v => (v.size.toLong, v.sum)).toMap
    assert(out == census, s"census mismatch: $out vs $census")
    assert(out.values.map(_._2).sum == docs.length, "every clip lands in one group")
    // the fingerprint is non-degenerate on this corpus: >1 distinct value
    assert(out.values.map(_._1).sum > 1)
  }
}
