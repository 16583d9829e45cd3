package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic gates for the round-7 twenty-first batch: the rerank-depth
  * curve (every depth's shortlist + rerank re-walked from sign bits
  * and exact sims, with the set-inclusion monotonicity law pinned)
  * and mean path length / effective diameter (a JVM BFS over the
  * served edge key re-deriving every query's census). */
class R7uOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)

  private def q(x: Double, dec: Int): Double = {
    val m = math.pow(10, dec)
    (if (x >= 0) math.floor(x * m + 0.5) else -math.floor(-x * m + 0.5)) / m
  }

  // ---------------- ann_refine_curve ----------------

  test("ann_refine_curve: every depth's shortlist and rerank re-walk; recall is monotone in R") {
    val raw = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray).toMap
    def dot(a: Array[Double], b: Array[Double]) = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val nrm = raw.map { case (id, v) => id -> { val n = math.sqrt(dot(v, v)); v.map(_ / n) } }
    val bits = raw.map { case (id, v) => id -> v.map(_ > 0) }
    val qids = sqlgen.Wm.QueryIds
    val truth = qids.map { qid =>
      qid -> nrm.keysIterator.filter(_ != qid)
        .map(c => (c, q(dot(nrm(qid), nrm(c)), 6))).toSeq
        .sortBy { case (c, s) => (-s, c) }.take(10).map(_._1).toSet
    }.toMap
    val short100 = qids.map { qid =>
      qid -> nrm.keysIterator.filter(_ != qid)
        .map(c => (c, bits(qid).zip(bits(c)).count { case (a, b) => a != b })).toSeq
        .sortBy { case (c, h) => (h, c) }.take(100).map(_._1)
    }.toMap
    val depths = Seq(10, 25, 50, 100)
    val exp = depths.map { r =>
      val hits = qids.map { qid =>
        val sel = short100(qid).take(r)
          .map(c => (c, q(dot(nrm(qid), nrm(c)), 6)))
          .sortBy { case (c, s) => (-s, c) }.take(10).map(_._1).toSet
        (sel & truth(qid)).size
      }.sum
      r.toLong -> hits.toLong
    }.toMap
    val rows = run("ann_refine_curve").collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val depth = r.getAs[Long]("refine_depth")
      assert(r.getAs[Long]("hits") == exp(depth), s"R=$depth")
      assert(math.abs(r.getAs[Double]("recall10") - q(exp(depth) / 50.0, 4)) < 1e-9)
      assert(r.getAs[Long]("n_exact_scored") == depth * 5)
    }
    // set inclusion: a deeper shortlist's exact-rerank top-10 can only
    // gain truth members — recall is monotone in R
    val byR = depths.map(r => exp(r.toLong))
    assert(byR.sliding(2).forall { case Seq(a, b) => a <= b }, s"not monotone: $byR")
  }

  // ---------------- graph_path_length ----------------

  test("graph_path_length: a JVM BFS over the served edges re-derives every query's census") {
    val edges = run("wm_knn_edges").collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst")))
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val qids = sqlgen.Wm.QueryIds
    val rows = run("graph_path_length").collect()
    assert(rows.length == qids.size)
    rows.foreach { r =>
      val qid = r.getAs[Long]("qid")
      // hop-layered BFS with the self-loop-augmented cumulative frontier
      var frontier = Set(qid)
      val cum = collection.mutable.ArrayBuffer(frontier.size.toLong)
      val newAt = collection.mutable.ArrayBuffer.empty[Long]
      (1 to 4).foreach { _ =>
        frontier = frontier ++ frontier.flatMap(n => adj.getOrElse(n, Set.empty))
        newAt += frontier.size - cum.last
        cum += frontier.size.toLong
      }
      val reached = newAt.sum
      val sw = newAt.zipWithIndex.map { case (n, i) => (i + 1).toLong * n }.sum
      val total = cum.last
      val d90 = (1 to 4).find(h => (cum(h) - 1) * 10 >= (total - 1) * 9).get.toLong
      assert(r.getAs[Long]("n_reached") == reached, s"qid=$qid reached")
      assert(math.abs(r.getAs[Double]("mean_path_len") - q(sw.toDouble / reached, 4)) < 1e-9, s"qid=$qid")
      assert(r.getAs[Long]("eff_diameter") == d90, s"qid=$qid d90")
      // the mean lies inside the horizon
      assert(r.getAs[Double]("mean_path_len") >= 1.0 - 1e-9)
      assert(r.getAs[Double]("mean_path_len") <= 4.0 + 1e-9)
    }
  }
}
