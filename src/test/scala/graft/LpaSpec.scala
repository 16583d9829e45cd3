package graft

import org.scalatest.funsuite.AnyFunSuite

/** Gate for `graph_communities` — synchronous label propagation over
  * the served kNN graph. Differential: the edge table comes from the
  * oracle-checked `wm_knn_edges` key, the 3 LPA rounds re-run in plain
  * JVM collections (mode of neighbour labels, tie → smallest), and the
  * community census must match exactly. Structural laws: members
  * conserve the node count; communities only coarsen vs. round 0.
  */
class LpaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("graph_communities census matches a JVM LPA over the served edges") {
    val edges = SparkEntry.queries("wm_knn_edges")(spark, TestSpark.Sf).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst")))
    val nodes = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet")
      .select("vec_id").collect().map(_.getAs[Long]("vec_id"))
    // symmetrized + self-loop adjacency, as multiset (parallel edges
    // vote once each, exactly like the SQL union all)
    val adj = (edges ++ edges.map(_.swap) ++ nodes.map(n => (n, n)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var lab: Map[Long, Long] = nodes.map(n => n -> n).toMap
    for (_ <- 1 to 3) {
      lab = nodes.map { n =>
        val votes = adj(n).map(lab).groupBy(identity)
          .map { case (l, vs) => (l, vs.size) }
        // mode, tie -> smallest label (max of (count, -label))
        val best = votes.maxBy { case (l, c) => (c.toLong, -l) }
        n -> best._1
      }.toMap
    }
    val expect = lab.values.groupBy(identity).map { case (l, vs) => l -> vs.size.toLong }
    val rows = SparkEntry.queries("graph_communities")(spark, TestSpark.Sf).collect()
      .map(r => r.getAs[Long]("community_id") -> r.getAs[Long]("n_members")).toMap
    assert(rows == expect)
    // conservation: every node lands in exactly one community
    assert(rows.values.sum == nodes.length.toLong)
    // LPA only coarsens from the singleton start
    assert(rows.size <= nodes.length)
    // on a kNN graph with K=16 there is real structure: strictly fewer
    // communities than nodes
    assert(rows.size < nodes.length)
  }

  test("graph_modularity matches the Newman formula over the mirrored labels") {
    val edges = SparkEntry.queries("wm_knn_edges")(spark, TestSpark.Sf).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst")))
    val nodes = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet")
      .select("vec_id").collect().map(_.getAs[Long]("vec_id"))
    val adj = (edges ++ edges.map(_.swap) ++ nodes.map(n => (n, n)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var lab: Map[Long, Long] = nodes.map(n => n -> n).toMap
    for (_ <- 1 to 3) {
      lab = nodes.map { n =>
        val best = adj(n).map(lab).groupBy(identity)
          .map { case (l, vs) => (l, vs.size) }
          .maxBy { case (l, c) => (c.toLong, -l) }
        n -> best._1
      }.toMap
    }
    // simple undirected graph: distinct unordered pairs, no self-loops
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    val m = und.size.toLong
    val deg = und.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (v, vs) => v -> vs.size.toLong }
    val intra = und.count { case (a, b) => lab(a) == lab(b) }.toLong
    val dsum = lab.toSeq.groupBy(_._2).map { case (_, ms) =>
      ms.map(x => deg.getOrElse(x._1, 0L)).sum
    }
    val sds = dsum.map(x => x * x).sum
    val q = intra.toDouble / m - sds.toDouble / (4.0 * m * m)
    val row = SparkEntry.queries("graph_modularity")(spark, TestSpark.Sf).collect().head
    assert(row.getAs[Long]("m_edges") == m)
    assert(row.getAs[Long]("intra_edges") == intra)
    assert(row.getAs[Long]("sum_deg_sq") == sds)
    assert(row.getAs[Long]("n_communities") == lab.values.toSet.size.toLong)
    assert(math.abs(row.getAs[Double]("modularity") - q) < 1e-6)
    // LPA on a K=16 kNN graph finds genuinely assortative structure
    assert(row.getAs[Double]("modularity") > 0.0)
  }
}
