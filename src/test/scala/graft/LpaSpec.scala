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
}
