package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Components

/** Connected components over dedup pairs: exact agreement with a
  * driver-side union-find, on both a hand-built graph (chains force
  * multi-hop propagation) and the real SimHash near-dup pairs. */
class ComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- edges) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map(n => n -> find(n)).toMap
  }

  test("chains, cliques and pairs resolve to min-id components") {
    import spark.implicits._
    // a 6-node chain (diameter forces >1 propagation round), a
    // triangle, a pair, interleaved ids
    val edges = Seq((10L, 2L), (2L, 30L), (30L, 4L), (4L, 50L), (50L, 6L),
      (100L, 101L), (101L, 102L), (100L, 102L),
      (7L, 70L))
    val got = Components.connectedComponents(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == unionFind(edges))
    assert(got(50L) == 2L && got(102L) == 100L && got(70L) == 7L)
  }

  test("simhash near-dup clusters agree with driver-side union-find") {
    val pairs = SparkEntry.queries("dedup_simhash_pairs")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs.nonEmpty)
    val got = Components.simhashClusters(spark, TestSpark.Sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == unionFind(pairs))
    // keepers are their own component heads
    assert(got.values.toSet.forall(c => got(c) == c))
  }
}
