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

  test("the 6-round unrolled dedup_components query reaches the true fixpoint") {
    // the oracle-checked SQL form runs a FIXED 6 rounds; prove that is
    // enough on the real pair graph (near-dup clusters are
    // quasi-cliques) by comparing against the iterate-to-fixpoint
    // operator
    val pairs = SparkEntry.queries("dedup_simhash_pairs")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val sqlForm = SparkEntry.queries("dedup_components")(spark, TestSpark.Sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sqlForm == unionFind(pairs))
    // is_keeper rows are exactly the component heads
    val keepers = SparkEntry.queries("dedup_components")(spark, TestSpark.Sf)
      .collect().filter(_.getLong(2) == 1L).map(_.getLong(0)).toSet
    assert(keepers == sqlForm.values.toSet)
  }
}
