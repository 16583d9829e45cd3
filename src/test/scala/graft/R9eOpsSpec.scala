package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Prf

/** Round-9 batch E: `graph_betweenness` — Brandes' sampled
  * bounded-horizon betweenness, mirrored exactly in JVM collections
  * (BFS shortest-path counts, quantized dependency accumulation). */
class R9eOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def r4(x: Double) = graft.operators.PcaSolve.roundAway(x, 4)
  private def q6(x: Double): Long = graft.operators.PcaSolve.roundAway(x, 0).toLong

  test("graph_betweenness: exact JVM Brandes mirror over the served graph") {
    Tables.register(spark, TestSpark.Sf)
    WmCache.ensure(spark, TestSpark.Sf)
    val knn = spark.table("g_knn").collect()
      .map(r => r.getAs[Long]("src") -> r.getAs[Long]("dst"))
    val edges = (knn ++ knn.map(_.swap)).distinct
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nodes = spark.sql("select vec_id from embeddings").collect()
      .map(_.getLong(0))
    val srcs = nodes.sortBy(id => (Prf.prf("btw", id), id)).take(4)

    // forward: BFS dist + shortest-path counts sigma, horizon 3
    val acc = collection.mutable.Map.empty[(Long, Long), Long] // (qs, node) -> del (1e-6 units)
    val terms = collection.mutable.Map.empty[(Long, Long), Int]
    srcs.foreach { s =>
      val dist = collection.mutable.Map(s -> 0)
      val sig = collection.mutable.Map(s -> 1L)
      var frontier = Set(s)
      for (dd <- 1 to 3) {
        val next = collection.mutable.Map.empty[Long, Long]
        frontier.foreach { v =>
          adj.getOrElse(v, Set.empty).foreach { w =>
            if (!dist.contains(w)) next(w) = next.getOrElse(w, 0L) + sig(v)
            else if (dist(w) == dd) next(w) = next.getOrElse(w, 0L) + sig(v)
          }
        }
        val fresh = next.keySet.filterNot(dist.contains)
        fresh.foreach { w => dist(w) = dd; sig(w) = next(w) }
        frontier = fresh.toSet
      }
      // backward: delta at dist 2 then dist 1, quantized per contribution
      def succs(v: Long) =
        adj.getOrElse(v, Set.empty).filter(w => dist.get(w).contains(dist(v) + 1))
      // the SQL's d1/d2 aggregate over the successor JOIN, so a
      // dist-1/2 node with no forward successors emits no row
      val d2 = dist.collect { case (v, 2) if succs(v).nonEmpty =>
        v -> succs(v).toSeq.map(w => q6(sig(v).toDouble / sig(w) * 1e6)).sum
      }.toMap
      val d1 = dist.collect { case (v, 1) if succs(v).nonEmpty =>
        v -> succs(v).toSeq.map(w =>
          q6(sig(v).toDouble / sig(w) * (1000000L + d2.getOrElse(w, 0L)))).sum
      }.toMap
      d1.foreach { case (v, del) =>
        acc((s, v)) = del; terms((s, v)) = terms.getOrElse((s, v), 0) + 1
      }
      d2.foreach { case (v, del) =>
        acc((s, v)) = acc.getOrElse((s, v), 0L) + del
        terms((s, v)) = terms.getOrElse((s, v), 0) + 1
      }
    }
    val byNode = acc.groupBy(_._1._2).map { case (n, m) =>
      n -> (m.values.sum, m.keys.size)
    }
    // n_source_terms counts (qs, node) rows in the d1-union-d2 table:
    // a node at dist 1 for one source contributes one row per source
    // PER LEVEL TABLE it appears in — exactly one (its dist is unique
    // per source), so terms == contributing sources
    val got = SparkEntry.queries("graph_betweenness")(spark, TestSpark.Sf)
      .collect().map(r => r.getAs[Long]("node") ->
        (r.getAs[Long]("n_source_terms"), r.getAs[Double]("betweenness"))).toMap
    assert(got.keySet == byNode.keySet,
      s"node sets differ: got ${got.size}, mirror ${byNode.size}")
    byNode.foreach { case (n, (del, nt)) =>
      assert(got(n)._1 == nt.toLong, s"node $n terms")
      assert(got(n)._2 == r4(del.toDouble / 1e6), s"node $n betweenness")
    }
    // sanity: somebody carries load
    assert(byNode.nonEmpty && byNode.values.map(_._1).max > 0L)
  }
}
