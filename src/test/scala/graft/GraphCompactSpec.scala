package graft

import org.scalatest.funsuite.AnyFunSuite

/** HNSW merge/compaction (vec_graph_compact, §2 row 4k4): the whole
  * insert-repair prune re-derived in the JVM from the served g_knn
  * adjacency and the append batch's forward-links dump — every census
  * row (counts, checksums, per-degree histogram) must match exactly. */
class GraphCompactSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val K = 16

  test("vec_graph_compact: exact JVM mirror of the degree-capped reverse-link merge") {
    Tables.register(spark, TestSpark.Sf)
    WmCache.ensure(spark, TestSpark.Sf)
    val knn = spark.table("g_knn").collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst"), r.getAs[Double]("sim")))
    val links = spark.sql(new graft.sqlgen.Gen(
        graft.sqlgen.SparkDialect, useViews = true).graphAppendLinksSql).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"), r.getAs[Double]("sim")))
    assert(links.nonEmpty)
    // reverse candidates: every forward link flips into its existing
    // endpoint; affected = the existing nodes receiving one
    val rc = links.map { case (q, c, s) => (c, q, s) }
    val aff = rc.map(_._1).toSet
    val adj = knn.filter(e => aff(e._1)) ++ rc
    // per-node (sim desc, dst) rank, keep K — the SQL prune, in JVM
    val byNode = adj.groupBy(_._1).view.mapValues(
      _.sortBy { case (_, dst, sim) => (-sim, dst) }).toMap
    val kept = byNode.toSeq.flatMap { case (_, es) => es.take(K) }
    val pruned = byNode.toSeq.flatMap { case (_, es) => es.drop(K) }
    val hist = byNode.map { case (src, es) => src -> math.min(es.size, K) }
      .groupBy(_._2).view.mapValues(_.keys).toMap
    def ck(es: Iterable[(Long, Long, Double)]): Long =
      es.map { case (s, t, _) => s * 1048573L + t }.sum

    val got = SparkEntry.queries("vec_graph_compact")(spark, TestSpark.Sf).collect()
      .map(r => (r.getAs[String]("metric"), r.getAs[Long]("k")) ->
        (r.getAs[Long]("n"), r.getAs[Long]("checksum"))).toMap
    val newNodes = links.map(_._1).distinct
    assert(got(("new_nodes", -1L)) == ((newNodes.size.toLong, newNodes.sum)))
    assert(got(("new_links", -1L)) ==
      ((links.size.toLong, links.map { case (q, c, _) => q * 1048573L + c }.sum)))
    assert(got(("affected_nodes", -1L)) == ((aff.size.toLong, aff.sum)))
    val revKept = kept.filter(_._2 >= 1000000L)
    assert(got(("rev_inserted", -1L)) == ((revKept.size.toLong, ck(revKept))))
    assert(got(("pruned", -1L)) == ((pruned.size.toLong, ck(pruned))))
    hist.foreach { case (deg, nodes) =>
      assert(got(("after_degree", deg.toLong)) ==
        ((nodes.size.toLong, nodes.sum)), s"degree $deg")
    }
    // structural invariants of a healthy compaction
    assert(hist.keys.max <= K, "degree cap must hold after the merge")
    assert(revKept.nonEmpty, "some reverse links must survive the prune")
    assert(kept.size == adj.size - pruned.size)
  }
}
