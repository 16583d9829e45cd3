package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.WmConst
import graft.operators.PcaSolve
import graft.sqlgen.Wm

/** Multi-vector late-interaction retrieval (search_maxsim, §2 row
  * 21q): full JVM mirror of the ColBERT-shaped score — per-token
  * hash embeddings, per-(doc, term) max similarity, exact-integer
  * per-query sums, top-10 ranking — re-derived from the raw parquet
  * text with the same IEEE steps the SQL renders. */
class MaxSimSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def rr(x: Double, dec: Int) = PcaSolve.roundAway(x, dec)

  test("search_maxsim: exact JVM mirror of scores and ranking") {
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").toLowerCase.split("\\s+")
          .filter(_.nonEmpty).take(Wm.MaxSimTokens))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    // per-query expected top-10: score = Σ_terms max_tok rr(dot, 6)
    // in exact micro-units
    val expect = Wm.MaxSimQueries.map { case (q, ts) =>
      val tvs = ts.map(WmConst.maxsimVec)
      val scored = docs.map { case (id, toks) =>
        val vecs = toks.map(WmConst.maxsimVec)
        val s = tvs.map { tv =>
          rr(vecs.map(v => rr(dot(v, tv), 6)).max * 1000000, 0).toLong
        }.sum
        (id, s)
      }
      q -> scored.sortBy { case (id, s) => (-s, id) }.take(10)
    }.toMap
    val got = SparkEntry.queries("search_maxsim")(spark, TestSpark.Sf).collect()
      .groupBy(_.getAs[Long]("qid"))
    assert(got.keySet == expect.keySet.map(_.toLong))
    expect.foreach { case (q, want) =>
      val rows = got(q.toLong).sortBy(_.getAs[Long]("rank"))
      assert(rows.length == 10, s"query $q row count")
      rows.zip(want).zipWithIndex.foreach { case ((r, (id, s)), i) =>
        assert(r.getAs[Long]("rank") == i + 1)
        assert(r.getAs[Long]("doc_id") == id, s"query $q rank ${i + 1}")
        assert(r.getAs[Double]("score") == rr(s.toDouble / 1000000.0, 6),
          s"query $q rank ${i + 1} score")
      }
    }
    // the late-interaction property that distinguishes MaxSim from a
    // bag-mean score: a doc containing an exact query term hits that
    // term's max at ~1.0 (self-similarity of the token vector)
    val q1Terms = Wm.MaxSimQueries.head._2.toSet
    val hit = docs.find(_._2.exists(q1Terms.contains)).get
    val tv = WmConst.maxsimVec(hit._2.find(q1Terms.contains).get)
    assert(math.abs(rr(dot(tv, tv), 6) - 1.0) < 2e-6)
  }

  test("search_maxsim_pruned: exact JVM mirror of candidates, overlap and top-1 agreement") {
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").toLowerCase.split("\\s+")
          .filter(_.nonEmpty).take(Wm.MaxSimTokens))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val got = SparkEntry.queries("search_maxsim_pruned")(spark, TestSpark.Sf).collect()
      .map(r => r.getAs[Long]("qid") -> r).toMap
    assert(got.keySet == Wm.MaxSimQueries.map(_._1.toLong).toSet)
    Wm.MaxSimQueries.foreach { case (q, ts) =>
      val tvs = ts.map(WmConst.maxsimVec)
      val probes = ts.flatMap(WmConst.maxsimProbes).toSet
      val scored = docs.map { case (id, toks) =>
        val vecs = toks.map(WmConst.maxsimVec)
        val s = tvs.map { tv =>
          rr(vecs.map(v => rr(dot(v, tv), 6)).max * 1000000, 0).toLong
        }.sum
        val cand = vecs.exists(v => probes(WmConst.maxsimBucket(v)))
        (id, s, cand)
      }
      val full10 = scored.sortBy { case (id, s, _) => (-s, id) }.take(10).map(_._1).toSet
      val cands = scored.filter(_._3)
      val pr10 = cands.sortBy { case (id, s, _) => (-s, id) }.take(10).map(_._1).toSet
      val r = got(q.toLong)
      assert(r.getAs[Long]("n_cand") == cands.length.toLong, s"query $q candidates")
      assert(r.getAs[Long]("overlap10") == full10.intersect(pr10).size.toLong,
        s"query $q overlap")
      assert(r.getAs[Double]("recall10") ==
        rr(full10.intersect(pr10).size / 10.0, 2), s"query $q recall")
      val top1Full = scored.minBy { case (id, s, _) => (-s, id) }._1
      val top1Pr = cands.minBy { case (id, s, _) => (-s, id) }._1
      assert(r.getAs[Long]("top1_match") ==
        (if (top1Full == top1Pr) 1L else 0L), s"query $q top1")
      // the pruning must actually prune AND keep recall meaningful at
      // this SF (exact-term docs are always candidates: a term's own
      // token sits in its own bucket)
      assert(cands.length < docs.length, s"query $q pruned nothing")
      assert(r.getAs[Long]("overlap10") >= 5, s"query $q recall collapsed")
    }
  }
}
