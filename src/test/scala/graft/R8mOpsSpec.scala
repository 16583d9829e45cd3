package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-8 batch: incremental graph-index maintenance, second-stage
  * rerank agreement, and the filtered-search strategy curve. */
class R8mOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Sf = TestSpark.Sf

  private def rows(name: String) =
    SparkEntry.queries(name)(spark, Sf).collect()

  test("vec_graph_append links every appended vector; top1_sim mirrors the JVM cosine") {
    val out = rows("vec_graph_append")
    assert(out.nonEmpty)
    // the batch is vec_append's PRF-selected tenth, re-identified —
    // mirror the selection + perturbation and re-derive each top-1
    // similarity from the raw parquet
    val raw = spark.read.parquet(s"$Sf/embeddings.parquet")
      .selectExpr("vec_id", "cast(embedding as array<double>) as v")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def prf(parts: String*): Long = {
      val h = graft.functions.Prf.md5hex(parts.mkString(":")).take(15)
      java.lang.Long.parseLong(h, 16)
    }
    val batch = raw.keys.filter(id => prf("append", id.toString) % 1048576 < 104858)
    assert(out.length == batch.size, s"${out.length} rows for ${batch.size} appended ids")
    def norm(v: Array[Double]): Array[Double] = {
      var s = 0.0; v.foreach(x => s += x * x); val n = math.sqrt(s); v.map(_ / n)
    }
    // the SQL rounds sims with round(x, 6) — Catalyst's BigDecimal
    // HALF_UP, not the house roundAway quantizer
    def r6(x: Double) = graft.operators.PcaSolve.sparkRound(x, 6)
    out.foreach { r =>
      val id = r.getAs[Long]("vec_id"); val orig = id - 1000000
      val pp = (prf("appos", orig.toString) % 64).toInt
      val v = raw(orig).zipWithIndex.map { case (x, k) => if (k == pp) x + 0.2 else x }
      val qn = norm(v)
      val tn = norm(raw(r.getAs[Long]("top1_id")).clone())
      var dot = 0.0
      qn.indices.foreach(i => dot += qn(i) * tn(i))
      assert(r.getAs[Double]("top1_sim") == r6(dot), s"top1 cosine mirror for $id")
      assert(r.getAs[Long]("n_links") <= 8 && r.getAs[Long]("n_links") >= 1)
      assert(r.getAs[Long]("n_rev_updates") <= r.getAs[Long]("n_links"))
      val atM = Option(r.getAs[java.lang.Double]("sim_at_m")).map(_.toDouble)
      atM.foreach(m => assert(m <= r.getAs[Double]("top1_sim")))
    }
    // the beam should usually land the true nearest existing vector
    // (HNSW's promise); pin a floor, not exactness — it's approximate
    val exact = out.count { r =>
      val id = r.getAs[Long]("vec_id"); val orig = id - 1000000
      val pp = (prf("appos", orig.toString) % 64).toInt
      val qn = norm(raw(orig).zipWithIndex.map { case (x, k) => if (k == pp) x + 0.2 else x })
      val best = raw.maxBy { case (_, w) =>
        val wn = norm(w.clone()); var s = 0.0; qn.indices.foreach(i => s += qn(i) * wn(i)); s
      }._1
      best == r.getAs[Long]("top1_id")
    }
    assert(exact >= out.length * 6 / 10, s"beam found the true NN for only $exact/${out.length}")
  }

  test("search_rerank_agreement equals the JVM Kendall-tau over the same score table") {
    val out = rows("search_rerank_agreement")
      .map(r => r.getAs[Long]("k") -> r).toMap
    assert(out.keySet == Set(5L, 10L, 30L))
    // mirror: same shortlist, same probe, same tau from the scratch table
    val sem = spark.table("g_hybrid_scores")
      .selectExpr("doc_id", "bm25", "csim").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("bm25"), r.getAs[Double]("csim")))
    def rA(x: Double) = graft.operators.PcaSolve.roundAway(x, 4)
    val cand = sem.sortBy(t => (-t._3, t._1)).take(30)
    val rn1 = cand.zipWithIndex.map { case (t, i) => t._1 -> (i + 1) }.toMap
    val ce = cand.map(t => t._1 ->
      graft.operators.PcaSolve.roundAway(t._3 * 0.7 + (t._2 / (math.abs(t._2) + 1)) * 0.3, 6)).toMap
    val rn2 = cand.map(_._1).sortBy(id => (-ce(id), id)).zipWithIndex
      .map { case (id, i) => id -> (i + 1) }.toMap
    for (k <- Seq(5, 10, 30)) {
      val ids = cand.map(_._1).filter(id => rn1(id) <= k)
      val pairs = for { a <- ids; b <- ids if a < b } yield (a, b)
      val conc = pairs.count { case (a, b) =>
        (rn1(a) < rn1(b)) == (rn2(a) < rn2(b)) }
      val disc = pairs.length - conc
      val r = out(k.toLong)
      assert(r.getAs[Long]("n_pairs") == pairs.length, s"k=$k pairs")
      assert(r.getAs[Long]("concordant") == conc, s"k=$k concordant")
      assert(r.getAs[Double]("kendall_tau") == rA((conc - disc).toDouble / pairs.length), s"k=$k tau")
      val ovl = ids.count(id => rn2(id) <= k)
      assert(r.getAs[Long]("overlap_at_k") == ovl, s"k=$k overlap")
    }
  }

  test("ann_filter_strategy_curve: corpus census exact, post-filter bounded by the truth") {
    val out = rows("ann_filter_strategy_curve")
    assert(out.length == 4)
    val emb = spark.read.parquet(s"$Sf/embeddings.parquet")
      .selectExpr("vec_id", "cast(label as long) as label").collect()
    val labels = emb.map(_.getLong(1))
    val ids = emb.map(_.getLong(0)).toSet
    val byMax = Map(0.1 -> 1, 0.3 -> 3, 0.5 -> 5, 0.9 -> 9)
    val nq = Seq(0L, 100L, 200L, 300L, 400L).count(ids.contains).toLong
    var lastPass = -1L
    out.sortBy(_.getAs[Double]("selectivity")).foreach { r =>
      val sel = r.getAs[Double]("selectivity")
      val pass = labels.count(_ < byMax(sel)).toLong
      assert(r.getAs[Long]("n_filtered_corpus") == pass, s"sel=$sel corpus census")
      assert(r.getAs[Long]("prefilter_score_rows") == pass * nq)
      assert(pass > lastPass); lastPass = pass
      assert(r.getAs[Long]("n_post_results") <= 10 * nq)
      val rec = r.getAs[Double]("post_recall10")
      assert(rec >= 0.0 && rec <= 1.0)
      assert(r.getAs[Long]("n_surviving_candidates") <= 40 * nq)
    }
    // the curve's whole point: a selective predicate starves the
    // post-filter leg (fewer results / lower recall than the broad rung)
    val bySel = out.map(r => r.getAs[Double]("selectivity") -> r).toMap
    assert(bySel(0.1).getAs[Long]("n_post_results") <=
      bySel(0.9).getAs[Long]("n_post_results"))
  }
}
