package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic guarantees of the session-4 ops that the oracle gate
  * (Spark == DuckDB on the same SQL) cannot express: RRF's fusion
  * arithmetic and rank consistency, BPE's merge-count monotonicity
  * plus a full JVM re-derivation of the round-1 winner, substring
  * dedup's span invariants against an independent JVM recount,
  * re-index conservation/stability, mix-weight normalization, and
  * the reconciliation ledger's cross-footing.
  */
class HybridOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)

  private lazy val docWords: Map[Long, Array[String]] = {
    import spark.implicits._
    spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .select($"doc_id", $"text")
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").toLowerCase.split("\\s+").filter(_.nonEmpty))
      .toMap
  }

  test("search_hybrid_rrf: 10 distinct docs, rrf = 1/(60+rl) + 1/(60+rs), ranks ordered") {
    val rows = run("search_hybrid_rrf").collect().sortBy(_.getAs[Long]("fused_rank"))
    assert(rows.length == 10)
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == 10)
    assert(rows.map(_.getAs[Long]("fused_rank")).toSeq == (1L to 10L))
    rows.foreach { r =>
      val rl = r.getAs[Long]("lex_rank"); val rs = r.getAs[Long]("sem_rank")
      assert(rl >= 1 && rs >= 1)
      val expect = 1.0 / (60 + rl) + 1.0 / (60 + rs)
      assert(math.abs(r.getAs[Double]("rrf_score") - expect) < 1e-5)
    }
    // fused order is exactly descending rrf (doc_id tie-break)
    val scores = rows.map(_.getAs[Double]("rrf_score"))
    scores.sliding(2).foreach { case Array(a, b) => assert(b <= a + 1e-12); case _ => }
  }

  test("search_hybrid_rrf: the BM25 argmax doc carries lexical rank 1 when fused in") {
    val top = run("text_bm25").collect().maxBy(r =>
      (r.getAs[Double]("bm25"), -r.getAs[Long]("doc_id")))
    run("search_hybrid_rrf").collect()
      .find(_.getAs[Long]("doc_id") == top.getAs[Long]("doc_id"))
      .foreach(r => assert(r.getAs[Long]("lex_rank") == 1L))
  }

  test("text_bpe_merges: 3 rounds, counts non-increasing, token totals strictly shrink") {
    val rows = run("text_bpe_merges").collect().sortBy(_.getAs[Long]("merge_round"))
    assert(rows.length == 3)
    val counts = rows.map(_.getAs[Long]("n_pairs"))
    // a round-2 pair is either an old pair (count can only drop) or a
    // new pair through the merged symbol (bounded by the old (x, l)
    // count) — so the winning count cannot grow
    counts.sliding(2).foreach { case Array(a, b) => assert(b <= a); case _ => }
    val toks = rows.map(_.getAs[Long]("n_tokens_after"))
    toks.sliding(2).foreach { case Array(a, b) => assert(b < a); case _ => }
    rows.foreach { r =>
      assert(r.getAs[String]("merged") ==
        r.getAs[String]("lhs") + r.getAs[String]("rhs"))
    }
  }

  test("text_bpe_merges: round-1 winner matches a direct JVM recount") {
    val pairCounts = new scala.collection.mutable.HashMap[(String, String), Long]()
    val wordFreq = new scala.collection.mutable.HashMap[String, Long]()
    docWords.values.foreach(_.foreach { w =>
      if (w.length >= 2 && w.forall(c => c >= 'a' && c <= 'z'))
        wordFreq.updateWith(w) { c => Some(c.getOrElse(0L) + 1L) }
    })
    wordFreq.foreach { case (w, c) =>
      w.sliding(2).foreach { p =>
        pairCounts.updateWith((p.substring(0, 1), p.substring(1))) {
          v => Some(v.getOrElse(0L) + c) }
      }
    }
    // the query's tie-break: max count, then lexicographically largest
    // 'l r' pair string
    val (bl, br) = pairCounts.maxBy { case ((l, r), c) => (c, l + " " + r) }._1
    val row1 = run("text_bpe_merges").collect()
      .find(_.getAs[Long]("merge_round") == 1L).get
    assert(row1.getAs[String]("lhs") == bl && row1.getAs[String]("rhs") == br)
    assert(row1.getAs[Long]("n_pairs") == pairCounts((bl, br)))
  }

  test("dedup_substring: per-doc spans match an independent JVM window recount") {
    // independent recount: 8-word windows (joined text), duplicated
    // across >= 2 distinct docs; per doc merge marked positions whose
    // gap <= 8 into maximal spans of [wpos, wpos + 7] token ranges
    val winDocs = new scala.collection.mutable.HashMap[String, scala.collection.mutable.Set[Long]]()
    docWords.foreach { case (id, ws) =>
      ws.sliding(8).filter(_.length == 8).foreach { w =>
        winDocs.getOrElseUpdate(w.mkString(" "), scala.collection.mutable.Set()) += id }
    }
    val dupWins = winDocs.filter(_._2.size >= 2).keySet
    val expected = docWords.flatMap { case (id, ws) =>
      val pos = ws.sliding(8).zipWithIndex
        .collect { case (w, i) if w.length == 8 && dupWins(w.mkString(" ")) => i + 1L }
        .toArray
      if (pos.isEmpty) None else {
        val spans = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
        var s = pos.head; var e = pos.head
        pos.tail.foreach { p =>
          if (p - e <= 8) e = p
          else { spans += ((s, e + 7)); s = p; e = p }
        }
        spans += ((s, e + 7))
        Some(id -> (spans.length.toLong, spans.map { case (a, b) => b - a + 1 }.max,
          spans.map { case (a, b) => b - a + 1 }.sum))
      }
    }
    val got = run("dedup_substring").collect().map(r =>
      r.getAs[Long]("doc_id") -> (r.getAs[Long]("n_spans"),
        r.getAs[Long]("max_span_tokens"), r.getAs[Long]("dup_tokens"))).toMap
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("vec_ivf_reindex: conserves the carrier count and most carriers stay put") {
    val rows = run("vec_ivf_reindex").collect()
    rows.foreach { r =>
      val moved = r.getAs[Long]("moved")
      assert((moved == 0L) ==
        (r.getAs[Long]("old_cell") == r.getAs[Long]("new_cell")))
    }
    val total = rows.map(_.getAs[Long]("n_carriers")).sum
    val nVec = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet").count()
    assert(total == (nVec * 0.1).toLong)
    // QIM embed keeps post-embed cosine >= ~0.99, so a majority of
    // carriers keep their served cell. The bench corpus is ISOTROPIC
    // (see SURVEY §2 row 4b) — cell margins are thin there, so some
    // boundary carriers genuinely move (measured 20% at sf0.001); on
    // clustered real-embedding corpora the margin is far wider.
    val movedN = rows.filter(_.getAs[Long]("moved") == 1L)
      .map(_.getAs[Long]("n_carriers")).sum
    assert(movedN.toDouble / total < 0.5)
  }

  test("data_mix_weights: weights normalize to 1 and follow sqrt-token order") {
    val rows = run("data_mix_weights").collect()
    assert(rows.length >= 2)
    val wsum = rows.map(_.getAs[Double]("mix_weight")).sum
    assert(math.abs(wsum - 1.0) < 1e-4)
    val byTok = rows.sortBy(_.getAs[Long]("n_tokens"))
    val ws = byTok.map(_.getAs[Double]("mix_weight"))
    ws.sliding(2).foreach { case Array(a, b) => assert(a <= b + 1e-9); case _ => }
    // temperature upsampling: the smallest source cycles more often
    // per budget than the largest
    assert(byTok.head.getAs[Double]("epochs_at_1m_tokens") >
      byTok.last.getAs[Double]("epochs_at_1m_tokens"))
  }

  test("events_user_rolling: the rolling sum covers at least the row's own purchase") {
    import spark.implicits._
    val rows = run("events_user_rolling").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_purchases_in_hour") >= 1L)
      assert(r.getAs[Double]("rolling_hour_spend") >= 0.0)
    }
    // cross-foot: number of output rows == number of purchase events
    val purchases = spark.read.parquet(s"${TestSpark.Sf}/events.parquet")
      .filter($"event_type" === "purchase").count()
    assert(rows.length.toLong == purchases)
  }

  test("events_trend: r2 is a valid share and the fit matches a JVM OLS") {
    import spark.implicits._
    val r = run("events_trend").collect().head
    val r2 = r.getAs[Double]("r2")
    assert(r2 >= 0.0 && r2 <= 1.0)
    // independent OLS over the same daily counts
    // registered view (ts normalized to BIGINT nanos), not the raw
    // parquet — the file has shipped as both ns and µs encodings
    val days = spark.table("events")
      .filter($"event_type" === "click")
      .selectExpr("cast(ts as long) div 86400000000000 as day")
      .groupBy("day").count().as[(Long, Long)].collect()
    val d0 = days.map(_._1).min
    val xs = days.map(d => (d._1 - d0).toDouble)
    val ys = days.map(_._2.toDouble)
    val m = xs.length
    val slope = (m * xs.zip(ys).map { case (a, b) => a * b }.sum -
      xs.sum * ys.sum) / (m * xs.map(x => x * x).sum - xs.sum * xs.sum)
    assert(math.abs(r.getAs[Double]("slope_per_day") - slope) < 1e-4)
    assert(r.getAs[Long]("n_days") == m)
  }

  test("events_reconcile: statuses agree with null sides and totals cross-foot") {
    import spark.implicits._
    val rows = run("events_reconcile").collect()
    rows.foreach { r =>
      val c = r.getAs[Long]("n_clicks"); val p = r.getAs[Long]("n_purchases")
      r.getAs[String]("status") match {
        case "both"          => assert(c > 0 && p > 0)
        case "click_only"    => assert(c > 0 && p == 0)
        case "purchase_only" => assert(c == 0 && p > 0)
      }
    }
    val ev = spark.read.parquet(s"${TestSpark.Sf}/events.parquet")
    val clicks = ev.filter($"event_type" === "click").count()
    val purchases = ev.filter($"event_type" === "purchase").count()
    assert(rows.map(_.getAs[Long]("n_clicks")).sum == clicks)
    assert(rows.map(_.getAs[Long]("n_purchases")).sum == purchases)
  }
}
