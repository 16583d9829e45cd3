package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-8 batch 3: the dedup tier benchmark and the token-budget
  * curation curve. */
class R8nOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Sf = TestSpark.Sf

  private def prf(parts: String*): Long =
    java.lang.Long.parseLong(
      graft.functions.Prf.md5hex(parts.mkString(":")).take(15), 16)

  private def docs() = spark.read.parquet(s"$Sf/documents.parquet")
    .selectExpr("doc_id", "text", "source").collect()
    .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  test("dedup_tier_eval: truth census and minhash tier mirror the JVM exactly") {
    val out = SparkEntry.queries("dedup_tier_eval")(spark, Sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("minhash_8x2", "simhash_5x12_h4"))
    val all = docs()
    val samp = all.filter { case (id, _, _) => prf("dteval", id.toString) % 100 < 10 }
    // exact 3-gram truth on the sample
    def grams(text: String): Set[String] = {
      val ws = text.toLowerCase.split("\\s+", -1)
      (if (ws.length < 3) Seq.empty
       else ws.sliding(3).map(_.mkString(" ")).toSeq).toSet
    }
    val gs = samp.map { case (id, t, _) => id -> grams(t) }.toMap
    val ids = samp.map(_._1).sorted
    val truth = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = gs(ids(i)); b = gs(ids(j))
      inter = (a & b).size
      // the SQL truth joins on a SHARED gram, so inter >= 1 is part of
      // the definition (an all-empty pair is not a positive)
      if inter >= 1 && 2 * inter >= a.size + b.size - inter
    } yield (ids(i), ids(j))).toSet
    val r1 = out("minhash_8x2")
    assert(r1.getAs[Long]("n_sample_docs") == samp.length)
    assert(r1.getAs[Long]("n_truth_pairs") == truth.size, "exact-Jaccard truth census")
    // minhash tier fully mirrored: signatures -> 8x2 bands -> candidates
    val p = graft.functions.WmConst.MinhashP
    def sig(g: Set[String]): Array[Long] = {
      val hs = g.toSeq.map(sh => prf_md5(sh) % p)
      (0 until 16).map { r =>
        val (a, b) = graft.functions.WmConst.minhashCoef(r)
        hs.map(h => (a * h + b) % p).min
      }.toArray
    }
    def prf_md5(s: String): Long =
      java.lang.Long.parseLong(graft.functions.Prf.md5hex(s).take(15), 16)
    val sigs = samp.filter(d => gs(d._1).nonEmpty).map(d => d._1 -> sig(gs(d._1))).toMap
    val cands = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      sa <- sigs.get(ids(i)); sb <- sigs.get(ids(j))
      if (0 until 8).exists(k =>
        sa(2 * k) * 2147483648L + sa(2 * k + 1) == sb(2 * k) * 2147483648L + sb(2 * k + 1))
    } yield (ids(i), ids(j))).toSet
    assert(r1.getAs[Long]("n_candidates") == cands.size, "minhash band candidates")
    assert(r1.getAs[Long]("tp") == (cands & truth).size)
    // both tiers: the P/R/F1 columns follow from the integer columns
    for (r <- out.values) {
      val (nc, tp, np) = (r.getAs[Long]("n_candidates"), r.getAs[Long]("tp"),
        r.getAs[Long]("n_truth_pairs"))
      assert(r.getAs[Long]("fp") == nc - tp && r.getAs[Long]("fn") == np - tp)
      def rA(x: Double) = graft.operators.PcaSolve.roundAway(x, 4)
      if (nc > 0) assert(r.getAs[Double]("precision") == rA(tp.toDouble / nc))
      if (np > 0) assert(r.getAs[Double]("recall") == rA(tp.toDouble / np))
      if (nc + np > 0) assert(r.getAs[Double]("f1") == rA(2.0 * tp / (nc + np)))
    }
  }

  test("data_budget_curve mirrors the JVM threshold-policy manifest") {
    val out = SparkEntry.queries("data_budget_curve")(spark, Sf).collect()
    assert(out.nonEmpty)
    val all = docs()
    def sparkSplit(t: String) = t.split("\\s+", -1)
    val q = all.map { case (_, t, src) =>
      val nWords = sparkSplit(t).length
      val nChars = t.length
      // the SQL strips [^a-zA-Z]: ASCII letters only (zh chars drop)
      val nAlpha = t.count(c => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))
      val quality = graft.operators.PcaSolve.sparkRound(
        (if (nWords >= 20 && nWords <= 80) 1.0 else 0.5) * (nAlpha.toDouble / nChars), 4)
      (src, nWords.toLong, math.floor(quality * 100).toLong)
    }
    val total = q.map(_._2).sum
    val byGb = q.groupBy(_._3).view.mapValues(_.map(_._2).sum).toMap
    def cum(c: Long) = byGb.filter(_._1 >= c).values.sum
    for (r <- Seq(25, 50, 75)) {
      val cutg = byGb.keys.filter(c => cum(c) * 100 >= r * total).max
      val kept = q.filter(_._3 >= cutg)
      val rtok = kept.map(_._2).sum
      val rows = out.filter(_.getAs[Long]("budget_pct") == r.toLong)
      assert(rows.map(_.getAs[Long]("n_tokens_kept")).sum == rtok, s"rung $r tokens")
      assert(rows.map(_.getAs[Long]("n_docs_kept")).sum == kept.length, s"rung $r docs")
      rows.foreach { row =>
        val src = row.getAs[String]("source")
        val sk = kept.filter(_._1 == src)
        assert(row.getAs[Long]("n_docs_kept") == sk.length, s"rung $r source $src docs")
        assert(row.getAs[Long]("n_tokens_kept") == sk.map(_._2).sum)
        def rA(x: Double, n: Int) = graft.operators.PcaSolve.roundAway(x, n)
        assert(row.getAs[Double]("quality_cutoff") == rA(cutg / 100.0, 2))
        assert(row.getAs[Double]("source_share") == rA(sk.map(_._2).sum.toDouble / rtok, 4))
        assert(row.getAs[Double]("rung_token_share") == rA(rtok.toDouble / total, 4))
      }
      // the realized share covers the nominal budget
      assert(rtok * 100 >= r * total, s"rung $r realized >= nominal")
    }
  }
}
