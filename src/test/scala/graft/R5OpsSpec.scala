package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic guarantees of the round-5 ops beyond the oracle gate:
  * binary-quantization distances re-derived in the JVM, the rerank
  * stage's exact-cosine consistency, hard-negative label contracts,
  * recall-eval arithmetic, and sequence-packing conservation laws.
  */
class R5OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)

  private lazy val normalized: Map[Long, Array[Double]] =
    spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet").collect()
      .map { r =>
        val v = r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray
        val n = math.sqrt(v.map(x => x * x).sum)
        r.getAs[Long]("vec_id") -> v.map(_ / n)
      }.toMap

  test("vec_topk_binary: hamming equals a JVM sign-bit recount for every pair") {
    val rows = run("vec_topk_binary").collect()
    assert(rows.nonEmpty)
    def code(v: Array[Double]): Array[Int] = v.map(x => if (x > 0) 1 else 0)
    rows.foreach { r =>
      val q = code(normalized(r.getAs[Long]("qid")))
      val c = code(normalized(r.getAs[Long]("neighbor_id")))
      val ham = q.zip(c).count { case (a, b) => a != b }
      assert(r.getAs[Long]("hamming") == ham.toLong,
        s"qid=${r.getAs[Long]("qid")} cid=${r.getAs[Long]("neighbor_id")}")
    }
    // per query: 10 ranks, hamming non-decreasing in rank
    rows.groupBy(_.getAs[Long]("qid")).foreach { case (_, rs) =>
      val byRn = rs.sortBy(_.getAs[Long]("rn"))
      assert(byRn.map(_.getAs[Long]("rn")).toSeq == (1L to 10L))
      byRn.map(_.getAs[Long]("hamming")).toSeq.sliding(2).foreach {
        case Seq(a, b) => assert(a <= b)
        case _         => ()
      }
    }
  }

  test("vec_topk_binary_rerank: sims are exact cosines and beat the unrefined Hamming ranking") {
    val rer = run("vec_topk_binary_rerank").collect()
    assert(rer.nonEmpty)
    rer.foreach { r =>
      val q = normalized(r.getAs[Long]("qid"))
      val c = normalized(r.getAs[Long]("neighbor_id"))
      val dot = q.zip(c).map { case (a, b) => a * b }.sum
      assert(math.abs(r.getAs[Double]("sim") - dot) < 1e-4)
    }
    // the refine stage must not lose to raw Hamming order: for each
    // query, mean exact cosine of the reranked top-10 >= mean exact
    // cosine of the Hamming top-10 (the rerank picks the best cosines
    // out of a strictly larger candidate set)
    val ham = run("vec_topk_binary").collect()
    val hamTop = ham.groupBy(_.getAs[Long]("qid")).map { case (q, rs) =>
      q -> rs.sortBy(_.getAs[Long]("rn")).take(10).map { r =>
        val a = normalized(q); val b = normalized(r.getAs[Long]("neighbor_id"))
        a.zip(b).map { case (x, y) => x * y }.sum
      }.sum / 10.0
    }
    rer.groupBy(_.getAs[Long]("qid")).foreach { case (q, rs) =>
      val rerMean = rs.map(_.getAs[Double]("sim")).sum / rs.length
      assert(rerMean >= hamTop(q) - 1e-9, s"qid=$q")
    }
  }

  test("vec_topk_ivf_bq: hamming matches the JVM recount and candidates come from probed cells") {
    val rows = run("vec_topk_ivf_bq").collect()
    assert(rows.nonEmpty)
    def code(v: Array[Double]): Array[Int] = v.map(x => if (x > 0) 1 else 0)
    rows.foreach { r =>
      val q = code(normalized(r.getAs[Long]("qid")))
      val c = code(normalized(r.getAs[Long]("neighbor_id")))
      val ham = q.zip(c).count { case (a, b) => a != b }
      assert(r.getAs[Long]("hamming") == ham.toLong)
    }
    // the IVF-routed result set is a subset of the full-corpus Hamming
    // scan's candidate universe, so per query the composed top-10's
    // best distance cannot beat the flat scan's best distance
    val flatBest = run("vec_topk_binary").collect()
      .groupBy(_.getAs[Long]("qid"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("hamming")).min }
    rows.groupBy(_.getAs[Long]("qid")).foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Long]("hamming")).min >= flatBest(q))
    }
  }

  test("vec_hard_negatives: every negative has a different label and sims order the ranks") {
    val rows = run("vec_hard_negatives").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("query_label") != r.getAs[Long]("negative_label"))
      assert(r.getAs[Long]("rn") >= 1L && r.getAs[Long]("rn") <= 5L)
    }
    rows.groupBy(_.getAs[Long]("qid")).foreach { case (_, rs) =>
      val byRn = rs.sortBy(_.getAs[Long]("rn"))
      byRn.map(_.getAs[Double]("sim")).toSeq.sliding(2).foreach {
        case Seq(a, b) => assert(a >= b - 1e-12)
        case _         => ()
      }
    }
  }

  test("ann_recall_eval: recall = hits/10, hits bounded by candidates") {
    val rows = run("ann_recall_eval").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val hits = r.getAs[Long]("hits")
      assert(hits >= 0L && hits <= 10L)
      assert(hits <= r.getAs[Long]("n_cand"))
      assert(math.abs(r.getAs[Double]("recall10") - hits / 10.0) < 1e-9)
    }
  }

  test("dedup_incremental: batch-only left side, corpus-only matches, threshold flag consistent") {
    val rows = run("dedup_incremental").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("new_doc") % 10 == 0)       // delta side only
      assert(r.getAs[Long]("match_doc") % 10 != 0)     // corpus side only
      val est = r.getAs[Double]("jaccard_est")
      assert(est >= 0.1 && est <= 1.0)
      assert(r.getAs[Long]("is_dup") == (if (est >= 0.5) 1L else 0L))
    }
    // one row per new doc (best match only)
    val nds = rows.map(_.getAs[Long]("new_doc"))
    assert(nds.distinct.length == nds.length)
    // every reported pair must also be a dedup_minhash candidate pair
    // with the same estimate (shared chain ⇒ consistent estimates)
    val mh = run("dedup_minhash").collect().map { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      (math.min(a, b), math.max(a, b)) -> r.getAs[Double]("jaccard_est")
    }.toMap
    rows.foreach { r =>
      val k = (math.min(r.getAs[Long]("new_doc"), r.getAs[Long]("match_doc")),
        math.max(r.getAs[Long]("new_doc"), r.getAs[Long]("match_doc")))
      assert(mh.get(k).exists(e => math.abs(e - r.getAs[Double]("jaccard_est")) < 1e-9), s"$k")
    }
  }

  test("events_ab_test: z recomputed from the four integers, significance consistent") {
    val r = run("events_ab_test").collect().head
    val (na, ca) = (r.getAs[Long]("n_a"), r.getAs[Long]("clicks_a"))
    val (nb, cb) = (r.getAs[Long]("n_b"), r.getAs[Long]("clicks_b"))
    assert(ca <= na && cb <= nb)
    val pa = ca.toDouble / na; val pb = cb.toDouble / nb
    val pp = (ca + cb).toDouble / (na + nb)
    val z = (pa - pb) / math.sqrt(pp * (1 - pp) * (1.0 / na + 1.0 / nb))
    assert(math.abs(r.getAs[Double]("z") - z) < 1e-3)
    assert(r.getAs[Long]("significant") == (if (math.abs(z) >= 1.96) 1L else 0L))
  }

  test("q18_big_orders: every order's quantity sum recounted above threshold") {
    import spark.implicits._
    val rows = run("q18_big_orders").collect()
    assert(rows.nonEmpty)
    val sums = spark.table("lineitem").groupBy("l_orderkey")
      .agg(org.apache.spark.sql.functions.sum("l_quantity").as("s"))
      .as[(Long, Double)].collect().toMap
    rows.foreach { r =>
      val ok = r.getAs[Long]("o_orderkey")
      assert(sums(ok) > 250)
      assert(r.getAs[Long]("sum_qty") == sums(ok).toLong)
    }
    // completeness: count matches the direct recount
    assert(rows.length == sums.count(_._2 > 250))
  }

  test("vec_cluster_stats: populations cover the corpus, coherence bounds hold") {
    val rows = run("vec_cluster_stats").collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n_vectors")).sum
    assert(total == normalized.size)                   // every vector in exactly one cell
    rows.foreach { r =>
      assert(r.getAs[Double]("min_sim") <= r.getAs[Double]("mean_sim") + 1e-4)
      assert(r.getAs[Double]("mean_sim") <= 1.0 + 1e-9)
    }
  }

  test("ann_nprobe_curve: recall and candidate cost are monotone in nprobe") {
    val rows = run("ann_nprobe_curve").collect().sortBy(_.getAs[Long]("nprobe"))
    assert(rows.map(_.getAs[Long]("nprobe")).toSeq == Seq(1L, 2L, 4L, 8L))
    rows.foreach { r =>
      assert(r.getAs[Long]("hits") <= 10 * 5)
      assert(math.abs(r.getAs[Double]("recall10") - r.getAs[Long]("hits") / 50.0) < 1e-9)
    }
    rows.map(_.getAs[Long]("n_cand")).toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(a < b)   // more probes, strictly more candidates
      case _         => ()
    }
    rows.map(_.getAs[Long]("hits")).toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(a <= b)  // a superset of candidates cannot lose hits
      case _         => ()
    }
  }

  test("wm_capacity: 16 blocks, shares sum to 1, floor is the true minimum") {
    val rows = run("wm_capacity").collect()
    assert(rows.length == 16)
    assert(rows.map(_.getAs[Long]("blk")).sorted.toSeq == (0L to 15L))
    val mn = rows.map(_.getAs[Long]("n_carriers")).min
    rows.foreach { r =>
      assert(r.getAs[Long]("min_redundancy") == mn)
      assert(r.getAs[Long]("block_bits") == 16L)
    }
    val share = rows.map(_.getAs[Double]("carrier_share")).sum
    assert(math.abs(share - 1.0) < 0.01)
  }

  test("pack_sequences: token/sequence conservation against a direct recount") {
    import spark.implicits._
    val rows = run("pack_sequences").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nTok = r.getAs[Long]("n_tokens"); val nSeq = r.getAs[Long]("n_seqs")
      // every token lands in exactly one 256-slot sequence
      assert(nTok <= nSeq * 256 && nTok > (nSeq - 1) * 256)
      assert(math.abs(r.getAs[Double]("fill_rate") - nTok.toDouble / (nSeq * 256)) < 1e-3)
      assert(r.getAs[Long]("n_boundary_docs") <= r.getAs[Long]("n_docs"))
      // at most one doc straddles each of the nSeq-1 interior cuts
      assert(r.getAs[Long]("n_boundary_docs") <= nSeq - 1)
    }
    // per-source doc/token totals equal a direct whitespace recount
    val direct = spark.table("documents")
      .selectExpr("source", "size(split(lower(text), '\\\\s+')) as ntok")
      .groupBy("source")
      .agg(org.apache.spark.sql.functions.expr("count(*) as n_docs"),
        org.apache.spark.sql.functions.expr("sum(ntok) as n_tokens"))
      .as[(String, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    rows.foreach { r =>
      val (nd, nt) = direct(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_docs") == nd)
      assert(r.getAs[Long]("n_tokens") == nt)
    }
  }
}
