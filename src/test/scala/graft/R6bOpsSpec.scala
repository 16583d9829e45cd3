package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic gates for the round-6 batch-2 ops beyond the oracle hash:
  * the matryoshka prefix-search contract (prefix scores and exact
  * rerank both re-derived in the JVM), the kNN classifier's majority
  * law against the independently-computed LSH top-10, and the two
  * TPC-H shapes' conservation laws recomputed from the raw parquet.
  */
class R6bOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)

  private lazy val rawVectors: Map[Long, Array[Double]] =
    spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet").collect()
      .map { r =>
        r.getAs[Long]("vec_id") ->
          r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray
      }.toMap
  private lazy val labels: Map[Long, Int] =
    spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }
  private def normalize(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(dot(v, v)); v.map(_ / n)
  }
  private def round6(x: Double): Double =
    (if (x >= 0) math.floor(x * 1e6 + 0.5) else -math.floor(-x * 1e6 + 0.5)) / 1e6

  // ---------------- vec_topk_matryoshka ----------------

  test("vec_topk_matryoshka: prefix scores and exact rerank match a JVM mirror") {
    val rows = run("vec_topk_matryoshka").collect()
    assert(rows.nonEmpty)
    val nrm = rawVectors.map { case (id, v) => id -> normalize(v) }
    rows.foreach { r =>
      val q = nrm(r.getAs[Long]("qid")); val c = nrm(r.getAs[Long]("neighbor_id"))
      val (qp, cp) = (q.take(16), c.take(16))
      val (qn, cn) = (math.sqrt(dot(qp, qp)), math.sqrt(dot(cp, cp)))
      val psim = if (qn == 0 || cn == 0) 0.0 else dot(qp, cp) / (qn * cn)
      assert(math.abs(round6(psim) - r.getAs[Double]("prefix_sim")) < 1e-9,
        s"prefix_sim mismatch at qid=${r.getAs[Long]("qid")}")
      assert(math.abs(round6(dot(q, c)) - r.getAs[Double]("sim")) < 1e-9,
        s"exact sim mismatch at qid=${r.getAs[Long]("qid")}")
    }
  }

  test("vec_topk_matryoshka: every result survives the JVM prefix shortlist") {
    val rows = run("vec_topk_matryoshka").collect()
    val nrm = rawVectors.map { case (id, v) => id -> normalize(v) }
    rows.groupBy(_.getAs[Long]("qid")).foreach { case (qid, rs) =>
      val qp = nrm(qid).take(16)
      val qn = math.sqrt(dot(qp, qp))
      // JVM top-50 by truncated cosine with the query's own tie-break
      val short = nrm.iterator.filter(_._1 != qid).map { case (cid, c) =>
        val cp = c.take(16); val cn = math.sqrt(dot(cp, cp))
        val ps = if (qn == 0 || cn == 0) 0.0 else dot(qp, cp) / (qn * cn)
        (cid, round6(ps))
      }.toSeq.sortBy { case (cid, ps) => (-ps, cid) }.take(50).map(_._1).toSet
      rs.foreach { r =>
        assert(short.contains(r.getAs[Long]("neighbor_id")),
          s"qid=$qid neighbor outside the prefix top-50 shortlist")
      }
    }
  }

  // ---------------- vec_knn_classify ----------------

  test("vec_knn_classify: majority law over the independently-served LSH top-10") {
    // vec_topk_lsh's top-10 is the SAME candidate ranking this
    // classifier votes over — recount its majority in the JVM
    val top = run("vec_topk_lsh").collect()
      .groupBy(_.getAs[Long]("qid"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSeq }
    val cls = run("vec_knn_classify").collect()
    assert(cls.nonEmpty)
    cls.foreach { r =>
      val qid = r.getAs[Long]("qid")
      val votes = top(qid).map(labels(_).toLong)
        .groupBy(identity).map { case (l, v) => (l, v.size.toLong) }
      // majority with min-label tie-break
      val (predLabel, nVotes) = votes.toSeq.sortBy { case (l, n) => (-n, l) }.head
      assert(r.getAs[Long]("pred_label") == predLabel, s"qid=$qid pred")
      assert(r.getAs[Long]("n_votes") == nVotes, s"qid=$qid votes")
      assert(r.getAs[Long]("true_label") == labels(qid).toLong, s"qid=$qid true")
      assert((r.getAs[Long]("correct") == 1L) == (predLabel == labels(qid).toLong))
    }
  }

  // ---------------- q13_custdist / q17_small_qty ----------------

  test("q13_custdist: distribution conserves customers and orders") {
    Tables.register(spark, TestSpark.Sf)
    val rows = run("q13_custdist").collect()
    val nCust = spark.sql("select count(*) from customer").head.getLong(0)
    val nOrd = spark.sql(
      "select count(*) from orders o join customer c on c.c_custkey = o.o_custkey")
      .head.getLong(0)
    assert(rows.map(_.getAs[Long]("custdist")).sum == nCust)
    assert(rows.map(r => r.getAs[Long]("c_count") * r.getAs[Long]("custdist")).sum == nOrd)
  }

  test("q17_small_qty: revenue matches a JVM mirror of the avg-quantity threshold") {
    val li = spark.read.parquet(s"${TestSpark.Sf}/lineitem.parquet")
      .select("l_partkey", "l_quantity", "l_extendedprice").collect()
      .map(r => (r.getAs[Long]("l_partkey"), r.getAs[Double]("l_quantity"),
        r.getAs[Double]("l_extendedprice")))
    val brandParts = spark.read.parquet(s"${TestSpark.Sf}/part.parquet")
      .where("p_brand = 'Brand#23'").collect().map(_.getAs[Long]("p_partkey")).toSet
    // per-part threshold: exact decimal sum / count / 5 — same operand
    // order as both SQL renderings
    val thr = li.groupBy(_._1).map { case (pk, rs) =>
      val s = rs.map(r => BigDecimal(r._2).setScale(2)).sum
      pk -> (s.toDouble / rs.length / 5.0)
    }
    val sel = li.filter { case (pk, qty, _) => brandParts.contains(pk) && qty < thr(pk) }
    val expect = if (sel.isEmpty) 0.0
      else (sel.map(r => BigDecimal(r._3).setScale(4)).sum.toDouble / 7.0)
    val row = run("q17_small_qty").head
    assert(row.getAs[Long]("n_items") == sel.length.toLong)
    assert(math.abs(row.getAs[Double]("avg_yearly") -
      BigDecimal(expect).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble) < 0.011,
      s"avg_yearly ${row.getAs[Double]("avg_yearly")} vs $expect")
  }
}
