package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic guarantees of the session-3 analytics ops that the oracle
  * gate (Spark == DuckDB on the same SQL) cannot express: MMR's
  * diversity/monotonicity contract, BM25's idf ordering, association-
  * rule lift consistency with direct counts, Markov row-stochasticity,
  * the fuzzy matcher's blocking invariants, and link prediction's
  * non-edge guarantee.
  */
class AnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)

  test("vec_mmr: five distinct picks, first is the relevance argmax, scores non-increasing") {
    val picks = run("vec_mmr").collect().sortBy(_.getAs[Long]("pick"))
    assert(picks.length == 5)
    assert(picks.map(_.getAs[Long]("vec_id")).distinct.length == 5)
    // pick 1 must equal the plain top-1 for the same query id
    val top = run("vec_topk").collect()
      .filter(_.getAs[Long]("qid") == 0L)
      .minBy(_.getAs[Long]("rn"))
    assert(picks.head.getAs[Long]("vec_id") == top.getAs[Long]("neighbor_id"))
    // rounds 2..5: candidate sets shrink and penalties only grow, so
    // the MMR argmax value cannot increase
    val s = picks.tail.map(_.getAs[Double]("mmr_score"))
    s.sliding(2).foreach { case Array(a, b) => assert(b <= a + 1e-12) }
  }

  test("vec_mmr: diversified picks are less redundant than plain top-5") {
    import spark.implicits._
    val mmrIds = run("vec_mmr").collect().map(_.getAs[Long]("vec_id")).toSeq
    val topIds = run("vec_topk").collect()
      .filter(r => r.getAs[Long]("qid") == 0L && r.getAs[Long]("rn") <= 5L)
      .map(_.getAs[Long]("neighbor_id")).toSeq
    def avgPairSim(ids: Seq[Long]): Double = {
      val vecs = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet")
        .filter($"vec_id".isin(ids: _*))
        .collect()
        .map(r => r.getAs[Long]("vec_id") -> {
          val v = r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble)
          val n = math.sqrt(v.map(x => x * x).sum)
          v.map(_ / n)
        }).toMap
      val ps = for { a <- ids; b <- ids if a < b }
        yield vecs(a).zip(vecs(b)).map { case (x, y) => x * y }.sum
      ps.sum / ps.length
    }
    // the whole point of MMR: the picked set is strictly less
    // self-similar than the plain relevance top-k (on any corpus where
    // the two sets differ)
    if (mmrIds.toSet != topIds.toSet)
      assert(avgPairSim(mmrIds) < avgPairSim(topIds))
  }

  test("text_bm25: the selective term dominates the score") {
    val rows = run("text_bm25").collect()
    assert(rows.nonEmpty)
    val withDup = rows.filter(_.getAs[Long]("tf_dup") > 0)
    val without = rows.filter(_.getAs[Long]("tf_dup") == 0)
    assert(withDup.nonEmpty && without.nonEmpty)
    def avg(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(_.getAs[Double]("bm25")).sum / rs.length
    // idf('dup') ≈ ln(19) vs idf(common) ≈ ln(1.3): docs containing
    // the rare term must average far above those scored only on the
    // common terms, across any document-length mix
    assert(avg(withDup) > avg(without))
  }

  test("market_basket: lift agrees with direct counts for the top pair") {
    val rows = run("market_basket").collect()
    assert(rows.nonEmpty)
    val r = rows.maxBy(_.getAs[Long]("n_orders"))
    val (ba, bb, c) = (r.getAs[String]("brand_a"), r.getAs[String]("brand_b"), r.getAs[Long]("n_orders"))
    Tables.register(spark, TestSpark.Sf)
    val ob = spark.sql(
      "select distinct l.l_orderkey as ok, p.p_brand as br from lineitem l join part p on p.p_partkey = l.l_partkey")
    ob.createOrReplaceTempView("t_ob")
    val total = spark.sql("select count(distinct ok) c from t_ob").head().getLong(0)
    val cb = spark.sql(s"select br, count(*) c from t_ob where br in ('$ba','$bb') group by br")
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    val direct = spark.sql(
      s"select count(*) c from t_ob a join t_ob b on a.ok=b.ok where a.br='$ba' and b.br='$bb'")
      .head().getLong(0)
    assert(direct == c)
    val lift = c.toDouble * total / (cb(ba).toDouble * cb(bb))
    assert(math.abs(lift - r.getAs[Double]("lift")) < 5e-4)
  }

  test("events_transitions: each source row is a probability distribution") {
    val rows = run("events_transitions").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("src")).foreach { case (_, rs) =>
      val p = rs.map(_.getAs[Double]("p")).sum
      assert(math.abs(p - 1.0) < 0.01) // rounding at 4dp, ≤5 cells
    }
    // total transitions = sum over users of (events_u - 1)
    val nTrans = rows.map(_.getAs[Long]("n_transitions")).sum
    val expected = spark.read.parquet(s"${TestSpark.Sf}/events.parquet")
      .groupBy("user_id").count().collect().map(_.getAs[Long]("count") - 1).sum
    assert(nTrans == expected)
  }

  test("text_fuzzy_match: blocked, non-identical, within threshold") {
    val rows = run("text_fuzzy_match").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("name_a"), r.getAs[String]("name_b"))
      assert(a != b)
      assert(a.split(" ").last == b.split(" ").last) // same block noun
      val dist = r.getAs[Long]("dist")
      assert(dist >= 1 && dist <= 3)
    }
  }

  test("dedup_semantic: ordered pairs above the similarity floor on the real corpus") {
    val sem = run("dedup_semantic").collect()
    assert(sem.nonEmpty)
    sem.foreach { r =>
      assert(r.getAs[Long]("id_a") < r.getAs[Long]("id_b"))
      assert(r.getAs[Double]("cos_sim") >= 0.3)
    }
  }

  // The bench corpus is isotropic and contains NO true near-dups
  // (brute-force: zero pairs above cosine 0.5 at sf0.001/sf0.01), so
  // recovery is proven the IvfRecallSpec way: a clustered corpus with
  // PLANTED near-duplicates, the REAL generated SQL, and a recall
  // floor for both blocking strategies (IVF cells here, LSH buckets in
  // dedup_embedding — SemDeDup's documented boundary-miss tradeoff is
  // why the gate is 0.8, not 1.0).
  test("dedup_semantic: cell blocking recovers >=80% of planted near-dups on a clustered corpus") {
    import spark.implicits._
    import graft.sqlgen.{Gen, SparkDialect}
    graft.functions.DotProduct.register(spark)
    def normalize(v: Array[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val rnd = new scala.util.Random(11)
    val Dim = 64; val NBase = 2000; val NClusters = 40; val NDup = 100
    val cents = Array.fill(NClusters)(normalize(Array.fill(Dim)(rnd.nextGaussian())))
    val base = Array.tabulate(NBase) { i =>
      (i.toLong, cents(i % NClusters).map(_ + 0.1 * rnd.nextGaussian()), (i % NClusters).toLong)
    }
    val dups = Array.tabulate(NDup) { i =>
      ((NBase + i).toLong, base(i)._2.map(_ + 0.01 * rnd.nextGaussian()), base(i)._3)
    }
    (base ++ dups).toSeq
      .map { case (id, v, l) => (id, v.map(_.toFloat).toSeq, l) }
      .toDF("vec_id", "embedding", "label")
      .createOrReplaceTempView("embeddings")
    try {
      val planted = (0 until NDup).map(i => (i.toLong, (NBase + i).toLong)).toSet
      def recovered(key: String): Double = {
        val pairs = spark.sql(new Gen(SparkDialect).sql(key)).collect()
          .filter(_.getAs[Double]("cos_sim") >= 0.9)
          .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
        (planted intersect pairs).size.toDouble / NDup
      }
      val cellRec = recovered("dedup_semantic")
      val lshRec = recovered("dedup_embedding")
      info(f"planted-dup recovery: cells=$cellRec%.2f lsh=$lshRec%.2f")
      assert(cellRec >= 0.8, f"cell blocking recovered $cellRec%.2f < 0.8")
      assert(lshRec >= 0.8, f"LSH blocking recovered $lshRec%.2f < 0.8")
    } finally {
      Tables.register(spark, TestSpark.Sf)
      spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet")
        .createOrReplaceTempView("embeddings")
    }
  }

  test("text_lm_score: templated text scores lower NLL than shuffled text over the same vocabulary") {
    import spark.implicits._
    import graft.sqlgen.{Gen, SparkDialect}
    graft.functions.DotProduct.register(spark)
    // doc 0: one sentence repeated (every context's continuation is
    // deterministic); doc 1: the SAME vocabulary in a scrambled order
    // (common contexts, erratic continuations). Same words, same
    // lengths — only the transition structure differs.
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon")
    val template = (Seq.fill(40)(words).flatten).mkString(" ")
    val rnd = new scala.util.Random(5)
    val scrambled = rnd.shuffle(Seq.fill(40)(words).flatten).mkString(" ")
    Seq((0L, template, "t", 200L), (1L, scrambled, "t", 200L))
      .toDF("doc_id", "text", "source", "n_chars")
      .createOrReplaceTempView("documents")
    try {
      val rows = spark.sql(new Gen(SparkDialect).sql("text_lm_score"))
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("avg_nll")).toMap
      assert(rows(0) < rows(1),
        s"template NLL ${rows(0)} should be below scrambled NLL ${rows(1)}")
      // the corpus model is trained on BOTH docs, so even the template's
      // contexts lose ~half their mass to the scrambled doc's heads:
      // template NLL ≈ ln(80/45) ≈ 0.58, scrambled ≈ ln(80/8) ≈ 2.3 —
      // gate the clean separation point between them
      assert(rows(0) < 1.0, s"templated transitions should stay below ln(e), got ${rows(0)}")
      assert(rows(1) > 1.0, s"scrambled transitions should exceed 1 nat, got ${rows(1)}")
      rows.values.foreach(nll => assert(nll >= 0.0))
    } finally {
      Tables.register(spark, TestSpark.Sf)
      spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
        .createOrReplaceTempView("documents")
    }
  }

  test("sample_weighted: dense ranks, monotone scores, long docs overrepresented") {
    val s = run("sample_weighted").collect()
    assert(s.map(_.getAs[Long]("smp_rank")).sorted.toSeq == (1L to 100L))
    val byRank = s.sortBy(_.getAs[Long]("smp_rank")).map(_.getAs[Double]("es_score"))
    byRank.sliding(2).foreach { case Array(a, b) => assert(b >= a) }
    // weight = n_chars, so the exponential-clock sample must skew long
    // (deterministic on the fixed corpus + fixed PRF key)
    val sampleMean = s.map(_.getAs[Long]("n_chars")).sum.toDouble / s.length
    val corpusMean = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .agg(org.apache.spark.sql.functions.avg("n_chars")).head().getDouble(0)
    assert(sampleMean > corpusMean,
      f"weighted sample mean $sampleMean%.0f chars should exceed corpus mean $corpusMean%.0f")
  }

  test("graph_link_predict: predictions are non-edges with real common neighbors") {
    val preds = run("graph_link_predict").collect()
    assert(preds.nonEmpty)
    val edges = run("wm_knn_edges").collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst")))
      .flatMap(e => Seq(e, e.swap)).toSet
    preds.foreach { r =>
      val (a, b) = (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))
      assert(a < b)
      assert(!edges.contains((a, b)), s"predicted pair ($a,$b) is already an edge")
      assert(r.getAs[Long]("n_common") >= 2)
      val j = r.getAs[Double]("jaccard")
      assert(j > 0.0 && j <= 1.0)
    }
  }
}
