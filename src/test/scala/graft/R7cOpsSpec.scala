package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic gates for the round-7 second batch: ship-latency
  * distribution, packing-efficiency curve, dedup threshold curve. */
class R7cOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)

  private def q(x: Double, dec: Int): Double = {
    val m = math.pow(10, dec)
    (if (x >= 0) math.floor(x * m + 0.5) else -math.floor(-x * m + 0.5)) / m
  }

  test("q_ship_latency: per-month mean and exact quantiles match the JVM mirror") {
    Tables.register(spark, TestSpark.Sf)
    val lat = spark.sql(
      """select year(o.o_orderdate) as yr, month(o.o_orderdate) as mo,
        |  cast((unix_seconds(cast(l.l_shipdate as timestamp_ltz)) -
        |        unix_seconds(cast(o.o_orderdate as timestamp_ltz))) div 86400 as bigint) as d
        |from orders o join lineitem l on l.l_orderkey = o.o_orderkey""".stripMargin)
      .collect().map(r => ((r.getAs[Int]("yr"), r.getAs[Int]("mo")), r.getAs[Long]("d")))
    val byMonth = lat.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val rows = run("q_ship_latency").collect()
    assert(rows.length == byMonth.size && rows.nonEmpty)
    rows.foreach { r =>
      val ds = byMonth((r.getAs[Long]("yr").toInt, r.getAs[Long]("mo").toInt))
      def pct(p: Double) = ds(math.ceil(ds.length * p).toInt - 1)
      assert(r.getAs[Long]("n_lineitems") == ds.length.toLong)
      assert(math.abs(r.getAs[Double]("mean_days") - q(ds.sum.toDouble / ds.length, 4)) < 1e-9)
      assert(r.getAs[Long]("p50_days") == pct(0.5))
      assert(r.getAs[Long]("p90_days") == pct(0.9))
      assert(r.getAs[Long]("max_days") == ds.max)
      assert(r.getAs[Long]("p50_days") <= r.getAs[Long]("p90_days"))
    }
  }

  test("pack_efficiency_curve: every level matches the JVM mirror; L=256 agrees with pack_sequences") {
    Tables.register(spark, TestSpark.Sf)
    val toks = spark.sql(
      "select source, doc_id, size(split(lower(text), '\\\\s+')) as ntok from documents")
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Int]("ntok").toLong))
    def mirror(len: Long): (Long, Long, Long, Long) = {
      var (nd, nt, ns, nb) = (0L, 0L, 0L, 0L)
      toks.groupBy(_._1).foreach { case (_, ds) =>
        var cume = 0L
        var maxSl = -1L
        ds.sortBy(_._2).foreach { case (_, _, ntok) =>
          val sf = cume / len
          cume += ntok
          val sl = (cume - 1) / len
          if (sl > sf) nb += 1
          maxSl = math.max(maxSl, sl)
          nd += 1; nt += ntok
        }
        ns += maxSl + 1
      }
      (nd, nt, ns, nb)
    }
    val rows = run("pack_efficiency_curve").collect().sortBy(_.getAs[Long]("seq_len"))
    assert(rows.map(_.getAs[Long]("seq_len")).toSeq == Seq(128L, 256L, 512L))
    rows.foreach { r =>
      val len = r.getAs[Long]("seq_len")
      val (nd, nt, ns, nb) = mirror(len)
      assert(r.getAs[Long]("n_docs") == nd, s"len=$len")
      assert(r.getAs[Long]("n_tokens") == nt, s"len=$len")
      assert(r.getAs[Long]("n_seqs") == ns, s"len=$len")
      assert(r.getAs[Long]("n_boundary_docs") == nb, s"len=$len")
      assert(math.abs(r.getAs[Double]("fill_rate") - q(nt.toDouble / (ns * len), 4)) < 1e-9)
      assert(r.getAs[Double]("fill_rate") > 0 && r.getAs[Double]("fill_rate") <= 1.0)
    }
    // cross-key: the 256 level IS pack_sequences' configuration
    val ps = run("pack_sequences").collect()
    val r256 = rows(1)
    assert(r256.getAs[Long]("n_seqs") == ps.map(_.getAs[Long]("n_seqs")).sum)
    assert(r256.getAs[Long]("n_boundary_docs") == ps.map(_.getAs[Long]("n_boundary_docs")).sum)
  }

  test("dedup_threshold_curve: thresholds filter the verified pair table; counts fall as t rises") {
    val verify = run("dedup_minhash_verify").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Double]("jaccard_true")))
    val rows = run("dedup_threshold_curve").collect().sortBy(_.getAs[Long]("t_centi"))
    assert(rows.map(_.getAs[Long]("t_centi")).toSeq == Seq(50L, 70L, 90L))
    rows.foreach { r =>
      val t = r.getAs[Long]("t_centi") / 100.0
      val surv = verify.filter(_._3 >= t - 1e-9)
      assert(r.getAs[Long]("n_dup_pairs") == surv.length.toLong, s"t=$t")
      assert(r.getAs[Long]("n_docs_implicated") ==
        surv.flatMap(p => Seq(p._1, p._2)).distinct.length.toLong, s"t=$t")
    }
    val pairs = rows.map(_.getAs[Long]("n_dup_pairs"))
    assert(pairs.sliding(2).forall(p => p(0) >= p(1)))
    assert(pairs.head > 0, "the synthetic near-dups must survive the lowest threshold")
  }
}
