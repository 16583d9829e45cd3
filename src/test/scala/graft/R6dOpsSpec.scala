package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic gates for the round-6 batch-4 ops: the three TPC-H star
  * shapes (bilateral volume, market share, scalar-max top supplier)
  * and the vocabulary coverage curve, each recounted from the raw
  * parquet in a JVM mirror.
  */
class R6dOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)

  private def dec4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP)

  private lazy val li = spark.read.parquet(s"${TestSpark.Sf}/lineitem.parquet")
    .selectExpr("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
      "year(l_shipdate) as y", "cast(l_shipdate as string) as sd").collect()
    .map(r => (r.getAs[Long]("l_orderkey"), r.getAs[Long]("l_suppkey"),
      dec4(r.getAs[Double]("l_extendedprice")) * dec4(1 - r.getAs[Double]("l_discount")),
      r.getAs[Int]("y"), r.getAs[String]("sd")))
  private lazy val ordCust = spark.read.parquet(s"${TestSpark.Sf}/orders.parquet")
    .collect().map(r => r.getAs[Long]("o_orderkey") -> r.getAs[Long]("o_custkey")).toMap
  private lazy val custNation = spark.read.parquet(s"${TestSpark.Sf}/customer.parquet")
    .selectExpr("c_custkey", "cast(c_nationkey as bigint) as c_nationkey")
    .collect().map(r => r.getAs[Long]("c_custkey") -> r.getAs[Long]("c_nationkey")).toMap
  private lazy val suppNation = spark.read.parquet(s"${TestSpark.Sf}/supplier.parquet")
    .selectExpr("s_suppkey", "cast(s_nationkey as bigint) as s_nationkey")
    .collect().map(r => r.getAs[Long]("s_suppkey") -> r.getAs[Long]("s_nationkey")).toMap
  private lazy val nationRegion = spark.read.parquet(s"${TestSpark.Sf}/nation.parquet")
    .selectExpr("cast(n_nationkey as bigint) as n_nationkey", "cast(n_regionkey as bigint) as n_regionkey")
    .collect().map(r => r.getAs[Long]("n_nationkey") -> r.getAs[Long]("n_regionkey")).toMap

  private def inWindow(sd: String, lo: String, hi: String) = sd >= lo && sd < hi

  test("q7_nation_volume: bilateral per-year revenue matches the JVM mirror") {
    // NATION_13/NATION_19 is the densest bilateral flow in the
    // synthetic corpus — non-empty at every SF (the original 1/2 pair
    // was empty at sf0.001, failing the all-keys smoke gate)
    val expect = li.filter(r => inWindow(r._5, "1996-01-01", "1998-01-01"))
      .flatMap { case (ok, sk, rev, y, _) =>
        val sn = suppNation(sk); val cn = custNation(ordCust(ok))
        if ((sn == 13 && cn == 19) || (sn == 19 && cn == 13))
          Some(((s"NATION_$sn", s"NATION_$cn", y.toLong), rev)) else None
      }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    val rows = run("q7_nation_volume").collect()
    assert(rows.length == expect.size && rows.nonEmpty)
    rows.foreach { r =>
      val k = (r.getAs[String]("supp_nation"), r.getAs[String]("cust_nation"),
        r.getAs[Long]("l_year"))
      assert(math.abs(r.getAs[Double]("revenue") - expect(k).toDouble) < 0.011, s"$k")
    }
  }

  test("q8_market_share: per-year share matches the JVM mirror") {
    val inRegion = li.filter(r => inWindow(r._5, "1996-01-01", "1998-01-01"))
      .filter { case (ok, _, _, _, _) => nationRegion(custNation(ordCust(ok))) == 0L }
    val byYear = inRegion.groupBy(_._4)
    val rows = run("q8_market_share").collect()
    assert(rows.length == byYear.size && rows.nonEmpty)
    rows.foreach { r =>
      val rs = byYear(r.getAs[Long]("l_year").toInt)
      val tot = rs.map(_._3).sum
      val nat = rs.filter(x => suppNation(x._2) == 5L).map(_._3).sum
      assert(math.abs(r.getAs[Double]("total_revenue") - tot.toDouble) < 0.011)
      assert(math.abs(r.getAs[Double]("nation_revenue") - nat.toDouble) < 0.011)
      assert(math.abs(r.getAs[Double]("mkt_share") - nat.toDouble / tot.toDouble) < 0.00011)
    }
  }

  test("q15_top_supplier: the scalar-max equality returns exactly the argmax set") {
    val rev = li.filter(r => inWindow(r._5, "1997-01-01", "1997-04-01"))
      .groupBy(_._2).map { case (sk, rs) => sk -> rs.map(_._3).sum }
    assert(rev.nonEmpty)
    val mx = rev.values.max
    val winners = rev.filter(_._2 == mx).keySet
    val rows = run("q15_top_supplier").collect()
    assert(rows.map(_.getAs[Long]("s_suppkey")).toSet == winners)
    rows.foreach(r => assert(math.abs(r.getAs[Double]("total_rev") - mx.toDouble) < 0.011))
  }

  test("text_vocab_coverage: threshold curve matches a JVM word-count mirror") {
    val words = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet").collect()
      .flatMap(_.getAs[String]("text").toLowerCase.split("\\s+"))
    val wc = words.groupBy(identity).map { case (_, v) => v.size.toLong }.toSeq
    val (tokens, types) = (wc.sum, wc.size.toLong)
    val rows = run("text_vocab_coverage").collect()
    assert(rows.length == 11)
    rows.foreach { r =>
      val thr = r.getAs[Long]("min_freq")
      val nTypes = wc.count(_ >= thr).toLong
      val nTok = wc.filter(_ >= thr).sum
      assert(r.getAs[Long]("n_types") == nTypes, s"thr=$thr types")
      assert(r.getAs[Long]("n_tokens") == nTok, s"thr=$thr tokens")
      assert(math.abs(r.getAs[Double]("token_share") - nTok.toDouble / tokens) < 0.00011)
      assert(math.abs(r.getAs[Double]("type_share") - nTypes.toDouble / types) < 0.00011)
    }
  }
}
