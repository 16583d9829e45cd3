package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic gates for the round-6 TPC-H completion batch — the five
  * remaining shapes expressible over the shipped columns (no partsupp,
  * no shipmode/commit dates): Q2 group-wise argmin join-back, Q9
  * subtractive profit rollup, Q11 fraction-of-global HAVING gate, Q16
  * NOT-IN exclusion + distinct-supplier rollup, Q20 nested semi-join
  * chain. Each is mirrored in plain JVM collections.
  */
class R6fOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)

  private lazy val lineitem = spark.read.parquet(s"${TestSpark.Sf}/lineitem.parquet")
    .selectExpr("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
      "l_extendedprice", "l_discount", "cast(l_shipdate as string) as sd")
    .collect()
  private lazy val part = spark.read.parquet(s"${TestSpark.Sf}/part.parquet")
    .selectExpr("p_partkey", "p_name", "p_brand", "p_type", "cast(p_size as int) as p_size",
      "p_retailprice").collect()
  private lazy val supplier = spark.read.parquet(s"${TestSpark.Sf}/supplier.parquet")
    .selectExpr("s_suppkey", "s_name", "cast(s_nationkey as bigint) as nk", "s_acctbal")
    .collect()
  private lazy val nationRegion: Map[Long, (String, String)] = {
    val regions = spark.read.parquet(s"${TestSpark.Sf}/region.parquet").collect()
      .map(r => r.getAs[Long]("r_regionkey") -> r.getAs[String]("r_name")).toMap
    spark.read.parquet(s"${TestSpark.Sf}/nation.parquet").collect()
      .map(r => r.getAs[Long]("n_nationkey") ->
        (r.getAs[String]("n_name"), regions(r.getAs[Long]("n_regionkey")))).toMap
  }

  test("q2_min_cost_supp: per-part argmin over EUROPE suppliers, ties kept") {
    val eu = supplier.filter(s => nationRegion(s.getAs[Long]("nk"))._2 == "EUROPE")
      .map(_.getAs[Long]("s_suppkey")).toSet
    val largeParts = part.filter(_.getAs[String]("p_type") == "LARGE")
      .map(_.getAs[Long]("p_partkey")).toSet
    val pc = lineitem.groupBy(r => (r.getAs[Long]("l_partkey"), r.getAs[Long]("l_suppkey")))
      .map { case (k, rs) =>
        k -> rs.map(r => r.getAs[Double]("l_extendedprice") / r.getAs[Double]("l_quantity")).min
      }
    val pm = pc.toSeq.filter { case ((pk, sk), _) => eu(sk) && largeParts(pk) }
      .groupBy(_._1._1).map { case (pk, rs) => pk -> rs.map(_._2).min }
    val expect = pc.filter { case ((pk, sk), c) =>
      eu(sk) && pm.get(pk).contains(c)
    }.keySet
    val rows = run("q2_min_cost_supp").collect()
    assert(rows.nonEmpty)
    val got = rows.map(r => (r.getAs[Long]("p_partkey"), r.getAs[Long]("s_suppkey"))).toSet
    assert(got == expect)
    // every reported cost is that part's minimum over EU suppliers
    rows.foreach { r =>
      val mc = pm(r.getAs[Long]("p_partkey"))
      assert(math.abs(r.getAs[Double]("unit_cost") - mc) < 1e-3)
    }
  }

  test("q9_product_profit: revenue-minus-cost rollup matches the BigDecimal mirror") {
    val widget = part.filter(_.getAs[String]("p_name").contains("widget"))
      .map(r => r.getAs[Long]("p_partkey") ->
        BigDecimal(r.getAs[Double]("p_retailprice")).setScale(1, BigDecimal.RoundingMode.HALF_UP))
      .toMap
    val orderYear = spark.read.parquet(s"${TestSpark.Sf}/orders.parquet")
      .selectExpr("o_orderkey", "cast(o_orderdate as string) as od").collect()
      .map(r => r.getAs[Long]("o_orderkey") -> r.getAs[String]("od").take(4).toLong).toMap
    val suppNation = supplier.map(s =>
      s.getAs[Long]("s_suppkey") -> nationRegion(s.getAs[Long]("nk"))._1).toMap
    case class Acc(rev: BigDecimal, cost: BigDecimal)
    val expect = lineitem.flatMap { r =>
      widget.get(r.getAs[Long]("l_partkey")).map { rp =>
        val rev = BigDecimal(r.getAs[Double]("l_extendedprice")).setScale(4, BigDecimal.RoundingMode.HALF_UP) *
          BigDecimal(1 - r.getAs[Double]("l_discount")).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        val cost = rp * BigDecimal(r.getAs[Double]("l_quantity")).setScale(0, BigDecimal.RoundingMode.HALF_UP)
        ((suppNation(r.getAs[Long]("l_suppkey")), orderYear(r.getAs[Long]("l_orderkey"))), Acc(rev, cost))
      }
    }.groupBy(_._1).map { case (k, rs) =>
      k -> (rs.map(_._2.rev).sum.toDouble - 0.4 * rs.map(_._2.cost).sum.toDouble)
    }
    val rows = run("q9_product_profit").collect()
    assert(rows.length == expect.size && rows.nonEmpty)
    rows.foreach { r =>
      val e = expect((r.getAs[String]("nation"), r.getAs[Long]("o_year")))
      assert(math.abs(r.getAs[Double]("profit") - e) < 0.011)
    }
  }

  test("q11_important_parts: the fraction-of-total gate admits exactly the mirror's parts") {
    val eu = supplier.filter(s => nationRegion(s.getAs[Long]("nk"))._2 == "EUROPE")
      .map(_.getAs[Long]("s_suppkey")).toSet
    val pv = lineitem.filter(r => eu(r.getAs[Long]("l_suppkey")))
      .groupBy(_.getAs[Long]("l_partkey"))
      .map { case (pk, rs) =>
        pk -> rs.map(r => BigDecimal(r.getAs[Double]("l_extendedprice"))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP)).sum
      }
    val tot = pv.values.sum.toDouble
    val expect = pv.filter { case (_, v) => v.toDouble > tot * 0.0012 }
    val rows = run("q11_important_parts").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("p_partkey")).toSet == expect.keySet)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("part_value") - expect(r.getAs[Long]("p_partkey")).toDouble) < 0.011)
    }
  }

  test("q16_supplier_cnt: distinct-supplier rollup excludes NOT-IN suppliers") {
    val excluded = supplier.filter(_.getAs[Double]("s_acctbal") < 0)
      .map(_.getAs[Long]("s_suppkey")).toSet
    val pmeta = part.map(r => r.getAs[Long]("p_partkey") ->
      (r.getAs[String]("p_brand"), r.getAs[String]("p_type"), r.getAs[Int]("p_size"))).toMap
    val sizes = Set(5, 10, 15, 20, 25, 30)
    val expect = lineitem.flatMap { r =>
      val (b, t, sz) = pmeta(r.getAs[Long]("l_partkey"))
      val sk = r.getAs[Long]("l_suppkey")
      if (b != "Brand#4" && sizes(sz) && !excluded(sk)) Some(((b, t, sz.toLong), sk)) else None
    }.distinct.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val rows = run("q16_supplier_cnt").collect()
    assert(rows.length == expect.size && rows.nonEmpty)
    rows.foreach { r =>
      val k = (r.getAs[String]("p_brand"), r.getAs[String]("p_type"), r.getAs[Long]("p_size"))
      assert(r.getAs[Long]("supplier_cnt") == expect(k))
    }
  }

  test("q20_excess_ship: the semi-join chain admits exactly the mirror's suppliers") {
    val boltParts = part.filter(_.getAs[String]("p_name").contains("bolt"))
      .map(_.getAs[Long]("p_partkey")).toSet
    val qualifying = lineitem
      .filter(r => boltParts(r.getAs[Long]("l_partkey")) &&
        r.getAs[String]("sd") >= "1997-01-01" && r.getAs[String]("sd") < "1998-01-01")
      .groupBy(r => (r.getAs[Long]("l_suppkey"), r.getAs[Long]("l_partkey")))
      .toSeq.map { case ((sk, _), rs) => (sk, rs.map(_.getAs[Double]("l_quantity").toLong).sum) }
      .filter(_._2 > 30).map(_._1).toSet
    val expect = supplier.filter { s =>
      qualifying(s.getAs[Long]("s_suppkey")) && nationRegion(s.getAs[Long]("nk"))._2 == "ASIA"
    }.map(_.getAs[Long]("s_suppkey")).toSet
    val rows = run("q20_excess_ship").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("s_suppkey")).toSet == expect)
    rows.foreach(r => assert(nationRegion.values.exists(_._1 == r.getAs[String]("n_name"))))
  }
}
