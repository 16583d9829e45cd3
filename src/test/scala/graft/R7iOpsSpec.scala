package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic gates for the round-7 eighth batch: order-gap cadence,
  * event-type adoption overlap, supplier-concentration HHI. */
class R7iOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)

  private def q(x: Double, dec: Int): Double = {
    val m = math.pow(10, dec)
    (if (x >= 0) math.floor(x * m + 0.5) else -math.floor(-x * m + 0.5)) / m
  }

  test("q_order_gap: gap census, rank-selected quantiles, and the repeat census match the JVM mirror") {
    Tables.register(spark, TestSpark.Sf)
    val od = spark.sql(
      "select distinct o_custkey, unix_seconds(cast(o_orderdate as timestamp_ltz)) div 86400 as dd from orders")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byCust = od.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val gaps = byCust.values.flatMap(ds => ds.zip(ds.tail).map { case (a, b) => b - a }).toSeq
    val n = gaps.length.toLong
    val sorted = gaps.sorted
    def sel(p: Double) = sorted(((n * p).ceil.toInt - 1).max(0))
    val r = run("q_order_gap").collect().head
    assert(r.getAs[Long]("n_repeat_customers") == byCust.count(_._2.length >= 2).toLong)
    assert(r.getAs[Long]("n_gaps") == n)
    assert(math.abs(r.getAs[Double]("mean_gap_days") - q(gaps.sum.toDouble / n, 4)) < 1e-9)
    assert(r.getAs[Long]("p50_gap") == sel(0.5))
    assert(r.getAs[Long]("p90_gap") == sel(0.9))
    assert(r.getAs[Long]("max_gap") == sorted.last)
  }

  test("events_type_overlap: exact pair sets, jaccard, and both conditionals match the JVM mirror") {
    Tables.register(spark, TestSpark.Sf)
    val tu = spark.sql("select distinct event_type, user_id from events")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byType = tu.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val types = byType.keySet.toSeq.sorted
    val rows = run("events_type_overlap").collect()
    assert(rows.length == types.size * (types.size - 1) / 2)
    rows.foreach { r =>
      val (ta, tb) = (r.getAs[String]("type_a"), r.getAs[String]("type_b"))
      assert(ta < tb)
      val (ua, ub) = (byType(ta), byType(tb))
      val nab = (ua & ub).size.toLong
      assert(r.getAs[Long]("n_users_a") == ua.size.toLong)
      assert(r.getAs[Long]("n_users_b") == ub.size.toLong)
      assert(r.getAs[Long]("n_both") == nab)
      assert(math.abs(r.getAs[Double]("jaccard") -
        q(nab.toDouble / (ua.size + ub.size - nab), 4)) < 1e-9)
      assert(math.abs(r.getAs[Double]("p_b_given_a") - q(nab.toDouble / ua.size, 4)) < 1e-9)
      assert(math.abs(r.getAs[Double]("p_a_given_b") - q(nab.toDouble / ub.size, 4)) < 1e-9)
    }
  }

  test("q_hhi_supplier: micro-unit folds, decimal-38 quadratics, and shares match the JVM mirror") {
    Tables.register(spark, TestSpark.Sf)
    val li = spark.sql(
      "select s.s_nationkey, l.l_suppkey, l.l_extendedprice, l.l_discount " +
        "from lineitem l join supplier s on s.s_suppkey = l.l_suppkey")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val nations = spark.sql("select n_nationkey, n_name from nation")
      .collect().map(r => (r.getInt(0), r.getString(1))).toMap
    val perSupp = li.groupBy(t => (t._1, t._2)).view.mapValues { rs =>
      rs.map { case (_, _, p, disc) => math.floor(p * (1 - disc) * 1000000 + 0.5).toLong }.sum
    }.toMap
    val rows = run("q_hhi_supplier").collect()
    val byNation = perSupp.groupBy(_._1._1)
    assert(rows.length == byNation.size)
    rows.foreach { r =>
      val nk = nations.find(_._2 == r.getAs[String]("nation")).get._1
      val cs = byNation(nk).values.toSeq
      val tot = cs.sum
      val q2 = cs.map(c => BigInt(c) * BigInt(c)).sum
      assert(r.getAs[Long]("n_suppliers") == cs.length.toLong)
      assert(math.abs(r.getAs[Double]("total_revenue") - q(tot.toDouble / 1000000, 2)) < 1e-6)
      val hhi = q2.toDouble / (tot.toDouble * tot.toDouble)
      assert(math.abs(r.getAs[Double]("hhi") - q(hhi, 6)) < 1e-9)
      assert(math.abs(r.getAs[Double]("top_share") - q(cs.max.toDouble / tot, 4)) < 1e-9)
      assert(r.getAs[Int]("concentrated") == (if (q(hhi, 6) > 0.25) 1 else 0))
      // HHI lives in [1/n, 1]
      assert(r.getAs[Double]("hhi") >= 1.0 / cs.length - 1e-6 && r.getAs[Double]("hhi") <= 1.0)
    }
  }
}
