package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic gates for the round-7 ninth batch: discount elasticity,
  * power-of-two activity histogram, DAU/MAU stickiness. */
class R7jOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)

  private def q(x: Double, dec: Int): Double = {
    val m = math.pow(10, dec)
    (if (x >= 0) math.floor(x * m + 0.5) else -math.floor(-x * m + 0.5)) / m
  }

  test("q_discount_elasticity: per-level means and the exact-moment Pearson r match the JVM mirror") {
    Tables.register(spark, TestSpark.Sf)
    val g = spark.sql("select l_discount, l_quantity from lineitem")
      .collect().map(r => (
        math.floor(r.getDouble(0) * 100 + 0.5).toLong,
        math.floor(r.getDouble(1) + 0.5).toLong))
    val n = g.length.toLong
    val sx = g.map(_._1).sum; val sy = g.map(_._2).sum
    val sxx = g.map(t => t._1 * t._1).sum
    val syy = g.map(t => t._2 * t._2).sum
    val sxy = g.map(t => t._1 * t._2).sum
    val pr = (n * sxy - sx * sy).toDouble /
      math.sqrt((n * sxx - sx * sx).toDouble) / math.sqrt((n * syy - sy * sy).toDouble)
    val byLvl = g.groupBy(_._1)
    val rows = run("q_discount_elasticity").collect()
    assert(rows.length == byLvl.size)
    rows.foreach { r =>
      val x = r.getAs[Long]("discount_pct")
      val lv = byLvl(x)
      assert(r.getAs[Long]("n_lines") == lv.length.toLong)
      assert(math.abs(r.getAs[Double]("avg_quantity") -
        q(lv.map(_._2).sum.toDouble / lv.length, 4)) < 1e-9, s"level $x")
      assert(math.abs(r.getAs[Double]("pearson_r") - q(pr, 4)) < 1e-9)
    }
  }

  test("events_activity_hist: ladder buckets, shares, and the cumulative curve match the JVM mirror") {
    Tables.register(spark, TestSpark.Sf)
    val uc = spark.sql("select user_id, count(*) as c from events group by user_id")
      .collect().map(_.getLong(1))
    def bucket(c: Long): Int = (39 to 1 by -1).find(b => c >= (1L << b)).getOrElse(0)
    val bc = uc.groupBy(bucket)
    val u = uc.length.toLong
    val e = uc.sum
    val rows = run("events_activity_hist").collect().sortBy(_.getAs[Long]("log2_bucket"))
    assert(rows.length == bc.size)
    var cum = 0L
    rows.foreach { r =>
      val b = r.getAs[Long]("log2_bucket").toInt
      val cs = bc(b)
      cum += cs.length
      assert(r.getAs[Long]("bucket_min") == (1L << b))
      assert(r.getAs[Long]("n_users") == cs.length.toLong)
      assert(r.getAs[Long]("n_events") == cs.sum)
      assert(math.abs(r.getAs[Double]("user_share") - q(cs.length.toDouble / u, 4)) < 1e-9)
      assert(math.abs(r.getAs[Double]("event_share") - q(cs.sum.toDouble / e, 4)) < 1e-9)
      assert(math.abs(r.getAs[Double]("cum_user_share") - q(cum.toDouble / u, 4)) < 1e-9)
    }
    assert(math.abs(rows.last.getAs[Double]("cum_user_share") - 1.0) < 1e-9)
  }

  test("events_stickiness: DAU, trailing-28-day MAU, and the ratio match the JVM mirror") {
    Tables.register(spark, TestSpark.Sf)
    val ud = spark.sql("select distinct user_id, ts div 1000000000 div 86400 as day from events")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val days = ud.map(_._2).distinct.sorted
    val rows = run("events_stickiness").collect()
    assert(rows.length == days.length)
    rows.foreach { r =>
      val day = r.getAs[Long]("day")
      val dau = ud.count(_._2 == day).toLong
      val mau = ud.filter(t => t._2 >= day - 27 && t._2 <= day).map(_._1).distinct.length.toLong
      assert(r.getAs[Long]("dau") == dau, s"day $day")
      assert(r.getAs[Long]("mau") == mau, s"day $day")
      assert(math.abs(r.getAs[Double]("stickiness") - q(dau.toDouble / mau, 4)) < 1e-9)
      // MAU dominates DAU by construction
      assert(mau >= dau)
    }
  }
}
