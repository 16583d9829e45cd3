package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Prf
import java.time.{LocalDateTime, ZoneOffset}

/** Round-9 batch F: the two TPC-H shapes that were column-blocked,
  * adapted to the shipped schema (Q12 conditional bimodal counts,
  * Q21 lone-late-supplier rollup) and the sampled harmonic-closeness
  * census — each mirrored in plain JVM collections.
  */
class R9fOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)
  private def r4(x: Double) = graft.operators.PcaSolve.roundAway(x, 4)
  private def q6(x: Double): Long = graft.operators.PcaSolve.roundAway(x, 0).toLong

  // independent epoch computation: parse the UTC-rendered timestamp
  // string, never the query's own unix_seconds expression
  private def epoch(s: String): Long =
    LocalDateTime.parse(s.replace(' ', 'T')).toEpochSecond(ZoneOffset.UTC)

  private lazy val ordersRows = spark.read.parquet(s"${TestSpark.Sf}/orders.parquet")
    .selectExpr("o_orderkey", "o_orderstatus", "o_orderpriority",
      "cast(o_orderdate as string) as od").collect()
  private lazy val lineRows = spark.read.parquet(s"${TestSpark.Sf}/lineitem.parquet")
    .selectExpr("l_orderkey", "l_suppkey", "l_returnflag",
      "cast(l_shipdate as string) as sd").collect()

  test("q12_shipmode: conditional bimodal priority counts match the JVM mirror") {
    val ord = ordersRows.map(r => r.getAs[Long]("o_orderkey") ->
      (r.getAs[String]("o_orderpriority"), epoch(r.getAs[String]("od")))).toMap
    val hi = Set("1-URGENT", "2-HIGH")
    val y0 = epoch("1997-01-01 00:00:00")
    val y1 = epoch("1998-01-01 00:00:00")
    val agg = collection.mutable.Map.empty[String, (Long, Long)]
    lineRows.foreach { r =>
      val mode = r.getAs[String]("l_returnflag")
      val se = epoch(r.getAs[String]("sd"))
      if ((mode == "R" || mode == "A") && se >= y0 && se < y1) {
        val (prio, oe) = ord(r.getAs[Long]("l_orderkey"))
        val lat = Math.floorDiv(se - oe, 86400L)
        if (lat >= 30 && lat <= 120) {
          val (h, l) = agg.getOrElse(mode, (0L, 0L))
          if (hi(prio)) agg(mode) = (h + 1, l) else agg(mode) = (h, l + 1)
        }
      }
    }
    val got = run("q12_shipmode").collect()
      .map(r => r.getAs[String]("mode") ->
        (r.getAs[Long]("high_line_count"), r.getAs[Long]("low_line_count"))).toMap
    assert(got == agg.toMap, s"got $got, mirror $agg")
    assert(got.nonEmpty)
  }

  test("q21_waiting_supplier: lone-late-supplier semantics match the textbook exists/not-exists mirror") {
    val fOrders = ordersRows.filter(_.getAs[String]("o_orderstatus") == "F")
      .map(r => r.getAs[Long]("o_orderkey") -> epoch(r.getAs[String]("od"))).toMap
    // (orderkey, suppkey, late) over status-F orders
    val lo = lineRows.flatMap { r =>
      fOrders.get(r.getAs[Long]("l_orderkey")).map { oe =>
        val late = epoch(r.getAs[String]("sd")) - oe > 90L * 86400L
        (r.getAs[Long]("l_orderkey"), r.getAs[Long]("l_suppkey"), late)
      }
    }
    // textbook Q21: supplier s waits order o iff s late in o,
    // EXISTS another supplier in o, NOT EXISTS another LATE supplier
    val byOrder = lo.groupBy(_._1)
    val waits = for {
      (ok, rs) <- byOrder.toSeq
      supps = rs.map(_._2).distinct
      lateSupps = rs.filter(_._3).map(_._2).distinct
      s <- lateSupps
      if supps.exists(_ != s) && !lateSupps.exists(_ != s)
    } yield (ok, s)
    val expect = waits.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val got = run("q21_waiting_supplier").collect()
      .map(r => r.getAs[Long]("s_suppkey") -> r.getAs[Long]("numwait")).toMap
    assert(got == expect, s"got ${got.size} suppliers, mirror ${expect.size}")
    assert(got.nonEmpty)
    // the name column carries the dim join
    run("q21_waiting_supplier").collect().foreach { r =>
      assert(r.getAs[String]("s_name").endsWith(f"${r.getAs[Long]("s_suppkey")}%09d"))
    }
  }

  test("graph_closeness: exact JVM harmonic-BFS mirror over the served graph") {
    Tables.register(spark, TestSpark.Sf)
    WmCache.ensure(spark, TestSpark.Sf)
    val knn = spark.table("g_knn").collect()
      .map(r => r.getAs[Long]("src") -> r.getAs[Long]("dst"))
    val edges = (knn ++ knn.map(_.swap)).distinct
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nodes = spark.sql("select vec_id from embeddings").collect()
      .map(_.getLong(0))
    val srcs = nodes.sortBy(id => (Prf.prf("cls", id), id)).take(8)

    // per-node: contributing sources, min dist, quantized 1/d sum
    val acc = collection.mutable.Map.empty[Long, (Long, Long, Long)]
    srcs.foreach { s =>
      val dist = collection.mutable.Map(s -> 0)
      var frontier = Set(s)
      for (dd <- 1 to 3) {
        val next = frontier.flatMap(v => adj.getOrElse(v, Set.empty))
          .filterNot(dist.contains)
        next.foreach(w => dist(w) = dd)
        frontier = next
      }
      dist.foreach { case (v, dd) =>
        if (dd > 0) {
          val (n, md, h) = acc.getOrElse(v, (0L, Long.MaxValue, 0L))
          acc(v) = (n + 1, math.min(md, dd.toLong), h + q6(1000000.0 / dd))
        }
      }
    }
    val got = run("graph_closeness").collect().map(r =>
      r.getAs[Long]("node") ->
        (r.getAs[Long]("n_sources"), r.getAs[Long]("min_dist"),
          r.getAs[Double]("harmonic"))).toMap
    assert(got.keySet == acc.keySet,
      s"node sets differ: got ${got.size}, mirror ${acc.size}")
    acc.foreach { case (v, (n, md, h)) =>
      assert(got(v)._1 == n, s"node $v n_sources")
      assert(got(v)._2 == md, s"node $v min_dist")
      assert(got(v)._3 == r4(h.toDouble / 1e6), s"node $v harmonic")
    }
    // a source's direct neighbors sit at distance 1 with full weight
    val s0 = srcs.head
    adj.getOrElse(s0, Set.empty).foreach { w =>
      assert(got.contains(w) && got(w)._2 == 1L)
    }
  }
}
