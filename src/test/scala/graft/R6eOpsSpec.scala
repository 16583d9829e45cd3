package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Prf, WmConst}

/** Semantic gates for the round-6 batch-5 ops: the gaps-and-islands
  * streak distribution, the minhash band-geometry curve (fully
  * re-derived signatures + the band-nesting monotonicity law), and the
  * Q22 scalar-average anti-join, all mirrored in the JVM.
  */
class R6eOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)

  test("events_streaks: longest-streak histogram matches a JVM islands mirror") {
    Tables.register(spark, TestSpark.Sf)
    val ud = spark.sql("select user_id, ts from events").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("ts") / 1000000000L / 86400L))
      .distinct
    val expect = ud.groupBy(_._1).map { case (_, rs) =>
      val days = rs.map(_._2).sorted
      // islands: a gap > 1 starts a new streak
      val lens = days.foldLeft(List.empty[(Long, Long)]) {
        case (Nil, d)                     => List((d, 1L))
        case ((last, len) :: t, d) if d == last + 1 => (d, len + 1) :: t
        case (acc, d)                     => (d, 1L) :: acc
      }.map(_._2)
      lens.max
    }.groupBy(identity).map { case (len, v) => len -> v.size.toLong }
    val rows = run("events_streaks").collect()
      .map(r => r.getAs[Long]("streak_days") -> r.getAs[Long]("n_users")).toMap
    assert(rows == expect)
  }

  test("minhash_band_curve: all four widths match fully re-derived JVM signatures") {
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    val p = WmConst.MinhashP
    val sigs: Map[Long, IndexedSeq[Long]] = docs.flatMap { case (id, text) =>
      val words = text.toLowerCase.split("\\s+")
      val shingles = words.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      val hs = shingles.map(sh =>
        java.lang.Long.parseLong(Prf.md5hex(sh).take(15), 16) % p)
      if (hs.isEmpty) None // <3-word docs have no signature row
      else Some(id -> (0 until 16).map { r =>
        val (a, b) = WmConst.minhashCoef(r)
        hs.map(h => (a * h + b) % p).min
      })
    }.toMap
    def curve(w: Int): (Long, Long) = {
      val nb = 16 / w
      val buckets = sigs.toSeq.flatMap { case (id, s) =>
        (0 until nb).map(b => ((b, (b * w until (b + 1) * w).map(s).mkString("_")), id))
      }
      val cand = buckets.groupBy(_._1).values.flatMap { g =>
        val ids = g.map(_._2).sorted
        for (i <- ids.indices; j <- i + 1 until ids.length) yield (ids(i), ids(j))
      }.toSet
      val nTrue = cand.count { case (a, b) =>
        (0 until 16).count(r => sigs(a)(r) == sigs(b)(r)) >= 8
      }
      (cand.size.toLong, nTrue.toLong)
    }
    val rows = run("minhash_band_curve").collect()
      .map(r => r.getAs[Long]("band_width") ->
        (r.getAs[Long]("n_candidates"), r.getAs[Long]("n_est_true"))).toMap
    assert(rows.nonEmpty)
    rows.foreach { case (w, got) =>
      assert(got == curve(w.toInt), s"width $w")
      assert(rows(w)._2 <= rows(w)._1)
    }
    // band nesting: a width-2w band match implies both width-w halves
    // match, so candidate sets (and their est-true subsets) shrink
    // monotonically as bands widen
    val widths = rows.keys.toSeq.sorted
    widths.sliding(2).foreach {
      case Seq(a, b) =>
        assert(rows(a)._1 >= rows(b)._1, s"candidates not monotone $a->$b")
        assert(rows(a)._2 >= rows(b)._2, s"est-true not monotone $a->$b")
      case _ => ()
    }
  }

  test("q22_sales_opp: scalar-average gate + anti-join matches the JVM mirror") {
    val cust = spark.read.parquet(s"${TestSpark.Sf}/customer.parquet")
      .selectExpr("c_custkey", "cast(c_nationkey as bigint) as c_nationkey", "c_acctbal")
      .collect()
      .map(r => (r.getAs[Long]("c_custkey"), r.getAs[Long]("c_nationkey"),
        r.getAs[Double]("c_acctbal")))
    val recent = spark.read.parquet(s"${TestSpark.Sf}/orders.parquet")
      .selectExpr("o_custkey", "cast(o_orderdate as string) as od").collect()
      .filter(_.getAs[String]("od") >= "2000-01-01")
      .map(_.getAs[Long]("o_custkey")).toSet
    val pos = cust.filter(_._3 > 0)
    val ab = pos.map(c => BigDecimal(c._3).setScale(2, BigDecimal.RoundingMode.HALF_UP))
      .sum.toDouble / pos.length
    val cand = cust.filter(c => c._3 > ab && !recent.contains(c._1))
    val expect = cand.groupBy(_._2).map { case (nk, cs) =>
      s"NATION_$nk" -> (cs.size.toLong,
        cs.map(c => BigDecimal(c._3).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble)
    }
    val rows = run("q22_sales_opp").collect()
    assert(rows.length == expect.size && rows.nonEmpty)
    rows.foreach { r =>
      val (n, bal) = expect(r.getAs[String]("n_name"))
      assert(r.getAs[Long]("n_customers") == n)
      assert(math.abs(r.getAs[Double]("total_balance") - bal) < 0.011)
    }
  }
}
