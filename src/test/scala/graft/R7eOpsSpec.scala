package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Prf

/** Semantic gates for the round-7 fourth batch: label separation,
  * retention half-life fit, per-doc novelty rate. */
class R7eOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)

  private def q(x: Double, dec: Int): Double = {
    val m = math.pow(10, dec)
    (if (x >= 0) math.floor(x * m + 0.5) else -math.floor(-x * m + 0.5)) / m
  }

  test("vec_label_separation: within/between sims match the JVM centroid mirror") {
    Tables.register(spark, TestSpark.Sf)
    val vecs = spark.sql(
      "select vec_id, label, cast(embedding as array<double>) as v from embeddings")
      .collect().map { r =>
        val v = r.getSeq[Double](2).toArray
        var ss = 0.0; var i = 0
        while (i < v.length) { ss += v(i) * v(i); i += 1 }
        (r.get(1).asInstanceOf[Number].longValue, v.map(_ / math.sqrt(ss)))
      }
    val byLabel = vecs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val cent = byLabel.map { case (l, vs) =>
      l -> Array.tabulate(64)(i => q(vs.map(_(i)).sum / vs.length, 6))
    }
    def dot(a: Array[Double], b: Array[Double]) = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    def nrm(a: Array[Double]) = math.sqrt(dot(a, a))
    val rows = run("vec_label_separation").collect()
    assert(rows.length == byLabel.size)
    rows.foreach { r =>
      val l = r.getAs[Long]("label")
      val c = cent(l)
      val within = {
        val sims = byLabel(l).map(v => q(dot(v, c) / nrm(c), 6))
        q(sims.map(BigDecimal(_)).sum.toDouble / sims.length, 4)
      }
      assert(r.getAs[Long]("n_members") == byLabel(l).length.toLong)
      assert(math.abs(r.getAs[Double]("within_sim") - within) < 2e-4, s"label $l")
      val bet = cent.filter(_._1 != l).map { case (l2, c2) =>
        (q(dot(c, c2) / (nrm(c) * nrm(c2)), 6), l2)
      }
      val (bs, bl) = bet.maxBy { case (s, l2) => (s, -l2) }
      assert(r.getAs[Long]("nearest_label") == bl, s"label $l")
      assert(math.abs(r.getAs[Double]("between_sim") - q(bs, 4)) < 2e-4, s"label $l")
      // the margin column is internally consistent with the two sims
      assert(math.abs(r.getAs[Double]("separation_margin") -
        q(r.getAs[Double]("within_sim") - r.getAs[Double]("between_sim"), 4)) < 2e-4)
      assert(r.getAs[Long]("nearest_label") != l)
    }
    assert(rows.map(_.getAs[Long]("n_members")).sum == vecs.length.toLong)
  }

  test("events_retention_halflife: day-k censuses, censoring, and the fit match the JVM mirror") {
    Tables.register(spark, TestSpark.Sf)
    val ev = spark.sql("select user_id, ts div 1000000000 as sec from events")
      .collect().map(r => (r.getLong(0), r.getLong(1) / 86400))
    val d0 = ev.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val active = ev.map(e => (e._1, e._2)).toSet
    val md = ev.map(_._2).max
    val rk = (1 to 14).map { k =>
      val elig = d0.filter { case (_, dd) => dd + k <= md }
      val ret = elig.count { case (u, dd) => active((u, dd + k)) }
      (k, elig.size.toLong, ret.toLong)
    }
    // roundAway onto the 1e-6 integer ln grid, negatives included
    val ys = rk.filter(_._3 > 0).map { case (k, e, r) =>
      val x = math.log(r.toDouble / e) * 1e6
      (k.toDouble, if (x >= 0) math.floor(x + 0.5) else -math.floor(-x + 0.5))
    }
    val n = ys.length.toDouble
    val sx = ys.map(_._1).sum; val sy = ys.map(_._2).sum
    val sxy = ys.map(p => p._1 * p._2).sum; val sxx = ys.map(p => p._1 * p._1).sum
    val num = n * sxy - sx * sy
    val slope = num / (n * sxx - sx * sx) / 1e6
    val rows = run("events_retention_halflife").collect().sortBy(_.getAs[Long]("k"))
    assert(rows.length == 14)
    rows.foreach { r =>
      val (k, e, ret) = rk(r.getAs[Long]("k").toInt - 1)
      assert(r.getAs[Long]("n_eligible") == e, s"k=$k")
      assert(r.getAs[Long]("n_retained") == ret, s"k=$k")
      assert(math.abs(r.getAs[Double]("retention") - q(ret.toDouble / e, 4)) < 1e-9)
      assert(math.abs(r.getAs[Double]("decay_slope") - q(slope, 6)) < 2e-6)
      if (num < 0)
        assert(math.abs(r.getAs[Double]("halflife_days") -
          q(-693147.18 * (n * sxx - sx * sx) / num, 4)) < 1e-2)
      else assert(r.isNullAt(r.fieldIndex("halflife_days")),
        "no decay must yield a null half-life, not a negative one")
    }
  }

  test("text_novelty_rate: first-seen shingle shares match the JVM mirror") {
    Tables.register(spark, TestSpark.Sf)
    val docs = spark.sql("select doc_id, lower(text) as lt from documents").collect()
      .map(r => (r.getLong(0), r.getString(1).split("\\s+").filter(_.nonEmpty)))
    val dg = docs.flatMap { case (id, ws) =>
      ws.sliding(5).filter(_.length == 5)
        .map(g => (id, java.lang.Long.parseLong(Prf.md5hex(g.mkString(" ")).take(15), 16)))
        .toSet
    }
    val first = dg.groupBy(_._2).view.mapValues(_.map(_._1).min).toMap
    val expect = dg.groupBy(_._1).view.mapValues { gs =>
      (gs.length.toLong, gs.count(g => first(g._2) == g._1).toLong)
    }.toMap
    val rows = run("text_novelty_rate").collect()
    assert(rows.length == expect.size && rows.nonEmpty)
    rows.foreach { r =>
      val (ns, nn) = expect(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_shingles") == ns)
      assert(r.getAs[Long]("n_novel") == nn)
      assert(math.abs(r.getAs[Double]("novelty_rate") - q(nn.toDouble / ns, 4)) < 1e-9)
    }
    // the earliest doc with shingles is all-novel by construction
    val firstDoc = expect.keys.min
    assert(expect(firstDoc)._1 == expect(firstDoc)._2)
  }
}
