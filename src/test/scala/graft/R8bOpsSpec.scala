package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic gates for the round-7 twenty-eighth batch: the two
  * remaining pgvector distance surfaces (max inner product over raw
  * vectors, unrolled L1) mirrored brute in the JVM, and the all-pairs
  * event-type correlation matrix refolded from zero-filled series. */
class R8bOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)

  private def q(x: Double, dec: Int): Double = {
    val m = math.pow(10, dec)
    (if (x >= 0) math.floor(x * m + 0.5) else -math.floor(-x * m + 0.5)) / m
  }

  private lazy val raw: Map[Long, Array[Double]] =
    spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray).toMap

  // ---------------- vec_topk_ip ----------------

  test("vec_topk_ip: max inner product over raw vectors matches the JVM brute ranking") {
    val rows = run("vec_topk_ip").collect()
    val qids = rows.map(_.getAs[Long]("qid")).distinct
    assert(qids.sorted.toSeq == graft.sqlgen.Wm.QueryIds.sorted)
    qids.foreach { qid =>
      val qv = raw(qid)
      val scored = raw.toSeq.filter(_._1 != qid).map { case (cid, cv) =>
        val ip = qv.indices.foldLeft(0.0)((s, i) => s + qv(i) * cv(i))
        (cid, q(ip, 6))
      }
      val expect = scored.sortBy { case (cid, ip) => (-ip, cid) }.take(10)
      val mine = rows.filter(_.getAs[Long]("qid") == qid).sortBy(_.getAs[Long]("rn"))
      assert(mine.length == 10)
      mine.zip(expect).foreach { case (r, (cid, ip)) =>
        assert(r.getAs[Long]("neighbor_id") == cid, s"q$qid rn${r.getAs[Long]("rn")}")
        assert(math.abs(r.getAs[Double]("ip") - ip) < 1e-9)
      }
    }
    // this corpus ships unit-normalized (float32 norms within 1e-7 of
    // 1), so raw inner product must AGREE with cosine at the rounding
    // grid — the cross-operator consistency witness; on unnormalized
    // data the two paths diverge by design
    val cos = run("vec_topk").collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("rn")) -> r.getAs[Double]("sim")).toMap
    rows.foreach { r =>
      cos.get((r.getAs[Long]("qid"), r.getAs[Long]("rn"))).foreach(s =>
        assert(math.abs(s - r.getAs[Double]("ip")) < 5e-6, "unit-norm corpus: ip ~ cosine"))
    }
  }

  // ---------------- vec_topk_l1 ----------------

  test("vec_topk_l1: the unrolled taxicab distance matches the JVM brute ranking") {
    val rows = run("vec_topk_l1").collect()
    val qids = rows.map(_.getAs[Long]("qid")).distinct
    qids.foreach { qid =>
      val qv = raw(qid)
      val scored = raw.toSeq.filter(_._1 != qid).map { case (cid, cv) =>
        // same left-to-right fold order as the unrolled SQL sum
        val d1 = qv.indices.foldLeft(0.0)((s, i) => s + math.abs(qv(i) - cv(i)))
        (cid, q(d1, 6))
      }
      val expect = scored.sortBy { case (cid, dist) => (dist, cid) }.take(10)
      val mine = rows.filter(_.getAs[Long]("qid") == qid).sortBy(_.getAs[Long]("rn"))
      assert(mine.length == 10)
      mine.zip(expect).foreach { case (r, (cid, dist)) =>
        assert(r.getAs[Long]("neighbor_id") == cid, s"q$qid rn${r.getAs[Long]("rn")}")
        assert(math.abs(r.getAs[Double]("dist") - dist) < 1e-9)
      }
    }
  }

  // ---------------- events_corr_matrix ----------------

  test("events_corr_matrix: every pair's Pearson r refolds from the zero-filled daily grid") {
    Tables.register(spark, TestSpark.Sf)
    val ev = spark.sql("select event_type, (ts div 1000000000) div 86400 as day from events")
      .collect().map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day")))
    val spine = ev.map(_._2).distinct.sorted
    val types = ev.map(_._1).distinct.sorted
    def series(t: String): Seq[Long] = {
      val c = ev.filter(_._1 == t).groupBy(_._2).view.mapValues(_.length.toLong).toMap
      spine.map(day => c.getOrElse(day, 0L))
    }
    val rows = run("events_corr_matrix").collect()
    val pairs = for (i <- types.indices; j <- i + 1 until types.length) yield (types(i), types(j))
    assert(rows.length == pairs.length)
    rows.foreach { r =>
      val (ta, tb) = (r.getAs[String]("type_a"), r.getAs[String]("type_b"))
      assert(ta < tb, "unordered pair convention")
      val xs = series(ta); val ys = series(tb)
      val n = xs.length.toLong
      val sx = xs.sum; val sy = ys.sum
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val sxx = xs.map(a => a * a).sum; val syy = ys.map(b => b * b).sum
      assert(r.getAs[Long]("n_days") == n)
      if (n >= 3 && n * sxx > sx * sx && n * syy > sy * sy) {
        val pr = (n * sxy - sx * sy).toDouble /
          math.sqrt((n * sxx - sx * sx).toDouble * (n * syy - sy * sy).toDouble)
        assert(math.abs(r.getAs[Double]("pearson_r") - q(pr, 6)) < 1e-9, s"$ta/$tb")
        assert(math.abs(q(pr, 6)) <= 1.0 + 1e-9)
      } else assert(r.isNullAt(r.fieldIndex("pearson_r")))
    }
  }
}
