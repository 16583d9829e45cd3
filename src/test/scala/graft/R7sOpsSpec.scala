package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic gates for the round-7 nineteenth batch: the storage-vs-
  * recall ladder (every quantizer leg re-scored in the JVM — SQ from
  * re-derived per-dim grids, PQ ADC from the served codebooks, BQ
  * from sign bits, MRL from prefix slices — and every hit recounted
  * against a re-derived truth table), the rich-club ladder (clubs,
  * intra-club edges, and φ refolded from the served degree/edge
  * keys), and funnel stage latency (first-qualifying chains, minute
  * grid, and both rank selections re-walked). */
class R7sOpsSpec extends AnyFunSuite {
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
        r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray).toMap
  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }
  private def normalize(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(dot(v, v)); v.map(_ / n)
  }
  private def top10(qid: Long, score: Long => Double, asc: Boolean = false): Set[Long] =
    raw.keysIterator.filter(_ != qid).map(c => (c, score(c))).toSeq
      .sortBy { case (c, s) => (if (asc) s else -s, c) }.take(10).map(_._1).toSet

  // ---------------- index_recall_ladder ----------------

  test("index_recall_ladder: every quantizer leg re-scores in the JVM and every hit recounts") {
    val rows = run("index_recall_ladder").collect()
    assert(rows.length == 5)
    val qids = sqlgen.Wm.QueryIds
    val nrm = raw.map { case (id, v) => id -> normalize(v) }
    val truth = qids.map(qid => qid -> top10(qid, c => q(dot(nrm(qid), nrm(c)), 6))).toMap
    // mrl16: prefix-16 cosine of the normalized vectors
    val pre = nrm.map { case (id, v) => id -> v.take(16) }
    val pnrm = pre.map { case (id, p) => id -> math.sqrt(dot(p, p)) }
    val mrlHits = qids.map { qid =>
      val sel = top10(qid, c =>
        q(if (pnrm(qid) == 0 || pnrm(c) == 0) 0.0 else dot(pre(qid), pre(c)) / (pnrm(qid) * pnrm(c)), 6))
      (sel & truth(qid)).size
    }.sum
    // sq8: per-dim min/max grid over RAW values, midpoint dequant, raw-q cosine
    val dim = raw.head._2.length
    val mn = Array.tabulate(dim)(i => raw.values.map(_(i)).min)
    val mx = Array.tabulate(dim)(i => raw.values.map(_(i)).max)
    val deq = raw.map { case (id, v) =>
      id -> Array.tabulate(dim) { i =>
        if (mx(i) == mn(i)) mn(i)
        else {
          val code = math.min(255L, math.max(0L, math.floor((v(i) - mn(i)) / (mx(i) - mn(i)) * 256).toLong))
          mn(i) + (code + 0.5) / 256 * (mx(i) - mn(i))
        }
      }
    }
    val sqHits = qids.map { qid =>
      val qv = raw(qid)
      val sel = top10(qid, c =>
        q(dot(qv, deq(c)) / (math.sqrt(dot(qv, qv)) * math.sqrt(dot(deq(c), deq(c)))), 6))
      (sel & truth(qid)).size
    }.sum
    // bq64: sign bits of the raw values, Hamming asc with cid tie-break
    val bits = raw.map { case (id, v) => id -> v.map(_ > 0) }
    val bqHits = qids.map { qid =>
      val sel = top10(qid, c =>
        bits(qid).zip(bits(c)).count { case (a, b) => a != b }.toDouble, asc = true)
      (sel & truth(qid)).size
    }.sum
    // pq8x8: ADC against the SERVED codebooks/codes (the views the key reads)
    val book = spark.table("g_pq_ct").collect().map { r =>
      (r.getAs[Number](r.fieldIndex("m")).longValue,
        r.getAs[Number](r.fieldIndex("cell")).longValue) ->
        r.getSeq[Double](r.fieldIndex("cv")).toArray
    }.toMap
    val codes = spark.table("g_pq_codes").collect().map { r =>
      (r.getAs[Long]("id"), r.getAs[Number](r.fieldIndex("m")).longValue) ->
        r.getAs[Number](r.fieldIndex("cell")).longValue
    }.toMap
    val pqHits = qids.map { qid =>
      val qsub = (0 until 8).map(m => nrm(qid).slice(m * 8, m * 8 + 8).toArray)
      val sel = top10(qid, { c =>
        var qda = 0.0; var c2 = 0.0
        (0 until 8).foreach { m =>
          val cv = book((m.toLong, codes((c, m.toLong))))
          qda += dot(qsub(m), cv); c2 += dot(cv, cv)
        }
        q(qda / math.sqrt(c2), 6)
      })
      (sel & truth(qid)).size
    }.sum
    val exp = Map("raw_f64" -> (512L, 50L), "mrl16" -> (128L, mrlHits.toLong),
      "sq8" -> (64L, sqHits.toLong), "pq8x8" -> (8L, pqHits.toLong), "bq64" -> (8L, bqHits.toLong))
    rows.foreach { r =>
      val m = r.getAs[String]("method")
      val (bytes, hits) = exp(m)
      assert(r.getAs[Long]("bytes_per_vector") == bytes, s"$m bytes")
      assert(r.getAs[Long]("hits") == hits, s"$m hits")
      assert(math.abs(r.getAs[Double]("recall10") - q(hits / 50.0, 4)) < 1e-9)
      assert(math.abs(r.getAs[Double]("compression_x") - q(512.0 / bytes, 2)) < 1e-9)
    }
    // the anchor: the raw row is its own truth table
    assert(exp("raw_f64")._2 == 50L)
  }

  // ---------------- graph_rich_club ----------------

  test("graph_rich_club: clubs, intra-club edges, and phi refold from the served keys") {
    val indeg = run("wm_in_degree").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("in_degree")).toMap
    val edges = run("wm_knn_edges").collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst")))
    val nAll = indeg.size.toLong
    val rows = run("graph_rich_club").collect().sortBy(_.getAs[Long]("degree_gt"))
    assert(rows.map(_.getAs[Long]("degree_gt")).toSeq == Seq(2L, 4L, 8L, 16L))
    rows.foreach { r =>
      val k = r.getAs[Long]("degree_gt")
      val club = indeg.filter(_._2 > k).keySet
      val intra = edges.count { case (s, d) => club(s) && club(d) }.toLong
      assert(r.getAs[Long]("n_club") == club.size.toLong, s"k=$k club")
      assert(math.abs(r.getAs[Double]("club_share") - q(club.size.toDouble / nAll, 4)) < 1e-9)
      assert(r.getAs[Long]("n_intra_edges") == intra, s"k=$k edges")
      if (club.size >= 2)
        assert(math.abs(r.getAs[Double]("phi") -
          q(intra.toDouble / (club.size.toDouble * (club.size - 1)), 4)) < 1e-9, s"k=$k phi")
      else assert(r.isNullAt(r.fieldIndex("phi")))
    }
  }

  // ---------------- events_funnel_time ----------------

  test("events_funnel_time: stage gaps, minute grid, and both rank selections re-walk") {
    Tables.register(spark, TestSpark.Sf)
    val ev = spark.sql(
      """select user_id, event_type, ts div 1000000000 as sec from events
        |where event_type in ('view', 'click', 'purchase')""".stripMargin)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"), r.getAs[Long]("sec")))
    val byUser = ev.groupBy(_._1)
    val gaps = byUser.values.flatMap { es =>
      val v0 = es.filter(_._2 == "view").map(_._3).minOption
      val c0 = v0.flatMap(v => es.filter(e => e._2 == "click" && e._3 >= v).map(_._3).minOption)
      val p0 = c0.flatMap(c => es.filter(e => e._2 == "purchase" && e._3 >= c).map(_._3).minOption)
      Seq(c0.zip(v0).map { case (c, v) => (1L, c - v) },
        p0.zip(c0).map { case (p, c) => (2L, p - c) }).flatten
    }.toSeq
    val rows = run("events_funnel_time").collect().sortBy(_.getAs[Long]("stage"))
    val byStage = gaps.groupBy(_._1)
    assert(rows.length == byStage.size)
    rows.foreach { r =>
      val st = r.getAs[Long]("stage")
      val dts = byStage(st).map(_._2)
      val n = dts.size.toLong
      assert(r.getAs[Long]("n_converted") == n, s"stage=$st")
      assert(math.abs(r.getAs[Double]("mean_minutes") - q(dts.sum.toDouble / n / 60, 4)) < 1e-9)
      val byMin = dts.map(_ / 60).groupBy(identity).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
      def sel(num: Long, den: Long): Long = {
        var cm = 0L
        byMin.collectFirst { case (v, m) if { cm += m; cm * den >= n * num } => v }.get
      }
      assert(r.getAs[Long]("median_minutes") == sel(1, 2), s"stage=$st median")
      assert(r.getAs[Long]("p90_minutes") == sel(9, 10), s"stage=$st p90")
    }
  }
}
