package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic gates for the round-6 graph-serving batch: personalized
  * PageRank (exact integer picorank mirror), the deterministic
  * random-walk corpus (keyed-PRF argmax mirror), the reciprocal-kNN
  * filter (set equality against the edge table), and the
  * conversion-window funnel (stage-time mirror + monotone census).
  */
class R6iOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)

  private val Seeds = Set(0L, 100L, 200L, 300L, 400L)

  private lazy val edges: Array[(Long, Long, Double, Long)] =
    SparkEntry.queries("wm_knn_edges")(spark, TestSpark.Sf).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst"),
        r.getAs[Double]("sim"), r.getAs[Long]("rn")))
  private lazy val nodes: Array[Long] =
    spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet")
      .select("vec_id").collect().map(_.getAs[Long]("vec_id"))

  test("graph_ppr: 3-step teleport diffusion matches the integer picorank mirror") {
    val odeg = edges.groupBy(_._1).map { case (s, es) => s -> es.length.toLong }
    val inc = edges.map(e => (e._1, e._2)) // u -> v
    var r: Map[Long, Long] = nodes.map(n => n -> (if (Seeds(n)) 200000000000L else 0L)).toMap
    for (_ <- 1 to 3) {
      val flow = inc.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => r(u) / odeg(u) }.sum
      }
      r = nodes.map { n =>
        n -> ((if (Seeds(n)) 30000000000L else 0L) + 85L * flow.getOrElse(n, 0L) / 100L)
      }.toMap
    }
    val expect = r.filter(_._2 > 0)
    val got = run("graph_ppr").collect()
      .map(x => x.getAs[Long]("vec_id") -> x.getAs[Long]("ppr_pico")).toMap
    assert(got == expect)
    // seeds retain teleport mass; diffusion reaches beyond the seeds
    Seeds.foreach(s => assert(got(s) >= 30000000000L))
    assert(got.size > Seeds.size)
  }

  test("graph_walks: every step is the keyed-PRF argmax over the current out-edges") {
    val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
    val rows = run("graph_walks").collect()
    assert(rows.length == nodes.length)
    rows.foreach { r =>
      val wid = r.getAs[Long]("walk_id")
      assert(r.getAs[Long]("n0") == wid)
      var cur = wid
      for (t <- 1 to 3) {
        val next = adj(cur).maxBy(dst =>
          (graft.functions.Prf.prf("walk", wid, t, dst), -dst))
        assert(r.getAs[Long](s"n$t") == next, s"walk $wid step $t")
        cur = next
      }
    }
  }

  test("graph_mutual_knn: exactly the reciprocated pairs, with both directions' metadata") {
    val emap = edges.map(e => (e._1, e._2) -> (e._3, e._4)).toMap
    val expect = emap.keySet.filter { case (a, b) => a < b && emap.contains((b, a)) }
    val rows = run("graph_mutual_knn").collect()
    val got = rows.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(got == expect)
    rows.foreach { r =>
      val k = (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))
      val (sab, rab) = emap(k)
      val (sba, rba) = emap(k.swap)
      assert(r.getAs[Double]("sim_ab") == sab && r.getAs[Long]("rank_ab") == rab)
      assert(r.getAs[Double]("sim_ba") == sba && r.getAs[Long]("rank_ba") == rba)
    }
  }

  test("events_funnel_windowed: stage census matches the conversion-window mirror") {
    Tables.register(spark, TestSpark.Sf)
    val evs = spark.sql("select user_id, event_type, ts div 1000000000 as sec from events")
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[Long]("sec")))
    val byUser = evs.groupBy(_._1)
    val views = byUser.flatMap { case (u, es) =>
      es.filter(_._2 == "view").map(_._3).minOption.map(u -> _)
    }
    val clicks = views.flatMap { case (u, tv) =>
      byUser(u).filter(e => e._2 == "click" && e._3 >= tv && e._3 <= tv + 3600)
        .map(_._3).minOption.map(u -> _)
    }
    val buys = clicks.flatMap { case (u, tc) =>
      byUser(u).filter(e => e._2 == "purchase" && e._3 >= tc && e._3 <= tc + 86400)
        .map(_._3).minOption.map(u -> _)
    }
    val row = run("events_funnel_windowed").collect().head
    assert(row.getAs[Long]("n_viewed") == views.size.toLong)
    assert(row.getAs[Long]("n_clicked_1h") == clicks.size.toLong)
    assert(row.getAs[Long]("n_purchased_24h") == buys.size.toLong)
    assert(math.abs(row.getAs[Double]("view_to_click") - clicks.size.toDouble / views.size) < 0.00011)
    assert(math.abs(row.getAs[Double]("click_to_buy") - buys.size.toDouble / clicks.size) < 0.00011)
    // the windowed funnel is a subset of the unwindowed one
    assert(views.size >= clicks.size && clicks.size >= buys.size)
  }

  test("wm_steganalysis: KS + mean shift match a mirror over the backup/embed cells") {
    // originals from the oracle-checked backup key, stego values from
    // the embed key — both 6dp-rounded; the normalized mirror divides
    // by the per-vector norm recomputed from raw parquet
    val nrm = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet").collect()
      .map { r =>
        val v = r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble)
        r.getAs[Long]("vec_id") -> math.sqrt(v.map(x => x * x).sum)
      }.toMap
    val orig = SparkEntry.queries("wm_backup")(spark, TestSpark.Sf).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("pos")) -> r.getAs[Double]("val")).toMap
    val steg = SparkEntry.queries("wm_embed")(spark, TestSpark.Sf).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("pos")) -> r.getAs[Double]("stego_val")).toMap
    assert(orig.keySet == steg.keySet)
    val pairs = orig.keys.toSeq.map { k =>
      (orig(k) / nrm(k._1), steg(k) / nrm(k._1))
    }
    def bucket(v: Double) = math.min(40L, math.max(0L, math.floor((v + 1) * 20).toLong))
    val n = pairs.length
    val ho = pairs.groupBy(p => bucket(p._1)).view.mapValues(_.size.toLong).toMap
    val hs = pairs.groupBy(p => bucket(p._2)).view.mapValues(_.size.toLong).toMap
    val ks = (0L to 40L).map { b =>
      val co = (0L to b).map(ho.getOrElse(_, 0L)).sum
      val cs = (0L to b).map(hs.getOrElse(_, 0L)).sum
      math.abs(co - cs)
    }.max.toDouble / n
    val meanShift = pairs.map { case (o, s) => s - o }.sum / n
    val row = run("wm_steganalysis").collect().head
    assert(row.getAs[Long]("n_cells") == n.toLong)
    // the mirror works from 6dp-rounded cells; allow bucket-edge slack
    assert(math.abs(row.getAs[Double]("ks_stat") - ks) <= 2.0 / n + 1e-9)
    assert(math.abs(row.getAs[Double]("mean_shift") - meanShift) < 1e-5)
    // statistical undetectability: QIM displacement stays within a
    // bucket or two of mass, and the mark is mean-free
    assert(row.getAs[Double]("ks_stat") < 0.2)
    assert(math.abs(row.getAs[Double]("mean_shift")) < 0.005)
  }
}
