package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic gates for the round-7 thirty-third batch: the order ↔
  * lineitem reconciliation audit (exact-cents rollup and bucket
  * census refolded), churn-label generation (point-in-time features
  * and labels re-derived per user), Burrows' Delta stylometry
  * (midranks→z→city-block distance refolded from raw text), and the
  * perceptual-hash image dedup (dHash re-derived from the pixel
  * formula, census recounted). */
class R8gOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)

  private def q(x: Double, dec: Int): Double = {
    val m = math.pow(10, dec)
    (if (x >= 0) math.floor(x * m + 0.5) else -math.floor(-x * m + 0.5)) / m
  }
  private def qL(x: Double): Long =
    (if (x >= 0) math.floor(x + 0.5) else -math.floor(-x + 0.5)).toLong

  test("q_order_reconcile: exact-cents rollup, buckets, and orphan census refold") {
    Tables.register(spark, TestSpark.Sf)
    val ls = spark.sql("select l_orderkey, l_extendedprice, l_discount, l_tax from lineitem")
      .collect().groupBy(_.getAs[Long]("l_orderkey")).map { case (k, rows) =>
        k -> (rows.length.toLong, rows.map { r =>
          qL(r.getAs[Double]("l_extendedprice") * 100) *
            (100 - qL(r.getAs[Double]("l_discount") * 100)) *
            (100 + qL(r.getAs[Double]("l_tax") * 100))
        }.sum)
      }
    val os = spark.sql("select o_orderkey, o_totalprice from orders")
      .collect().map(r => r.getAs[Long]("o_orderkey") ->
        qL(r.getAs[Double]("o_totalprice") * 100) * 10000L).toMap
    val allKeys = ls.keySet ++ os.keySet
    val tagged = allKeys.toSeq.map { k =>
      val l = ls.get(k); val o = os.get(k)
      val bucket =
        if (l.isEmpty) "orphan_header"
        else if (o.isEmpty) "orphan_lines"
        else {
          val rel = math.abs((o.get - l.get._2).toDouble) / o.get
          if (rel < 0.0001) "match" else if (rel < 0.01) "gap_sub_1pct"
          else if (rel < 0.1) "gap_sub_10pct" else if (rel < 1.0) "gap_sub_100pct"
          else "gap_over_100pct"
        }
      val relq = for (oo <- o; ll <- l)
        yield qL(math.abs((oo - ll._2).toDouble) / oo * 1000000)
      (bucket, l.map(_._1).getOrElse(0L), relq)
    }
    val rows = run("q_order_reconcile").collect()
    val total = allKeys.size.toLong
    assert(rows.map(_.getAs[Long]("n_orders")).sum == total)
    rows.foreach { r =>
      val b = r.getAs[String]("bucket")
      val mine = tagged.filter(_._1 == b)
      assert(r.getAs[Long]("n_orders") == mine.size.toLong, b)
      assert(r.getAs[Long]("n_lineitems") == mine.map(_._2).sum, b)
      assert(math.abs(r.getAs[Double]("order_share") - q(mine.size.toDouble / total, 4)) < 1e-9, b)
      if (mine.exists(_._3.isDefined))
        assert(math.abs(r.getAs[Double]("mean_abs_rel_gap") -
          q(mine.flatMap(_._3).sum.toDouble / mine.size / 1000000, 4)) < 1e-9, b)
    }
    // the synthetic corpus draws totals independently: the audit must
    // find essentially nothing in the match bucket
    val matchRow = rows.find(_.getAs[String]("bucket") == "match")
    assert(matchRow.forall(_.getAs[Long]("n_orders") < total / 10))
  }

  test("events_churn_labels: point-in-time features and labels re-derived per user") {
    Tables.register(spark, TestSpark.Sf)
    val ev = spark.sql("select user_id, ts div 1000000000 div 86400 as day, event_type from events")
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("day"), r.getAs[String]("event_type")))
    val users = ev.groupBy(_._1).flatMap { case (_, xs) =>
      val pre = xs.filter(_._2 < 19746)
      if (pre.isEmpty) None else Some {
        val nb = pre.size.toLong
        val bucket = (12 to 1 by -1).find(b => nb >= (1L << b)).getOrElse(0)
        (bucket.toLong, nb, pre.count(_._3 == "purchase").toLong,
          19746 - pre.map(_._2).max, pre.map(_._2).max - pre.map(_._2).min,
          pre.map(_._2).distinct.size.toLong,
          if (xs.exists(_._2 >= 19746)) 0L else 1L)
      }
    }.toSeq
    val rows = run("events_churn_labels").collect()
    assert(rows.map(_.getAs[Long]("n_users")).sum == users.size.toLong)
    rows.foreach { r =>
      val b = r.getAs[Long]("log2_activity_bucket")
      val mine = users.filter(_._1 == b)
      assert(r.getAs[Long]("n_users") == mine.size.toLong, s"bucket $b")
      assert(r.getAs[Long]("n_churned") == mine.map(_._7).sum, s"bucket $b")
      assert(math.abs(r.getAs[Double]("churn_rate") -
        q(mine.map(_._7).sum.toDouble / mine.size, 4)) < 1e-9, s"bucket $b")
      assert(math.abs(r.getAs[Double]("mean_recency_days") -
        q(mine.map(_._4).sum.toDouble / mine.size, 2)) < 1e-9, s"bucket $b")
      assert(math.abs(r.getAs[Double]("mean_tenure_days") -
        q(mine.map(_._5).sum.toDouble / mine.size, 2)) < 1e-9, s"bucket $b")
      assert(math.abs(r.getAs[Double]("mean_purchases") -
        q(mine.map(_._3).sum.toDouble / mine.size, 2)) < 1e-9, s"bucket $b")
    }
  }

  test("text_burrows_delta: top words, ppb grid, z-scores, and deltas refold from raw text") {
    Tables.register(spark, TestSpark.Sf)
    val docs = spark.sql("select source, lower(text) as t from documents")
      .collect().map(r => (r.getAs[String]("source"), r.getAs[String]("t")))
    val words = docs.flatMap { case (s, t) => t.split("\\s+").filter(_.nonEmpty).map((s, _)) }
    val wc = words.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val top = wc.toSeq.sortBy { case (w, c) => (-c, w) }.take(30).map(_._1).toSet
    val stot = words.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val scnt = words.filter(w => top(w._2)).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sources = stot.keys.toSeq.sorted
    val ppb = (for (s <- sources; w <- top)
      yield (s, w) -> scnt.getOrElse((s, w), 0L) * 1000000000L / stot(s)).toMap
    val zq = top.map { w =>
      val ps = sources.map(s => ppb((s, w)))
      val sN = ps.size.toLong; val sp = ps.sum; val spp = ps.map(p => p * p).sum
      w -> sources.map { s =>
        val z = if (sN * spp - sp * sp == 0) 0L
        else qL((ppb((s, w)) - sp.toDouble / sN) /
          math.sqrt((sN.toDouble * spp - sp.toDouble * sp) / (sN.toDouble * (sN - 1))) * 1000000)
        s -> z
      }.toMap
    }.toMap
    val rows = run("text_burrows_delta").collect()
    assert(rows.length == sources.size * (sources.size - 1) / 2)
    rows.foreach { r =>
      val (sa, sb) = (r.getAs[String]("source_a"), r.getAs[String]("source_b"))
      assert(sa < sb)
      assert(r.getAs[Long]("n_words") == 30L)
      val delta = top.toSeq.map(w => math.abs(zq(w)(sa) - zq(w)(sb))).sum
      assert(math.abs(r.getAs[Double]("delta_burrows") -
        q(delta.toDouble / 30 / 1000000, 4)) < 1e-9, s"$sa-$sb")
    }
  }

  test("multimodal_image_dhash: hashes re-derived from the pixel formula; census recounted") {
    import graft.operators.Bmp
    Tables.register(spark, TestSpark.Sf)
    val vecs = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray)
    // JVM hash straight from the pixel FORMULA (not through the codec):
    // agreement with the served key witnesses encode→parse inversion
    val hashes = vecs.map { case (id, v) =>
      val px = v.map(Bmp.pixelByte)
      id -> Bmp.dhash(px, 8)
    }
    val hs = hashes.toMap
    val bands = hashes.flatMap { case (id, h) =>
      (0 to 3).map(k => ((k, (h >> (14 * k)) & 16383L), id))
    }
    val cand = bands.groupBy(_._1).values.flatMap { ids =>
      val v = ids.map(_._2).sorted
      for (i <- v.indices; j <- (i + 1) until v.length) yield (v(i), v(j))
    }.toSet
    val hammings = cand.toSeq.map { case (a, b) =>
      java.lang.Long.bitCount(hs(a) ^ hs(b))
    }
    val rows = run("multimodal_image_dhash").collect()
    val totalRow = rows.find(_.getAs[Long]("hamming") == -1L).get
    assert(totalRow.getAs[Long]("n_pairs") == vecs.length.toLong) // n_images
    assert(totalRow.getAs[Long]("n_distinct") == hs.values.toSet.size.toLong)
    val dupImages = hs.values.groupBy(identity).values.filter(_.size > 1).map(_.size).sum
    assert(totalRow.getAs[Long]("n_exact_dup_images") == dupImages.toLong)
    assert(totalRow.getAs[Long]("n_candidate_pairs") == cand.size.toLong)
    assert(totalRow.getAs[Long]("n_near_dup_pairs") == hammings.count(_ <= 6).toLong)
    val hist = hammings.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val histRows = rows.filter(_.getAs[Long]("hamming") >= 0)
    assert(histRows.map(r => r.getAs[Long]("hamming") -> r.getAs[Long]("n_pairs")).toMap ==
      hist.map { case (k, v) => k.toLong -> v })
  }
}
