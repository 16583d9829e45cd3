package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Prf, WmConst, WmDecode, WmEmbed}
import graft.sqlgen.{Wm, WmParams}

/** Semantic gates for the round-7 thirty-second batch: multi-tenant
  * watermarking (tenant B's tranche, embed, and BOTH extractions
  * re-derived through the JVM embed/decode library; structural
  * disjointness pinned) and watermark repair (attack, damage census,
  * re-embed, and post-extraction all mirrored; repaired carriers are
  * proven to decode clean and repair can only remove errors). */
class R8fOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)

  // JVM twin of the SQL Irwin–Hall gaussian (Dialect.prfGauss)
  private def gauss(parts: Any*): Double = {
    def chunks(h: Long) = (0 until 5).map(i => ((h >> (12 * i)) & 4095L).toDouble)
    val h1 = Prf.prf(("ih1" +: parts): _*)
    val h2 = Prf.prf(("ih2" +: parts): _*)
    val s = (chunks(h1) ++ chunks(h2)).sum + 5.0
    (s / 4096.0 - 5.0) * 1.0954451150103321
  }

  private def stegoVectors(): Map[Long, Array[Double]] =
    SparkEntry.queries("wm_embed")(spark, TestSpark.Sf).collect()
      .groupBy(_.getAs[Long]("vec_id")).map { case (id, rows) =>
        val v = new Array[Double](64)
        rows.foreach(r => v(r.getAs[Long]("pos").toInt - 1) = r.getAs[Double]("stego_val"))
        id -> v
      }

  private def votesOf(decoded: Iterable[Option[(Int, Array[Int])]])
  : (Map[(Int, Int), Int], Map[Int, Int]) = {
    val votes = scala.collection.mutable.Map[(Int, Int), Int]().withDefaultValue(0)
    val nValid = scala.collection.mutable.Map[Int, Int]().withDefaultValue(0)
    decoded.foreach(_.foreach { case (blk, pb) =>
      nValid(blk) += 1
      pb.zipWithIndex.foreach { case (b, i) => votes((blk, i)) += 2 * b - 1 }
    })
    (votes.toMap.withDefaultValue(0), nValid.toMap.withDefaultValue(0))
  }

  private def errorsPerBlk(votes: Map[(Int, Int), Int], nValid: Map[Int, Int],
                           msg: Array[Array[Int]]): Map[Int, Long] =
    (0 until 16).map { blk =>
      blk -> (0 until 16).count { i =>
        val vt = votes((blk, i))
        nValid(blk) == 0 || (if (vt > 0) 1 else 0) != msg(blk)(8 + i)
      }.toLong
    }.toMap

  test("wm_multi_tenant: tranche, second embed, and both extractions match the JVM mirror; carriers disjoint") {
    val p2 = WmParams(message = "TENANT-B-MSG-002", key = "tenant-b-key")
    Tables.register(spark, TestSpark.Sf)
    val indeg = SparkEntry.queries("wm_in_degree")(spark, TestSpark.Sf).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("in_degree")).toMap
    val nvec = indeg.size.toLong
    val target = math.max(math.floor(nvec * 0.1).toLong, 16L)
    val pool = math.min(target + math.floor(target * 0.5).toLong, nvec)
    // degree rank (in_degree, vec_id) → candidate pool → ES score rank
    val poolIds = indeg.toSeq.sortBy { case (id, dg) => (dg, id) }.take(pool.toInt)
    def score(id: Long, dg: Long): Double = {
      val u = (Prf.prf("sel", Wm.Key, id) + 1).toDouble / 1152921504606846976.0
      val w = if (dg == 0) 0.9 else if (dg == 1) 0.7 else if (dg == 2) 0.5
              else if (dg == 3) 0.4 else 0.3
      -math.log(u) / w
    }
    val ranked = poolIds.map { case (id, dg) => (id, score(id, dg)) }
      .sortBy { case (id, s) => (s, id) }
    val aSet = ranked.take(target.toInt).zipWithIndex
      .map { case ((id, _), i) => id -> (i % 16) }.toMap
    val bSet = ranked.slice(target.toInt, pool.toInt).zipWithIndex
      .map { case ((id, _), i) => id -> (i % 16) }.toMap
    // the first tranche must BE the served carrier set (prefix property)
    val served = SparkEntry.queries("wm_carriers")(spark, TestSpark.Sf).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("blk").toInt).toMap
    assert(aSet == served, "rank prefix must reproduce the served carriers")
    assert(aSet.keySet.intersect(bSet.keySet).isEmpty, "tranches must be disjoint")
    // tenant B embeds its own lattice from the ORIGINAL values
    val clean = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray).toMap
    val aStego = stegoVectors()
    val combined = aStego ++ bSet.map { case (id, blk) =>
      id -> WmEmbed.embed(clean(id), blk, p2)
    }
    val (vA, nA) = votesOf(combined.values.map(WmDecode.decode(_)))
    val (vB, nB) = votesOf(combined.values.map(WmDecode.decode(_, p2.key)))
    val errA = errorsPerBlk(vA, nA, WmConst.msgBits(WmParams.Default.cipherB64))
    val errB = errorsPerBlk(vB, nB, WmConst.msgBits(p2.cipherB64))
    val rows = run("wm_multi_tenant").collect()
    assert(rows.length == 16)
    rows.foreach { r =>
      val blk = r.getAs[Long]("blk").toInt
      assert(r.getAs[Long]("errors_tenant_a") == errA(blk), s"blk $blk a")
      assert(r.getAs[Long]("errors_tenant_b") == errB(blk), s"blk $blk b")
      assert(r.getAs[Long]("n_valid_a") == nA(blk).toLong, s"blk $blk nA")
      assert(r.getAs[Long]("n_valid_b") == nB(blk).toLong, s"blk $blk nB")
    }
  }

  test("wm_repair: damage census, re-embed, and post extraction match the JVM mirror; repair only removes errors") {
    Tables.register(spark, TestSpark.Sf)
    val carriers = SparkEntry.queries("wm_carriers")(spark, TestSpark.Sf).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("blk").toInt).toMap
    val att = stegoVectors().map { case (id, v) =>
      id -> v.zipWithIndex.map { case (x, i) => x + 0.04 * gauss("rep", id, i + 1) }
    }
    val preDec = att.map { case (id, v) => id -> WmDecode.decode(v) }
    val (vPre, nPre) = votesOf(preDec.values)
    val dmg = carriers.filter { case (id, _) => preDec(id).isEmpty }
    val fixed = att.map { case (id, v) =>
      id -> (if (dmg.contains(id)) WmEmbed.embed(v, dmg(id)) else v)
    }
    val postDec = fixed.map { case (id, v) => id -> WmDecode.decode(v) }
    val (vPost, nPost) = votesOf(postDec.values)
    val msg = WmConst.msgBits(WmParams.Default.cipherB64)
    val (errPre, errPost) = (errorsPerBlk(vPre, nPre, msg), errorsPerBlk(vPost, nPost, msg))
    // every repaired carrier decodes clean to its registry block
    dmg.foreach { case (id, blk) =>
      val dec = postDec(id)
      assert(dec.isDefined && dec.get._1 == blk, s"repaired $id must decode to blk $blk")
      assert(dec.get._2.sameElements(msg(blk).slice(8, 24)), s"repaired $id payload")
    }
    val rows = run("wm_repair").collect()
    assert(rows.length == 16)
    rows.foreach { r =>
      val blk = r.getAs[Long]("blk").toInt
      assert(r.getAs[Long]("pre_errors") == errPre(blk), s"blk $blk pre")
      assert(r.getAs[Long]("post_errors") == errPost(blk), s"blk $blk post")
      assert(r.getAs[Long]("pre_valid") == nPre(blk).toLong, s"blk $blk preN")
      assert(r.getAs[Long]("post_valid") == nPost(blk).toLong, s"blk $blk postN")
      assert(r.getAs[Long]("n_repaired") == dmg.size.toLong)
      // repair adds only correct votes: errors cannot increase
      assert(r.getAs[Long]("post_errors") <= r.getAs[Long]("pre_errors"), s"blk $blk monotone")
    }
  }
}
