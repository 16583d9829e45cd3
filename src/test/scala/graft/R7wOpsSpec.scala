package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic gate for the collusion (averaging) attack: the second
  * embed, the per-cell average, and the original-key extraction are
  * all re-derived through the JVM embed/decode library (the
  * wm_overwrite mirror convention), and the block-level CRC-failure
  * law the measured report shows is pinned. */
class R7wOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)

  test("wm_collusion: averaged copies + original-key extraction match the JVM embed/decode mirror") {
    import graft.functions.{WmConst, WmDecode, WmEmbed}
    import graft.sqlgen.WmParams
    val p2 = WmParams(message = "COLLUDER-MARK-03", key = "colluder-key")
    val carriers = SparkEntry.queries("wm_carriers")(spark, TestSpark.Sf).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("blk").toInt).toMap
    val steg = SparkEntry.queries("wm_embed")(spark, TestSpark.Sf).collect()
      .groupBy(_.getAs[Long]("vec_id")).map { case (id, rows) =>
        val v = new Array[Double](64)
        rows.foreach(r => v(r.getAs[Long]("pos").toInt - 1) = r.getAs[Double]("stego_val"))
        id -> v
      }
    val clean = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray).toMap
    // the colluder's independent embed from the CLEAN copy, then the
    // per-cell average of the two marked copies
    val colluded = steg.map { case (id, v1) =>
      val v2 = WmEmbed.embed(clean(id), carriers(id), p2)
      id -> v1.zip(v2).map { case (a, b) => (a + b) / 2 }
    }
    val msg = WmConst.msgBits(WmParams.Default.cipherB64)
    val msg2 = WmConst.msgBits(p2.cipherB64)
    val votes = scala.collection.mutable.Map[(Int, Int), Int]().withDefaultValue(0)
    var nValid = 0
    val validBlks = scala.collection.mutable.Set.empty[Int]
    colluded.values.foreach(v => WmDecode.decode(v).foreach { case (blk, pb) =>
      nValid += 1; validBlks += blk
      pb.zipWithIndex.foreach { case (b, i) => votes((blk, i)) += 2 * b - 1 }
    })
    val exp = (0 until 16).map { blk =>
      blk -> (0 until 16).map { i =>
        val err = {
          val vt = votes.get((blk, i))
          if (vt.isEmpty || (if (vt.get > 0) 1 else 0) != msg(blk)(8 + i)) 1 else 0
        }
        (msg(blk)(8 + i) == msg2(blk)(8 + i), err)
      }
    }.toMap
    val rows = run("wm_collusion").collect()
    assert(rows.length == 16)
    rows.foreach { r =>
      val blk = r.getAs[Long]("blk").toInt
      val bits = exp(blk)
      assert(r.getAs[Long]("n_agree_bits") == bits.count(_._1).toLong, s"blk $blk agree")
      assert(r.getAs[Long]("errors_colluded") == bits.map(_._2).sum.toLong, s"blk $blk errs")
      assert(r.getAs[Long]("errors_on_agree") == bits.filter(_._1).map(_._2).sum.toLong, s"blk $blk")
      assert(r.getAs[Long]("errors_on_disagree") == bits.filterNot(_._1).map(_._2).sum.toLong, s"blk $blk")
      // the CRC-failure law: a block with no surviving valid carrier
      // errors on every bit
      if (!validBlks.contains(blk))
        assert(r.getAs[Long]("errors_colluded") == 16L, s"blk $blk should be fully dark")
    }
    // collusion is genuinely destructive here (unlike the single-copy
    // noise cells): a large share of the payload is corrupted
    assert(rows.map(_.getAs[Long]("errors_colluded")).sum > 64L)
  }
}
