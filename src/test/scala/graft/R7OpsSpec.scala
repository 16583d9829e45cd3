package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic gates for the round-7 batch. */
class R7OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)

  test("wm_vote_margin: per-block margins and weakest-bit argmin match the JVM decode mirror") {
    import graft.functions.WmDecode
    // the clean extraction votes, re-derived through the JVM decode
    // mirror over the oracle-checked embed output (the same mirror the
    // BER-curve spec pins against the SQL chain)
    val steg = SparkEntry.queries("wm_embed")(spark, TestSpark.Sf).collect()
      .groupBy(_.getAs[Long]("vec_id")).map { case (id, rows) =>
        val v = new Array[Double](64)
        rows.foreach(r => v(r.getAs[Long]("pos").toInt - 1) = r.getAs[Double]("stego_val"))
        id -> v
      }
    val votes = scala.collection.mutable.Map[(Int, Int), (Int, Int)]().withDefaultValue((0, 0))
    steg.foreach { case (_, v) =>
      WmDecode.decode(v).foreach { case (blk, pb) =>
        pb.zipWithIndex.foreach { case (b, i) =>
          val (vt, n) = votes((blk, i)); votes((blk, i)) = (vt + 2 * b - 1, n + 1)
        }
      }
    }
    def q(x: Double, dec: Int): Double = {
      val m = math.pow(10, dec)
      math.floor(x * m + 0.5) / m // margins are non-negative
    }
    // per-block mirror of the key's aggregation: margin = |vote|/n
    // quantized 6dp BEFORE the exact decimal mean (the house rule)
    val expect = votes.toSeq.groupBy(_._1._1).map { case (blk, bits) =>
      val margins = bits.map { case ((_, bit), (vt, n)) =>
        bit -> q(math.abs(vt).toDouble / n, 6)
      }.sortBy(_._1)
      val minM = margins.map(_._2).min
      val meanM = q(margins.map(_._2).sum / margins.length, 4)
      val weakest = margins.minBy { case (bit, m) => (m, bit) }._1
      blk.toLong -> (margins.length.toLong, bits.map(_._2._2).max.toLong,
        minM, meanM, weakest.toLong)
    }
    val got = run("wm_vote_margin").collect()
    assert(got.length == expect.size && got.nonEmpty)
    got.foreach { r =>
      val (nBits, nCar, minM, meanM, weakest) = expect(r.getAs[Long]("blk"))
      assert(r.getAs[Long]("n_bits") == nBits)
      assert(r.getAs[Long]("n_carriers") == nCar)
      assert(math.abs(r.getAs[Double]("min_margin") - minM) < 1e-6)
      assert(math.abs(r.getAs[Double]("mean_margin") - meanM) < 1e-4)
      assert(r.getAs[Long]("weakest_bit") == weakest)
      // a margin is a majority share: (0, 1], and the min bounds the mean
      assert(r.getAs[Double]("min_margin") > 0.0 &&
        r.getAs[Double]("min_margin") <= 1.0)
      assert(r.getAs[Double]("min_margin") <= r.getAs[Double]("mean_margin") + 1e-9)
      assert(weakest >= 0 && weakest < 16)
    }
  }

  test("wm_key_mismatch: both legs match the JVM decode mirror; the asymmetry is the security property") {
    import graft.functions.{WmConst, WmDecode}
    val steg = SparkEntry.queries("wm_embed")(spark, TestSpark.Sf).collect()
      .groupBy(_.getAs[Long]("vec_id")).map { case (id, rows) =>
        val v = new Array[Double](64)
        rows.foreach(r => v(r.getAs[Long]("pos").toInt - 1) = r.getAs[Double]("stego_val"))
        id -> v
      }
    val msg = WmConst.msgBits(graft.sqlgen.WmParams.Default.cipherB64)
    def leg(key: String): (Long, Long, Long) = {
      val decs = steg.values.flatMap(v => WmDecode.decode(v, key = key)).toSeq
      val votes = scala.collection.mutable.Map[(Int, Int), Int]().withDefaultValue(0)
      decs.foreach { case (blk, pb) =>
        pb.zipWithIndex.foreach { case (b, i) => votes((blk, i)) += 2 * b - 1 }
      }
      val errs = (0 until 16).flatMap(blk => (0 until 16).map { i =>
        val vt = votes.get((blk, i))
        if (vt.isEmpty || (if (vt.get > 0) 1 else 0) != msg(blk)(8 + i)) 1L else 0L
      }).sum
      (decs.size.toLong, decs.map(_._1).distinct.size.toLong, errs)
    }
    val expect = Map("genuine" -> leg(graft.sqlgen.Wm.Key),
      "wrong_key" -> leg("not-the-key"))
    val got = run("wm_key_mismatch").collect()
      .map(r => r.getAs[String]("leg") -> (r.getAs[Long]("n_valid_vectors"),
        r.getAs[Long]("n_blocks_recovered"), r.getAs[Long]("bit_errors"))).toMap
    assert(got == expect)
    // the property under test: with the key, everything; without, noise
    assert(got("genuine")._2 == 16L && got("genuine")._3 == 0L)
    assert(got("wrong_key")._1 < got("genuine")._1 / 10,
      "the CRC gate must reject almost every wrong-key decode")
    assert(got("wrong_key")._3 > 200L,
      "whatever chance-decodes must not reconstruct the message")
  }

  test("knn_edges_salted: every bucket's salted pair set equals the plain self-join's") {
    val rows = run("knn_edges_salted").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("sets_equal") == 1L,
        s"bucket (${r.getAs[Long]("t")}, ${r.getAs[Long]("bucket")})")
      assert(r.getAs[Long]("n_plain") == r.getAs[Long]("n_salted"))
      assert(r.getAs[Long]("n_plain") == r.getAs[Long]("n_matched"))
    }
    // the witness is not vacuous: some bucket actually has pairs
    assert(rows.map(_.getAs[Long]("n_plain")).sum > 0)
  }
}
