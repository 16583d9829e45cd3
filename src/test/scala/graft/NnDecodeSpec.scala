package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.WmConst
import graft.operators.PcaSolve

/** NN-decoder inference witness (wm_nn_decode, §2 row 21r): the full
  * 64→16→24 ReLU forward pass re-derived in the JVM from the raw
  * parquet with the same PRF-pinned literal weights and the same IEEE
  * step order — every bit-position census row must match exactly. */
class NnDecodeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def rr(x: Double, dec: Int) = PcaSolve.roundAway(x, dec)

  test("wm_nn_decode: exact JVM mirror of the MLP forward pass census") {
    val vecs = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet")
      .selectExpr("cast(embedding as array<double>) as v").collect()
      .map(_.getSeq[Double](0).toArray)
    val n = vecs.length
    // per row: h_j = relu(b1_j + Σ_k v_k·w1_jk), logit_m = b2_m + Σ_j h_j·w2_mj
    val q = vecs.map { v =>
      val h = Array.tabulate(16) { j0 =>
        var s = WmConst.nnWeight("nb1", j0 + 1, 0)
        var k = 0
        while (k < 64) { s += v(k) * WmConst.nnWeight("nw1", j0 + 1, k + 1); k += 1 }
        math.max(s, 0.0)
      }
      Array.tabulate(24) { m0 =>
        var s = WmConst.nnWeight("nb2", m0 + 1, 0)
        var j = 0
        while (j < 16) { s += h(j) * WmConst.nnWeight("nw2", m0 + 1, j + 1); j += 1 }
        rr(s * 1000000, 0).toLong // the per-row 1e-6 logit quantization
      }
    }
    val got = SparkEntry.queries("wm_nn_decode")(spark, TestSpark.Sf).collect()
      .map(r => r.getAs[Long]("bit_pos") -> r).toMap
    assert(got.size == 24)
    (1 to 24).foreach { m =>
      val ones = q.count(_(m - 1) > 0).toLong
      val sum = q.map(_(m - 1)).sum
      val r = got(m.toLong)
      assert(r.getAs[Long]("n_ones") == ones, s"bit $m ones")
      assert(r.getAs[Double]("ones_rate") == rr(ones.toDouble / n, 4), s"bit $m rate")
      assert(r.getAs[Double]("mean_logit") == rr(sum.toDouble / n / 1000000, 6),
        s"bit $m mean logit")
    }
    // the untrained PRF net must still be a REAL function of its input:
    // positions differ in their ones rates (a constant net would not)
    val rates = (1 to 24).map(m => got(m.toLong).getAs[Double]("ones_rate"))
    assert(rates.distinct.size > 4, "bit heads must respond differently to the corpus")
  }
}
