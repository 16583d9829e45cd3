package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Crypto
import graft.sqlgen.Wm

/** Operator #11: the full blind-recovery chain — embed into the vector
  * table, extract 256 bits, reassemble the base64 ciphertext, AES-GCM
  * decrypt — must return the original plaintext (reference:
  * pg_func.py:400-436 extract_watermark + decrypt_message). */
class WatermarkEndToEndSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("extracted bits decrypt back to the original message") {
    val rows = SparkEntry.queries("wm_extract")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rows.size == Wm.Blocks * 16, "all 16 blocks x 16 bits recovered")
    val chars = for (blk <- 0 until Wm.Blocks; ci <- 0 until 2) yield {
      val c = (0 until 8).map(b => rows((blk.toLong, (ci * 8 + b).toLong)) << (7 - b)).sum
      c.toChar
    }
    val recovered = chars.mkString
    assert(recovered == Wm.CipherB64, "reassembled ciphertext matches")
    assert(Crypto.decryptFromBase64(recovered, Wm.Key) == Wm.Message)
  }

  test("extraction survives the gaussian attack (BER = 0)") {
    val ber = SparkEntry.queries("wm_ber")(spark, TestSpark.Sf).collect()
    assert(ber.length == Wm.Blocks)
    val errors = ber.map(_.getAs[Long]("errors")).sum
    assert(errors == 0, s"expected 0 bit errors under attack, got $errors")
  }

  test("embedding preserves vector norms") {
    // stego vectors keep their pre-embed L2 norm (norm-restore step)
    Tables.register(spark, TestSpark.Sf)
    val df = SparkEntry.queries("wm_embed")(spark, TestSpark.Sf)
    df.createOrReplaceTempView("stego_out")
    val drift = spark.sql(
      """select max(abs(s.nrm - o.nrm)) from
        |  (select vec_id, sqrt(sum(stego_val * stego_val)) as nrm
        |   from stego_out group by vec_id) s
        |join
        |  (select vec_id, sqrt(aggregate(zip_with(cast(embedding as array<double>),
        |     cast(embedding as array<double>), (x, y) -> x * y),
        |     cast(0 as double), (a, v) -> a + v)) as nrm
        |   from embeddings) o
        |on s.vec_id = o.vec_id""".stripMargin).head().getDouble(0)
    assert(drift < 1e-4, s"norm drift $drift (round-6 output tolerance)")
  }

  test("unwatermarked table yields no coherent watermark (negative control)") {
    val r = SparkEntry.queries("wm_extract_null")(spark, TestSpark.Sf).head()
    val crcPass = r.getAs[Long]("n_crc_pass")
    val n = r.getAs[Long]("n_vectors")
    // CRC-4 passes by chance for ~1/16 of random vectors
    assert(crcPass < n / 4, s"false-positive rate too high: $crcPass of $n")
  }

  test("as-of join output is consistent") {
    val rows = SparkEntry.queries("events_asof")(spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("gap_s") >= 0, "purchase at or before click")
      assert(r.getAs[Long]("purchase_sec") <= r.getAs[Long]("click_sec"))
    }
  }
}
