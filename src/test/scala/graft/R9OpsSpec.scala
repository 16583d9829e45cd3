package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Crypto
import graft.sqlgen.Wm

/** Round-9 operator contracts:
  *
  *  - `wm_recover_registry` (row 11's SQL half made hash-gated): the
  *    registry-path recover reassembles the exact ciphertext
  *    characters under the standard attack, and the AES-GCM decrypt of
  *    its reassembled string — the ONLY stage left outside the oracle
  *    gate — returns the original plaintext;
  *  - the scratch-backed `wm_repair` (damage snapshot materialized
  *    once) stays row-identical to the inline rendering it replaced.
  */
class R9OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)

  test("wm_recover_registry: 32 fully-voted characters, every one matches the embedded ciphertext") {
    val rows = run("wm_recover_registry").collect()
    assert(rows.length == Wm.Blocks * 2)
    assert(rows.forall(_.getAs[Long]("n_bits_voted") == 8L),
      "every character reassembles from all 8 voted bits")
    assert(rows.map(_.getAs[Long]("is_match")).sum == Wm.Blocks * 2,
      "registry recovery is error-free under the standard attack")
    rows.foreach { r =>
      assert(r.getAs[Long]("recovered_code") == r.getAs[Long]("expected_code"))
    }
  }

  test("wm_recover_registry feeds the AES-GCM decrypt: recovered string decrypts to the plaintext") {
    val rows = run("wm_recover_registry").collect()
      .sortBy(r => (r.getAs[Long]("blk"), r.getAs[Long]("char_pos")))
    val recovered = rows.map(_.getAs[Long]("recovered_code").toChar).mkString
    assert(recovered == Wm.CipherB64)
    assert(Crypto.decryptFromBase64(recovered, Wm.Key) == Wm.Message)
  }

  test("wm_repair: scratch-backed damage snapshot is row-identical to the inline rendering") {
    Tables.register(spark, TestSpark.Sf)
    WmCache.ensure(spark, TestSpark.Sf)
    val served = run("wm_repair").collect()
      .map(r => r.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
    // the inline Spark rendering (att CTE re-derived per reference —
    // the form the key shipped with through r8)
    val inline = spark.sql(new graft.sqlgen.Gen(graft.sqlgen.SparkDialect,
        useViews = true).wmRepairSql(None)).collect()
      .map(r => r.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
    assert(served.length == Wm.Blocks)
    assert(served.toSeq == inline.toSeq)
  }

  test("wm_repair still repairs: post errors zero, pre errors nonzero at the cliff sigma") {
    val rows = run("wm_repair").collect()
    val pre = rows.map(_.getAs[Long]("pre_errors")).sum
    val post = rows.map(_.getAs[Long]("post_errors")).sum
    assert(rows.map(_.getAs[Long]("n_repaired")).head >= 0L)
    assert(post <= pre, s"repair must not increase errors (pre=$pre post=$post)")
    assert(post == 0L, s"repaired extraction is clean (post=$post)")
  }
}
