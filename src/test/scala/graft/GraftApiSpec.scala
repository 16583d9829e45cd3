package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.api.Graft
import graft.sqlgen.{Wm, WmParams}

/** The user-facing facade: the reference's end-to-end story
  * (embed → blind extract → decrypt) through the public API. */
class GraftApiSpec extends AnyFunSuite {
  private lazy val g = Graft(TestSpark.spark, TestSpark.Sf)

  test("recoverMessage round-trips the watermark blind") {
    assert(g.recoverMessage() == Wm.Message)
  }

  test("recoverMessage with the wrong key fails the auth tag") {
    intercept[javax.crypto.AEADBadTagException] {
      g.recoverMessage(key = "not-the-key")
    }
  }

  test("a custom (message, key, rate, delta) embeds and blind-recovers") {
    // the reference's embed_watermark(message, embed_rate,
    // encryption_key) surface: nothing about the pipeline is
    // compile-time — a different payload under a different key at a
    // different rate must round-trip blind through the same engine
    val p = WmParams(message = "sixteen byte msg", key = "another-key-42",
      rate = 0.15, delta = 0.2)
    val g2 = new Graft(TestSpark.spark, TestSpark.Sf, p)
    assert(g2.recoverMessage() == "sixteen byte msg")
    // and the default-key engine state is untouched
    assert(g.recoverMessage() == Wm.Message)
  }

  test("custom-key carriers differ from default-key carriers") {
    val p = WmParams(key = "another-key-42")
    val g2 = new Graft(TestSpark.spark, TestSpark.Sf, p)
    val c1 = g.carriers.collect().map(_.getLong(0)).toSet
    val c2 = g2.carriers.collect().map(_.getLong(0)).toSet
    assert(c1 != c2, "key seeds carrier selection")
  }

  test("topK returns k ranked neighbors per query vector") {
    val rows = g.topK.collect()
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.nonEmpty)
    byQ.foreach { case (_, rs) =>
      assert(rs.length == 10)
      assert(rs.map(_.getAs[Long]("rn")).sorted.toSeq == (1L to 10L))
      // ranked by descending similarity
      val sims = rs.sortBy(_.getAs[Long]("rn")).map(_.getAs[Double]("sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("watermarkedTable has one row per vector") {
    assert(g.watermarkedTable.count() == g.table("embeddings").count())
  }

  test("catalog lists tables with dimensions") {
    val rows = g.catalog.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(rows("embeddings") == 64)
  }
}
