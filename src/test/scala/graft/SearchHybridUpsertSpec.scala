package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Prf

/** CDC-upsert maintenance of the hybrid score stack
  * (search_hybrid_upsert, §2 row 21m3): the maintained per-doc stats
  * table (keep untouched rows ∪ re-tokenize only the 5% delta) must
  * EQUAL a full rebuild on the post-state corpus — proved here by a
  * brute-force JVM rebuild — and the global BM25 stats, scores, ranks
  * and fused top-10 the key serves from the maintained stats must
  * match the same quantities recomputed from raw post-state text. */
class SearchHybridUpsertSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val Terms = Seq("dup", "spark", "hash")
  private val FhDim = 16

  private case class St(dl: Long, tf: Array[Long], nrm2: Long, qdot: Long)

  private lazy val qVec: Array[Long] = {
    val q = new Array[Long](FhDim)
    Terms.foreach { t =>
      val ix = (Prf.prf("fh", t) % FhDim).toInt
      q(ix) += (if (Prf.prf("fhs", t) % 2 == 0) 1 else -1)
    }
    q
  }

  /** Mirrors the SQL chain: split keeps EMPTY tokens (limit -1 — the
    * wx convention), dl counts every token, fh signs via the shared
    * PRF. All-integer outputs. */
  private def stats(text: String): St = {
    val toks = text.toLowerCase.split("\\s+", -1)
    val tf = Terms.map(t => toks.count(_ == t).toLong).toArray
    val dv = new Array[Long](FhDim)
    toks.foreach { w =>
      val ix = (Prf.prf("fh", w) % FhDim).toInt
      dv(ix) += (if (Prf.prf("fhs", w) % 2 == 0) 1 else -1)
    }
    St(toks.length.toLong, tf, dv.map(v => v * v).sum,
      dv.zip(qVec).map { case (a, b) => a * b }.sum)
  }

  private def ra6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("search_hybrid_upsert: maintained stats = rebuild; censuses and fused top-10 match a brute JVM rebuild") {
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val deleted = docs.keySet.filter(_ % 20 == 3)
    val updated = docs.keySet.filter(_ % 20 == 7)

    val baseSt = docs.map { case (id, t) => id -> stats(t) }
    // the maintained path: keep untouched rows, recompute only delta
    val keep  = baseSt.filter { case (id, _) => !deleted(id) && !updated(id) }
    val delta = updated.map(id => id -> stats(docs(id) + " updated cdc")).toMap
    val maintained = keep ++ delta
    // full rebuild on the post corpus
    val rebuild = docs.collect {
      case (id, t) if !deleted(id) && !updated(id) => id -> stats(t)
      case (id, t) if updated(id) => id -> stats(t + " updated cdc")
    }
    assert(maintained.keySet == rebuild.keySet)
    maintained.foreach { case (id, s) =>
      val r = rebuild(id)
      assert(s.dl == r.dl && s.tf.sameElements(r.tf) &&
        s.nrm2 == r.nrm2 && s.qdot == r.qdot, s"doc $id stats")
    }

    // global BM25 stats fold from the maintained table
    val n = maintained.size.toLong
    val sdl = maintained.values.map(_.dl).sum
    val df = (0 until 3).map(i => maintained.values.count(_.tf(i) > 0).toLong)

    // scores (identical IEEE step order to the SQL rendering)
    val qn = math.sqrt(qVec.map(v => v.toDouble * v).sum)
    val scs = maintained.toSeq.collect { case (id, s) if s.tf.sum > 0 =>
      val bm25 = (0 until 3).map { i =>
        val idf = math.log(1.0 + (2 * n - 2 * df(i) + 1).toDouble / (2 * df(i) + 1).toDouble)
        idf * (s.tf(i) * 2.2) / (s.tf(i) + 0.3 + 0.9 * s.dl / (sdl.toDouble / n))
      }.sum
      (id, ra6(bm25), ra6(s.qdot / (math.sqrt(s.nrm2.toDouble) * qn)))
    }
    val rl = scs.sortBy { case (id, b, _) => (-b, id) }.zipWithIndex
      .map { case ((id, _, _), i) => id -> (i + 1L) }.toMap
    val rs = scs.sortBy { case (id, _, c) => (-c, id) }.zipWithIndex
      .map { case ((id, _, _), i) => id -> (i + 1L) }.toMap
    val fused = scs.map { case (id, _, _) =>
      (id, 1.0 / (60 + rl(id)) + 1.0 / (60 + rs(id)))
    }.sortBy { case (id, f) => (-f, id) }.take(10)

    def ck(ids: Iterable[Long]) = ids.sum
    def ckStats(m: Map[Long, St]) = m.map { case (id, s) =>
      id * 1048573L + s.dl * 31 + s.tf(0) * 7 + s.tf(1) * 11 + s.tf(2) * 13 +
        s.nrm2 * 3 + s.qdot
    }.sum

    val got = SparkEntry.queries("search_hybrid_upsert")(spark, TestSpark.Sf)
      .collect()
      .map(r => (r.getAs[String]("metric"), r.getAs[Long]("k")) ->
        (r.getAs[Long]("n"), r.getAs[Long]("checksum"))).toMap
    assert(got(("deleted_docs", -1L)) == ((deleted.size.toLong, ck(deleted))))
    assert(got(("updated_docs", -1L)) == ((updated.size.toLong, ck(updated))))
    assert(got(("stale_stats", -1L)) == (((deleted ++ updated).size.toLong, ck(deleted ++ updated))))
    assert(got(("delta_stats", -1L)) == ((delta.size.toLong, ckStats(delta))))
    assert(got(("final_stats", -1L)) == ((maintained.size.toLong, ckStats(maintained))))
    fused.zipWithIndex.foreach { case ((id, _), i) =>
      val rk = i + 1L
      assert(got.get(("top10", rk)).map(_._1).contains(id), s"top10 rank $rk doc")
      assert(got(("top10", rk))._2 == rl(id) * 1048576L + rs(id), s"top10 rank $rk leg ranks")
    }
  }
}
