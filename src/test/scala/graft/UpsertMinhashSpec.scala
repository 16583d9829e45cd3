package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Prf, WmConst}

/** CDC-upsert maintenance of the MINHASH index (dedup_upsert_minhash,
  * §2 row 23g2): the maintained banded pair table must EQUAL a full
  * rebuild on the post-state corpus — proved against a brute-force JVM
  * rebuild (a pair's band collisions are a pure function of its two
  * signatures, so kept pairs stay correct and the delta join re-derives
  * every pair with a changed endpoint). */
class UpsertMinhashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val P = WmConst.MinhashP

  // Mirrors the SQL chain's token convention: split keeps EMPTY
  // tokens (Spark split uses limit -1 — leading/trailing empties of
  // whitespace-padded text survive and flow into shingles).
  private def minhash(text: String): Array[Long] = {
    val toks = text.toLowerCase.split("\\s+", -1)
    val shingles = toks.sliding(3).filter(_.length == 3)
      .map(_.mkString(" ")).toSet
    val hs = shingles.toArray.map(sh => Prf.prf(sh) % P)
    Array.tabulate(16) { r =>
      val (a, b) = WmConst.minhashCoef(r)
      hs.map(h => (a * h + b) % P).min
    }
  }

  private def matches(a: Array[Long], b: Array[Long]): Int =
    (0 until 16).count(r => a(r) == b(r))

  private def shareBand(a: Array[Long], b: Array[Long]): Boolean =
    (0 until 8).exists(k => a(2 * k) == b(2 * k) && a(2 * k + 1) == b(2 * k + 1))

  test("dedup_upsert_minhash: maintained pair table equals a brute-force rebuild") {
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val deleted = docs.keySet.filter(_ % 20 == 3)
    val updated = docs.keySet.filter(_ % 20 == 7)
    val baseSig = docs.map { case (id, t) => id -> minhash(t) }
    val postSig = docs.collect {
      case (id, _) if !deleted(id) && !updated(id) => id -> baseSig(id)
      case (id, t) if updated(id) => id -> minhash(t + " updated cdc")
    }
    def pairs(sigs: Map[Long, Array[Long]]): Map[(Long, Long), Int] = {
      val ids = sigs.keys.toArray.sorted
      (for {
        i <- ids.indices.iterator
        j <- (i + 1) until ids.length
        if shareBand(sigs(ids(i)), sigs(ids(j)))
        mm = matches(sigs(ids(i)), sigs(ids(j)))
        if mm >= 2
      } yield (ids(i), ids(j)) -> mm).toMap
    }
    val basePairs = pairs(baseSig)
    val rebuilt = pairs(postSig)
    val touched = deleted ++ updated
    val stale = basePairs.keySet.filter { case (a, b) => touched(a) || touched(b) }
    val keep = basePairs.filter { case ((a, b), _) => !touched(a) && !touched(b) }
    val delta = rebuilt.filter { case ((a, b), _) => updated(a) || updated(b) }
    // the maintenance identity: keep ∪ delta = rebuild (disjointly)
    assert(keep.keySet.intersect(delta.keySet).isEmpty)
    assert(keep ++ delta == rebuilt, "maintained set must equal the rebuild")
    assert(basePairs.nonEmpty, "the base corpus must have banded pairs at this SF")

    def ck(ps: Iterable[(Long, Long)]): Long =
      ps.map { case (a, b) => a * 1048573L + b }.sum
    val got = SparkEntry.queries("dedup_upsert_minhash")(spark, TestSpark.Sf).collect()
      .map(r => (r.getAs[String]("metric"), r.getAs[Long]("k")) ->
        (r.getAs[Long]("n"), r.getAs[Long]("checksum"))).toMap
    assert(got(("deleted_docs", -1L)) == ((deleted.size.toLong, deleted.sum)))
    assert(got(("updated_docs", -1L)) == ((updated.size.toLong, updated.sum)))
    assert(got(("stale_pairs", -1L)) == ((stale.size.toLong, ck(stale))))
    assert(got(("delta_pairs", -1L)) == ((delta.size.toLong, ck(delta.keys))))
    (2 to 16).foreach { mm =>
      val ps = rebuilt.filter(_._2 == mm).keys
      val want = if (ps.isEmpty) None else Some((ps.size.toLong, ck(ps)))
      assert(got.get(("final_pairs", mm.toLong)) == want, s"match count $mm census")
    }
  }

  test("minhash JVM twin matches the SQL signature chain for whitespace-padded text (r11 ADVICE)") {
    import spark.implicits._
    val texts = Seq(
      1L -> "  leading pad tokens here",
      2L -> "trailing pad tokens here   ",
      3L -> "   both  sides   padded text here  ",
      4L -> "no padding four tokens",
      5L -> " x y ")
    texts.toDF("doc_id", "text").createOrReplaceTempView("pad_docs")
    // the rendered build SQL verbatim, with the documents table
    // shadowed by a CTE over the padded fixture
    val sql = new graft.sqlgen.Gen(graft.sqlgen.SparkDialect).minhashSigBuildSql
      .replaceFirst("(?s)^with ", "with documents as (select doc_id, text from pad_docs), ")
    val got = spark.sql(sql).collect()
      .map(r => r.getLong(0) -> (1 to 16).map(r.getLong).toSeq).toMap
    for ((id, t) <- texts)
      assert(got.get(id) == graft.functions.MinHash.sig(t).map(_.toSeq),
        s"doc $id: JVM twin vs SQL chain on padded text")
    assert(got.contains(1L) && got.contains(3L), "padded docs must produce signatures")
  }
}
