package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Prf

/** CDC-upsert dedup maintenance (dedup_upsert): the maintained pair
  * table must EQUAL a full rebuild on the post-state corpus — proved
  * here against a brute-force JVM rebuild (band pigeonhole covers the
  * whole verify radius, so the banded pair set is exactly
  * {hamming ≤ bands−1}, and a brute all-pairs scan is a valid oracle
  * for it at spec scale). */
class UpsertDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def simhash(text: String): Long = {
    val counts = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.length.toLong)
    val sums = new Array[Long](60)
    counts.foreach { case (wd, cnt) =>
      val h = Prf.prf(wd)
      var b = 0
      while (b < 60) {
        val bit = (h >> (59 - b)) & 1L
        sums(b) += cnt * (2 * bit - 1)
        b += 1
      }
    }
    (0 until 60).map(b => if (sums(b) > 0) 1L << (59 - b) else 0L).sum
  }

  test("dedup_upsert: maintained pair table equals a brute-force rebuild on the post state") {
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val deleted = docs.keySet.filter(_ % 20 == 3)
    val updated = docs.keySet.filter(_ % 20 == 7)
    val baseSig = docs.map { case (id, t) => id -> simhash(t) }
    val postSig = docs.collect {
      case (id, t) if !deleted(id) && !updated(id) => id -> baseSig(id)
      case (id, t) if updated(id) => id -> simhash(t + " updated cdc")
    }
    def pairs(sigs: Map[Long, Long]): Map[(Long, Long), Int] = {
      val ids = sigs.keys.toArray.sorted
      (for {
        i <- ids.indices.iterator
        j <- (i + 1) until ids.length
        h = java.lang.Long.bitCount(sigs(ids(i)) ^ sigs(ids(j)))
        if h <= 4
      } yield (ids(i), ids(j)) -> h).toMap
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
    assert(stale.nonEmpty && delta.nonEmpty,
      "the CDC batch must actually move pairs at this SF")

    def ck(ps: Iterable[(Long, Long)]): Long =
      ps.map { case (a, b) => a * 1048573L + b }.sum
    val got = SparkEntry.queries("dedup_upsert")(spark, TestSpark.Sf).collect()
      .map(r => (r.getAs[String]("metric"), r.getAs[Long]("k")) ->
        (r.getAs[Long]("n"), r.getAs[Long]("checksum"))).toMap
    assert(got(("deleted_docs", -1L)) == ((deleted.size.toLong, deleted.sum)))
    assert(got(("updated_docs", -1L)) == ((updated.size.toLong, updated.sum)))
    assert(got(("stale_pairs", -1L)) == ((stale.size.toLong, ck(stale))))
    assert(got(("delta_pairs", -1L)) == ((delta.size.toLong, ck(delta.keys))))
    (0 to 4).foreach { h =>
      val ps = rebuilt.filter(_._2 == h).keys
      val want = if (ps.isEmpty) None else Some((ps.size.toLong, ck(ps)))
      assert(got.get(("final_pairs", h.toLong)) == want, s"hamming $h census")
    }
  }
}
