package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Streams
import java.sql.Timestamp

/** Streaming per-group KMV bottom-k sketch (the incremental form of
  * the native `graft_kmv` aggregate): the sketch is a pure function of
  * the input SET, so micro-batch splits must not change a single
  * element — on the same rows the streamed set is LONG-FOR-LONG equal
  * to the batch aggregate's array. */
class StreamingKmvSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def t0 = Timestamp.valueOf("2024-01-01 10:00:00")

  test("streaming KMV sets equal the batch graft_kmv per source") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    Tables.register(spark, TestSpark.Sf)
    val batch = spark.sql(
      """select source, graft_kmv(h, 64) as mins from
        |(select distinct source,
        |   cast(conv(substr(md5(concat_ws(':', 'kmv', wd)), 1, 15), 16, 10) as bigint) as h
        | from (select source, split(lower(text), '\\s+') as ws from documents) w
        | lateral view explode(ws) _e as wd) _h
        |group by source""".stripMargin)
      .collect().map(r => r.getAs[String]("source") -> r.getSeq[Long](1).toList).toMap
    // the stream gets RAW (non-distinct) words — the sketch dedups
    val words = spark.sql(
      """select source, wd from
        |(select source, split(lower(text), '\\s+') as ws from documents) w
        |lateral view explode(ws) _e as wd""".stripMargin)
      .as[(String, String)].collect()
    val in = MemoryStream[(Timestamp, String, String)]
    val q = Streams.kmvStream(in.toDS(), 64)
      .toDF("source", "mins")
      .writeStream.format("memory").queryName("kmv_stream")
      .outputMode("update").start()
    try {
      val chunks = words.grouped(math.max(1, words.length / 4 + 1)).toSeq
      for (c <- chunks) {
        in.addData(c.toSeq.map { case (s, wd) => (t0, s, wd) })
        q.processAllAvailable()
      }
      val updates = spark.table("kmv_stream")
        .as[(String, Seq[Long])].collect()
      // sink row order is not batch order; sketches only ever grow in
      // size and then shrink in content, so the final set per source
      // is the one with (max size, min sum)
      val finalSet = updates.groupBy(_._1).view
        .mapValues(_.minBy(u => (-u._2.length, u._2.map(BigInt(_)).sum))._2.toList).toMap
      assert(finalSet.keySet == batch.keySet)
      for ((src, mins) <- batch) {
        assert(finalSet(src) == mins, s"sketch mismatch for $src")
        assert(mins == mins.sorted && mins.distinct == mins, s"not a sorted set: $src")
      }
    } finally q.stop()
  }
}
