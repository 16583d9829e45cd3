package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Streams

/** Streaming peak-concurrency monitor (the `events_peak_concurrency`
  * twin): closed sessions from the real corpus arrive in three
  * micro-batches; the final per-day emissions must equal the batch
  * key's rows bit-for-bit.
  */
class StreamingConcurrencySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** JVM replica of the batch sessionizer (e/m/s/ses CTEs): new-session
    * flags over (ts, event_id) order, session ids accumulated in
    * (sec, event_id) order — the batch SQL's exact window orders. */
  private def sessions(): Seq[(Long, Long)] = {
    Tables.register(spark, TestSpark.Sf)
    val evs = spark.sql("select user_id, event_id, ts from events").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[Long]("ts")))
    evs.groupBy(_._1).values.flatMap { rows =>
      val byTs = rows.sortBy(r => (r._3, r._2))
      val newFlag = byTs.zipWithIndex.map { case ((_, eid, ts), i) =>
        val sec = ts / 1000000000L
        val flag = if (i == 0) 1
          else { val prevSec = byTs(i - 1)._3 / 1000000000L
                 if (sec - prevSec > 1800) 1 else 0 }
        (eid, sec, flag)
      }
      val bySec = newFlag.sortBy { case (eid, sec, _) => (sec, eid) }
      var sid = 0L
      val tagged = bySec.map { case (_, sec, flag) => sid += flag; (sid, sec) }
      tagged.groupBy(_._1).values.map { ss =>
        (ss.map(_._2).min, ss.map(_._2).max)
      }
    }.toSeq
  }

  test("final per-day emissions equal the batch events_peak_concurrency rows") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val ses = sessions().sortBy(_._1)
    val in = MemoryStream[(Long, Long)]
    val q = Streams.concurrencyStream(in.toDS)
      .writeStream.format("memory").queryName("concmon")
      .outputMode("update").start()
    try {
      ses.grouped(math.max(1, ses.length / 3 + 1))
        .foreach { c => in.addData(c); q.processAllAvailable() }
      val updates = spark.table("concmon").as[Streams.ConcPoint].collect()
      val latest = updates.zipWithIndex.groupBy(_._1.day).view
        .mapValues(_.maxBy(_._2)._1).toMap
      val batch = SparkEntry.queries("events_peak_concurrency")(spark, TestSpark.Sf)
        .collect()
      assert(batch.nonEmpty && latest.size == batch.length,
        s"stream ${latest.size} days vs batch ${batch.length}")
      batch.foreach { r =>
        val d = r.getAs[Long]("day")
        val p = latest(d)
        assert(p.nStarts == r.getAs[Long]("n_starts"), s"day $d starts")
        assert(p.nEnds == r.getAs[Long]("n_ends"), s"day $d ends")
        assert(p.dayPeak == r.getAs[Long]("day_peak"), s"day $d peak")
        assert(p.eodConcurrency == r.getAs[Long]("eod_concurrency"), s"day $d eod")
        assert(p.globalPeak == r.getAs[Long]("global_peak"), s"day $d global")
      }
    } finally q.stop()
  }

  test("overlapping and midnight-spanning sessions count correctly") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val day0 = 1700006400L / 86400 * 86400 // aligned day start
    // three overlapping sessions in day 0, one spanning into day 1
    val ses = Seq(
      (day0 + 100L, day0 + 500L),
      (day0 + 200L, day0 + 300L),
      (day0 + 250L, day0 + 260L),          // triple overlap at 250..260
      (day0 + 86000L, day0 + 86400L + 600L)) // crosses midnight
    val in = MemoryStream[(Long, Long)]
    val q = Streams.concurrencyStream(in.toDS)
      .writeStream.format("memory").queryName("concmon2")
      .outputMode("update").start()
    try {
      in.addData(ses); q.processAllAvailable()
      val latest = spark.table("concmon2").as[Streams.ConcPoint].collect()
        .zipWithIndex.groupBy(_._1.day).view.mapValues(_.maxBy(_._2)._1).toMap
      val d0 = day0 / 86400
      assert(latest(d0).dayPeak == 3L)          // the triple overlap
      assert(latest(d0).eodConcurrency == 1L)   // midnight-spanner open
      assert(latest(d0).nStarts == 4L && latest(d0).nEnds == 3L)
      assert(latest(d0 + 1).nEnds == 1L)        // its −1 lands next day
      assert(latest(d0 + 1).eodConcurrency == 0L)
      assert(latest(d0 + 1).globalPeak == 3L)
    } finally q.stop()
  }
}
