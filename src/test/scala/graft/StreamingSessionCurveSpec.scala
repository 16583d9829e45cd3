package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Streams
import java.sql.Timestamp

/** Multi-timeout sessionization stream (the `events_sessions_curve`
  * twin): the real corpus streamed in three micro-batches must
  * produce, per timeout rung, exactly the batch key's session census
  * — n_sessions, total events, and active duration all equal. */
class StreamingSessionCurveSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Gaps = Seq(300L, 1800L, 7200L)

  test("per-rung closed sessions equal the batch tuning-curve census") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    Tables.register(spark, TestSpark.Sf)
    val evs = spark.sql(
      "select timestamp_seconds(ts div 1000000000) as tss, user_id from events order by tss")
      .as[(Timestamp, Long)].collect().toSeq
    val parts = evs.grouped(math.max(1, evs.length / 3 + 1)).toSeq

    val in = MemoryStream[(Timestamp, Long)]
    val q = Streams.sessionCurveStream(in.toDS, Gaps)
      .writeStream.format("memory").queryName("sess_curve")
      .outputMode("append").start()
    try {
      parts.foreach { p => in.addData(p); q.processAllAvailable() }
      // advance the watermark far past every rung deadline so the
      // remaining open sessions close via event-time timeout (the
      // flush user's own sessions stay open — excluded below)
      in.addData((Timestamp.valueOf("2030-01-01 00:00:00"), -1L))
      q.processAllAvailable()
      val sess = spark.table("sess_curve").as[Streams.RungSess].collect()
        .filter(_.userId != -1L)
      val batch = SparkEntry.queries("events_sessions_curve")(spark, TestSpark.Sf)
        .collect().map(r => r.getAs[Long]("timeout_s") ->
          (r.getAs[Long]("n_sessions"), r.getAs[Long]("active_duration_s"))).toMap
      val nEvents = evs.length.toLong
      for (g <- Gaps) {
        val rung = sess.filter(_.gapSec == g)
        val (nSess, actDur) = batch(g)
        assert(rung.length.toLong == nSess,
          s"rung $g: ${rung.length} streamed sessions vs batch $nSess")
        assert(rung.map(s => s.end - s.start).sum == actDur,
          s"rung $g: active duration mismatch")
        assert(rung.map(_.nEvents).sum == nEvents,
          s"rung $g: every event lands in exactly one session")
      }
    } finally q.stop()
  }

  test("a gap straddling micro-batches splits or merges per rung") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    def ts(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    val in = MemoryStream[(Timestamp, Long)]
    val q = Streams.sessionCurveStream(in.toDS, Gaps)
      .writeStream.format("memory").queryName("sess_curve2")
      .outputMode("append").start()
    try {
      in.addData((ts("10:00"), 1L), (ts("10:04"), 1L)); q.processAllAvailable()
      // 11-min gap across the batch boundary: breaks the 5-min rung,
      // merges in the 30-min and 2-h rungs
      in.addData((ts("10:15"), 1L)); q.processAllAvailable()
      in.addData((Timestamp.valueOf("2030-01-01 00:00:00"), -1L))
      q.processAllAvailable()
      val sess = spark.table("sess_curve2").as[Streams.RungSess].collect()
        .filter(_.userId == 1L)
      assert(sess.count(_.gapSec == 300L) == 2, s"5-min rung splits: ${sess.toSeq}")
      assert(sess.count(_.gapSec == 1800L) == 1, s"30-min rung merges: ${sess.toSeq}")
      assert(sess.count(_.gapSec == 7200L) == 1, s"2-h rung merges: ${sess.toSeq}")
      val merged = sess.find(_.gapSec == 1800L).get
      assert(merged.nEvents == 3 && merged.start == ts("10:00").getTime / 1000 &&
        merged.end == ts("10:15").getTime / 1000)
    } finally q.stop()
  }
}
