package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Streams
import java.sql.Timestamp

/** Streaming bot detector (the `events_bot_detect` twin): the real
  * corpus streamed second-ordered in three micro-batches must emit,
  * per user, exactly the batch key's final verdict row. */
class StreamingBotSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("final per-user verdicts equal the batch events_bot_detect rows") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    Tables.register(spark, TestSpark.Sf)
    val evs = spark.sql(
      "select timestamp_seconds(ts div 1000000000) as tss, user_id from events order by tss, event_id")
      .as[(Timestamp, Long)].collect().toSeq

    val in = MemoryStream[(Timestamp, Long)]
    val q = Streams.botStream(in.toDS)
      .writeStream.format("memory").queryName("bots")
      .outputMode("update").start()
    try {
      evs.grouped(math.max(1, evs.length / 3 + 1))
        .foreach { c => in.addData(c); q.processAllAvailable() }
      val updates = spark.table("bots").as[Streams.BotPoint].collect()
      val latest = updates.zipWithIndex.groupBy(_._1.userId).view
        .mapValues(_.maxBy(_._2)._1).toMap
      val batch = SparkEntry.queries("events_bot_detect")(spark, TestSpark.Sf).collect()
      assert(batch.nonEmpty)
      assert(latest.size == batch.length,
        s"${latest.size} streamed users vs ${batch.length} batch rows")
      batch.foreach { r =>
        val u = r.getAs[Long]("user_id")
        val p = latest(u)
        assert(p.nGaps == r.getAs[Long]("n_gaps"), s"user $u n_gaps")
        assert(p.meanGapS == r.getAs[Double]("mean_gap_s"), s"user $u mean")
        assert(p.gapCv == r.getAs[Double]("gap_cv"), s"user $u cv")
        assert(p.botLike == r.getAs[Long]("bot_like"), s"user $u verdict")
      }
    } finally q.stop()
  }

  test("a metronome user trips the verdict; a bursty human does not") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    def ts(s: Long) = new Timestamp(1700000000000L + s * 1000)
    val in = MemoryStream[(Timestamp, Long)]
    val q = Streams.botStream(in.toDS)
      .writeStream.format("memory").queryName("bots2")
      .outputMode("update").start()
    try {
      // bot: exactly every 10 s; human: irregular gaps
      in.addData((0 to 6).map(i => (ts(10L * i), 1L)) ++
        Seq(0L, 3L, 50L, 55L, 300L, 310L, 1000L).map(s => (ts(s), 2L)))
      q.processAllAvailable()
      val pts = spark.table("bots2").as[Streams.BotPoint].collect()
        .groupBy(_.userId).view.mapValues(_.last).toMap
      assert(pts(1L).botLike == 1L && pts(1L).gapCv == 0.0)
      assert(pts(2L).botLike == 0L && pts(2L).gapCv > 0.3)
    } finally q.stop()
  }
}
