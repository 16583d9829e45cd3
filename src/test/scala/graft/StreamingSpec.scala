package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Streams
import java.sql.Timestamp

/** Operator #38: Structured Streaming windowed aggregation with an
  * event-time watermark, and gap sessionization via
  * flatMapGroupsWithState — the incremental forms of `events_windowed`
  * and `events_sessions`. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  test("windowed counts aggregate by 1h event-time window") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Timestamp, String, Double)]
    val out = Streams.windowedCounts(
      in.toDF.toDF("ts", "event_type", "value"))
    val q = out.writeStream.format("memory").queryName("wc")
      .outputMode("update").start()
    try {
      in.addData((ts("10:05"), "click", 1.0), (ts("10:40"), "click", 2.0),
        (ts("10:50"), "view", 5.0), (ts("11:10"), "click", 3.0))
      q.processAllAvailable()
      val res = spark.table("wc")
        .selectExpr("window.start as s", "event_type", "n", "sum_value")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      assert(res.contains((ts("10:00"), "click", 2L, 3.0)))
      assert(res.contains((ts("10:00"), "view", 1L, 5.0)))
      assert(res.contains((ts("11:00"), "click", 1L, 3.0)))
    } finally q.stop()
  }

  test("late data beyond the watermark is dropped from closed windows") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Timestamp, String, Double)]
    val out = Streams.windowedCounts(
      in.toDF.toDF("ts", "event_type", "value"))
    val q = out.writeStream.format("memory").queryName("wc_late")
      .outputMode("append").start()
    try {
      in.addData((ts("10:05"), "click", 1.0))
      q.processAllAvailable()
      // advance watermark far past 10:00-11:00 + 1h tolerance
      in.addData((ts("14:00"), "click", 1.0))
      q.processAllAvailable()
      // this event is 3h late: must NOT reopen the emitted 10:00 window
      in.addData((ts("10:20"), "click", 100.0))
      q.processAllAvailable()
      val w10 = spark.table("wc_late")
        .selectExpr("window.start as s", "n").as[(Timestamp, Long)]
        .collect().filter(_._1 == ts("10:00"))
      assert(w10.forall(_._2 == 1L), s"late row leaked into closed window: ${w10.toSeq}")
    } finally q.stop()
  }

  test("streaming dedup drops repeated event ids") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Timestamp, Long)]
    val out = Streams.dedupStream(in.toDF.toDF("ts", "event_id"))
    val q = out.writeStream.format("memory").queryName("dd")
      .outputMode("append").start()
    try {
      in.addData((ts("10:00"), 1L), (ts("10:01"), 2L), (ts("10:02"), 1L))
      q.processAllAvailable()
      in.addData((ts("10:10"), 2L), (ts("10:11"), 3L))
      q.processAllAvailable()
      val ids = spark.table("dd").select("event_id").as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("stream-stream interval join pairs clicks with in-window purchases") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val clicks = MemoryStream[(Timestamp, Long, Long)]
    val purchases = MemoryStream[(Timestamp, Long, Long)]
    val q = Streams.clickPurchaseJoin(clicks.toDS.toDF(), purchases.toDS.toDF())
      .writeStream.format("memory").queryName("ssj")
      .outputMode("append").start()
    try {
      // purchase 30 min before the click (in window), one 2 h before
      // (out of window), one for a different user
      purchases.addData((ts("09:30"), 1L, 100L), (ts("08:00"), 1L, 101L),
        (ts("09:45"), 2L, 102L))
      clicks.addData((ts("10:00"), 1L, 500L))
      q.processAllAvailable()
      // advance both watermarks far enough to emit/expire everything
      purchases.addData((ts("14:00"), 9L, 199L))
      clicks.addData((ts("14:00"), 9L, 599L))
      q.processAllAvailable()
      val rows = spark.table("ssj")
        .select("click_id", "purchase_id").as[(Long, Long)].collect().toSet
      assert(rows.contains((500L, 100L)), s"in-window purchase joined: $rows")
      assert(!rows.exists(_._2 == 101L), "2h-old purchase is outside the window")
      assert(!rows.exists(_._2 == 102L), "other user's purchase not joined")
    } finally q.stop()
  }

  test("batch events_attribution equals the streaming interval join on the real corpus") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    Tables.register(spark, TestSpark.Sf)
    // floor ts to whole seconds: the batch query compares epoch
    // SECONDS (evSec) while the stream joins full-precision
    // timestamps — on floor-second inputs the boundary semantics are
    // identical, so pair sets must match exactly
    def side(t: String) = spark.sql(
      s"""select timestamp_seconds(ts div 1000000000) as tss, user_id, event_id
         |from events where event_type = '$t'""".stripMargin)
      .as[(Timestamp, Long, Long)].collect().toSeq
    val clicks = MemoryStream[(Timestamp, Long, Long)]
    val purchases = MemoryStream[(Timestamp, Long, Long)]
    val q = Streams.clickPurchaseJoin(clicks.toDS.toDF(), purchases.toDS.toDF())
      .writeStream.format("memory").queryName("attrib_parity")
      .outputMode("append").start()
    try {
      purchases.addData(side("purchase"))
      clicks.addData(side("click"))
      q.processAllAvailable()
      // push both watermarks past every event so all pairs emit
      val flush = (Timestamp.valueOf("2030-01-01 00:00:00"), 999999L, 999999L)
      purchases.addData(flush); clicks.addData(flush)
      q.processAllAvailable()
      val streamed = spark.table("attrib_parity")
        .select("click_id", "purchase_id").as[(Long, Long)].collect()
        .filterNot(t => t._1 == 999999L || t._2 == 999999L).toSet
      val batch = SparkEntry.queries("events_attribution")(spark, TestSpark.Sf)
        .collect().map(r =>
          (r.getAs[Long]("click_id"), r.getAs[Long]("purchase_id"))).toSet
      assert(batch.nonEmpty)
      assert(streamed == batch,
        s"streaming/batch pair sets differ: only-stream=${streamed -- batch} only-batch=${batch -- streamed}")
    } finally q.stop()
  }

  test("sessionization closes sessions on a 30-min gap") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Timestamp, Long)]
    val q = Streams.sessionize(in.toDS).writeStream
      .format("memory").queryName("sess").outputMode("append").start()
    try {
      // user 7: two bursts separated by > 30 min -> first closes inline
      in.addData((ts("10:00"), 7L), (ts("10:10"), 7L), (ts("10:20"), 7L))
      q.processAllAvailable()
      in.addData((ts("12:00"), 7L), (ts("12:05"), 7L))
      q.processAllAvailable()
      val sessions = spark.table("sess").as[Streams.Sess].collect()
      val first = sessions.find(s => s.userId == 7L &&
        s.start == ts("10:00").getTime / 1000)
      assert(first.isDefined, s"first burst closed as a session: ${sessions.toSeq}")
      assert(first.get.nEvents == 3 &&
        first.get.end == ts("10:20").getTime / 1000)
    } finally q.stop()
  }

  test("late event older than the open session closes alone, open session survives") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Timestamp, Long)]
    // gap (5 min) < watermark delay (30 min): a within-watermark event
    // can predate the open session by MORE than the gap
    val q = Streams.sessionize(in.toDS, gapSec = 300).writeStream
      .format("memory").queryName("sess_old").outputMode("append").start()
    try {
      in.addData((ts("10:00"), 5L), (ts("10:02"), 5L))
      q.processAllAvailable()
      // 09:40 is inside the watermark (10:02 - 30 min) but > gap before
      // the open session's start: it must close as its OWN session and
      // must NOT displace [10:00-10:02] from state
      in.addData((ts("09:40"), 5L))
      q.processAllAvailable()
      // adjacent to the open session — merges iff state survived
      in.addData((ts("10:04"), 5L))
      q.processAllAvailable()
      in.addData((ts("13:00"), 5L)) // closes the open session
      q.processAllAvailable()
      val sessions = spark.table("sess_old").as[Streams.Sess].collect()
        .filter(_.userId == 5L)
      val lone = sessions.filter(s => s.start == ts("09:40").getTime / 1000)
      assert(lone.length == 1 && lone.head.nEvents == 1 &&
        lone.head.end == ts("09:40").getTime / 1000, s"got ${sessions.toSeq}")
      val main = sessions.filter(s => s.start == ts("10:00").getTime / 1000)
      assert(main.length == 1 && main.head.nEvents == 3 &&
        main.head.end == ts("10:04").getTime / 1000, s"got ${sessions.toSeq}")
    } finally q.stop()
  }

  test("late in-watermark event merges into the open session without moving end backwards") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Timestamp, Long)]
    val q = Streams.sessionize(in.toDS).writeStream
      .format("memory").queryName("sess_late").outputMode("append").start()
    try {
      in.addData((ts("10:00"), 9L), (ts("10:20"), 9L))
      q.processAllAvailable()
      // late event BEFORE the open session's start, within both the gap
      // and the watermark (10:20 - 30 min = 09:50): must extend start
      // backwards, not reset end to 09:55
      in.addData((ts("09:55"), 9L))
      q.processAllAvailable()
      // close the session via a far-future event
      in.addData((ts("13:00"), 9L))
      q.processAllAvailable()
      val closed = spark.table("sess_late").as[Streams.Sess].collect()
        .filter(s => s.userId == 9L && s.nEvents == 3)
      assert(closed.length == 1, s"one merged session expected: ${closed.toSeq}")
      assert(closed.head.start == ts("09:55").getTime / 1000)
      assert(closed.head.end == ts("10:20").getTime / 1000)
    } finally q.stop()
  }
}
