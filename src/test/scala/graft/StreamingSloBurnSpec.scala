package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Streams

/** Streaming multi-window SLO burn-rate (the incremental form of
  * `events_slo_burn`): on the same finalized hourly counts the
  * streaming points must EQUAL the oracle-checked batch query's rows
  * bit-for-bit — same value-based window membership, integer sums,
  * division order, and rounding — across any micro-batch split. */
class StreamingSloBurnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streaming burn rates and alert flags equal the batch query across micro-batch splits") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    Tables.register(spark, TestSpark.Sf)
    val batch = SparkEntry.queries("events_slo_burn")(spark, TestSpark.Sf)
      .collect().map { r =>
        r.getAs[Long]("hour_idx") -> (r.getAs[Long]("n_events"), r.getAs[Long]("n_errors"),
          r.getAs[Double]("burn_1h"), r.getAs[Double]("burn_6h"), r.getAs[Double]("burn_24h"),
          r.getAs[Long]("page_alert"), r.getAs[Long]("ticket_alert"))
      }.toMap
    val hourly = spark.sql(
      """select ts div 1000000000 div 3600 as hr, cast(count(*) as bigint) as n,
        |  cast(sum(case when event_type = 'error' then 1 else 0 end) as bigint) as ne
        |from events group by ts div 1000000000 div 3600 order by hr""".stripMargin)
      .as[(Long, Long, Long)].collect()
    val in = MemoryStream[(Long, Long, Long)]
    val q = Streams.sloBurnStream(in.toDS())
      .writeStream.format("memory").queryName("slo_stream")
      .outputMode("append").start()
    try {
      hourly.grouped(math.max(1, hourly.length / 5 + 1))
        .foreach { c => in.addData(c.toSeq); q.processAllAvailable() }
      val got = spark.table("slo_stream").collect().map { r =>
        r.getAs[Long]("hourIdx") -> (r.getAs[Long]("n"), r.getAs[Long]("nErr"),
          r.getAs[Double]("burn1h"), r.getAs[Double]("burn6h"), r.getAs[Double]("burn24h"),
          r.getAs[Long]("pageAlert"), r.getAs[Long]("ticketAlert"))
      }.toMap
      assert(got.keySet == batch.keySet)
      for ((k, b) <- batch) assert(got(k) == b, s"hour $k: ${got(k)} != $b")
      assert(batch.size >= 24)
    } finally q.stop()
  }

  test("a gap hour does not shift the value-based frame") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    // hours 0..4 then a silent hour 5, then hour 6: the 6h frame at
    // hour 6 covers hours 1..6 BY VALUE (5 rows), not the last 6 rows
    val hrs = Seq((0L, 10L, 10L), (1L, 10L, 0L), (2L, 10L, 0L), (3L, 10L, 0L),
      (4L, 10L, 0L), (6L, 10L, 0L))
    val in = MemoryStream[(Long, Long, Long)]
    val q = Streams.sloBurnStream(in.toDS())
      .writeStream.format("memory").queryName("slo_edge")
      .outputMode("append").start()
    try {
      in.addData(hrs); q.processAllAvailable()
      val r6 = spark.table("slo_edge").collect()
        .find(_.getAs[Long]("hourIdx") == 6L).get
      // hour 0's 10 errors fell OUT of the 6h window at hour 6
      assert(r6.getAs[Double]("burn6h") == 0.0)
      // but they are still inside the 24h window
      assert(r6.getAs[Double]("burn24h") > 0.0)
    } finally q.stop()
  }
}
