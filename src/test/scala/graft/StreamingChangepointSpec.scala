package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Streams
import java.sql.Timestamp

/** Streaming CUSUM changepoint monitor (the `events_changepoint`
  * twin): the real corpus streamed in three micro-batches must emit,
  * after the last batch, exactly the batch key's verdict row. */
class StreamingChangepointSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("final emission equals the batch events_changepoint row across micro-batch splits") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    Tables.register(spark, TestSpark.Sf)
    val evs = spark.sql(
      "select timestamp_seconds(ts div 1000000000) as tss from events order by tss")
      .as[Timestamp].collect().toSeq

    val in = MemoryStream[Timestamp]
    val q = Streams.changepointStream(in.toDS)
      .writeStream.format("memory").queryName("cusum")
      .outputMode("update").start()
    try {
      evs.grouped(math.max(1, evs.length / 3 + 1))
        .foreach { c => in.addData(c); q.processAllAvailable() }
      val last = spark.table("cusum").as[Streams.ChangepointPoint]
        .collect().last
      val b = SparkEntry.queries("events_changepoint")(spark, TestSpark.Sf)
        .head()
      assert(last.cpDay == b.getAs[Long]("cp_day"))
      assert(last.nDays == b.getAs[Long]("n_days"))
      assert(last.cusumPeak == b.getAs[Double]("cusum_peak"))
      assert(last.meanBefore == b.getAs[Double]("mean_before"))
      assert(last.meanAfter == b.getAs[Double]("mean_after"))
      assert(last.levelShift == b.getAs[Double]("level_shift"))
    } finally q.stop()
  }

  test("a synthetic level shift is localized at its true boundary") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    // 10 days at 2/day then 10 days at 8/day: cp at day 9 (0-based
    // days since epoch base), mean_before 2, mean_after 8
    val base = 1700000000L / 86400 * 86400 // midnight boundary
    def ts(day: Int, k: Int) =
      new Timestamp((base + day * 86400L + k * 60) * 1000)
    val evs = (0 until 10).flatMap(d => (0 until 2).map(k => ts(d, k))) ++
      (10 until 20).flatMap(d => (0 until 8).map(k => ts(d, k)))
    val in = MemoryStream[Timestamp]
    val q = Streams.changepointStream(in.toDS)
      .writeStream.format("memory").queryName("cusum2")
      .outputMode("update").start()
    try {
      in.addData(evs); q.processAllAvailable()
      val last = spark.table("cusum2").as[Streams.ChangepointPoint]
        .collect().last
      assert(last.cpDay == base / 86400 + 9)
      assert(last.meanBefore == 2.0 && last.meanAfter == 8.0)
      assert(last.levelShift == 6.0)
    } finally q.stop()
  }
}
