package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Streams
import java.sql.Timestamp

/** Streaming periodogram (the `events_periodogram` twin): after
  * consuming the corpus in three micro-batches, the final 4-period
  * emission equals the batch key's rows bit for bit. */
class StreamingPeriodogramSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("final per-period emissions equal the batch events_periodogram rows") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    Tables.register(spark, TestSpark.Sf)
    val evs = spark.sql(
      "select timestamp_seconds(ts div 1000000000) as tss from events order by tss")
      .as[Timestamp].collect().toSeq

    val in = MemoryStream[Timestamp]
    val q = Streams.periodogramStream(in.toDS)
      .writeStream.format("memory").queryName("pgram")
      .outputMode("update").start()
    try {
      evs.grouped(math.max(1, evs.length / 3 + 1))
        .foreach { c => in.addData(c); q.processAllAvailable() }
      val updates = spark.table("pgram").as[Streams.PeriodPoint].collect()
      val latest = updates.zipWithIndex.groupBy(_._1.periodDays).view
        .mapValues(_.maxBy(_._2)._1).toMap
      val batch = SparkEntry.queries("events_periodogram")(spark, TestSpark.Sf).collect()
      assert(batch.length == 4 && latest.size == 4)
      batch.foreach { r =>
        val p = latest(r.getAs[Long]("period_days"))
        assert(p.power == r.getAs[Double]("power"), s"p=${p.periodDays} power")
        val share = r.getAs[java.lang.Double]("power_share")
        if (share == null) assert(p.powerShare.isEmpty)
        else assert(p.powerShare.contains(share.doubleValue()), s"p=${p.periodDays} share")
        assert(p.isDominant == r.getAs[Long]("is_dominant"), s"p=${p.periodDays} dom")
      }
    } finally q.stop()
  }

  test("a planted 7-day square wave dominates at period 7") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val base = 1700000000L / 86400 * 86400
    def ts(day: Int, k: Int) = new Timestamp((base + day * 86400L + k * 60) * 1000)
    // 28 days: weekdays 10 events, every 7th day 50 — a clean weekly cycle
    val evs = (0 until 28).flatMap(d =>
      (0 until (if (d % 7 == 0) 50 else 10)).map(k => ts(d, k)))
    val in = MemoryStream[Timestamp]
    val q = Streams.periodogramStream(in.toDS)
      .writeStream.format("memory").queryName("pgram2")
      .outputMode("update").start()
    try {
      in.addData(evs); q.processAllAvailable()
      val pts = spark.table("pgram2").as[Streams.PeriodPoint].collect()
        .groupBy(_.periodDays).view.mapValues(_.last).toMap
      assert(pts(7L).isDominant == 1L)
      assert(pts(7L).powerShare.exists(_ > 0.5))
    } finally q.stop()
  }
}
