package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Streams
import java.sql.Timestamp

/** Streaming seasonal-adjusted robust anomaly monitor (the
  * `events_anomaly_seasonal` twin): after the corpus streams through
  * in three micro-batches, the final per-day emissions equal the
  * batch key's rows bit for bit. */
class StreamingSeasonalMadSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("final per-day emissions equal the batch events_anomaly_seasonal rows") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    Tables.register(spark, TestSpark.Sf)
    val evs = spark.sql(
      "select timestamp_seconds(ts div 1000000000) as tss from events order by tss")
      .as[Timestamp].collect().toSeq

    val in = MemoryStream[Timestamp]
    val q = Streams.seasonalAnomalyStream(in.toDS)
      .writeStream.format("memory").queryName("seasmad")
      .outputMode("update").start()
    try {
      evs.grouped(math.max(1, evs.length / 3 + 1))
        .foreach { c => in.addData(c); q.processAllAvailable() }
      val updates = spark.table("seasmad").as[Streams.SeasonalMadPoint].collect()
      val latest = updates.zipWithIndex.groupBy(_._1.day).view
        .mapValues(_.maxBy(_._2)._1).toMap
      val batch = SparkEntry.queries("events_anomaly_seasonal")(spark, TestSpark.Sf)
        .collect()
      assert(batch.nonEmpty && latest.size == batch.length)
      batch.foreach { r =>
        val d = r.getAs[Long]("day")
        val p = latest(d)
        assert(p.nEvents == r.getAs[Long]("n_events"), s"day $d n")
        assert(p.dow == r.getAs[Long]("dow"), s"day $d dow")
        assert(p.dowMean == r.getAs[Double]("dow_mean"), s"day $d dow_mean")
        assert(p.residual == r.getAs[Double]("residual"), s"day $d residual")
        val z = r.getAs[java.lang.Double]("robust_z")
        if (z == null) assert(p.robustZ.isEmpty, s"day $d z null")
        else assert(p.robustZ.contains(z.doubleValue()), s"day $d z")
        assert(p.isOutlier == r.getAs[Number]("is_outlier").longValue(), s"day $d flag")
      }
    } finally q.stop()
  }

  test("a weekday-patterned series with one broken Saturday flags only the break") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val base = 1700000000L / 86400 * 86400
    def ts(day: Int, k: Int) = new Timestamp((base + day * 86400L + k * 60) * 1000)
    // 12 weeks: weekend days 20 events, weekdays 5±1 (the wobble keeps
    // the residual MAD nonzero — an exactly-repeating series has MAD 0
    // and the detector correctly abstains); one weekend day (day 32)
    // collapses to 1 event. A raw MAD detector sees weekends as
    // outliers; the deseasonalized one sees only the broken day (its
    // own dow mean absorbs 1/12 of the break — the long window keeps
    // the siblings' residuals under the 3.5 gate).
    def isWeekend(d: Int) = { val dow = (base / 86400 + d + 4) % 7; dow == 5 || dow == 6 }
    val evs = (0 until 84).flatMap { dd =>
      val n = if (dd == 32) 1 else if (isWeekend(dd)) 20 else 5 + dd % 2
      (0 until n).map(k => ts(dd, k))
    }
    assert(isWeekend(32), "day 32 must be a weekend day for the scenario")
    val in = MemoryStream[Timestamp]
    val q = Streams.seasonalAnomalyStream(in.toDS)
      .writeStream.format("memory").queryName("seasmad2")
      .outputMode("update").start()
    try {
      in.addData(evs); q.processAllAvailable()
      val pts = spark.table("seasmad2").as[Streams.SeasonalMadPoint].collect()
        .groupBy(_.day).view.mapValues(_.last).toMap
      assert(pts(base / 86400 + 32).isOutlier == 1L, "the broken Saturday must flag")
      val others = pts.filter(_._1 != base / 86400 + 32)
      assert(others.values.count(_.isOutlier == 1L) == 0,
        "regular weekend peaks must not flag after deseasonalization")
    } finally q.stop()
  }
}
