package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Streams
import java.sql.Timestamp

/** Streaming median/MAD robust anomaly monitor (the
  * `events_anomaly_mad` twin): after consuming the real corpus in
  * three micro-batches, the final per-day emissions must equal the
  * batch key's rows bit-for-bit. */
class StreamingMadSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("final per-day emissions equal the batch events_anomaly_mad rows") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    Tables.register(spark, TestSpark.Sf)
    val evs = spark.sql(
      "select timestamp_seconds(ts div 1000000000) as tss from events order by tss")
      .as[Timestamp].collect().toSeq

    val in = MemoryStream[Timestamp]
    val q = Streams.anomalyMadStream(in.toDS)
      .writeStream.format("memory").queryName("madmon")
      .outputMode("update").start()
    try {
      evs.grouped(math.max(1, evs.length / 3 + 1))
        .foreach { c => in.addData(c); q.processAllAvailable() }
      val updates = spark.table("madmon").as[Streams.MadPoint].collect()
      // last emission per day wins (Update mode re-emits every day each batch)
      val latest = updates.zipWithIndex.groupBy(_._1.day).view
        .mapValues(_.maxBy(_._2)._1).toMap
      val batch = SparkEntry.queries("events_anomaly_mad")(spark, TestSpark.Sf)
        .collect()
      assert(batch.nonEmpty && latest.size == batch.length)
      batch.foreach { r =>
        val d = r.getAs[Long]("day")
        val p = latest(d)
        assert(p.nEvents == r.getAs[Long]("n_events"), s"day $d n")
        assert(p.medianEvents == r.getAs[Long]("median_events"), s"day $d median")
        assert(p.mad == r.getAs[Long]("mad"), s"day $d mad")
        val z = r.getAs[java.lang.Double]("robust_z")
        if (z == null) assert(p.robustZ.isEmpty, s"day $d z null")
        else assert(p.robustZ.contains(z.doubleValue()), s"day $d z")
        // batch emits the CASE literal as INT; normalize via Number
        assert(p.isOutlier == r.getAs[Number]("is_outlier").longValue(), s"day $d outlier")
      }
    } finally q.stop()
  }

  test("a 10x spike day trips the outlier flag; steady days do not") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val base = 1700000000L / 86400 * 86400
    def ts(day: Int, k: Int) =
      new Timestamp((base + day * 86400L + k * 60) * 1000)
    // 14 steady days of 5±1 events, one day of 50
    val evs = (0 until 14).flatMap(d => (0 until (5 + d % 2)).map(k => ts(d, k))) ++
      (0 until 50).map(k => ts(14, k))
    val in = MemoryStream[Timestamp]
    val q = Streams.anomalyMadStream(in.toDS)
      .writeStream.format("memory").queryName("madmon2")
      .outputMode("update").start()
    try {
      in.addData(evs); q.processAllAvailable()
      val updates = spark.table("madmon2").as[Streams.MadPoint].collect()
      val latest = updates.zipWithIndex.groupBy(_._1.day).view
        .mapValues(_.maxBy(_._2)._1).toMap
      assert(latest(base / 86400 + 14).isOutlier == 1L)
      assert((0 until 14).forall(d => latest(base / 86400 + d).isOutlier == 0L))
    } finally q.stop()
  }
}
