package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Streams

/** Streaming trailing-window anomaly scoring (the incremental form of
  * `events_anomaly`): on the same finalized hourly counts, the
  * streaming scores must EQUAL the oracle-checked batch query's rows
  * bit-for-bit — same integer rolling sums, same float order, same
  * rounding — regardless of how the hours split across micro-batches. */
class StreamingAnomalySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streaming anomaly scores equal the batch query on the same hours") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    Tables.register(spark, TestSpark.Sf)
    // expected rows from the oracle-checked batch query — (type, hour)
    // -> (n, nh, mu, z, flag); z nullable
    val batch = SparkEntry.queries("events_anomaly")(spark, TestSpark.Sf)
      .collect().map { r =>
        (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getDouble(3),
            if (r.isNullAt(4)) None else Some(r.getDouble(4)), r.getLong(5))
      }.toMap
    // the finalized hourly counts the batch query scored
    val hourly = spark.sql(
      """select event_type, (ts div 3600000000000) * 3600 as hr,
        |  cast(count(*) as bigint) as c
        |from events group by event_type, (ts div 3600000000000) * 3600
        |order by hr""".stripMargin)
      .as[(String, Long, Long)].collect()
    val in = MemoryStream[(String, Long, Long)]
    val q = Streams.anomalyStream(in.toDS())
      .writeStream.format("memory").queryName("anomaly_stream")
      .outputMode("append").start()
    try {
      // split hour-ordered input across 5 micro-batches: state must
      // carry the ring across batch boundaries
      hourly.grouped(math.max(1, hourly.length / 5 + 1))
        .foreach { c => in.addData(c.toSeq); q.processAllAvailable() }
      val got = spark.table("anomaly_stream")
        .collect().map { r =>
          (r.getString(0), r.getLong(1)) ->
            (r.getLong(2), r.getDouble(4),
              if (r.isNullAt(5)) None else Some(r.getDouble(5)), r.getLong(6))
        }.toMap
      assert(got.keySet == batch.keySet,
        s"${got.size} streamed rows vs ${batch.size} batch rows")
      for ((k, b) <- batch)
        assert(got(k) == b, s"$k: streaming ${got(k)} != batch $b")
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("hour arriving mid-ring scores against only earlier hours") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    // constant history of 12 hours then a spike: z must be defined by
    // construction only when variance > 0
    val flat = (0L until 12L).map(h => ("t", h * 3600, 10L))
    val spike = Seq(("t", 12L * 3600, 50L))
    val in = MemoryStream[(String, Long, Long)]
    val q = Streams.anomalyStream(in.toDS())
      .writeStream.format("memory").queryName("anomaly_edge")
      .outputMode("append").start()
    try {
      in.addData(flat ++ spike); q.processAllAvailable()
      val rows = spark.table("anomaly_edge").collect()
      // the first 12 hours emit nothing (nh < 12); the spike hour has
      // a zero-variance baseline -> z null, not flagged
      assert(rows.length == 1)
      assert(rows.head.getLong(1) == 12L * 3600)
      assert(rows.head.isNullAt(5))
      assert(rows.head.getLong(6) == 0L)
    } finally q.stop()
  }
}
