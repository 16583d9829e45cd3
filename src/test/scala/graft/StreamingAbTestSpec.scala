package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Streams

/** Streaming A/B monitor (incremental form of `events_ab_test`): the
  * per-variant counts are exact integer sums, so however the event
  * stream splits into micro-batches, the final complete-mode state
  * must EQUAL the batch query's four integers. */
class StreamingAbTestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streamed variant counts equal the batch A/B readout across micro-batch splits") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    Tables.register(spark, TestSpark.Sf)
    val b = SparkEntry.queries("events_ab_test")(spark, TestSpark.Sf).collect().head
    val ev = spark.sql("select user_id, event_type from events")
      .as[(Long, String)].collect()
    val in = MemoryStream[(Long, String)]
    val q = Streams.abTestStream(
      in.toDF().withColumnRenamed("_1", "user_id").withColumnRenamed("_2", "event_type"))
      .writeStream.format("memory").queryName("ab_stream")
      .outputMode("complete").start()
    try {
      ev.grouped(math.max(1, ev.length / 5 + 1))
        .foreach { c => in.addData(c.toSeq); q.processAllAvailable() }
      val got = spark.table("ab_stream").collect()
        .map(r => r.getAs[Long]("variant") ->
          (r.getAs[Long]("n"), r.getAs[Long]("n_click"))).toMap
      assert(got(0L) == (b.getAs[Long]("n_a"), b.getAs[Long]("clicks_a")))
      assert(got(1L) == (b.getAs[Long]("n_b"), b.getAs[Long]("clicks_b")))
    } finally q.stop()
  }
}
