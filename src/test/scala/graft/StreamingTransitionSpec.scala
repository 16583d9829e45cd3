package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Streams

/** Streaming transition extraction (the incremental form of
  * `events_transitions`): on the same events, the streamed
  * (src, dst) multiset must aggregate to EXACTLY the batch query's
  * transition counts, regardless of how the per-user-ordered stream
  * splits across micro-batches — the last-event state carries the
  * boundary transition. */
class StreamingTransitionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streamed transitions equal the batch counts across micro-batch splits") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    Tables.register(spark, TestSpark.Sf)
    val batch = SparkEntry.queries("events_transitions")(spark, TestSpark.Sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_transitions"))
      .toMap
    // events in global (sec, event_id) order — any interleaving that
    // preserves each user's order would do; global order is one such
    val ev = spark.sql(
      """select ts div 1000000000 as sec, event_id, user_id, event_type
        |from events order by sec, event_id""".stripMargin)
      .as[(Long, Long, Long, String)].collect()
    val in = MemoryStream[(Long, Long, Long, String)]
    val q = Streams.transitionStream(in.toDS())
      .writeStream.format("memory").queryName("transition_stream")
      .outputMode("append").start()
    try {
      ev.grouped(math.max(1, ev.length / 7 + 1))
        .foreach { c => in.addData(c.toSeq); q.processAllAvailable() }
      val got = spark.table("transition_stream")
        .groupBy("_1", "_2").count()
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("count"))
        .toMap
      assert(got == batch, s"streaming ${got.size} cells vs batch ${batch.size}")
      assert(batch.values.sum > 0)
    } finally q.stop()
  }
}
