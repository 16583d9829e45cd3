package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Streams
import java.sql.Timestamp

/** Streaming day-over-day mix-shift monitor (the `events_mix_shift`
  * twin): the real corpus streamed in three micro-batches must emit,
  * per adjacent-day pair, exactly the batch key's final JS row. */
class StreamingMixShiftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("final per-pair emissions equal the batch events_mix_shift rows") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    Tables.register(spark, TestSpark.Sf)
    val evs = spark.sql(
      "select timestamp_seconds(ts div 1000000000) as tss, event_type from events order by tss, event_id")
      .as[(Timestamp, String)].collect().toSeq

    val in = MemoryStream[(Timestamp, String)]
    val q = Streams.mixShiftStream(in.toDS)
      .writeStream.format("memory").queryName("mixshift")
      .outputMode("update").start()
    try {
      evs.grouped(math.max(1, evs.length / 3 + 1))
        .foreach { c => in.addData(c); q.processAllAvailable() }
      val updates = spark.table("mixshift").as[Streams.JsPoint].collect()
      val latest = updates.zipWithIndex.groupBy(_._1.day).view
        .mapValues(_.maxBy(_._2)._1).toMap
      val batch = SparkEntry.queries("events_mix_shift")(spark, TestSpark.Sf).collect()
      assert(batch.nonEmpty && latest.size == batch.length,
        s"${latest.size} streamed pairs vs ${batch.length} batch rows")
      batch.foreach { r =>
        val d = r.getAs[Long]("day")
        val p = latest(d)
        assert(p.prevDay == r.getAs[Long]("prev_day"), s"day $d prev")
        assert(p.nEvents == r.getAs[Long]("n_events"), s"day $d n")
        assert(p.nPrev == r.getAs[Long]("n_prev"), s"day $d n_prev")
        assert(p.jsNats == r.getAs[Double]("js_nats"), s"day $d js")
        assert(p.jsNormalized == r.getAs[Double]("js_normalized"), s"day $d jsn")
      }
    } finally q.stop()
  }

  test("a mix flip between two days produces a near-1 normalized JS; identical days produce 0") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val base = 1700000000L / 86400 * 86400
    def ts(day: Int, k: Int) = new Timestamp((base + day * 86400L + k * 60) * 1000)
    // day 0: all 'a'; day 1: all 'b' (disjoint mix -> JS = ln 2 -> 1.0
    // normalized); day 2: all 'b' again (identical to day 1 -> 0)
    val evs = (0 until 20).map(k => (ts(0, k), "a")) ++
      (0 until 20).map(k => (ts(1, k), "b")) ++
      (0 until 20).map(k => (ts(2, k), "b"))
    val in = MemoryStream[(Timestamp, String)]
    val q = Streams.mixShiftStream(in.toDS)
      .writeStream.format("memory").queryName("mixshift2")
      .outputMode("update").start()
    try {
      in.addData(evs); q.processAllAvailable()
      val pts = spark.table("mixshift2").as[Streams.JsPoint].collect()
        .groupBy(_.day).view.mapValues(_.last).toMap
      assert(pts(base / 86400 + 1).jsNormalized == 1.0)
      assert(pts(base / 86400 + 2).jsNormalized == 0.0)
    } finally q.stop()
  }
}
