package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Streams

/** Streaming windowed funnel (the incremental form of
  * `events_funnel_windowed`): per-user latched stage times must equal
  * the batch min-based definition on the same rows, and the
  * aggregated censuses must reproduce the oracle-checked batch report
  * — across micro-batch splits of the event-time-ordered stream. */
class StreamingFunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streamed funnel stages equal the batch definition across micro-batch splits") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    Tables.register(spark, TestSpark.Sf)
    val batchRow = SparkEntry.queries("events_funnel_windowed")(spark, TestSpark.Sf)
      .collect().head
    // JVM mirror of the batch stage times (min view; min click in
    // [t_view, t_view+1h]; min purchase in [t_click, t_click+24h])
    val ev = spark.sql(
      """select ts div 1000000000 as sec, event_id, user_id, event_type
        |from events order by sec, event_id""".stripMargin)
      .as[(Long, Long, Long, String)].collect()
    val mirror = ev.groupBy(_._3).flatMap { case (user, es) =>
      val v = es.filter(_._4 == "view").map(_._1).minOption
      v.map { tv =>
        val c = es.filter(e => e._4 == "click" && e._1 >= tv && e._1 <= tv + 3600)
          .map(_._1).minOption
        val b = c.flatMap(tc =>
          es.filter(e => e._4 == "purchase" && e._1 >= tc && e._1 <= tc + 86400)
            .map(_._1).minOption)
        user -> (tv, c.getOrElse(-1L), b.getOrElse(-1L))
      }
    }.toMap

    for (chunks <- Seq(1, 5)) {
      val in = MemoryStream[(java.sql.Timestamp, Long, String)]
      val q = Streams.funnelStream(in.toDS())
        .writeStream.format("memory").queryName(s"funnel_stream_$chunks")
        .outputMode("update").start()
      try {
        val rows = ev.map(e => (new java.sql.Timestamp(e._1 * 1000), e._3, e._4))
        rows.grouped(math.max(1, rows.length / chunks + 1))
          .foreach { c => in.addData(c.toSeq); q.processAllAvailable() }
        // stages only ever advance, so the FINAL row per user is the
        // one with the most latched stages (update-mode sink order is
        // not batch order)
        val got = spark.table(s"funnel_stream_$chunks")
          .as[Streams.FunnelRow].collect()
          .groupBy(_.userId).view
          .mapValues(_.maxBy(r => (r.tBuy, r.tClick, r.tView))).toMap
        val reached = got.filter(_._2.tView >= 0)
          .map { case (u, r) => u -> (r.tView, r.tClick, r.tBuy) }.toMap
        assert(reached == mirror, s"chunks=$chunks")
        // and the aggregated censuses reproduce the oracle-checked report
        val nv = reached.size.toLong
        val nc = reached.values.count(_._2 >= 0).toLong
        val np = reached.values.count(_._3 >= 0).toLong
        assert(nv == batchRow.getAs[Long]("n_viewed"), s"chunks=$chunks")
        assert(nc == batchRow.getAs[Long]("n_clicked_1h"), s"chunks=$chunks")
        assert(np == batchRow.getAs[Long]("n_purchased_24h"), s"chunks=$chunks")
        assert(nv > 0 && nc > 0)
      } finally q.stop()
    }
  }
}
