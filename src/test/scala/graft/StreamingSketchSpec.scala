package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{HllSketch, Streams}
import java.sql.Timestamp

/** Streaming per-group HLL (the incremental form of
  * `sketch_distinct_by_source`): the register array is mergeable O(m)
  * state, so micro-batch splits and duplicate words must not change
  * the estimate — and on the same rows the streaming estimate must
  * EQUAL the batch query's, because the JVM register math mirrors the
  * generated SQL bit for bit. */
class StreamingSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def t0 = Timestamp.valueOf("2024-01-01 10:00:00")

  test("streaming sketch equals the batch query estimate on the same rows") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    Tables.register(spark, TestSpark.Sf)
    // expected: the oracle-checked batch query
    val batch = SparkEntry.queries("sketch_distinct_by_source")(spark, TestSpark.Sf)
      .selectExpr("source", "hll_est").as[(String, Double)].collect().toMap
    // the exact word rows the batch engine hashed (duplicates INCLUDED
    // — HLL insertion is idempotent, streaming needs no distinct)
    val words = spark.sql(
      """select source, wd from
        |(select source, split(lower(text), '\\s+') as ws from documents) w
        |lateral view explode(ws) _e as wd""".stripMargin)
      .as[(String, String)].collect()
    val in = MemoryStream[(Timestamp, String, String)]
    val q = Streams.distinctSketchStream(in.toDS())
      .toDF("source", "estimate")
      .writeStream.format("memory").queryName("hll_stream")
      .outputMode("update").start()
    try {
      // split across three micro-batches to force state merges
      val chunks = words.grouped(math.max(1, words.length / 3 + 1)).toSeq
      for (c <- chunks) {
        in.addData(c.toSeq.map { case (s, wd) => (t0, s, wd) })
        q.processAllAvailable()
      }
      // last update per source is the final estimate
      val updates = spark.table("hll_stream").as[(String, Double)].collect()
      val finalEst = updates.zipWithIndex.groupBy(_._1._1).view
        .mapValues(_.maxBy(_._2)._1._2).toMap
      assert(finalEst.keySet == batch.keySet)
      for ((src, est) <- batch)
        assert(finalEst(src) == est,
          s"$src: streaming ${finalEst(src)} != batch $est")
    } finally q.stop()
  }

  test("streaming windowed counts equal the batch events_windowed on the real table") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    Tables.register(spark, TestSpark.Sf)
    val batch = SparkEntry.queries("events_windowed")(spark, TestSpark.Sf)
      .selectExpr("hour_epoch", "event_type", "n").as[(Long, String, Long)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    // replay the real events table through the stream (ts arrives as
    // BIGINT nanos via the registered view — rebuild the timestamp)
    val rows = spark.sql(
      "select timestamp_seconds(ts div 1000000000) as ts, event_type, value from events")
      .as[(Timestamp, String, Double)].collect()
    val in = MemoryStream[(Timestamp, String, Double)]
    val q = Streams.windowedCounts(in.toDF.toDF("ts", "event_type", "value"))
      .selectExpr("cast(unix_timestamp(window.start) as bigint) as he", "event_type", "n")
      .writeStream.format("memory").queryName("wc_parity")
      .outputMode("update").start()
    try {
      rows.grouped(math.max(1, rows.length / 4 + 1))
        .foreach { c => in.addData(c.toSeq); q.processAllAvailable() }
      val updates = spark.table("wc_parity").as[(Long, String, Long)].collect()
      val finalN = updates.zipWithIndex.groupBy(u => (u._1._1, u._1._2)).view
        .mapValues(_.maxBy(_._2)._1._3).toMap
      assert(finalN == batch,
        s"windowed parity broke: ${finalN.size} stream keys vs ${batch.size} batch keys")
    } finally q.stop()
  }

  test("register math matches the documented HLL shape") {
    val regs = new Array[Byte](HllSketch.M)
    // idempotent: same word twice = once
    HllSketch.insert(regs, "alpha");
    val snapshot = regs.clone()
    HllSketch.insert(regs, "alpha")
    assert(regs.toSeq == snapshot.toSeq)
    // empty sketch -> linear counting of a full-empty register file
    val empty = new Array[Byte](HllSketch.M)
    assert(HllSketch.estimate(empty) == 0.0 ||
      HllSketch.estimate(empty).isNaN == false) // defined, no crash
    // a few hundred distinct words land within ~3 standard errors
    // (1.04/sqrt(256) ~ 6.5%)
    val r2 = new Array[Byte](HllSketch.M)
    val n = 500
    (1 to n).foreach(i => HllSketch.insert(r2, s"word-$i"))
    val est = HllSketch.estimate(r2)
    assert(math.abs(est - n) / n < 0.2, s"estimate $est too far from $n")
  }
}
