package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Streams

/** Streaming exact dyadic EWMA (the incremental form of `events_ewma`):
  * on the same finalized daily counts the streaming points must EQUAL
  * the oracle-checked batch query's rows bit-for-bit — the scaled
  * mantissa is the same exact bigint, the division the same exponent
  * shift, the rounding the same floor-based half-away — regardless of
  * how the days split across micro-batches. */
class StreamingEwmaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streaming EWMA, forecast, and residual equal the batch query across micro-batch splits") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    Tables.register(spark, TestSpark.Sf)
    val batch = SparkEntry.queries("events_ewma")(spark, TestSpark.Sf)
      .collect().map { r =>
        r.getAs[Long]("day") -> (r.getAs[Long]("n_events"),
          r.getAs[Double]("ewma"),
          if (r.isNullAt(r.fieldIndex("forecast"))) None else Some(r.getAs[Double]("forecast")),
          if (r.isNullAt(r.fieldIndex("residual"))) None else Some(r.getAs[Double]("residual")))
      }.toMap
    val daily = spark.sql(
      """select 'all' as s, ts div 1000000000 div 86400 as day,
        |  cast(count(*) as bigint) as x
        |from events group by ts div 1000000000 div 86400 order by day""".stripMargin)
      .as[(String, Long, Long)].collect()
    val in = MemoryStream[(String, Long, Long)]
    val q = Streams.ewmaStream(in.toDS())
      .writeStream.format("memory").queryName("ewma_stream")
      .outputMode("append").start()
    try {
      daily.grouped(math.max(1, daily.length / 4 + 1))
        .foreach { c => in.addData(c.toSeq); q.processAllAvailable() }
      val got = spark.table("ewma_stream").collect().map { r =>
        r.getAs[Long]("day") -> (r.getAs[Long]("n"), r.getAs[Double]("ewma"),
          Option(r.getAs[java.lang.Double]("forecast")).map(_.toDouble),
          Option(r.getAs[java.lang.Double]("residual")).map(_.toDouble))
      }.toMap
      assert(got.keySet == batch.keySet)
      for ((k, b) <- batch) assert(got(k) == b, s"day $k: ${got(k)} != $b")
      assert(batch.size >= 5)
    } finally q.stop()
  }

  test("state carries the exact mantissa: a late micro-batch continues the same kernel") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    // two series interleaved; constant series converges to the constant
    val a = (0L until 10L).map(d => ("c", d, 8L))
    val in = MemoryStream[(String, Long, Long)]
    val q = Streams.ewmaStream(in.toDS())
      .writeStream.format("memory").queryName("ewma_edge")
      .outputMode("append").start()
    try {
      in.addData(a.take(3)); q.processAllAvailable()
      in.addData(a.drop(3)); q.processAllAvailable()
      val rows = spark.table("ewma_edge").collect()
        .sortBy(_.getAs[Long]("day"))
      assert(rows.length == 10)
      // EWMA of a constant series IS the constant, at every step
      rows.foreach(r => assert(r.getAs[Double]("ewma") == 8.0))
      // one-step forecast = previous EWMA; residual 0 from day 1 on
      rows.drop(1).foreach { r =>
        assert(r.getAs[Double]("forecast") == 8.0)
        assert(r.getAs[Double]("residual") == 0.0)
      }
    } finally q.stop()
  }
}
