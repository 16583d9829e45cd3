package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Streams
import java.sql.Timestamp

/** Streaming per-group count-min grid (the incremental form of the
  * native `graft_cms` aggregate): micro-batch splits must not change a
  * single cell — CMS state merges by addition, so on the same rows the
  * streamed grid is LONG-FOR-LONG equal to the batch aggregate's. */
class StreamingCmsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def t0 = Timestamp.valueOf("2024-01-01 10:00:00")

  test("streaming CMS grids equal the batch graft_cms per source") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    Tables.register(spark, TestSpark.Sf)
    // expected: the native aggregate, grouped (exercises the grouped
    // merge path of the TypedImperativeAggregate too)
    val batch = spark.sql(
      """select source, graft_cms(wd) as grid from
        |(select source, split(lower(text), '\\s+') as ws from documents) w
        |lateral view explode(ws) _e as wd
        |group by source""".stripMargin)
      .collect().map(r => r.getAs[String]("source") -> r.getSeq[Long](1).toList).toMap
    val words = spark.sql(
      """select source, wd from
        |(select source, split(lower(text), '\\s+') as ws from documents) w
        |lateral view explode(ws) _e as wd""".stripMargin)
      .as[(String, String)].collect()
    val in = MemoryStream[(Timestamp, String, String)]
    val q = Streams.cmsStream(in.toDS())
      .toDF("source", "grid")
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("update").start()
    try {
      val chunks = words.grouped(math.max(1, words.length / 3 + 1)).toSeq
      for (c <- chunks) {
        in.addData(c.toSeq.map { case (s, wd) => (t0, s, wd) })
        q.processAllAvailable()
      }
      val updates = spark.table("cms_stream")
        .as[(String, Seq[Long])].collect()
      // update-mode sink row order is not contractually batch order;
      // CMS grids grow monotonically, so the FINAL grid per source is
      // the one with the maximal cell sum
      val finalGrid = updates.groupBy(_._1).view
        .mapValues(_.maxBy(_._2.sum)._2.toList).toMap
      assert(finalGrid.keySet == batch.keySet)
      for ((src, g) <- batch)
        assert(finalGrid(src) == g, s"grid mismatch for $src")
    } finally q.stop()
  }
}
