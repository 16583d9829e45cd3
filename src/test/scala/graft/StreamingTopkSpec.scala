package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Streams
import java.sql.Timestamp

/** Streaming per-group bounded top-k (the incremental twin of the
  * native `graft_topk` aggregate): on the same rows the final streamed
  * shortlist must EQUAL the batch aggregate's output, under any
  * micro-batch split — including tie runs crossing the k boundary,
  * where only the shared (score desc, id asc) total order keeps the
  * two paths identical.
  */
class StreamingTopkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def t0 = Timestamp.valueOf("2024-01-01 10:00:00")

  test("streamed shortlists equal the batch graft_topk under micro-batch splits") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    Tables.register(spark, TestSpark.Sf) // registers graft_topk
    // deterministic scored rows with heavy ties: 5 groups x 400 rows,
    // 13 distinct scores — the k=10 boundary lands inside tie runs
    val rows = for (g <- 0 until 5; i <- 0 until 400) yield
      (s"g$g", g * 1000L + i, ((i * 31 + g * 7) % 13).toDouble / 12.0)
    rows.toDF("g", "id", "score").createOrReplaceTempView("stk_in")
    val batch = spark.sql(
      """select g, e.id as id, e.score as score, p0 + 1 as rn
        |from (select g, graft_topk(id, score, 10) as tk from stk_in group by g) _t
        |lateral view posexplode(tk) _e as p0, e""".stripMargin)
      .collect().map(r => (r.getAs[String]("g"), r.getAs[Int]("rn"),
        r.getAs[Long]("id"), r.getAs[Double]("score"))).toSet

    for (nChunks <- Seq(1, 4)) {
      val in = MemoryStream[(Timestamp, String, Long, Double)]
      val q = Streams.groupedTopkStream(in.toDS(), 10)
        .toDF("g", "ids", "scores")
        .writeStream.format("memory").queryName(s"stk_$nChunks")
        .outputMode("update").start()
      try {
        rows.grouped(math.max(1, rows.length / nChunks + 1))
          .foreach { c => in.addData(c.map { case (g, id, s) => (t0, g, id, s) }); q.processAllAvailable() }
        val updates = spark.table(s"stk_$nChunks")
          .collect().map(r => (r.getAs[String]("g"),
            r.getAs[scala.collection.Seq[Long]]("ids").toList,
            r.getAs[scala.collection.Seq[Double]]("scores").toList))
        val finalRows = updates.zipWithIndex.groupBy(_._1._1).view
          .mapValues(_.maxBy(_._2)._1).toMap
        val streamed = finalRows.values.flatMap { case (g, ids, scores) =>
          ids.zip(scores).zipWithIndex.map { case ((id, s), i) => (g, i + 1, id, s) }
        }.toSet
        assert(streamed == batch, s"chunks=$nChunks")
      } finally q.stop()
    }
  }
}
