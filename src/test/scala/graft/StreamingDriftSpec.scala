package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Streams
import java.sql.Timestamp

/** Streaming embedding-drift monitor (the `vec_data_drift` twin): the
  * batch key's first half becomes the broadcast baseline, its second
  * half streams through in chunks, and the final emitted row per
  * dimension must equal the batch query's row bit-for-bit. */
class StreamingDriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def micro(v: Double): Long =
    (if (v >= 0) math.floor(v * 1e6 + 0.5) else -math.floor(-v * 1e6 + 0.5)).toLong

  test("final drift rows equal the batch vec_data_drift across micro-batch splits") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val t0 = new Timestamp(1700000000000L)
    val raw = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet")
      .selectExpr("vec_id", "cast(embedding as array<double>) as v").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1))
    val maxId = raw.map(_._1).max
    val (first, second) = raw.partition { case (id, _) => id * 2 <= maxId }
    // baseline: the batch key's first-half integer moments
    var base = Map.empty[Int, (Long, Long, Long)]
    first.foreach { case (_, v) =>
      v.zipWithIndex.foreach { case (x, i) =>
        val (c, s1, s2) = base.getOrElse(i + 1, (0L, 0L, 0L))
        val m = micro(x)
        base += (i + 1) -> (c + 1, s1 + m, s2 + m * m)
      }
    }
    val cells = second.flatMap { case (id, v) =>
      v.zipWithIndex.map { case (x, i) => (t0, id, i + 1, x) }
    }.sortBy(c => (c._3, c._2))

    val in = MemoryStream[(Timestamp, Long, Int, Double)]
    val q = Streams.driftStream(in.toDS, base)
      .writeStream.format("memory").queryName("drift")
      .outputMode("update").start()
    try {
      cells.grouped(math.max(1, cells.length / 3 + 1))
        .foreach { c => in.addData(c.toSeq); q.processAllAvailable() }
      val updates = spark.table("drift").as[Streams.DriftPoint].collect()
      val latest = updates.zipWithIndex.groupBy(_._1.dim).view
        .mapValues(_.maxBy(_._2)._1).toMap
      val batch = SparkEntry.queries("vec_data_drift")(spark, TestSpark.Sf).collect()
      assert(batch.nonEmpty && latest.nonEmpty)
      batch.foreach { r =>
        val d = latest(r.getAs[Long]("dim").toInt)
        assert(d.nBase == r.getAs[Long]("n_first"), s"dim ${d.dim} n_first")
        assert(d.nCur == r.getAs[Long]("n_second"), s"dim ${d.dim} n_second")
        assert(d.muBase == r.getAs[Double]("mu_first"), s"dim ${d.dim} mu_first")
        assert(d.muCur == r.getAs[Double]("mu_second"), s"dim ${d.dim} mu_second")
        assert(d.stdPooled == r.getAs[Double]("std_pooled"), s"dim ${d.dim} std_pooled")
        assert(d.zShift == r.getAs[Double]("z_shift"), s"dim ${d.dim} z_shift")
      }
    } finally q.stop()
  }
}
