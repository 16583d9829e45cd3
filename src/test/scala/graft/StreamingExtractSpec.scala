package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Streams
import graft.sqlgen.Wm

/** Batch-embedded, STREAM-extracted: the stego cells from the batch
  * embed query, fed as an out-of-order stream in two chunks, must
  * decode to exactly the embedded message bits. */
class StreamingExtractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streaming blind extraction recovers the embedded message") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._

    // a real event time: epoch-0 stamps would be dropped as late
    // against Spark's initial watermark (also 0)
    val t0 = new java.sql.Timestamp(1700000000000L)
    val cells = SparkEntry.queries("wm_embed")(spark, TestSpark.Sf)
      .collect().map(r => (t0, r.getLong(0), r.getLong(1).toInt, r.getDouble(2)))
    // shuffle deterministically and split so most vectors straddle
    // the two micro-batches (state must carry partial vectors over)
    val mixed = cells.sortBy { case (_, id, pos, _) => (pos, id) }
    val (c1, c2) = mixed.splitAt(mixed.length / 2)

    val in = MemoryStream[(java.sql.Timestamp, Long, Int, Double)]
    val q = Streams.extractStream(in.toDS)
      .writeStream.format("memory").queryName("wmx")
      .outputMode("append").start()
    try {
      in.addData(c1.toSeq); q.processAllAvailable()
      val mid = spark.table("wmx").count()
      in.addData(c2.toSeq); q.processAllAvailable()
      val decoded = spark.table("wmx").as[Streams.Decoded].collect()
      assert(mid < decoded.length, "second batch completed more vectors")

      // majority-vote tail (batch, as in production)
      val votes = decoded.groupBy(_.blk).view.mapValues { ds =>
        (0 until 16).map(j => if (ds.map(d => 2 * d.bits(j) - 1).sum > 0) 1 else 0)
      }.toMap
      val expect = SparkEntry.queries("wm_msg_bits")(spark, TestSpark.Sf)
        .collect().map(r => (r.getLong(0).toInt, r.getLong(1).toInt) -> r.getLong(2).toInt).toMap
      for (blk <- 0 until Wm.Blocks; j <- 0 until 16)
        assert(votes(blk)(j) == expect((blk, j)), s"bit ($blk, $j)")
    } finally q.stop()
  }

  test("custom-params cells decode with the matching key/delta") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    import graft.sqlgen.WmParams
    val p = WmParams(message = "sixteen byte msg", key = "another-key-42",
      delta = 0.2)
    val g2 = new graft.api.Graft(spark, TestSpark.Sf, p)
    val t0 = new java.sql.Timestamp(1700000000000L)
    val cells = g2.embedded.collect()
      .map(r => (t0, r.getLong(0), r.getLong(1).toInt, r.getDouble(2)))
    val in = MemoryStream[(java.sql.Timestamp, Long, Int, Double)]
    val q = Streams.extractStream(in.toDS, params = p)
      .writeStream.format("memory").queryName("wmx_custom")
      .outputMode("append").start()
    try {
      in.addData(cells.toSeq); q.processAllAvailable()
      val decoded = spark.table("wmx_custom").as[Streams.Decoded].collect()
      assert(decoded.nonEmpty, "custom-key cells decode under the custom key")
      val expect = g2.messageBits.collect()
        .map(r => (r.getLong(0).toInt, r.getLong(1).toInt) -> r.getLong(2).toInt).toMap
      val votes = decoded.groupBy(_.blk).view.mapValues { ds =>
        (0 until 16).map(j => if (ds.map(d => 2 * d.bits(j) - 1).sum > 0) 1 else 0)
      }.toMap
      for ((blk, bits) <- votes; j <- 0 until 16)
        assert(bits(j) == expect((blk, j)), s"bit ($blk, $j)")
    } finally q.stop()
  }

  test("incomplete vector state expires via event-time timeout") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val t0 = 1700000000000L
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val in = MemoryStream[(java.sql.Timestamp, Long, Int, Double)]
    // 1-minute expiry for incomplete vectors
    val q = Streams.extractStream(in.toDS, incompleteTimeoutMs = 60000L)
      .writeStream.format("memory").queryName("wmx_expire")
      .outputMode("append").start()
    try {
      // a partial vector (1 of 64 cells) — state entry created
      in.addData((ts(t0), 1L, 1, 0.5)); q.processAllAvailable()
      assert(q.lastProgress.stateOperators.head.numRowsTotal == 1)
      // push the watermark far past the partial vector's expiry
      // (t0 + 1 min): a cell of a DIFFERENT vector 10 minutes later
      in.addData((ts(t0 + 600000), 2L, 1, 0.5)); q.processAllAvailable()
      val total = q.lastProgress.stateOperators.head.numRowsTotal
      assert(total == 1, s"vector 1 expired, only vector 2 remains: $total")
    } finally q.stop()
  }
}
