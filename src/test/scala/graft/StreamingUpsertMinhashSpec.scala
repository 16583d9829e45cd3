package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Streams

/** Streaming CDC-upsert maintenance of the MINHASH index
  * (Streams.upsertMinhashStream): an insert-only replay must
  * reassemble the oracle-gated batch signature table long-for-long
  * however the stream splits into micro-batches, and updates/deletes
  * follow the retract-then-assert protocol — the streaming twin of
  * `dedup_upsert_minhash` exactly as StreamingUpsertSpec is the twin
  * of `dedup_upsert`. */
class StreamingUpsertMinhashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def ts(i: Int) = new Timestamp(1704103200000L + i * 1000L)

  test("insert replay reassembles the batch minhash signatures; updates/deletes retract") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    Tables.register(spark, TestSpark.Sf)
    val batch = spark.sql(new graft.sqlgen.Gen(
        graft.sqlgen.SparkDialect).minhashSigBuildSql).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (0 until 16).map(m => r.getAs[Long](s"m$m"))).toMap
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))

    val in = MemoryStream[(Timestamp, Long, String)]
    val q = Streams.upsertMinhashStream(in.toDS())
      .toDF("doc_id", "band", "sigv", "delta")
      .writeStream.format("memory").queryName("upsert_mh_stream")
      .outputMode("update").start()
    try {
      // phase 1: insert every doc across 3 micro-batches
      for (c <- docs.grouped(docs.length / 3 + 1)) {
        in.addData(c.toSeq.map { case (id, t) => (ts(0), id, t) })
        q.processAllAvailable()
      }
      def net(): Map[(Long, Int), (Long, Long)] =
        spark.table("upsert_mh_stream")
          .groupBy("doc_id", "band")
          .agg(org.apache.spark.sql.functions.expr("sum(delta)").as("n"),
            org.apache.spark.sql.functions.expr("sum(sigv * delta)").as("v"))
          .collect()
          .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("band")) ->
            (r.getAs[Long]("n"), r.getAs[Long]("v"))).toMap
      val afterInsert = net()
      // every signed doc holds exactly one live row per band; the net
      // band values reassemble the batch 16-hash signature exactly
      // (m2b = v div 2^31, m2b+1 = v mod 2^31 — both minima < 2^31)
      assert(batch.nonEmpty && batch.keySet.forall(id =>
        (0 until 8).forall(b => afterInsert.get((id, b)).exists(_._1 == 1L))))
      batch.foreach { case (id, ms) =>
        (0 until 8).foreach { b =>
          val v = afterInsert((id, b))._2
          assert(v / 2147483648L == ms(2 * b) && v % 2147483648L == ms(2 * b + 1),
            s"doc $id band $b signature reassembly")
        }
      }

      // phase 2: update one doc, delete another, no-op a third
      val (uid, utext) = docs.head
      val (did, _) = docs(1)
      val (nid, ntext) = docs(2)
      in.addData(Seq((ts(1), uid, utext + " updated cdc"),
        (ts(1), did, ""), (ts(1), nid, ntext)))
      q.processAllAvailable()
      val after = net()
      val newSig = graft.functions.MinHash.sig(utext + " updated cdc").get
      (0 until 8).foreach { b =>
        assert(after((uid, b))._1 == 1L, s"update leaves one live row, band $b")
        assert(after((did, b))._1 == 0L, s"delete retracts to zero, band $b")
        val v = after((uid, b))._2
        assert(v / 2147483648L == newSig(2 * b) && v % 2147483648L == newSig(2 * b + 1),
          s"updated doc reassembles its NEW signature, band $b")
      }
      // the unchanged re-upsert emitted nothing
      assert(after((nid, 0)) == afterInsert((nid, 0)), "no-op upsert is silent")
    } finally q.stop()
  }
}
