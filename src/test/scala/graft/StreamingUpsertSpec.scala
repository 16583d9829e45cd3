package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Streams
import java.sql.Timestamp

/** Streaming CDC-upsert signature maintenance (the incremental twin of
  * dedup_upsert's batch path): on an insert-only replay of the real
  * corpus the accumulated band state must reassemble EXACTLY the
  * oracle-gated batch `dedup_simhash` signatures, however the stream
  * splits into micro-batches; updates retract the old band rows and
  * assert the new ones; deletes retract to nothing. */
class StreamingUpsertSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def ts(i: Int) = new Timestamp(1704103200000L + i * 1000L)

  test("insert replay reassembles the batch dedup_simhash signatures; updates/deletes retract") {
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val batch = SparkEntry.queries("dedup_simhash")(spark, TestSpark.Sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))

    val in = MemoryStream[(Timestamp, Long, String)]
    val q = Streams.upsertStream(in.toDS())
      .toDF("doc_id", "bb", "bandv", "delta")
      .writeStream.format("memory").queryName("upsert_stream")
      .outputMode("update").start()
    try {
      // phase 1: insert every doc across 3 micro-batches
      for (c <- docs.grouped(docs.length / 3 + 1)) {
        in.addData(c.toSeq.map { case (id, t) => (ts(0), id, t) })
        q.processAllAvailable()
      }
      def net(): Map[(Long, Int), (Long, Long)] =
        spark.table("upsert_stream")
          .groupBy("doc_id", "bb")
          .agg(org.apache.spark.sql.functions.expr("sum(delta)").as("n"),
            org.apache.spark.sql.functions.expr("sum(bandv * delta)").as("v"))
          .collect()
          .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("bb")) ->
            (r.getAs[Long]("n"), r.getAs[Long]("v"))).toMap
      val afterInsert = net()
      // every doc holds exactly one live row per band; the net band
      // values reassemble the batch signature bit for bit
      assert(batch.nonEmpty && batch.keySet.forall(id =>
        (0 until 5).forall(bb => afterInsert.get((id, bb)).exists(_._1 == 1L))))
      batch.foreach { case (id, sig) =>
        val re = (0 until 5).map(bb => afterInsert((id, bb))._2 << (bb * 12)).sum
        assert(re == sig, s"doc $id signature reassembly")
      }

      // phase 2: update one doc, delete another, no-op a third
      val (uid, utext) = docs.head
      val (did, _) = docs(1)
      val (nid, ntext) = docs(2)
      in.addData(Seq((ts(1), uid, utext + " updated cdc"),
        (ts(1), did, ""), (ts(1), nid, ntext)))
      q.processAllAvailable()
      val after = net()
      val newSig = graft.functions.SimHash.sig(utext + " updated cdc")
      (0 until 5).foreach { bb =>
        assert(after((uid, bb))._1 == 1L, s"update leaves one live row, band $bb")
        assert(after((did, bb))._1 == 0L, s"delete retracts to zero, band $bb")
      }
      assert((0 until 5).map(bb => after((uid, bb))._2 << (bb * 12)).sum == newSig,
        "updated doc reassembles its NEW signature")
      // the unchanged re-upsert emitted nothing
      assert(after((nid, 0)) == afterInsert((nid, 0)), "no-op upsert is silent")
    } finally q.stop()
  }

  test("simhash JVM twin matches the SQL signature chain for whitespace-padded text (r11 ADVICE)") {
    import spark.implicits._
    val texts = Seq(
      1L -> "  leading pad tokens here",
      2L -> "trailing pad tokens here   ",
      3L -> "   both  sides   padded text here  ",
      4L -> "no padding four tokens")
    texts.toDF("doc_id", "text").createOrReplaceTempView("pad_docs_sim")
    val sql = new graft.sqlgen.Gen(graft.sqlgen.SparkDialect).simhashSigBuildSql
      .replaceFirst("(?s)^with ", "with documents as (select doc_id, text from pad_docs_sim), ")
    val got = spark.sql(sql).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((id, t) <- texts)
      assert(got(id) == graft.functions.SimHash.sig(t),
        s"doc $id: JVM twin vs SQL chain on padded text")
  }
}
