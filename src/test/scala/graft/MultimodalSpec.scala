package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaMeta, MediaRow}

/** Operator #31: multimodal binary-column plumbing — typed schema,
  * partitioned batched decode, frame sampling. The decode itself is a
  * documented stub (no codecs in this container); the dataflow is real. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def rows(n: Int): Seq[MediaRow] =
    (0 until n).map { i =>
      MediaRow(i.toLong, if (i % 2 == 0) "image" else "audio",
        Array.tabulate(64 + i)(j => ((i * 31 + j) % 251).toByte),
        MediaMeta(640, 480, if (i % 2 == 0) "png" else "wav"))
    }

  test("binary columns round-trip through the Dataset schema") {
    import spark.implicits._
    val ds = spark.createDataset(rows(10))
    val schema = ds.schema
    assert(schema("bytes").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    val back = ds.collect().sortBy(_.media_id)
    assert(back(3).bytes.toSeq == rows(10)(3).bytes.toSeq)
  }

  test("batched decode emits one deterministic feature row per media") {
    import spark.implicits._
    val ds = spark.createDataset(rows(100))
    val feats = Multimodal.decodeFeatures(ds, dim = 8, batchSize = 16)
      .collect().sortBy(_.media_id)
    assert(feats.length == 100)
    assert(feats.forall(_.features.length == 8))
    // deterministic: same bytes -> same features, independent of
    // partitioning/batch boundaries
    val again = Multimodal.decodeFeatures(
      spark.createDataset(rows(100)).repartition(7), dim = 8, batchSize = 3)
      .collect().sortBy(_.media_id)
    assert(feats.zip(again).forall { case (a, b) =>
      a.features.toSeq == b.features.toSeq && a.n_bytes == b.n_bytes })
  }

  test("frame sampling covers the payload in order") {
    import spark.implicits._
    val ds = spark.createDataset(rows(4))
    val frames = Multimodal.sampleFrames(ds, n = 4).collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(frames.keySet == (0 until 4).map(_.toLong).toSet)
    val reassembled = frames(2L).flatMap(_._3)
    assert(reassembled.toSeq == rows(4)(2).bytes.toSeq.take(reassembled.length))
  }
}
