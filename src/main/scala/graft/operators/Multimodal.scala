package graft.operators

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.col

/** Multimodal column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with a typed metadata struct, and per-row
  * decode/feature-extraction runs as a BATCHED per-partition map — the
  * same dataflow shape as a vectorized (Arrow/pandas) UDF, which is how
  * this would bind to a real decoder at 100 TB (decode cost dominates,
  * so batching amortizes library-call overhead and the partitioning
  * keys by media_id for even work distribution).
  *
  * The decode itself is a clearly-marked deterministic STUB: no
  * image/audio codecs exist in this container. Everything Spark-side —
  * schema, encoders, repartitioning, batch shape — is real and tested.
  */
object Multimodal {
  case class MediaMeta(width: Int, height: Int, format: String)
  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte],
                      meta: MediaMeta)
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                           features: Array[Float])

  /** STUB decoder: a real build links an image/audio library here and
    * decodes `bytes` per `meta.format`; this deterministic fake hashes
    * the payload so tests can assert exact values. */
  private[operators] def stubDecode(bytes: Array[Byte], dim: Int): Array[Float] = {
    val h = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    Array.tabulate(dim)(i => (h(i % 16) & 0xff) / 255.0f)
  }

  /** Decode each media payload to a feature vector. Runs batched inside
    * mapPartitions (batchSize rows per decoder call, the vectorized-UDF
    * shape); repartitions by media_id so a skewed source file doesn't
    * serialize the decode. */
  def decodeFeatures(ds: Dataset[MediaRow], dim: Int = 8,
                     batchSize: Int = 32): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.repartition(col("media_id"))
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // one "library call" per batch in a real decoder
          batch.iterator.map { r =>
            MediaFeatures(r.media_id, r.kind, r.bytes.length,
              stubDecode(r.bytes, dim))
          }
        }
      }
  }

  /** Frame sampling for video payloads: pick n deterministic byte-range
    * "frames". A real build would seek keyframes via the container
    * index; the byte-chunk split is the STUB stand-in. */
  def sampleFrames(ds: Dataset[MediaRow], n: Int = 4): Dataset[(Long, Int, Array[Byte])] = {
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      val step = math.max(1, r.bytes.length / n)
      (0 until n).iterator.map { i =>
        val from = math.min(i * step, r.bytes.length)
        val until = math.min(from + step, r.bytes.length)
        (r.media_id, i, r.bytes.slice(from, until))
      }
    }
  }
}
