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

  /** STUB decoder for the formats this container has no codec for
    * (jpeg/video — DCT and inter-frame codecs aren't pure JVM): a real
    * build links the library here and decodes `bytes` per
    * `meta.format`; this deterministic fake hashes the payload so
    * tests can assert exact values. WAV, BMP, and PNG payloads do NOT
    * go through this — operators.{Wav,Bmp,Png}.parse are real
    * decoders. */
  private[operators] def stubDecode(bytes: Array[Byte], dim: Int): Array[Float] = {
    val h = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    Array.tabulate(dim)(i => (h(i % 16) & 0xff) / 255.0f)
  }

  /** REAL decode for BMP payloads (operators.Bmp): header + pixel
    * facts as the feature vector — [w/4096, h/4096, bpp/32,
    * mean-pixel/255, log10(1+bytes)/8, 0-padded]. */
  private[operators] def bmpDecode(bytes: Array[Byte], dim: Int): Array[Float] = {
    val m = Bmp.parse(bytes)
    val meanPx = m.pixelSum.toDouble / (3.0 * m.width * m.height) / 255.0
    val fs = Array(m.width / 4096f, m.height / 4096f, m.bitsPerPixel / 32f,
      meanPx.toFloat, (math.log10(1.0 + m.byteLen) / 8).toFloat)
    Array.tabulate(dim)(i => if (i < fs.length) fs(i) else 0f)
  }

  /** REAL decode for WAV payloads (operators.Wav): header + PCM facts
    * as the feature vector — [rate/48k, bits/32, channels/8,
    * log10(1+samples)/8, duration_s/60, mean|sample|/32768, 0-padded]. */
  private[operators] def wavDecode(bytes: Array[Byte], dim: Int): Array[Float] = {
    val m = Wav.parse(bytes)
    val meanAbs = if (m.nSamples == 0) 0f
      else (math.abs(m.sampleSum).toDouble / m.nSamples / 32768.0).toFloat
    val fs = Array(m.sampleRate / 48000f, m.bitsPerSample / 32f,
      m.channels / 8f, (math.log10(1.0 + m.nSamples) / 8).toFloat,
      m.durationMs / 60000f, meanAbs)
    Array.tabulate(dim)(i => if (i < fs.length) fs(i) else 0f)
  }

  /** REAL decode for PNG payloads (operators.Png): header + pixel
    * facts as the feature vector — [w/4096, h/4096, depth/32,
    * mean-pixel/255, log10(1+bytes)/8, filter-mean/4, 0-padded]. */
  private[operators] def pngDecode(bytes: Array[Byte], dim: Int): Array[Float] = {
    val m = Png.parse(bytes)
    val meanPx = m.pixelSum.toDouble / (3.0 * m.width * m.height) / 255.0
    val fs = Array(m.width / 4096f, m.height / 4096f, m.bitDepth / 32f,
      meanPx.toFloat, (math.log10(1.0 + m.byteLen) / 8).toFloat,
      (m.filterSum.toDouble / m.height / 4.0).toFloat)
    Array.tabulate(dim)(i => if (i < fs.length) fs(i) else 0f)
  }

  /** Decode each media payload to a feature vector. Runs batched inside
    * mapPartitions (batchSize rows per decoder call, the vectorized-UDF
    * shape); repartitions by media_id so a skewed source file doesn't
    * serialize the decode. WAV/BMP/PNG payloads take the real parse
    * paths; formats with no in-container codec take the documented
    * stub. */
  def decodeFeatures(ds: Dataset[MediaRow], dim: Int = 8,
                     batchSize: Int = 32): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.repartition(col("media_id"))
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // one "library call" per batch in a real decoder
          batch.iterator.map { r =>
            val feats =
              if (r.meta.format == "wav" && Wav.isWav(r.bytes)) wavDecode(r.bytes, dim)
              else if (r.meta.format == "bmp" && Bmp.isBmp(r.bytes)) bmpDecode(r.bytes, dim)
              else if (r.meta.format == "png" && Png.isPng(r.bytes)) pngDecode(r.bytes, dim)
              else stubDecode(r.bytes, dim)
            MediaFeatures(r.media_id, r.kind, r.bytes.length, feats)
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
