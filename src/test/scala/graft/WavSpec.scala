package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Multimodal, Wav}
import graft.operators.Multimodal.{MediaMeta, MediaRow}
import java.nio.{ByteBuffer, ByteOrder}

/** Operator #31 (real-decode leg): the RIFF/WAVE PCM16 codec — a real
  * encoder and an INDEPENDENT chunk-walking parser, exercised on
  * inputs the synthetic generator never produces (reordered/unknown
  * chunks, odd-size padding, malformed files). The end-to-end
  * generate→encode→parse→stats path is oracle-checked by the
  * `multimodal_wav_stats` query key. */
class WavSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("encode → parse round-trips every field including the payload sum") {
    val samples = Array.tabulate(1000)(i => ((i * 37) % 65521 - 32760).toShort)
    val m = Wav.parse(Wav.encodePcm16(12000, samples))
    assert(m.sampleRate == 12000 && m.bitsPerSample == 16 && m.channels == 1)
    assert(m.nSamples == 1000L)
    assert(m.sampleSum == samples.map(_.toLong).sum)
    assert(m.durationMs == 1000L * 1000 / 12000)
    assert(m.byteLen == 44 + 2000)
  }

  test("parser walks unknown chunks (with odd-size padding) before data") {
    // RIFF [LIST(5 bytes + pad)] [fmt ] [data] — a layout the encoder
    // never emits but real WAV files do
    val samples = Array[Short](100, -200, 300)
    val fmtData = {
      val b = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      b.putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
      b.array()
    }
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + body.length + (body.length & 1))
        .order(ByteOrder.LITTLE_ENDIAN)
      b.put(id.getBytes("US-ASCII")).putInt(body.length).put(body)
      b.array() // trailing pad byte stays zero
    }
    val data = {
      val b = ByteBuffer.allocate(6).order(ByteOrder.LITTLE_ENDIAN)
      samples.foreach(b.putShort); b.array()
    }
    val body = chunk("LIST", Array[Byte](1, 2, 3, 4, 5)) ++
      chunk("fmt ", fmtData) ++ chunk("data", data)
    val file = {
      val b = ByteBuffer.allocate(12 + body.length).order(ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(4 + body.length)
      b.put("WAVE".getBytes("US-ASCII")).put(body)
      b.array()
    }
    val m = Wav.parse(file)
    assert(m.sampleRate == 8000 && m.nSamples == 3L && m.sampleSum == 200L)
  }

  test("malformed inputs throw instead of hashing garbage") {
    val good = Wav.encodePcm16(8000, Array[Short](1, 2, 3))
    assertThrows[IllegalArgumentException](Wav.parse("nope".getBytes))
    // wrong WAVE magic
    val badMagic = good.clone(); badMagic(8) = 'X'.toByte
    assertThrows[IllegalArgumentException](Wav.parse(badMagic))
    // chunk size overruns the file
    val overrun = good.clone()
    ByteBuffer.wrap(overrun).order(ByteOrder.LITTLE_ENDIAN).putInt(40, 9999)
    assertThrows[IllegalArgumentException](Wav.parse(overrun))
    // truncated: data chunk missing entirely
    assertThrows[IllegalArgumentException](Wav.parse(good.take(36)))
  }

  test("decodeFeatures routes valid WAV bytes through the real parser") {
    import spark.implicits._
    val wavBytes = Wav.encodePcm16(16000, Array.tabulate(800)(i => (i % 100).toShort))
    val rows = Seq(
      MediaRow(0L, "audio", wavBytes, MediaMeta(0, 0, "wav")),
      // declared wav but not RIFF → falls back to the stub, no crash
      MediaRow(1L, "audio", Array.tabulate(64)(_.toByte), MediaMeta(0, 0, "wav")),
      MediaRow(2L, "image", Array.tabulate(64)(_.toByte), MediaMeta(8, 8, "png")))
    val feats = Multimodal.decodeFeatures(spark.createDataset(rows), dim = 8)
      .collect().sortBy(_.media_id)
    // real parse: rate/48k and duration_s/60 come from the header
    assert(math.abs(feats(0).features(0) - 16000f / 48000f) < 1e-6)
    assert(math.abs(feats(0).features(4) - (800L * 1000 / 16000) / 60000f) < 1e-6)
    // stub fallback rows still decode deterministically
    assert(feats(1).features.length == 8 && feats(2).features.length == 8)
    assert(feats(1).features.toSeq == feats(2).features.toSeq) // same bytes → same stub
  }

  test("wavStats parses the whole synthetic corpus and aggregates per (source, rate)") {
    val df = Wav.wavStats(spark, TestSpark.Sf).collect()
    assert(df.nonEmpty)
    val bySource = df.groupBy(_.getString(0))
    // every (source, rate) group decoded some real samples
    assert(df.forall(_.getLong(3) > 0)) // total_samples
    assert(bySource.forall { case (_, rs) => rs.map(_.getLong(1)).distinct.size == rs.size })
  }
}
