package graft.operators

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Real (not stubbed) multimodal decode for a pure-JVM, codec-free
  * format: RIFF/WAVE PCM. The container ships no image/audio codec
  * libraries, but WAV needs none — the container format is a chunk
  * walk and the payload is raw little-endian PCM samples, so the full
  * decode path (magic validation → chunk traversal → fmt parse → PCM
  * sample read) runs as plain JVM code inside a batched
  * mapPartitions, the same dataflow the stubbed image/video paths
  * document (operators.Multimodal).
  *
  * The oracle story (graft.sqlgen has no binary columns to check
  * against): media payloads are SYNTHESIZED deterministically from
  * the documents table (sample count = n_chars, rate keyed on doc_id,
  * a closed-form PCM waveform), encoded to real WAV bytes by
  * [[encodePcm16]], then DECODED BACK by the independent [[parse]]
  * chunk-walker. The aggregate stats query over the decoded fields is
  * oracle-checked against DuckDB computing the same stats directly
  * from the generation formula — any header-layout, chunk-size,
  * endianness, or sample-decode bug breaks the hash match (and
  * WavSpec additionally covers chunk-order/malformed-input cases the
  * generator never produces).
  */
object Wav {

  /** Decoded WAV facts: everything downstream stats consume.
    * sampleSum (the sum of all decoded PCM16 samples) is the payload
    * witness — headers alone can't produce it. */
  final case class WavMeta(sampleRate: Int, bitsPerSample: Int,
                           channels: Int, nSamples: Long, byteLen: Long,
                           sampleSum: Long) {
    def durationMs: Long = nSamples * 1000L / sampleRate
  }

  /** Encode mono PCM16 samples as a standard 44-byte-header WAV file
    * (RIFF little-endian, fmt + data chunks). */
  def encodePcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(1) // PCM
    bb.putShort(1) // mono
    bb.putInt(sampleRate)
    bb.putInt(sampleRate * 2) // byte rate
    bb.putShort(2)            // block align
    bb.putShort(16)           // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** True iff the first 12 bytes carry the RIFF/WAVE magics. */
  def isWav(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "WAVE"

  /** Parse a WAV file: validate magics, walk chunks in ANY order
    * (skipping unknown ones, honoring the odd-size pad byte), read the
    * PCM16 fmt header, and decode every data-chunk sample. Throws
    * IllegalArgumentException on malformed input — a decode pipeline
    * must surface corrupt media, not hash it. */
  def parse(bytes: Array[Byte]): WavMeta = {
    require(isWav(bytes), "not a RIFF/WAVE file")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var sampleRate, bits, channels = -1
    var nSamples, sampleSum = 0L
    var sawFmt, sawData = false
    var off = 12
    while (off + 8 <= bytes.length) {
      val id = new String(bytes, off, 4, "US-ASCII")
      val size = bb.getInt(off + 4)
      require(size >= 0 && off + 8 + size <= bytes.length,
        s"chunk '$id' overruns the file (size=$size at offset=$off)")
      id match {
        case "fmt " =>
          require(size >= 16, s"fmt chunk too short: $size")
          val audioFormat = bb.getShort(off + 8).toInt
          require(audioFormat == 1, s"not PCM (audio format $audioFormat)")
          channels = bb.getShort(off + 10).toInt
          sampleRate = bb.getInt(off + 12)
          bits = bb.getShort(off + 22).toInt
          require(channels > 0 && sampleRate > 0, "bad fmt fields")
          require(bits == 16, s"only PCM16 supported, got $bits-bit")
          sawFmt = true
        case "data" =>
          require(sawFmt, "data chunk before fmt chunk")
          require(size % (2 * channels) == 0, s"data size $size not frame-aligned")
          var p = off + 8
          val end = off + 8 + size
          while (p < end) { sampleSum += bb.getShort(p); p += 2 }
          nSamples += size / (2L * channels)
          sawData = true
        case _ => // skip unknown chunk (LIST, INFO, fact, ...)
      }
      off += 8 + size + (size & 1) // chunks are word-aligned
    }
    require(sawFmt && sawData, "missing fmt or data chunk")
    WavMeta(sampleRate, bits, channels, nSamples, bytes.length.toLong, sampleSum)
  }

  // ---------------------------------------------------------------- //
  // Deterministic synthetic corpus (the oracle-checkable generator)
  // ---------------------------------------------------------------- //

  /** Sample rate keyed on doc_id: 8/12/16 kHz. */
  def synthRate(docId: Long): Int = 8000 + (docId % 3).toInt * 4000

  /** Closed-form PCM16 waveform: sample i of doc d is
    * ((d·31 + i·7) mod 65521) − 32760 — integer arithmetic DuckDB can
    * reproduce exactly with generate_series. */
  def synthSamples(docId: Long, n: Int): Array[Short] =
    Array.tabulate(n)(i => (((docId * 31 + i.toLong * 7) % 65521) - 32760).toShort)

  /** The oracle-checked query: synthesize → encode → PARSE (the real
    * chunk-walking decoder) → per-(source, sample_rate) stats. Decode
    * runs batched in mapPartitions (the vectorized-UDF dataflow shape;
    * at 100 TB the same partition-batched loop hosts a real codec
    * call); the aggregation is one map-side-combinable shuffle. */
  def wavStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    graft.Tables.register(spark, dir)
    val docs = spark.table("documents")
      .selectExpr("cast(doc_id as bigint)", "source", "cast(n_chars as int)")
      .as[(Long, String, Int)]
    val decoded = docs.mapPartitions { it =>
      it.grouped(32).flatMap { batch =>
        // one "codec call" per batch — the real-library binding site
        batch.iterator.map { case (docId, source, nChars) =>
          val bytes = encodePcm16(synthRate(docId), synthSamples(docId, nChars))
          val m = parse(bytes)
          (source, m.sampleRate.toLong, m.nSamples, m.durationMs, m.sampleSum, m.byteLen)
        }
      }
    }.toDF("source", "sample_rate", "n_samples", "duration_ms", "sample_sum", "n_bytes")
    decoded.groupBy($"source", $"sample_rate")
      .agg(count(lit(1)).as("n_files"),
        sum($"n_samples").as("total_samples"),
        sum($"duration_ms").as("total_duration_ms"),
        sum($"sample_sum").as("payload_sum"),
        sum($"n_bytes").as("total_bytes"))
  }

  /** Decoded PCM16 samples in file order (mono frame order for the
    * synthetic corpus) — the feature-extraction input. Walks the same
    * chunk layout as [[parse]]; callers run parse first for full
    * validation. */
  def pcmSamples(bytes: Array[Byte]): Array[Short] = {
    require(isWav(bytes), "not a RIFF/WAVE file")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val out = scala.collection.mutable.ArrayBuilder.make[Short]
    var off = 12
    while (off + 8 <= bytes.length) {
      val id = new String(bytes, off, 4, "US-ASCII")
      val size = bb.getInt(off + 4)
      require(size >= 0 && off + 8 + size <= bytes.length, "chunk overrun")
      if (id == "data") {
        // PCM16 invariant: sample data is an even byte count — an odd
        // size would pull the pad byte (or the next chunk header) into
        // the last sample, or read past the buffer on a final chunk
        require((size & 1) == 0, "odd PCM16 data chunk")
        var p = off + 8
        val end = off + 8 + size
        while (p + 2 <= end) { out += bb.getShort(p); p += 2 }
      }
      off += 8 + size + (size & 1)
    }
    out.result()
  }

  /** Classic audio features over decoded PCM — ALL exact integers so
    * the oracle can recompute them from the generation formula with
    * order-free sums: zero-crossing count (the voiced/unvoiced and
    * noisiness workhorse), total energy Σs², and two Walsh sequency
    * correlates B_k = Σ sᵢ·(1 − 2·((i≫k)&1)) (the ±1 square-wave
    * transform — a real sequency-domain feature with none of the
    * float-accumulation ambiguity a DFT would put across the engine
    * boundary). */
  final case class WavFeats(zcr: Long, energy: Long, b2: Long, b4: Long)
  def features(samples: Array[Short]): WavFeats = {
    var zcr = 0L; var en = 0L; var b2 = 0L; var b4 = 0L
    var i = 0
    while (i < samples.length) {
      val s = samples(i).toLong
      en += s * s
      if (i > 0 && ((s >= 0) != (samples(i - 1) >= 0))) zcr += 1
      b2 += s * (1 - 2 * ((i >> 2) & 1))
      b4 += s * (1 - 2 * ((i >> 4) & 1))
      i += 1
    }
    WavFeats(zcr, en, b2, b4)
  }

  /** The oracle-checked FEATURE query: synthesize → encode → decode →
    * per-clip ZCR/energy/Walsh features (real DSP over the decoded
    * payload, not the header) → per-(source, rate) integer census.
    * Same batched-mapPartitions dataflow as [[wavStats]]; at 100 TB
    * the same loop hosts a real feature extractor (librosa/essentia
    * equivalents), and the aggregation stays one combinable shuffle. */
  def wavFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    graft.Tables.register(spark, dir)
    val docs = spark.table("documents")
      .selectExpr("cast(doc_id as bigint)", "source", "cast(n_chars as int)")
      .as[(Long, String, Int)]
    val feats = docs.mapPartitions { it =>
      it.grouped(32).flatMap { batch =>
        batch.iterator.map { case (docId, source, nChars) =>
          val bytes = encodePcm16(synthRate(docId), synthSamples(docId, nChars))
          val m = parse(bytes) // full validation walk
          val f = features(pcmSamples(bytes))
          (source, m.sampleRate.toLong, f.zcr, f.energy, f.b2, f.b4)
        }
      }
    }.toDF("source", "sample_rate", "zcr", "energy", "b2", "b4")
    feats.groupBy($"source", $"sample_rate")
      .agg(count(lit(1)).as("n_files"),
        sum($"zcr").as("total_zcr"),
        sum($"energy").as("total_energy"),
        sum($"b2").as("walsh_b2"),
        sum($"b4").as("walsh_b4"))
  }

  /** DuckDB oracle for [[wavFeatures]]: the same integer features
    * recomputed from the generation formula — agreement proves the
    * decode→feature path reads every sample in order (ZCR is
    * adjacency-sensitive; the Walsh correlates are position-keyed). */
  val wavFeaturesOracleSql: String =
    """with p as (select doc_id, source, n_chars,
      |            8000 + (doc_id % 3) * 4000 as sr from documents),
      |ix as (select doc_id, unnest(generate_series(0, n_chars - 1)) as i from p),
      |sx as (select doc_id, i, (doc_id * 31 + i * 7) % 65521 - 32760 as s from ix),
      |w as (select doc_id, i, s, lag(s) over (partition by doc_id order by i) as ls from sx),
      |f as (select doc_id,
      |        sum(case when i > 0 and ((s >= 0) <> (ls >= 0)) then 1 else 0 end) as zcr,
      |        sum(s * s) as energy,
      |        sum(s * (1 - 2 * ((i // 4) % 2))) as b2,
      |        sum(s * (1 - 2 * ((i // 16) % 2))) as b4
      |      from w group by doc_id),
      |j as (select p.source, p.sr, coalesce(f.zcr, 0) as zcr, coalesce(f.energy, 0) as energy,
      |             coalesce(f.b2, 0) as b2, coalesce(f.b4, 0) as b4
      |      from p left join f on f.doc_id = p.doc_id)
      |select source, cast(sr as bigint) as sample_rate,
      |  cast(count(*) as bigint) as n_files,
      |  cast(sum(zcr) as bigint) as total_zcr,
      |  cast(sum(energy) as bigint) as total_energy,
      |  cast(sum(b2) as bigint) as walsh_b2,
      |  cast(sum(b4) as bigint) as walsh_b4
      |from j group by source, sr""".stripMargin

  /** AM-modulated synthetic voice for the FINGERPRINT key: carrier
    * ((i·7) mod 200 − 100) under a doc-keyed mod-5 envelope. The
    * plain ramp the stats/features keys synthesize is spectrally FLAT
    * within a clip (every frame carries the same energy, so any
    * frame-delta fingerprint degenerates to one bucket — measured:
    * 1 distinct print over 500 clips); the envelope's alignment with
    * the doc-dependent frame length gives each clip a real energy
    * PROFILE (measured: ~92 distinct prints / 500 clips with
    * multi-clip collision groups — an actual dedup census). Still
    * closed-form integer math DuckDB reproduces exactly. */
  def synthSamplesAm(docId: Long, n: Int): Array[Short] =
    Array.tabulate(n) { i =>
      val m = (i.toLong * 7) % 200 - 100
      val env = 1 + (docId * 7 + i.toLong * 3) % 5
      (m * env).toShort
    }

  /** Perceptual audio fingerprint (chromaprint-lite, the time-domain
    * analog of Bmp's image dHash): the decoded clip frames into 16
    * equal windows (frame length = n div 16, the ragged tail ignored
    * — stated), per-frame ENERGY Σs² is exact integer DSP, and bit f
    * of the 15-bit fingerprint is [en(f) > en(f+1)] — adjacent-frame
    * energy DELTAS survive gain changes the way dHash's gradient
    * signs survive brightness shifts. A clip shorter than 16 samples
    * fingerprints as 0 (all frames empty, stated). */
  def fingerprint(samples: Array[Short]): Long = {
    val lf = samples.length / 16
    var fp = 0L
    if (lf > 0) {
      val en = Array.tabulate(16) { f =>
        var s = 0L
        var i = f * lf
        while (i < (f + 1) * lf) { val v = samples(i).toLong; s += v * v; i += 1 }
        s
      }
      var f = 0
      while (f < 15) { if (en(f) > en(f + 1)) fp |= 1L << (14 - f); f += 1 }
    }
    fp
  }

  /** The oracle-checked AUDIO-DEDUP query: synthesize → encode →
    * decode (the real chunk walk) → per-clip fingerprint → exact
    * fingerprint-collision census as a group-size histogram. NO pair
    * join anywhere — the census is two combinable groupBys, so the
    * key is scale-safe even when the fingerprint domain collapses
    * (unlike a banded pair census, whose hot buckets go quadratic);
    * a production near-dup pass would band the same fingerprints
    * through the simhash machinery (stated). The oracle recomputes
    * every fingerprint from the generation formula in closed form —
    * agreement witnesses frame order, energy math, and the bit
    * packing through the real decode path. */
  def audioFingerprint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    graft.Tables.register(spark, dir)
    val docs = spark.table("documents")
      .selectExpr("cast(doc_id as bigint)", "cast(n_chars as int)")
      .as[(Long, Int)]
    val fps = docs.mapPartitions { it =>
      it.grouped(32).flatMap { batch =>
        batch.iterator.map { case (docId, nChars) =>
          val bytes = encodePcm16(synthRate(docId), synthSamplesAm(docId, nChars))
          parse(bytes) // full validation walk
          fingerprint(pcmSamples(bytes))
        }
      }
    }.toDF("fp")
    fps.groupBy($"fp").agg(count(lit(1)).as("gs"))
      .groupBy($"gs").agg(count(lit(1)).as("n_groups"),
        sum($"gs").as("n_clips"))
      .select($"gs".cast("long").as("group_size"),
        $"n_groups".cast("long").as("n_groups"),
        $"n_clips".cast("long").as("n_clips"))
  }

  /** DuckDB oracle for [[audioFingerprint]]: fingerprints recomputed
    * from the generation formula (frame energies over generate_series,
    * adjacent-frame comparison bits, the same MSB-first packing). */
  val audioFingerprintOracleSql: String =
    """with p as (select doc_id, n_chars, n_chars // 16 as lf from documents),
      |fr as (select p.doc_id, p.lf, unnest(generate_series(0, 15)) as f from p where p.lf > 0),
      |ix as (select doc_id, lf, f, unnest(generate_series(f * lf, (f + 1) * lf - 1)) as i from fr),
      |sx as (select doc_id, f, ((i * 7) % 200 - 100) * (1 + (doc_id * 7 + i * 3) % 5) as s from ix),
      |en as (select doc_id, f, sum(s * s) as e from sx group by doc_id, f),
      |bits as (select a.doc_id,
      |           sum(case when a.e > b.e then cast(pow(2, 14 - a.f) as bigint) else 0 end) as fp
      |         from en a join en b on b.doc_id = a.doc_id and b.f = a.f + 1
      |         where a.f < 15 group by a.doc_id),
      |allfp as (select p.doc_id, coalesce(bits.fp, 0) as fp
      |          from p left join bits on bits.doc_id = p.doc_id),
      |grp as (select fp, count(*) as gs from allfp group by fp)
      |select cast(gs as bigint) as group_size,
      |  cast(count(*) as bigint) as n_groups,
      |  cast(sum(gs) as bigint) as n_clips
      |from grp group by gs""".stripMargin

  /** DuckDB oracle for [[wavStats]]: the same stats computed straight
    * from the generation formula — agreement proves the encoder and
    * the independent parser invert each other on every field,
    * including the full PCM payload sum. */
  val wavStatsOracleSql: String =
    """with p as (select doc_id, source, n_chars,
      |            8000 + (doc_id % 3) * 4000 as sr from documents),
      |ix as (select doc_id, unnest(generate_series(0, n_chars - 1)) as i from p),
      |ps as (select doc_id, sum((doc_id * 31 + i * 7) % 65521 - 32760) as psum
      |       from ix group by doc_id),
      |s as (select p.source, p.sr, p.n_chars, coalesce(ps.psum, 0) as psum
      |      from p left join ps on ps.doc_id = p.doc_id)
      |select source, cast(sr as bigint) as sample_rate,
      |  cast(count(*) as bigint) as n_files,
      |  cast(sum(n_chars) as bigint) as total_samples,
      |  cast(sum((n_chars * 1000) // sr) as bigint) as total_duration_ms,
      |  cast(sum(psum) as bigint) as payload_sum,
      |  cast(sum(44 + 2 * n_chars) as bigint) as total_bytes
      |from s group by source, sr""".stripMargin
}
