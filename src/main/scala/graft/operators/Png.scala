package graft.operators

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater, Inflater}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Real image decode for the third codec-free container: non-interlaced
  * 8-bit truecolor PNG. PNG's only compression is DEFLATE in a zlib
  * wrapper — exactly what `java.util.zip` ships — so unlike jpeg/video
  * (which stay stubbed: no DCT/codec libraries in this container) a
  * full PNG codec is pure JVM. The traps here are different from
  * BMP/WAV's: BIG-endian chunk framing with per-chunk CRC32 over
  * type+data, the IHDR-first / IDAT-concatenation / IEND-last chunk
  * grammar, and above all the per-scanline FILTER layer — every row is
  * delta-coded against its left/up/up-left neighbors by one of five
  * filter types before deflate, and reconstruction must use the
  * RECONSTRUCTED neighbors, not the filtered file bytes.
  *
  * The encoder deliberately cycles the filter type per row
  * (row % 5: None, Sub, Up, Average, Paeth), so the oracle-checked
  * stats query exercises every unfilter branch on every image — a bug
  * in any of the five reconstructions corrupts `total_pixel_sum` and
  * breaks the DuckDB hash match. The encoder and the chunk-walking
  * parser are independent code paths; PngSpec adds multi-IDAT
  * round-trips, CRC corruption, truncation, and grammar violations the
  * generator never produces.
  */
object Png {

  private val Signature: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
  private val Bpp = 3 // bytes per pixel, 8-bit RGB

  final case class PngMeta(width: Int, height: Int, bitDepth: Int,
                           colorType: Int, byteLen: Long, pixelSum: Long,
                           filterSum: Long)

  /** Paeth predictor (PNG spec §9.4): nearest of a (left), b (up),
    * c (up-left) to a + b - c, ties preferring a then b. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def writeChunk(out: ByteArrayOutputStream, typ: String,
                         data: Array[Byte]): Unit = {
    val len = data.length
    out.write(Array((len >>> 24).toByte, (len >>> 16).toByte,
      (len >>> 8).toByte, len.toByte))
    val tb = typ.getBytes("US-ASCII")
    out.write(tb)
    out.write(data)
    val crc = new CRC32()
    crc.update(tb); crc.update(data)
    val c = crc.getValue
    out.write(Array((c >>> 24).toByte, (c >>> 16).toByte,
      (c >>> 8).toByte, c.toByte))
  }

  /** Encode a width×height 8-bit RGB image (row-major, 3 bytes/pixel)
    * as a non-interlaced truecolor PNG. Each scanline is filtered with
    * type row % 5, cycling through all five PNG filters. `idatChunkSize`
    * splits the compressed stream across multiple IDAT chunks (the spec
    * allows any split; parsers must concatenate). */
  def encodeRgb8(width: Int, height: Int, rgb: Array[Byte],
                 idatChunkSize: Int = Int.MaxValue): Array[Byte] = {
    require(width > 0 && height > 0, "bad dimensions")
    require(rgb.length == width * height * Bpp, "pixel byte count mismatch")
    val stride = width * Bpp
    val raw = new Array[Byte]((stride + 1) * height)
    var row = 0
    while (row < height) {
      val ft = row % 5
      raw((stride + 1) * row) = ft.toByte
      var i = 0
      while (i < stride) {
        val x = rgb(row * stride + i) & 0xff
        val a = if (i >= Bpp) rgb(row * stride + i - Bpp) & 0xff else 0
        val b = if (row > 0) rgb((row - 1) * stride + i) & 0xff else 0
        val c = if (row > 0 && i >= Bpp) rgb((row - 1) * stride + i - Bpp) & 0xff else 0
        val f = ft match {
          case 0 => x
          case 1 => x - a
          case 2 => x - b
          case 3 => x - (a + b) / 2
          case 4 => x - paeth(a, b, c)
        }
        raw((stride + 1) * row + 1 + i) = (f & 0xff).toByte
        i += 1
      }
      row += 1
    }
    // zlib-wrapped DEFLATE (Deflater's default framing — what IDAT holds)
    val defl = new Deflater()
    defl.setInput(raw); defl.finish()
    val comp = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!defl.finished()) comp.write(buf, 0, defl.deflate(buf))
    defl.end()
    val out = new ByteArrayOutputStream()
    out.write(Signature)
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(width).putInt(height)
    ihdr.put(8.toByte)  // bit depth
    ihdr.put(2.toByte)  // color type: truecolor
    ihdr.put(0.toByte).put(0.toByte).put(0.toByte) // deflate, adaptive, no interlace
    writeChunk(out, "IHDR", ihdr.array())
    comp.toByteArray.grouped(math.max(1, idatChunkSize))
      .foreach(part => writeChunk(out, "IDAT", part))
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** True iff the first eight bytes are the PNG signature. */
  def isPng(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 && java.util.Arrays.equals(
      java.util.Arrays.copyOf(bytes, 8), Signature)

  private def be32(bytes: Array[Byte], off: Int): Long =
    ((bytes(off) & 0xffL) << 24) | ((bytes(off + 1) & 0xffL) << 16) |
      ((bytes(off + 2) & 0xffL) << 8) | (bytes(off + 3) & 0xffL)

  /** Parse a non-interlaced 8-bit truecolor PNG: validate the
    * signature, walk the chunk stream verifying every CRC32 and the
    * IHDR-first/IEND-last grammar, concatenate IDAT payloads, inflate,
    * and reconstruct every scanline through its filter (all five
    * types), summing the reconstructed pixel bytes (the payload
    * witness) and the filter-type bytes (the proof the per-row filter
    * layer was actually walked). Throws on malformed input. */
  def parse(bytes: Array[Byte]): PngMeta = {
    require(isPng(bytes), "not a PNG file")
    var pos = 8
    var width = 0; var height = 0; var bitDepth = 0; var colorType = 0
    var seenIhdr = false; var seenIend = false
    val idat = new ByteArrayOutputStream()
    while (!seenIend) {
      require(pos + 8 <= bytes.length, "truncated chunk header")
      val len = be32(bytes, pos).toInt
      require(len >= 0 && pos + 12L + len <= bytes.length, "truncated chunk")
      val typ = new String(bytes, pos + 4, 4, "US-ASCII")
      val crc = new CRC32()
      crc.update(bytes, pos + 4, 4 + len)
      require(crc.getValue == be32(bytes, pos + 8 + len),
        s"CRC mismatch in $typ chunk")
      typ match {
        case "IHDR" =>
          require(!seenIhdr, "duplicate IHDR")
          require(pos == 8, "IHDR must be the first chunk")
          require(len == 13, "bad IHDR length")
          width = be32(bytes, pos + 8).toInt
          height = be32(bytes, pos + 12).toInt
          bitDepth = bytes(pos + 16) & 0xff
          colorType = bytes(pos + 17) & 0xff
          val interlace = bytes(pos + 20) & 0xff
          require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
          require(bitDepth == 8 && colorType == 2,
            s"only 8-bit truecolor supported (depth=$bitDepth type=$colorType)")
          require(interlace == 0, "interlaced (Adam7) PNG not supported")
          seenIhdr = true
        case "IDAT" =>
          require(seenIhdr, "IDAT before IHDR")
          idat.write(bytes, pos + 8, len)
        case "IEND" =>
          require(seenIhdr, "IEND before IHDR")
          require(len == 0, "IEND must be empty")
          seenIend = true
        case _ =>
          require(seenIhdr, s"$typ chunk before IHDR")
      }
      pos += 12 + len
    }
    val comp = idat.toByteArray
    require(comp.nonEmpty, "no IDAT data")
    val stride = width * Bpp
    val raw = new Array[Byte]((stride + 1) * height)
    val inf = new Inflater()
    inf.setInput(comp)
    var got = 0
    while (got < raw.length && !inf.finished()) {
      val n = inf.inflate(raw, got, raw.length - got)
      require(n > 0 || !inf.needsInput(), "truncated IDAT stream")
      got += n
    }
    val extra = inf.inflate(new Array[Byte](1))
    inf.end()
    require(got == raw.length && extra == 0,
      s"decompressed length $got != expected ${raw.length}")
    // unfilter: recon uses RECONSTRUCTED neighbors (prev holds row-1)
    val prev = new Array[Int](stride)
    val cur = new Array[Int](stride)
    var pixelSum = 0L
    var filterSum = 0L
    var row = 0
    while (row < height) {
      val ft = raw((stride + 1) * row) & 0xff
      require(ft <= 4, s"bad filter type $ft")
      filterSum += ft
      var i = 0
      while (i < stride) {
        val f = raw((stride + 1) * row + 1 + i) & 0xff
        val a = if (i >= Bpp) cur(i - Bpp) else 0
        val b = if (row > 0) prev(i) else 0
        val c = if (row > 0 && i >= Bpp) prev(i - Bpp) else 0
        val x = ft match {
          case 0 => f
          case 1 => f + a
          case 2 => f + b
          case 3 => f + (a + b) / 2
          case 4 => f + paeth(a, b, c)
        }
        cur(i) = x & 0xff
        pixelSum += cur(i)
        i += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
      row += 1
    }
    PngMeta(width, height, bitDepth, colorType, bytes.length.toLong,
      pixelSum, filterSum)
  }

  /** Oracle-checked query: render each embedding as an 8×8 grayscale-
    * in-RGB PNG (dim d → pixel d, all three channels = the BMP pixel
    * formula byte), decode it back with the independent parser,
    * aggregate per label. The deflate layer makes the encoded byte
    * length content-dependent (not closed-form recomputable), so the
    * oracle witnesses are the RECONSTRUCTED pixel sum (3× the
    * component-byte sum — any filter/unfilter/chunk/CRC bug corrupts
    * it) and the filter-type sum (rows 0..7 cycle 0,1,2,3,4,0,1,2 =
    * 13 per image — proves the scanline filter layer was walked). */
  def pngStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    graft.Tables.register(spark, dir)
    val vecs = spark.table("embeddings")
      .selectExpr("cast(vec_id as bigint)", "cast(label as bigint)",
        "cast(embedding as array<double>)")
      .as[(Long, Long, Seq[Double])]
    val decoded = vecs.mapPartitions { it =>
      it.grouped(64).flatMap { batch =>
        batch.iterator.map { case (id, label, v) =>
          val rgb = new Array[Byte](v.length * 3)
          var d = 0
          while (d < v.length) {
            val g = Bmp.pixelByte(v(d)).toByte
            rgb(3 * d) = g; rgb(3 * d + 1) = g; rgb(3 * d + 2) = g
            d += 1
          }
          val m = parse(encodeRgb8(8, 8, rgb))
          (label, m.width.toLong, m.height.toLong, m.pixelSum, m.filterSum)
        }
      }
    }.toDF("label", "width", "height", "pixel_sum", "filter_sum")
    decoded.groupBy($"label", $"width", $"height")
      .agg(count(lit(1)).as("n_images"),
        sum($"pixel_sum").as("total_pixel_sum"),
        sum($"filter_sum").as("total_filter_sum"))
  }

  /** DuckDB oracle: the same stats straight from the generation
    * formulas — 3 channel bytes per component, filter cycle sum 13 per
    * 8-row image. */
  val pngStatsOracleSql: String =
    """with px as (select label,
      |        unnest(list_transform(cast(embedding as double[]),
      |               v -> least(255, greatest(0, cast(floor((v + 1) * 128) as bigint)))) ) as b
      |      from embeddings),
      |s as (select label, cast(sum(b) as bigint) as comp_sum, cast(count(*) as bigint) as n_comp
      |      from px group by label)
      |select cast(label as bigint) as label, cast(8 as bigint) as width, cast(8 as bigint) as height,
      |  cast(n_comp / 64 as bigint) as n_images,
      |  cast(comp_sum * 3 as bigint) as total_pixel_sum,
      |  cast((n_comp / 64) * 13 as bigint) as total_filter_sum
      |from s""".stripMargin
}
