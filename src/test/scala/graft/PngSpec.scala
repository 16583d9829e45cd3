package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Multimodal, Png}
import graft.operators.Multimodal.{MediaMeta, MediaRow}

/** Operator #31 (image leg 2): the non-interlaced 8-bit truecolor PNG
  * codec — real deflate-backed encoder + independent chunk-walking
  * parser. The encoder cycles all five scanline filters (row % 5), so
  * every round-trip here and every image in the oracle-checked
  * `multimodal_png_stats` exercises every unfilter branch; this spec
  * adds the shapes the generator never produces (multi-IDAT splits,
  * CRC corruption, truncation, grammar violations, interlace/palette
  * rejection). */
class PngSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def rgbGradient(w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h * 3)(i => ((i * 7 + 3) % 256).toByte)

  test("encode → parse round-trips dimensions, pixel sum, and the filter cycle") {
    val rgb = rgbGradient(8, 8)
    val m = Png.parse(Png.encodeRgb8(8, 8, rgb))
    assert(m.width == 8 && m.height == 8)
    assert(m.bitDepth == 8 && m.colorType == 2)
    assert(m.pixelSum == rgb.map(_ & 0xff).map(_.toLong).sum)
    // rows 0..7 carry filters 0,1,2,3,4,0,1,2
    assert(m.filterSum == 13)
  }

  test("all five filters reconstruct on a non-square high-entropy image") {
    // 5 rows => every filter type exactly once; width 7 keeps the
    // left-neighbor offset (3 bytes) unaligned with the row stride
    val rnd = new scala.util.Random(42)
    val rgb = Array.fill(7 * 5 * 3)(rnd.nextInt(256).toByte)
    val m = Png.parse(Png.encodeRgb8(7, 5, rgb))
    assert(m.width == 7 && m.height == 5)
    assert(m.pixelSum == rgb.map(_ & 0xff).map(_.toLong).sum)
    assert(m.filterSum == 0 + 1 + 2 + 3 + 4)
  }

  test("parser concatenates split IDAT chunks") {
    val rgb = rgbGradient(16, 16)
    val whole = Png.encodeRgb8(16, 16, rgb)
    val split = Png.encodeRgb8(16, 16, rgb, idatChunkSize = 7)
    assert(split.length > whole.length) // more chunk framing overhead
    val m = Png.parse(split)
    assert(m.pixelSum == Png.parse(whole).pixelSum)
    assert(m.width == 16 && m.height == 16)
  }

  test("malformed inputs throw instead of decoding garbage") {
    val good = Png.encodeRgb8(4, 4, rgbGradient(4, 4))
    // wrong signature
    assertThrows[IllegalArgumentException](Png.parse("NOTPNG!!".getBytes ++ good.drop(8)))
    // truncated mid-chunk
    assertThrows[IllegalArgumentException](Png.parse(good.take(good.length - 6)))
    // corrupt one IDAT payload byte -> CRC must catch it
    val corrupt = good.clone()
    corrupt(8 + 25 + 8 + 3) = (corrupt(8 + 25 + 8 + 3) ^ 0x55).toByte
    assertThrows[IllegalArgumentException](Png.parse(corrupt))
    // interlaced flag set (with CRC fixed up) must be rejected, not
    // mis-decoded: rebuild the IHDR chunk by hand
    val interlaced = good.clone()
    interlaced(8 + 8 + 12) = 1 // interlace byte, last of the 13 IHDR bytes
    val crc = new java.util.zip.CRC32()
    crc.update(interlaced, 8 + 4, 4 + 13)
    val c = crc.getValue
    val crcOff = 8 + 8 + 13
    interlaced(crcOff) = (c >>> 24).toByte
    interlaced(crcOff + 1) = (c >>> 16).toByte
    interlaced(crcOff + 2) = (c >>> 8).toByte
    interlaced(crcOff + 3) = c.toByte
    assertThrows[IllegalArgumentException](Png.parse(interlaced))
  }

  test("decodeFeatures routes valid PNG bytes through the real parser") {
    import spark.implicits._
    val pngBytes = Png.encodeRgb8(8, 8, Array.fill(192)(102.toByte))
    val rows = Seq(
      MediaRow(0L, "image", pngBytes, MediaMeta(8, 8, "png")),
      MediaRow(1L, "image", Array.tabulate(64)(_.toByte), MediaMeta(8, 8, "png")))
    val feats = Multimodal.decodeFeatures(spark.createDataset(rows), dim = 8)
      .collect().sortBy(_.media_id)
    assert(math.abs(feats(0).features(0) - 8f / 4096f) < 1e-7)
    assert(math.abs(feats(0).features(3) - 102f / 255f) < 1e-6) // mean pixel
    assert(math.abs(feats(0).features(5) - (13.0 / 8 / 4).toFloat) < 1e-6) // filter mean
    assert(feats(1).features.length == 8) // non-PNG bytes: stub path intact
  }

  test("multimodal_png_stats matches the closed-form witnesses at sf0.001") {
    val rows = SparkEntry.queries("multimodal_png_stats")(spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_images")
      assert(r.getAs[Long]("width") == 8 && r.getAs[Long]("height") == 8)
      assert(r.getAs[Long]("total_filter_sum") == 13 * n)
    }
  }
}
