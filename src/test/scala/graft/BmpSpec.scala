package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Bmp, Multimodal}
import graft.operators.Multimodal.{MediaMeta, MediaRow}
import java.nio.{ByteBuffer, ByteOrder}

/** Operator #31 (image leg): the uncompressed 24-bit BMP codec — real
  * encoder + independent parser, exercised on the layouts the
  * synthetic generator never produces (padded strides, malformed
  * headers). The end-to-end render→encode→parse→stats path is
  * oracle-checked by `multimodal_bmp_stats`. */
class BmpSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("encode → parse round-trips dimensions and the pixel payload sum") {
    val gray = Array.tabulate(64)(i => (i * 4).toByte)
    val m = Bmp.parse(Bmp.encode24(8, 8, gray))
    assert(m.width == 8 && m.height == 8 && m.bitsPerPixel == 24)
    assert(m.pixelSum == 3L * gray.map(_ & 0xff).sum)
    assert(m.byteLen == 54 + 8 * 8 * 3) // stride 24 needs no padding
  }

  test("parser honors 4-byte row padding on non-aligned widths") {
    // width 3 -> raw row 9 bytes -> stride 12 (3 pad bytes per row)
    val gray = Array.tabulate(6)(i => (10 * (i + 1)).toByte)
    val bytes = Bmp.encode24(3, 2, gray)
    assert(bytes.length == 54 + 12 * 2)
    val m = Bmp.parse(bytes)
    assert(m.width == 3 && m.height == 2)
    // pad bytes must NOT leak into the sum
    assert(m.pixelSum == 3L * gray.map(_ & 0xff).sum)
  }

  test("malformed inputs throw instead of decoding garbage") {
    val good = Bmp.encode24(3, 2, Array.tabulate(6)(_.toByte))
    assertThrows[IllegalArgumentException](Bmp.parse("XX".getBytes ++ good.drop(2)))
    assertThrows[IllegalArgumentException](Bmp.parse(good.take(40)))
    // header claiming pixel data beyond the file
    val overrun = good.clone()
    ByteBuffer.wrap(overrun).order(ByteOrder.LITTLE_ENDIAN).putInt(18, 4096)
    assertThrows[IllegalArgumentException](Bmp.parse(overrun))
    // 8-bit palette BMPs are out of scope and must be rejected, not
    // mis-summed
    val bpp8 = good.clone()
    ByteBuffer.wrap(bpp8).order(ByteOrder.LITTLE_ENDIAN).putShort(28, 8)
    assertThrows[IllegalArgumentException](Bmp.parse(bpp8))
  }

  test("decodeFeatures routes valid BMP bytes through the real parser") {
    import spark.implicits._
    val bmpBytes = Bmp.encode24(8, 8, Array.fill(64)(102.toByte))
    val rows = Seq(
      MediaRow(0L, "image", bmpBytes, MediaMeta(8, 8, "bmp")),
      MediaRow(1L, "image", Array.tabulate(64)(_.toByte), MediaMeta(8, 8, "png")))
    val feats = Multimodal.decodeFeatures(spark.createDataset(rows), dim = 8)
      .collect().sortBy(_.media_id)
    assert(math.abs(feats(0).features(0) - 8f / 4096f) < 1e-7)
    assert(math.abs(feats(0).features(3) - 102f / 255f) < 1e-6) // mean pixel
    assert(feats(1).features.length == 8) // stub path intact
  }

  test("bmpStats decodes the rendered corpus and matches embedding-derived sums") {
    val rows = Bmp.bmpStats(spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(1) == 8 && r.getLong(2) == 8))
    assert(rows.forall(_.getLong(4) > 0)) // total_pixel_sum
  }

  test("pixels() inverts encode24, un-flipping the bottom-up row order") {
    val gray = Array.tabulate(64)(i => (i * 3 + 7).toByte) // every pixel distinct
    val decoded = Bmp.pixels(Bmp.encode24(8, 8, gray))
    assert(decoded.toSeq == gray.map(_ & 0xff).toSeq,
      "decoded pixels must come back in image order, not file (bottom-up) order")
    // a non-multiple-of-4 stride exercises the row padding too
    val g5 = Array.tabulate(15)(i => (200 - i).toByte) // 5x3, stride 16 != 15
    assert(Bmp.pixels(Bmp.encode24(5, 3, g5)).toSeq == g5.map(_ & 0xff).toSeq)
  }

  test("features are decode-order witnesses: vgrad sees vertical structure, checker sees position") {
    // two horizontal bands: rows 0-3 = 0, rows 4-7 = 100
    val bands = Array.tabulate(64)(i => if (i / 8 < 4) 0.toByte else 100.toByte)
    val f = Bmp.features(Bmp.pixels(Bmp.encode24(8, 8, bands)), 8)
    assert(f.hgrad == 0L) // rows are flat
    assert(f.vgrad == 8L * 100L) // one band boundary, 8 columns
    assert(f.checker == 0L) // balanced checkerboard on constant bands
    // a vertical stripe image transposes the gradients
    val stripes = Array.tabulate(64)(i => if (i % 8 < 4) 0.toByte else 100.toByte)
    val g = Bmp.features(Bmp.pixels(Bmp.encode24(8, 8, stripes)), 8)
    assert(g.vgrad == 0L && g.hgrad == 8L * 100L)
  }

  test("bmpFeatures aggregates the decoded-feature corpus per label") {
    val rows = Bmp.bmpFeatures(spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("n_images") > 0))
    // gradients of real (non-constant) images are strictly positive
    assert(rows.forall(_.getAs[Long]("total_hgrad") > 0))
    assert(rows.forall(_.getAs[Long]("total_vgrad") > 0))
  }
}
