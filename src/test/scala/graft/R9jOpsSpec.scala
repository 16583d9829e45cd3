package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bmp

/** Round-9 batch J: the multimodal RESIZE stage — 2×2 box downsample
  * over the decoded BMP pixels, features over the 4×4 thumbnail.
  * Mirrored in closed form from the embedding components (independent
  * of the decode/resize code path), plus geometry unit witnesses.
  */
class R9jOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("downsample2x: block averages, orientation, floor division") {
    // 8x8 ramp: pixel(y, x) = 16*y + x — every 2x2 block averages to
    // (16*(2r)+2c + 16*(2r)+2c+1 + 16*(2r+1)+2c + 16*(2r+1)+2c+1)/4
    val px = Array.tabulate(64)(i => 16 * (i / 8) + (i % 8))
    val q = Bmp.downsample2x(px, 8)
    assert(q.length == 16)
    for (r <- 0 until 4; c <- 0 until 4)
      assert(q(r * 4 + c) == (16 * 2 * r + 8 + 2 * c), s"cell ($r,$c)")
    // floor: a block of {0,0,0,3} averages to 0, {1,1,1,1} to 1
    val tiny = Array(0, 0, 1, 1, 0, 3, 1, 1) // 4x2 image
    assert(Bmp.downsample2x(tiny, 4).toSeq == Seq(0, 1))
  }

  test("multimodal_bmp_resize: closed-form mirror from the embedding components") {
    Tables.register(spark, TestSpark.Sf)
    val vecs = spark.sql(
      "select label, cast(embedding as array<double>) as e from embeddings").collect()
    val acc = collection.mutable.Map.empty[Long, Array[Long]] // label -> n,psum,hg,vg,ck,br
    vecs.foreach { r =>
      val lb = r.getAs[Int]("label").toLong
      val e = r.getSeq[Double](1)
      def pb(i: Int) = math.min(255, math.max(0, math.floor((e(i) + 1) * 128).toInt))
      def q(rr: Int, cc: Int) =
        (pb(2 * rr * 8 + 2 * cc) + pb(2 * rr * 8 + 2 * cc + 1) +
          pb((2 * rr + 1) * 8 + 2 * cc) + pb((2 * rr + 1) * 8 + 2 * cc + 1)) / 4
      var psum = 0L; var hg = 0L; var vg = 0L; var ck = 0L; var br = 0L
      for (rr <- 0 until 4; cc <- 0 until 4) {
        val v = q(rr, cc)
        psum += v
        if (cc > 0) hg += math.abs(v - q(rr, cc - 1))
        if (rr > 0) vg += math.abs(v - q(rr - 1, cc))
        ck += v.toLong * (1 - 2 * ((rr + cc) % 2))
        if (v >= 128) br += 1
      }
      val a = acc.getOrElseUpdate(lb, Array.fill(6)(0L))
      a(0) += 1; a(1) += psum; a(2) += hg; a(3) += vg; a(4) += ck; a(5) += br
    }
    val got = SparkEntry.queries("multimodal_bmp_resize")(spark, TestSpark.Sf)
      .collect().map(r => r.getAs[Long]("label") -> r).toMap
    assert(got.keySet == acc.keySet)
    acc.foreach { case (lb, a) =>
      val r = got(lb)
      assert(r.getAs[Long]("n_images") == a(0), s"label $lb n")
      assert(r.getAs[Long]("resized_pixel_sum") == a(1), s"label $lb psum")
      assert(r.getAs[Long]("total_hgrad") == a(2), s"label $lb hgrad")
      assert(r.getAs[Long]("total_vgrad") == a(3), s"label $lb vgrad")
      assert(r.getAs[Long]("walsh_checker") == a(4), s"label $lb checker")
      assert(r.getAs[Long]("n_bright") == a(5), s"label $lb bright")
    }
    // resize smooths: thumbnail gradients are bounded by the full-res
    // totals (box averaging is a contraction on adjacent differences)
    val full = SparkEntry.queries("multimodal_bmp_features")(spark, TestSpark.Sf)
      .collect().map(r => r.getAs[Long]("label") ->
        (r.getAs[Long]("total_hgrad"), r.getAs[Long]("total_vgrad"))).toMap
    acc.foreach { case (lb, a) =>
      assert(a(2) <= full(lb)._1 && a(3) <= full(lb)._2, s"label $lb smoothing")
    }
  }
}
