package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.{col, expr}
import graft.functions.Prf

/** Gates for the native KMV bottom-k sketch (functions.KmvAgg):
  * content equality with the JVM k-smallest-distinct mirror,
  * partitioning invariance (the buffer is a pure function of the
  * input SET), the small-set exact branch, and the capped merge. */
class NativeKmvSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("graft_kmv reproduces the k smallest distinct hashes at 1/7/32 partitions") {
    Tables.register(spark, TestSpark.Sf)
    val words = spark.sql(
      "select source, wd from (select source, split(lower(text), '\\\\s+') as ws from documents) " +
        "lateral view explode(ws) _e as wd")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val expected = words.groupBy(_._1).view.mapValues { vs =>
      vs.map(v => Prf.prf("kmv", v._2)).distinct.sorted.take(64).toSeq
    }.toMap
    val base = spark.sql(
      "select distinct source, cast(conv(substr(md5(concat_ws(':', 'kmv', wd)), 1, 15), 16, 10) as bigint) as h " +
        "from (select source, split(lower(text), '\\\\s+') as ws from documents) " +
        "lateral view explode(ws) _e as wd")
    for (parts <- Seq(1, 7, 32)) {
      val rows = base.repartition(parts, col("h"))
        .groupBy("source").agg(expr("graft_kmv(h, 64)").as("mins"))
        .collect()
      assert(rows.length == expected.size, s"parts=$parts")
      rows.foreach { r =>
        val src = r.getString(0)
        assert(r.getSeq[Long](1) == expected(src), s"parts=$parts source=$src")
      }
    }
  }

  test("small-set branch: k larger than the distinct count returns the whole set, est exact") {
    Tables.register(spark, TestSpark.Sf)
    import spark.implicits._
    val df = Seq(("a", 10L), ("a", 3L), ("a", 3L), ("a", 7L), ("b", 5L))
      .toDF("g", "h")
    val rows = df.groupBy("g").agg(expr("graft_kmv(h, 16)").as("mins"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(rows("a") == Seq(3L, 7L, 10L)) // distinct, ascending
    assert(rows("b") == Seq(5L))
  }

  test("capped update: only the k smallest survive, duplicates never evict") {
    Tables.register(spark, TestSpark.Sf)
    import spark.implicits._
    val vals = Seq(9L, 1L, 8L, 1L, 7L, 2L, 9L, 3L, 6L, 2L)
    val df = vals.map(("g", _)).toDF("g", "h").repartition(3)
    val r = df.groupBy("g").agg(expr("graft_kmv(h, 4)").as("mins")).collect().head
    assert(r.getSeq[Long](1) == Seq(1L, 2L, 3L, 6L))
  }

  test("sketch_kmv curve: monotone k-levels and the small-set exact law") {
    val rows = SparkEntry.queries("sketch_kmv")(spark, TestSpark.Sf).collect()
    val bySrc = rows.groupBy(_.getAs[String]("source"))
    bySrc.foreach { case (src, rs) =>
      assert(rs.map(_.getAs[Long]("k")).sorted.toSeq == Seq(16L, 64L, 256L), src)
      rs.foreach { r =>
        val k = r.getAs[Long]("k")
        val nk = r.getAs[Long]("n_sketch")
        val nEx = r.getAs[Long]("n_exact")
        assert(nk == math.min(k, nEx), s"$src k=$k")
        if (nk < k) // sketch saw everything: the estimate IS the exact count
          assert(r.getAs[Double]("kmv_est") == nEx.toDouble, s"$src k=$k")
      }
      // kth hash shrinks as k shrinks (smaller shortlist = smaller max)
      val hs = rs.sortBy(_.getAs[Long]("k")).map(_.getAs[Long]("kth_hash"))
      assert(hs.zip(hs.tail).forall { case (a, b) => a <= b }, src)
    }
  }
}
