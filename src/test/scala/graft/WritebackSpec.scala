package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Writeback

/** Operator #20: the distributed overwrite of the watermarked vector
  * table (reference: pg_func.py update_vectors). */
class WritebackSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val out = "target/test-out/stego_table"

  test("writeback writes one row per source vector, dim preserved") {
    val n = Writeback.writeStego(spark, TestSpark.Sf, out)
    val src = Tables.load(spark, TestSpark.Sf, "embeddings").count()
    assert(n == src)
    val back = spark.read.parquet(out)
    assert(back.selectExpr("min(size(embedding))", "max(size(embedding))")
      .head().toSeq == Seq(64, 64))
  }

  test("only carrier vectors changed, and only slightly") {
    Tables.register(spark, TestSpark.Sf)
    spark.read.parquet(out).createOrReplaceTempView("stego_tbl")
    val carriers = SparkEntry.queries("wm_carriers")(spark, TestSpark.Sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val diffs = spark.sql(
      """select s.vec_id,
        |  sqrt(aggregate(zip_with(s.embedding, cast(e.embedding as array<double>),
        |    (x, y) -> (x - y) * (x - y)), cast(0 as double), (a, v) -> a + v)) as l2diff
        |from stego_tbl s join embeddings e on s.vec_id = e.vec_id""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val changed = diffs.filter(_._2 > 1e-5).keySet
    assert(changed == carriers, "exactly the selected carriers changed")
    // round-6 writeback quantization keeps non-carriers within 1e-5
    assert(diffs.values.max < 0.5, "perturbation stays small (cos ~ 1)")
  }
}
