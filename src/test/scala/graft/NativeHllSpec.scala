package graft

import org.scalatest.funsuite.AnyFunSuite

/** The native TypedImperativeAggregate HLL (`graft_hll`) must equal
  * the pure-SQL sketch chain row for row — same registers, same
  * estimate, same linear-counting gate — including through the
  * partial/merge aggregation path (local[*] splits the word stream
  * across partitions, so merge() is genuinely exercised). */
class NativeHllSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.Sf)

  test("graft_hll equals the SQL sketch per source, bit for bit") {
    def rows(name: String) = run(name).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_exact"), r.getAs[Double]("hll_est"), r.getAs[Double]("rel_err")))
      .toMap
    val native = rows("sketch_distinct_native")
    val sql = rows("sketch_distinct_by_source")
    assert(native.keySet == sql.keySet)
    native.foreach { case (src, v) => assert(v == sql(src), s"source=$src") }
    assert(native.nonEmpty)
  }

  test("sketch_source_overlap: union estimates equal JVM-merged registers for every pair") {
    import graft.streaming.HllSketch
    import spark.implicits._
    val rows = run("sketch_source_overlap").collect()
    assert(rows.length > 1)
    // one register array per source, built in the JVM from the same
    // word stream (insert is idempotent — no distinct needed)
    val regs = scala.collection.mutable.Map[String, Array[Byte]]()
    spark.table("documents")
      .selectExpr("source", "explode(split(lower(text), '\\\\s+')) as wd")
      .as[(String, String)].collect()
      .foreach { case (src, wd) =>
        HllSketch.insert(regs.getOrElseUpdate(src, new Array[Byte](HllSketch.M)), wd)
      }
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("src_a"), r.getAs[String]("src_b"))
      val merged = regs(a).zip(regs(b)).map { case (x, y) => math.max(x, y).toByte }
      assert(r.getAs[Double]("est_union") == HllSketch.estimate(merged), s"($a,$b)")
      // union of sketches can never estimate below either side's floor
      // by more than rounding, and never above the sum
      assert(r.getAs[Double]("est_union") <=
        r.getAs[Double]("est_a") + r.getAs[Double]("est_b") + 1e-6)
      assert(math.abs(r.getAs[Double]("est_overlap") -
        (r.getAs[Double]("est_a") + r.getAs[Double]("est_b") - r.getAs[Double]("est_union"))) < 1e-3)
    }
  }

  test("graft_hll arity error is a plan-time AnalysisException") {
    Tables.register(spark, TestSpark.Sf)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("select graft_hll(text, lang) from documents").collect()
    }
    assert(e.getMessage.contains("graft_hll"))
  }
}
