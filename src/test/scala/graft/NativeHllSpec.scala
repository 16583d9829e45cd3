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

  test("graft_hll arity error is a plan-time AnalysisException") {
    Tables.register(spark, TestSpark.Sf)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("select graft_hll(text, lang) from documents").collect()
    }
    assert(e.getMessage.contains("graft_hll"))
  }
}
