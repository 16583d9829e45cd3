package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Prf

/** Semantic gates for the native `graft_cms` TypedImperativeAggregate:
  * the aggregated grid equals a JVM replay of every insertion, point
  * queries over the native grid are row-identical to the pure-SQL
  * `sketch_cms` key (same PRF rows, exact integer counts — the
  * property that lets the oracle be the SQL rendering), and the
  * arity check raises a plan-time AnalysisException.
  */
class NativeCmsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val words: Seq[String] = {
    Tables.register(spark, TestSpark.Sf)
    spark.sql("select explode(split(lower(text), '\\\\s+')) as wd from documents")
      .collect().map(_.getString(0)).toSeq
  }

  test("graft_cms grid equals the JVM insertion replay") {
    Tables.register(spark, TestSpark.Sf)
    val grid = spark.sql(
      "select graft_cms(wd) as g from (select explode(split(lower(text), '\\\\s+')) as wd from documents) _w")
      .collect().head.getSeq[Long](0).toArray
    assert(grid.length == 64)
    val expect = new Array[Long](64)
    words.foreach { w =>
      (0 until 4).foreach(r => expect(r * 16 + (Prf.prf("cms", r, w) % 16).toInt) += 1L)
    }
    assert(grid.toSeq == expect.toSeq)
    // every row conserves the total insertion count
    (0 until 4).foreach(r =>
      assert(grid.slice(r * 16, r * 16 + 16).sum == words.size.toLong))
  }

  test("sketch_cms_native point queries are row-identical to the SQL grid key") {
    def rows(name: String): Set[(String, Long, Long, Long)] =
      SparkEntry.queries(name)(spark, TestSpark.Sf).collect().map(r =>
        (r.getAs[String]("word"), r.getAs[Long]("n_exact"),
          r.getAs[Long]("cms_est"), r.getAs[Long]("overestimate"))).toSet
    val native = rows("sketch_cms_native")
    assert(native == rows("sketch_cms"))
    // CMS overestimates, never under
    native.foreach { case (w, _, _, over) => assert(over >= 0L, w) }
  }

  test("graft_cms arity error is a plan-time AnalysisException") {
    Tables.register(spark, TestSpark.Sf)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("select graft_cms(text, lang) from documents").collect()
    }
    assert(e.getMessage.contains("graft_cms"))
  }
}
