package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.api.Graft

/** The custom CosineTopK physical operator must produce EXACTLY the
  * rows of the declarative join+window formulation (`vec_topk`). */
class CosineTopKSpec extends AnyFunSuite {
  private lazy val g = Graft(TestSpark.spark, TestSpark.Sf)

  private def rowSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("neighbor_id"),
      r.getAs[Double]("sim"), r.getAs[Long]("rn"))).toSet

  test("native operator matches the declarative top-k exactly") {
    val declarative = rowSet(g.topK)
    val native = rowSet(g.topKNative(10))
    assert(native == declarative)
  }

  test("physical plan contains the custom exec, no join or window") {
    val plan = g.topKNative(10).queryExecution.executedPlan.toString
    assert(plan.contains("CosineTopK")) // exec renders without the Exec suffix
    assert(!plan.contains("Window"))
    assert(!plan.toLowerCase.contains("cartesian"))
  }

  test("k is honored") {
    val rows = g.topKNative(3).collect()
    assert(rows.groupBy(_.getAs[Long]("qid")).values.forall(_.length == 3))
  }

  test("zero-norm vectors produce sim 0.0 instead of crashing") {
    val spark = TestSpark.spark
    import graft.plans.{CosineTopK, CosineTopKStrategy}
    import org.apache.spark.sql.graftbridge.DataFrameBridge
    CosineTopKStrategy.register(spark)
    val corpus = spark.sql(
      """select * from values
        |  (cast(1 as bigint), array(1.0d, 0.0d)),
        |  (cast(2 as bigint), array(0.0d, 0.0d)),
        |  (cast(3 as bigint), array(0.6d, 0.8d)) as t(id, v)""".stripMargin)
    val queries = corpus.where("id = 1")
    val out = DataFrameBridge.ofRows(spark, CosineTopK(2,
      DataFrameBridge.logicalPlan(queries), DataFrameBridge.logicalPlan(corpus)))
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    assert(out(3L) == 0.6 && out(2L) == 0.0) // zero vector ranks by sim 0, no NaN
  }
}
