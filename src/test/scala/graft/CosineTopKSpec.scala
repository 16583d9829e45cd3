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
}
