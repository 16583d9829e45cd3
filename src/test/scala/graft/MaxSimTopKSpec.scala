package graft

import org.scalatest.funsuite.AnyFunSuite

/** The late-interaction serving path's ranking is the bounded-state
  * aggregate, not a |Q|·N window (r10 verdict item 2): search_maxsim's
  * rn ≤ 10 rendering must plan through graft_topk_rows
  * (plans.RewriteWindowTopK → functions.RowTopKAgg — map-side partials
  * keep ≤ 10 rows per query per partition, the exchange carries
  * O(|Q|·10)), and the rewritten rows must equal the window form's. */
class MaxSimTopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def withRewriteOff[T](body: => T): T = {
    spark.conf.set("spark.graft.topkRewrite.maxK", "0")
    try body finally spark.conf.set("spark.graft.topkRewrite.maxK", "100")
  }

  test("search_maxsim plans through graft_topk_rows, identical rows to the window form") {
    val df = SparkEntry.queries("search_maxsim")(spark, TestSpark.Sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_topk_rows"),
      "search_maxsim ranking lost the bounded-state rewrite (map-side partial missing)")
    assert(!plan.contains("Window"),
      "the |Q|·N ranking window survived into search_maxsim's executed plan")
    val got = df.collect().map(_.toString).sorted.toSeq
    val ref = withRewriteOff {
      val d = SparkEntry.queries("search_maxsim")(spark, TestSpark.Sf)
      assert(d.queryExecution.executedPlan.toString.contains("Window"),
        "maxK=0 must disable the rewrite")
      d.collect().map(_.toString).sorted.toSeq
    }
    assert(got == ref && got.nonEmpty)
  }
}
