package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProduct, HllAgg}
import graft.plans.CosineTopKStrategy

/** The idiomatic Spark integration point: enable the whole library on
  * any cluster with
  *
  *   --conf spark.sql.extensions=graft.GraftExtensions
  *
  * which injects the codegen'd `graft_dot` expression into the session
  * catalog and the CosineTopK planner strategy into Catalyst — no
  * imperative register() calls required (the per-session helpers
  * `DotProduct.register` / `CosineTopKStrategy.register` remain for
  * REPL use on an already-built session). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      // arity-checked at plan time: SELECT graft_dot(x) must raise a
      // proper AnalysisException, not an IndexOutOfBoundsException
      (exprs: Seq[Expression]) => DotProduct.build(exprs)))
    ext.injectFunction((
      FunctionIdentifier("graft_hll"),
      new ExpressionInfo(classOf[graft.functions.HllAgg].getName, "graft_hll"),
      (exprs: Seq[Expression]) => HllAgg.build(exprs)))
    ext.injectFunction((
      FunctionIdentifier("graft_cms"),
      new ExpressionInfo(classOf[graft.functions.CmsAgg].getName, "graft_cms"),
      (exprs: Seq[Expression]) => graft.functions.CmsAgg.build(exprs)))
    ext.injectPlannerStrategy(_ => CosineTopKStrategy)
    // rank-window top-k → bounded-state graft_topk_rows aggregate
    // (unchanged SQL, O(groups·k) exchange instead of a full sort)
    ext.injectOptimizerRule(_ => graft.plans.RewriteWindowTopK)
  }
}
