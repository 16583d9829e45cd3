package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product over two array<double> columns.
  *
  * Replaces `aggregate(zip_with(a, b, (x, y) -> x * y), 0d, (s, v) ->
  * s + v)`: the higher-order-function chain allocates an intermediate
  * array per row and evaluates lambdas interpretively; this expression
  * is a single fused loop that participates in whole-stage codegen —
  * the hot inner op of every pairwise-vector query (kNN sims, top-k,
  * recall, near-dup cosine).
  *
  * Summation is a strict left-to-right fold, bit-identical to the HOF
  * form and to the DuckDB oracle's list_reduce rendering (IEEE: 0.0 + x
  * == x), so swapping it in changes no query output.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // generated SQL always passes array<double> (the nv CTE casts), so a
  // plain type assertion replaces ExpectsInputTypes coercion
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == ArrayType(DoubleType)) ||
      Seq(left, right).forall(e => e.dataType.isInstanceOf[ArrayType] &&
        e.dataType.asInstanceOf[ArrayType].elementType == DoubleType)
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects two array<double>, got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toDoubleArray()
    val y = b.asInstanceOf[ArrayData].toDoubleArray()
    val n = math.min(x.length, y.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += x(i) * y(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double ${ev.value}_acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}_acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = ${ev.value}_acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Arity-checked builder shared by the session-registry and
    * SparkSessionExtensions registration paths: wrong arity raises a
    * plan-time AnalysisException, not IndexOutOfBoundsException. */
  def build(exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): DotProduct = {
    if (exprs.length != 2)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> "`graft_dot`",
          "expectedNum" -> "2",
          "actualNum" -> exprs.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))
    DotProduct(exprs.head, exprs(1))
  }

  /** Register `graft_dot` in a session's function registry so generated
    * SQL can call it (Tables.register does this for every session the
    * driver hands us). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", build, "built-in")
}
