package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import graft.streaming.HllSketch

/** Native HyperLogLog distinct-estimate aggregate (`graft_hll`) —
  * the engine-level form of the SQL sketch in
  * `sketch_distinct_by_source`: the aggregation buffer IS the m = 256
  * register array, updated map-side, MERGED register-wise across
  * partitions (TypedImperativeAggregate gives the partial/final split
  * for free), so a distinct estimate costs O(m) state per group where
  * a count-distinct shuffles every raw value. This is the
  * DataSketches-style integration shape Spark reserves for sketch
  * aggregates — exercised here with math that is BIT-IDENTICAL to the
  * generated SQL chain ([[graft.streaming.HllSketch]] mirrors the
  * keyed 60-bit hash, register split, unrolled-integer rho, ordered
  * register fold, alpha literal, Spark round semantics, and the
  * canonical linear-counting gate; StreamingSketchSpec +
  * NativeHllSpec pin the equality), so the native aggregate's output
  * hash-matches the DuckDB oracle's pure-SQL rendering.
  */
case class HllAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  override def createAggregationBuffer(): Array[Byte] =
    new Array[Byte](HllSketch.M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) HllSketch.insert(buf, v.toString)
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var j = 0
    while (j < buf.length) {
      if (other(j) > buf(j)) buf(j) = other(j)
      j += 1
    }
    buf
  }

  override def eval(buf: Array[Byte]): Any = HllSketch.estimate(buf)

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_hll"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_hll expects a string column, got ${child.dataType}")

  override def withNewMutableAggBufferOffset(newOffset: Int): HllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllAgg =
    copy(child = newChildren.head)
}

object HllAgg {
  /** Arity-checked builder (same contract as DotProduct.build). */
  def build(exprs: Seq[Expression]): HllAgg = {
    if (exprs.length != 1)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> "`graft_hll`",
          "expectedNum" -> "1",
          "actualNum" -> exprs.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))
    HllAgg(exprs.head)
  }

  // the bare AggregateFunction: the analyzer wraps it in an
  // AggregateExpression (ResolveFunctions), same as built-in aggs
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hll", e => build(e), "built-in")
}
