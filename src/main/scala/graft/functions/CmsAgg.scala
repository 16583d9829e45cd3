package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native count-min-sketch aggregate (`graft_cms`) — the engine-level
  * form of the SQL grid in `sketch_cms`: the aggregation buffer IS the
  * 4×16 long grid (one flat array, row-major), incremented map-side per
  * input value and MERGED by elementwise addition across partitions —
  * the textbook mergeability that makes CMS the O(grid) answer to
  * frequency monitoring over an unbounded key domain (Cormode &
  * Muthukrishnan 2005). Hash rows use the same keyed PRF as the
  * generated SQL (prf('cms', r, word) % 16, [[Prf.prf]] mirrors the SQL
  * md5 rendering byte-for-byte), and counts are exact integers, so a
  * point query `min_r grid[r][h_r(w)]` over the native grid is
  * BIT-IDENTICAL to the DuckDB oracle's pure-SQL rendering —
  * NativeCmsSpec and the `sketch_cms_native` oracle key pin this.
  *
  * Reference scale story: the reference's monitoring counts exact
  * frequencies in pandas (the analysis scripts' value_counts); at
  * 100 TB the grid is 512 bytes of state per group and the raw keys
  * never shuffle.
  */
case class CmsAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  import CmsAgg.{Rows, W}

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](Rows * W)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.toString
      var r = 0
      while (r < Rows) {
        buf(r * W + (Prf.prf("cms", r, s) % W).toInt) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var j = 0
    while (j < buf.length) { buf(j) += other(j); j += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(Rows * W)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_cms"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_cms expects a string column, got ${child.dataType}")

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsAgg =
    copy(child = newChildren.head)
}

object CmsAgg {
  /** Grid geometry — matches the sketch_cms SQL (4 rows × 16 cols). */
  val Rows = 4
  val W = 16

  /** Arity-checked builder (same contract as HllAgg.build). */
  def build(exprs: Seq[Expression]): CmsAgg = {
    if (exprs.length != 1)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> "graft_cms",
          "expectedNum" -> "1",
          "actualNum" -> exprs.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))
    CmsAgg(exprs.head)
  }

  // the bare AggregateFunction: the analyzer wraps it in an
  // AggregateExpression (ResolveFunctions), same as built-in aggs
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cms", e => build(e), "built-in")
}
