package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native KMV (K-minimum-values / bottom-k) distinct sketch
  * (`graft_kmv(hash, k)`) — the fourth TypedImperativeAggregate in the
  * family (graft_hll registers, graft_topk shortlists, graft_cms
  * grids): the aggregation buffer IS the bounded set of the k smallest
  * DISTINCT hash values, updated map-side with an early-reject against
  * the current kth value and merged as a capped set union, so a
  * distinct sketch costs O(k) state per group where the SQL window
  * rendering ranks the full per-group hash stream. The buffer content
  * is a pure FUNCTION of the input SET (insertion order cannot change
  * which k values are smallest), so the result is partitioning- and
  * order-invariant by construction — `sketch_kmv_native` hash-matches
  * the DuckDB oracle's pure-SQL window rendering, and NativeKmvSpec
  * pins equality at 1/7/32 partitions.
  *
  * Returns the retained hashes as an ASCENDING array<bigint> (the
  * serialized sketch itself — downstream SQL reads the kth value for
  * the estimator and the size for the small-set exact branch, and two
  * sketches union by merging arrays, the KMV set algebra).
  */
case class KmvAgg(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  private lazy val k: Int = {
    val v = kExpr.eval(InternalRow.empty)
    require(v != null, "graft_kmv: k must be a non-null literal")
    val kk = v.asInstanceOf[Number].intValue
    require(kk >= 1 && kk <= (1 << 20), s"graft_kmv: k out of range [1, 2^20]: $kk")
    kk
  }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit =
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last && !buf.contains(v)) { buf.add(v); buf.remove(buf.last); () }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child, kExpr)
  override def prettyName: String = "graft_kmv"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType != LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_kmv expects a bigint hash column, got ${child.dataType}")
    else if (!(kExpr.foldable && (kExpr.dataType == IntegerType || kExpr.dataType == LongType)))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "graft_kmv expects a foldable integer k")
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvAgg =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

object KmvAgg {
  def build(exprs: Seq[Expression]): KmvAgg = {
    if (exprs.length != 2)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> "`graft_kmv`",
          "expectedNum" -> "2",
          "actualNum" -> exprs.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))
    KmvAgg(exprs(0), exprs(1))
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_kmv", e => build(e), "built-in")
}
