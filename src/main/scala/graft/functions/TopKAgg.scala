package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

/** Native bounded-state per-group top-k aggregate (`graft_topk(id,
  * score, k)`) — the engine-level alternative to the
  * `row_number() over (partition by g order by score desc)` window:
  * a window RANKS every row (the full candidate set shuffles, sorts
  * per group, then gets discarded past k), while this aggregate keeps
  * at most k (id, score) pairs per group PER PARTITION and merges
  * partials pairwise — map-side combine reduces each partition's
  * contribution to ≤ k rows before the exchange, so the shuffle
  * carries O(groups · k) instead of O(N). At 100 TB-scale candidate
  * generation (every ANN refine emits |Q|·probe·rows candidates) this
  * is the difference between a bounded exchange and a sort of the
  * whole candidate stream.
  *
  * Total order: (score DESC, id ASC) — ties at the k boundary break
  * by id, so the result is deterministic under ANY partitioning or
  * merge order (NativeTopkSpec pins partitioning-invariance; the
  * oracle for the serving key `vec_topk_grouped` is the window form
  * rendered for DuckDB). Result: `array<struct<id bigint, score
  * double>>` sorted in rank order (the reference serves ranked id
  * lists from its ANN searches: database/milvus/milvus_func.py:229
  * search → hits[0].ids; this is that contract as an aggregate).
  */
case class TopKAgg(
    idExpr: Expression,
    scoreExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]] {

  private lazy val k: Int = kExpr.eval(InternalRow.empty) match {
    case i: Int  => i
    case l: Long => l.toInt
    case other   => throw new IllegalArgumentException(
      s"graft_topk k must be a foldable integer literal, got $other")
  }

  /** true when a ranks strictly ahead of b: score desc, id asc. */
  @inline private def ahead(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  /** Sort rank-order in place and truncate to k. */
  private def compact(buf: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    val sorted = buf.sortWith(ahead)
    if (sorted.length > k) sorted.take(k) else sorted
  }

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    new ArrayBuffer[(Double, Long)](k + 1)

  override def update(buf: ArrayBuffer[(Double, Long)], input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val idV = idExpr.eval(input)
    val scV = scoreExpr.eval(input)
    if (idV != null && scV != null) {
      buf += ((scV.asInstanceOf[Double], idV.asInstanceOf[Long]))
      // amortized O(n log k): let the buffer grow to 4k, then keep the
      // best k — never more than 4k live entries per group per partition
      if (buf.length >= 4 * k) {
        val kept = compact(buf)
        buf.clear()
        buf ++= kept
      }
    }
    buf
  }

  override def merge(buf: ArrayBuffer[(Double, Long)], other: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    buf ++= other
    val kept = compact(buf)
    buf.clear()
    buf ++= kept
    buf
  }

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any =
    new GenericArrayData(compact(buf).map { case (s, id) =>
      InternalRow(id, s)
    }.toArray[Any])

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val kept = compact(buf)
    val bb = java.nio.ByteBuffer.allocate(4 + kept.length * 16)
    bb.putInt(kept.length)
    kept.foreach { case (s, id) => bb.putDouble(s); bb.putLong(id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[(Double, Long)](n + 1)
    var i = 0
    while (i < n) {
      val s = bb.getDouble; val id = bb.getLong
      buf += ((s, id))
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("id", LongType), StructField("score", DoubleType))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(idExpr, scoreExpr, kExpr)
  override def prettyName: String = "graft_topk"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (idExpr.dataType != LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_topk id must be bigint, got ${idExpr.dataType}")
    else if (scoreExpr.dataType != DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_topk score must be double, got ${scoreExpr.dataType}")
    else if (!kExpr.foldable ||
        !(kExpr.dataType == IntegerType || kExpr.dataType == LongType ||
          kExpr.dataType == ShortType || kExpr.dataType == ByteType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "graft_topk k must be a foldable integer literal")
    else if (k <= 0)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_topk k must be positive, got $k")
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(idExpr = newChildren(0), scoreExpr = newChildren(1), kExpr = newChildren(2))
}

object TopKAgg {
  /** Arity-checked builder (same contract as HllAgg.build). */
  def build(exprs: Seq[Expression]): TopKAgg = {
    if (exprs.length != 3)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> "`graft_topk`",
          "expectedNum" -> "3",
          "actualNum" -> exprs.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))
    TopKAgg(exprs(0), exprs(1), exprs(2))
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_topk", e => build(e), "built-in")
}
