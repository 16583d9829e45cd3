package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.InterpretedOrdering
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

/** Generalized bounded-state per-group top-k over FULL ROWS — the
  * engine half of the `row_number() ≤ k` rewrite
  * (graft.plans.RewriteWindowTopK): where [[TopKAgg]] ranks (id,
  * score) pairs, this keeps the k best COMPLETE payload rows per
  * group under an arbitrary SortOrder list, so any rank-window top-k
  * filter can be substituted without changing its output columns.
  *
  * Exactly the TopKAgg state discipline: map-side partials hold ≤ k
  * records per group per partition (compacted at 4k), partials merge
  * pairwise, so the exchange carries O(groups·k) rows where the
  * window form sorts the full candidate stream. Each record is one
  * UnsafeRow of (sort keys ++ payload): the keys ride along so
  * merge/deserialize never re-evaluate expressions, and serialization
  * is a length-prefixed copy of the row bytes.
  *
  * Tie behavior: records comparing equal under the SortOrders keep
  * arrival order (stable sort) — the same arbitrary-among-ties class
  * as `row_number()` itself, deterministic whenever the ordering is
  * total (the house rankings always tie-break by id). */
case class RowTopKAgg(
    payload: Seq[Expression],
    sortKeys: Seq[SortOrder],
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[UnsafeRow]] {

  private val nSort = sortKeys.length
  private def nFields = nSort + payload.length

  // record = (sort keys ++ payload) projected off the input row once
  @transient private lazy val recordProj =
    UnsafeProjection.create((sortKeys.map(_.child) ++ payload).toArray)

  // rank order over the record's leading key fields
  @transient private lazy val ordering = new InterpretedOrdering(
    sortKeys.zipWithIndex.map { case (so, i) =>
      SortOrder(BoundReference(i, so.child.dataType, so.child.nullable),
        so.direction, so.nullOrdering, Seq.empty)
    })

  // eval emits only the payload fields, in child-output order
  @transient private lazy val payloadProj = UnsafeProjection.create(
    payload.zipWithIndex.map { case (e, i) =>
      BoundReference(nSort + i, e.dataType, e.nullable)
    }.toArray[Expression])

  private def compact(buf: ArrayBuffer[UnsafeRow]): ArrayBuffer[UnsafeRow] = {
    val sorted = buf.sortWith((a, b) => ordering.compare(a, b) < 0)
    if (sorted.length > k) sorted.take(k) else sorted
  }

  override def createAggregationBuffer(): ArrayBuffer[UnsafeRow] =
    new ArrayBuffer[UnsafeRow](k + 1)

  override def update(buf: ArrayBuffer[UnsafeRow], input: InternalRow): ArrayBuffer[UnsafeRow] = {
    buf += recordProj(input).copy()
    // amortized O(n log k): grow to 4k, keep the best k
    if (buf.length >= 4 * k) {
      val kept = compact(buf)
      buf.clear()
      buf ++= kept
    }
    buf
  }

  override def merge(buf: ArrayBuffer[UnsafeRow], other: ArrayBuffer[UnsafeRow]): ArrayBuffer[UnsafeRow] = {
    buf ++= other
    val kept = compact(buf)
    buf.clear()
    buf ++= kept
    buf
  }

  override def eval(buf: ArrayBuffer[UnsafeRow]): Any =
    new GenericArrayData(compact(buf).map(r => payloadProj(r).copy()).toArray[Any])

  override def serialize(buf: ArrayBuffer[UnsafeRow]): Array[Byte] = {
    val kept = compact(buf)
    val parts = kept.map(_.getBytes)
    val bb = java.nio.ByteBuffer.allocate(4 + parts.map(p => 4 + p.length).sum)
    bb.putInt(kept.length)
    parts.foreach { p => bb.putInt(p.length); bb.put(p) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[UnsafeRow] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[UnsafeRow](n + 1)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      val row = new UnsafeRow(nFields)
      row.pointTo(arr, len)
      buf += row
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(payload.zipWithIndex.map { case (e, i) =>
      StructField(s"c$i", e.dataType, e.nullable)
    }),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = payload ++ sortKeys
  // substring-contains "graft_topk": the rewritten plan reads
  // partial_graft_topk_rows / graft_topk_rows at each aggregate mode
  override def prettyName: String = "graft_topk_rows"

  override def withNewMutableAggBufferOffset(newOffset: Int): RowTopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): RowTopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): RowTopKAgg =
    copy(payload = newChildren.take(payload.length),
      sortKeys = newChildren.drop(payload.length).map(_.asInstanceOf[SortOrder]))
}
