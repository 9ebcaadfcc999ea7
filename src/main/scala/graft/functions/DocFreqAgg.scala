package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Per-group row count plus up to `cap` of the grouped values, in ONE
  * map-side-combinable pass: returns `struct(df: bigint, ids:
  * array<bigint>)` where `df` is the exact group size and `ids` holds
  * the first `cap` values seen (merge order, deterministic content-wise
  * only when `df <= cap`, where it is the complete set).
  *
  * Built for the contamination document-frequency cap
  * ([[graft.ops.Contamination.report]]): groups with `df > cap` are
  * dropped downstream, so their id lists are irrelevant — the buffer
  * STOPS collecting at `cap` entries and memory is O(min(df, cap))
  * even for a boilerplate shingle seen in millions of training
  * documents, where `collect_list` would buffer every carrier before
  * the filter could drop the group. Caller contract: values are
  * distinct within a group (true for Contamination's per-(doc,shingle)
  * rows), so `df` doubles as the distinct count and a surviving
  * group's `ids` is its complete carrier set.
  */
case class DocFreqAgg(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DocFreqAgg.Buf] {

  require(cap > 0, s"doc_freq cap must be positive, got $cap")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = DocFreqAgg.resultType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"doc_freq requires an integral id column, got ${other.catalogString}")
  }

  private lazy val toLong: Any => Long = child.dataType match {
    case LongType => v => v.asInstanceOf[Long]
    case _ => v => v.asInstanceOf[Int].toLong
  }

  override def createAggregationBuffer(): DocFreqAgg.Buf = new DocFreqAgg.Buf

  override def update(buf: DocFreqAgg.Buf, input: InternalRow): DocFreqAgg.Buf = {
    val v = child.eval(input)
    if (v != null) {
      buf.n += 1L
      if (buf.ids.length < cap) buf.ids += toLong(v)
    }
    buf
  }

  override def merge(b1: DocFreqAgg.Buf, b2: DocFreqAgg.Buf): DocFreqAgg.Buf = {
    b1.n += b2.n
    val room = cap - b1.ids.length
    if (room > 0) b1.ids ++= b2.ids.take(room)
    b1
  }

  override def eval(buf: DocFreqAgg.Buf): Any =
    InternalRow(buf.n, new GenericArrayData(buf.ids.toArray))

  override def serialize(buf: DocFreqAgg.Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + buf.ids.length * 8)
    bb.putLong(buf.n)
    buf.ids.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): DocFreqAgg.Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new DocFreqAgg.Buf
    buf.n = bb.getLong()
    while (bb.remaining() >= 8) buf.ids += bb.getLong()
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): DocFreqAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DocFreqAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DocFreqAgg =
    copy(child = newChildren.head)
}

object DocFreqAgg {
  /** Mutable (count, capped id list) pair — the aggregation buffer. */
  final class Buf {
    var n: Long = 0L
    val ids: mutable.ArrayBuffer[Long] = mutable.ArrayBuffer.empty[Long]
  }

  val resultType: StructType = StructType(Seq(
    StructField("df", LongType, nullable = false),
    StructField("ids", ArrayType(LongType, containsNull = false),
      nullable = false)))
}

object DocFreqFunctions {
  /** `docFreq(id, cap)`: per-group `struct(df, ids)` with `ids` capped
    * at `cap` entries (complete exactly when `df <= cap`).
    */
  def docFreq(id: Column, cap: Long): Column = {
    val capInt = math.min(cap, Int.MaxValue.toLong).toInt
    ColumnBridge.column(
      DocFreqAgg(ColumnBridge.expression(id), capInt).toAggregateExpression())
  }

  /** `minIds(id, n)`: per-group `struct(df, ids)` with `ids` = the `n`
    * SMALLEST values, sorted ascending — deterministic for ANY group
    * size and arrival order (where [[docFreq]]'s arrival-order cap is
    * content-deterministic only under `df <= cap`).
    */
  def minIds(id: Column, n: Int): Column =
    ColumnBridge.column(
      MinIdsAgg(ColumnBridge.expression(id), n).toAggregateExpression())
}

/** Per-group row count plus the `n` SMALLEST grouped values, sorted
  * ascending, in one map-side-combinable pass: `struct(df: bigint,
  * ids: array<bigint>)`. The bounded deterministic posting list —
  * unlike [[DocFreqAgg]]'s arrival-order cap (content-deterministic
  * only when the group fits the cap) or `slice(array_sort(
  * collect_list(...)))`, which buffers the ENTIRE group before
  * truncating (unbounded state on hot keys — exactly what a posting
  * list for a stopword-grade token would hit at corpus scale), this
  * buffer never exceeds `n` longs per group regardless of group size
  * or merge order. Caller contract: values distinct within a group
  * (rows already unique per (token, doc)), so `df` doubles as the
  * distinct count.
  */
case class MinIdsAgg(
    child: Expression,
    n: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DocFreqAgg.Buf] {

  require(n > 0, s"min_ids n must be positive, got $n")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = DocFreqAgg.resultType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"min_ids requires an integral id column, got ${other.catalogString}")
  }

  private lazy val toLong: Any => Long = child.dataType match {
    case LongType => v => v.asInstanceOf[Long]
    case _ => v => v.asInstanceOf[Int].toLong
  }

  override def createAggregationBuffer(): DocFreqAgg.Buf = new DocFreqAgg.Buf

  /** Insert keeping `buf.ids` sorted ascending and at most `n` long. */
  private def insert(buf: DocFreqAgg.Buf, v: Long): Unit = {
    if (buf.ids.length < n || v < buf.ids.last) {
      // linear insertion point from the tail: postings insert near the
      // end under ascending feeds, and n is small by contract
      var i = buf.ids.length
      while (i > 0 && buf.ids(i - 1) > v) i -= 1
      buf.ids.insert(i, v)
      if (buf.ids.length > n) buf.ids.remove(buf.ids.length - 1)
    }
  }

  override def update(buf: DocFreqAgg.Buf, input: InternalRow): DocFreqAgg.Buf = {
    val v = child.eval(input)
    if (v != null) {
      buf.n += 1L
      insert(buf, toLong(v))
    }
    buf
  }

  override def merge(b1: DocFreqAgg.Buf, b2: DocFreqAgg.Buf): DocFreqAgg.Buf = {
    b1.n += b2.n
    b2.ids.foreach(insert(b1, _))
    b1
  }

  override def eval(buf: DocFreqAgg.Buf): Any =
    InternalRow(buf.n, new GenericArrayData(buf.ids.toArray))

  override def serialize(buf: DocFreqAgg.Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + buf.ids.length * 8)
    bb.putLong(buf.n)
    buf.ids.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): DocFreqAgg.Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new DocFreqAgg.Buf
    buf.n = bb.getLong()
    while (bb.remaining() >= 8) buf.ids += bb.getLong()
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinIdsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinIdsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinIdsAgg =
    copy(child = newChildren.head)
}
