package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Count of strictly-ordered pairs within a group: for a group whose
  * `child` values form the multiset {v: m_v}, returns
  * C(n,2) − Σ_v C(m_v,2) — i.e. |{(i,j): v_i < v_j}|, exactly what a
  * self-join on `a.v < b.v` per group counts, without the join.
  *
  * One shuffle instead of two stacked aggregates (or three join
  * stages): the buffer is a value→multiplicity map, map-side combined,
  * bounded by the per-group distinct count (≤7 for TPC-H linenumbers).
  */
case class PairCountAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LongMap[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pair_count requires an integral column, got ${other.catalogString}")
  }

  private lazy val toLong: Any => Long = child.dataType match {
    case LongType => v => v.asInstanceOf[Long]
    case _ => v => v.asInstanceOf[Int].toLong
  }

  override def createAggregationBuffer(): mutable.LongMap[Long] =
    mutable.LongMap.empty[Long]

  override def update(buf: mutable.LongMap[Long],
      input: InternalRow): mutable.LongMap[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val k = toLong(v)
      buf.update(k, buf.getOrElse(k, 0L) + 1L)
    }
    buf
  }

  override def merge(b1: mutable.LongMap[Long],
      b2: mutable.LongMap[Long]): mutable.LongMap[Long] = {
    b2.foreach { case (k, m) => b1.update(k, b1.getOrElse(k, 0L) + m) }
    b1
  }

  override def eval(buf: mutable.LongMap[Long]): Any = {
    var n = 0L
    var tied = 0L
    buf.foreach { case (_, m) => n += m; tied += m * (m - 1) / 2 }
    n * (n - 1) / 2 - tied
  }

  override def serialize(buf: mutable.LongMap[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.size * 16)
    buf.foreach { case (k, m) => bb.putLong(k); bb.putLong(m) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = mutable.LongMap.empty[Long]
    while (bb.remaining() >= 16) buf.update(bb.getLong(), bb.getLong())
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): PairCountAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): PairCountAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PairCountAgg =
    copy(child = newChildren.head)
}

object PairCountFunctions {
  /** `pairCount(v)`: per-group count of pairs with `v_i < v_j`. */
  def pairCount(v: Column): Column =
    ColumnBridge.column(
      PairCountAgg(ColumnBridge.expression(v)).toAggregateExpression())
}
