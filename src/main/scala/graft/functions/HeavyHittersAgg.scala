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
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch (Misra & Gries 1982; mergeable form
  * per Agarwal et al., PODS'12) — the frequency member of the sketch
  * family (HLL = distinct, GK = quantiles, MinHash = set overlap): per
  * group, at most `k − 1` counters over an unbounded item stream, with
  * the deterministic guarantee that EVERY item occurring more than
  * N/k times survives, and every surviving estimate undercounts its
  * true frequency by at most N/k. The 100 TB "top words / top hosts /
  * top templates" path: the exact q23-style groupBy shuffles one row
  * per distinct item — vocabulary-sized state — where this aggregate
  * ships k−1 counters per partition and combines map-side.
  *
  * `update` is the textbook rule (increment if tracked, adopt if a
  * slot is free, else decrement all — amortized O(1) per arrival);
  * `merge` sums counters then subtracts the k-th largest sum and
  * drops non-positives (the PODS'12 mergeable reduction, preserving
  * both guarantees under any merge topology). Like any MG instance
  * the surviving ESTIMATES depend on arrival/merge order — the
  * guarantee is what is deterministic, so the driver checks this op
  * rows-only and ScalaTest pins the guarantee itself.
  *
  * Returns `array<struct<item: string, est: bigint>>`, sorted
  * (est desc, item asc) for a stable rendering of one sketch state.
  */
case class HeavyHittersAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k >= 2, s"heavy_hitters k must be >= 2, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"heavy_hitters requires a string item column, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      buf.get(item) match {
        case Some(c) => buf.update(item, c + 1)
        case None if buf.size < k - 1 => buf.update(item, 1L)
        case None =>
          // decrement-all; drop zeros (classic MG step)
          val dead = mutable.ArrayBuffer.empty[String]
          buf.keysIterator.foreach { key =>
            val c = buf(key) - 1
            if (c == 0L) dead += key else buf.update(key, c)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(b1: mutable.HashMap[String, Long],
      b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (item, c) =>
      b1.update(item, b1.getOrElse(item, 0L) + c)
    }
    if (b1.size >= k) {
      // subtract the k-th largest count, drop non-positives: back to
      // <= k-1 counters with the error bound telescoping correctly
      val kth = b1.values.toArray.sorted(Ordering[Long].reverse).apply(k - 1)
      val dead = mutable.ArrayBuffer.empty[String]
      b1.keysIterator.foreach { key =>
        val c = b1(key) - kth
        if (c <= 0L) dead += key else b1.update(key, c)
      }
      dead.foreach(b1.remove)
    }
    b1
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val rows = buf.toArray
      .sortBy { case (item, est) => (-est, item) }
      .map { case (item, est) =>
        InternalRow(UTF8String.fromString(item), est)
      }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (item, c) =>
      val bytes = item.getBytes("UTF-8")
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, "UTF-8"), in.readLong())
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHittersAgg =
    copy(child = newChildren.head)
}

object HeavyHittersFunctions {
  /** `heavyHitters(item, k)`: per-group MG sketch — every item with
    * frequency > N/k survives; estimates undercount by at most N/k.
    */
  def heavyHitters(item: Column, k: Int): Column =
    ColumnBridge.column(
      HeavyHittersAgg(ColumnBridge.expression(item), k).toAggregateExpression())
}
