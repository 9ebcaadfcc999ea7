package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** One per-subspace PQ codebook: cell ids ASCENDING (the tie-break
  * order) with centroids in MILLI-grid integer units (1000× the x79
  * `floor(x*1000)` grid, so a grid coordinate scales to the centroid
  * domain by an exact ×1000).
  */
final case class PqBook(cells: Array[Long], cents: Array[Array[Long]])
  extends Serializable {
  require(cells.length == cents.length, "cells/cents length mismatch")
  require(cells.toSeq == cells.toSeq.sorted,
    "PqBook cells must be ascending (argmin ties break to the smallest)")
}

/** PQ assignment kernel ([[graft.ops.Similarity.pqTopK]]): nearest
  * codebook cell per subspace under squared L2 in EXACT integer
  * arithmetic — `D = Σ (1000·a_i − C_i)²` over Longs, ties to the
  * smaller cell id. One tight loop per row replaces the HOF spelling's
  * numSub × cells interpreted zip_with/aggregate folds (measured 9.6 s
  * → sub-second on the x93 row at sf0.1). Bounds: |a| ≤ ~600k after
  * the ×1000 scale, diff² ≤ ~1.4e12, × subDim ≤ ~2.3e13 — far inside
  * Long.
  */
object PqKernel {
  def assign(grid: ArrayData, books: Array[PqBook], subDim: Int)
      : ArrayData = {
    val numSub = books.length
    val codes = new Array[Long](numSub)
    var m = 0
    while (m < numSub) {
      val off = m * subDim
      val b = books(m)
      var bestD = Long.MaxValue
      var bestC = Long.MaxValue
      var c = 0
      while (c < b.cells.length) {
        val cv = b.cents(c)
        var d = 0L
        var i = 0
        while (i < subDim) {
          val diff = 1000L * grid.getLong(off + i) - cv(i)
          d += diff * diff
          i += 1
        }
        // cells ascend, so strict < keeps the smallest cell among ties
        if (d < bestD) { bestD = d; bestC = b.cells(c) }
        c += 1
      }
      codes(m) = bestC
      m += 1
    }
    new GenericArrayData(codes)
  }

  /** The same exact-integer distance for one subvector/centroid pair —
    * the driver-side ADC-table arithmetic ([[assign]]'s inner loop,
    * shared so the two can never drift).
    */
  def sqDist(sub: Array[Long], cv: Array[Long]): Long = {
    var d = 0L
    var i = 0
    while (i < sub.length) {
      val diff = 1000L * sub(i) - cv(i)
      d += diff * diff
      i += 1
    }
    d
  }
}

/** `pq_codes(grid)` — the numSub nearest-cell codes for an integer-grid
  * vector against plan-bound codebooks. Null → null.
  */
case class PqAssignCodes(child: Expression, books: Seq[PqBook],
    subDim: Int) extends UnaryExpression {
  require(books.nonEmpty && subDim >= 1, "need books and subDim >= 1")
  private lazy val bookArr = books.toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_codes requires array<bigint>, got ${other.catalogString}")
  }
  override def nullSafeEval(grid: Any): Any =
    PqKernel.assign(grid.asInstanceOf[ArrayData], bookArr, subDim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("pqBooks", bookArr,
      "graft.functions.PqBook[]")
    nullSafeCodeGen(ctx, ev, g =>
      s"${ev.value} = graft.functions.PqKernel.assign($g, $booksRef, $subDim);")
  }
  override protected def withNewChildInternal(newChild: Expression): PqAssignCodes =
    copy(child = newChild)
}

object PqFunctions {
  def pqCodes(grid: Column, books: Seq[PqBook], subDim: Int): Column =
    ColumnBridge.column(
      PqAssignCodes(ColumnBridge.expression(grid), books, subDim))
}
