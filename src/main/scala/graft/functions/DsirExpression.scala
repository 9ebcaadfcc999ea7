package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DSIR scoring kernel ([[graft.ops.Sampling.dsirScore]]): per document,
  * one pass over the text computing every adjacent-bigram's portable
  * rolling fingerprint (fold over "w1 w2" — the exact
  * [[SketchKernels.rollingFingerprint]] arithmetic, including the
  * single-space separator) mod `dim`, and summing that bucket's frozen
  * log-ratio. Replaces the interpreted `transform` + decimal
  * `aggregate` HOF spelling (measured 9.7 s → the kernel path at
  * sf0.1), which survives as `dsirScoreSpec` — the executable
  * specification this kernel is property-pinned against.
  *
  * Exactness: the model's log-ratios are 6-dp decimals, so they are
  * EXACT multiples of 10⁻⁶; the kernel sums them as Long micro-units
  * (overflow would need ~10¹⁴ bigrams per document) and the final
  * `micros / 1e6` double division is the one correctly-rounded step —
  * bit-equal to the DECIMAL(38,6)→DOUBLE cast of the HOF/aggregate
  * spellings.
  */
object DsirKernel {

  /** Tokenization contract: split on single spaces, empties preserved —
    * `split(text, " ", -1)`. Token boundaries only; no allocation per
    * token.
    */
  def score(text: UTF8String, lamMicros: Array[Long], dim: Int): InternalRow = {
    val s = text.toString
    val len = s.length
    var nBigrams = 0L
    var sumMicros = 0L
    // fold state of the PREVIOUS token (fingerprint fold up to its end)
    var tokStart = 0
    var prevAcc = -1L // fold of previous token, -1 = none yet
    var i = 0
    while (i <= len) {
      if (i == len || s.charAt(i) == ' ') {
        // token = s[tokStart, i): fold it
        var acc = 0L
        var p = tokStart
        while (p < i) {
          val cp = s.codePointAt(p)
          acc = (acc * 31 + cp) % 2147483648L
          p += Character.charCount(cp)
        }
        if (prevAcc >= 0L) {
          // bigram fingerprint: continue prev fold with ' ' then this token
          var bg = (prevAcc * 31 + 32) % 2147483648L
          p = tokStart
          while (p < i) {
            val cp = s.codePointAt(p)
            bg = (bg * 31 + cp) % 2147483648L
            p += Character.charCount(cp)
          }
          sumMicros += lamMicros((bg % dim).toInt)
          nBigrams += 1L
        }
        prevAcc = acc
        tokStart = i + 1
      }
      i += 1
    }
    InternalRow(nBigrams, sumMicros)
  }

  val resultType: StructType = StructType(Seq(
    StructField("n_bigrams", LongType, nullable = false),
    StructField("logw_micros", LongType, nullable = false)))
}

/** `dsir_score(text)` with a frozen micro-unit ratio table — see
  * [[DsirKernel.score]]. Null text → null. `lamMicros` must have `dim`
  * entries.
  */
case class DsirScoreExpr(child: Expression, lamMicros: IndexedSeq[Long])
    extends UnaryExpression {
  require(lamMicros.nonEmpty, "ratio table must be non-empty")
  private lazy val lamArr: Array[Long] = lamMicros.toArray
  override def dataType: DataType = DsirKernel.resultType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dsir_score requires string, got ${other.catalogString}")
  }
  override def nullSafeEval(text: Any): Any =
    DsirKernel.score(text.asInstanceOf[UTF8String], lamArr, lamArr.length)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // Java SOURCE type name, not the JVM binary name: classOf[...].getName
    // is "[J", which Janino cannot parse in the generated cast — every
    // stage containing the expression would silently fall back to
    // interpreted eval (pinned by the codegen-compile test in
    // KernelPropertySpec).
    val tableRef = ctx.addReferenceObj("dsirLamMicros", lamArr, "long[]")
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.DsirKernel.score($t, $tableRef, " +
        s"${lamArr.length});")
  }
  override protected def withNewChildInternal(
      newChild: Expression): DsirScoreExpr =
    copy(child = newChild)
}

object DsirFunctions {
  /** `struct(n_bigrams, logw_micros)` from text + the frozen table. */
  def dsirScore(text: Column, lamMicros: IndexedSeq[Long]): Column =
    ColumnBridge.column(DsirScoreExpr(ColumnBridge.expression(text), lamMicros))
}
