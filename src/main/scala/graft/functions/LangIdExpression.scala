package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Trained language-ID scoring kernel
  * ([[graft.ops.TextAnalysis.langIdScore]]): one pass over the text
  * computing every CHAR-trigram's portable rolling fingerprint
  * (`((c1·31 + c2)·31 + c3) mod 2³¹` over code points — the exact
  * [[SketchKernels.rollingFingerprint]] fold of the 3-char substring)
  * mod `dim`, accumulating that bucket's frozen log-probability for
  * EVERY language simultaneously, then arg-maxing (ties → smallest
  * language index; the caller sorts languages ascending, so ties break
  * lexicographically — same contract as the SQL `ORDER BY s DESC,
  * lang ASC` oracle spelling).
  *
  * Exactness: the per-(language, bucket) log-probabilities are 6-dp
  * decimals, summed as Long micro-units (the [[DsirKernel]] argument:
  * overflow needs ~10¹⁴ trigrams per document); the final
  * `micros / 1e6` double division is the one correctly-rounded step.
  */
object LangIdKernel {

  /** `lamMicros` is the flattened L×dim table (language-major). Returns
    * `(n_trigrams, best_idx, best_micros)`; `best_idx` is 0 with all
    * sums 0 when the text has fewer than 3 code points.
    */
  def score(text: UTF8String, lamMicros: Array[Long], dim: Int,
      nLangs: Int): InternalRow = {
    val s = text.toString
    val len = s.length
    val sums = new Array[Long](nLangs)
    var n = 0L
    var prev2 = -1
    var prev1 = -1
    var i = 0
    while (i < len) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      if (prev2 >= 0) {
        var f = prev2.toLong % 2147483648L
        f = (f * 31 + prev1) % 2147483648L
        f = (f * 31 + cp) % 2147483648L
        val b = (f % dim).toInt
        var li = 0
        while (li < nLangs) {
          sums(li) += lamMicros(li * dim + b)
          li += 1
        }
        n += 1L
      }
      prev2 = prev1
      prev1 = cp
    }
    var best = 0
    var li = 1
    while (li < nLangs) {
      if (sums(li) > sums(best)) best = li
      li += 1
    }
    InternalRow(n, best, sums(best))
  }

  val resultType: StructType = StructType(Seq(
    StructField("n_trigrams", LongType, nullable = false),
    StructField("best_idx", IntegerType, nullable = false),
    StructField("best_micros", LongType, nullable = false)))

  /** Per-document trigram-bucket count VECTOR (same window fold as
    * [[score]]) — the TRAINING side's per-row kernel: one text scan,
    * one dim-length array out, so corpus trigram counting becomes a
    * [[VectorSumAgg]] elementwise aggregate (L×dim doubles per map
    * task) instead of a corpus-sized trigram explode. Doubles are
    * exact for counts < 2⁵³.
    */
  def trigramCounts(text: UTF8String,
      dim: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val s = text.toString
    val len = s.length
    val out = new Array[Double](dim)
    var prev2 = -1
    var prev1 = -1
    var i = 0
    while (i < len) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      if (prev2 >= 0) {
        var f = prev2.toLong % 2147483648L
        f = (f * 31 + prev1) % 2147483648L
        f = (f * 31 + cp) % 2147483648L
        out((f % dim).toInt) += 1.0
      }
      prev2 = prev1
      prev1 = cp
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }
}

/** `trigram_counts(text)`: dim-length double count vector of hashed
  * char-trigram buckets — see [[LangIdKernel.trigramCounts]]. Null
  * text → null.
  */
case class TrigramCountsExpr(child: Expression, dim: Int)
    extends UnaryExpression {
  require(dim >= 2, s"dim must be >= 2, got $dim")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"trigram_counts requires string, got ${other.catalogString}")
  }
  override def nullSafeEval(text: Any): Any =
    LangIdKernel.trigramCounts(text.asInstanceOf[UTF8String], dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.LangIdKernel.trigramCounts($t, $dim);")
  override protected def withNewChildInternal(
      newChild: Expression): TrigramCountsExpr =
    copy(child = newChild)
}

/** `lang_score(text)` against a frozen per-language trigram table —
  * see [[LangIdKernel.score]]. Null text → null. `lamMicros` must have
  * `nLangs * dim` entries, language-major.
  */
case class LangScoreExpr(child: Expression, lamMicros: IndexedSeq[Long],
    dim: Int, nLangs: Int) extends UnaryExpression {
  require(dim >= 2 && nLangs >= 1 && lamMicros.length == nLangs * dim,
    s"table must be nLangs*dim = ${nLangs * dim} entries, " +
      s"got ${lamMicros.length}")
  private lazy val lamArr: Array[Long] = lamMicros.toArray
  override def dataType: DataType = LangIdKernel.resultType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lang_score requires string, got ${other.catalogString}")
  }
  override def nullSafeEval(text: Any): Any =
    LangIdKernel.score(text.asInstanceOf[UTF8String], lamArr, dim, nLangs)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // Java SOURCE type name ("long[]"), never the JVM binary "[J" —
    // Janino rejects the latter and the stage silently drops to
    // interpreted eval (the DsirScoreExpr lesson, codegen-pinned in
    // KernelPropertySpec)
    val tableRef = ctx.addReferenceObj("langLamMicros", lamArr, "long[]")
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.LangIdKernel.score($t, $tableRef, " +
        s"$dim, $nLangs);")
  }
  override protected def withNewChildInternal(
      newChild: Expression): LangScoreExpr =
    copy(child = newChild)
}

object LangIdFunctions {
  /** `struct(n_trigrams, best_idx, best_micros)` from text + the frozen
    * language-major table.
    */
  def langScore(text: Column, lamMicros: IndexedSeq[Long], dim: Int,
      nLangs: Int): Column =
    ColumnBridge.column(LangScoreExpr(
      ColumnBridge.expression(text), lamMicros, dim, nLangs))

  /** `array<double>` of per-bucket trigram counts, length `dim`. */
  def trigramCounts(text: Column, dim: Int): Column =
    ColumnBridge.column(TrigramCountsExpr(ColumnBridge.expression(text), dim))
}
