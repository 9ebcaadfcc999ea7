package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Gopher-style document-quality signal kernel
  * ([[graft.ops.TextAnalysis.gopherRules]]) — the published rule-suite
  * signals (word count, mean word length, symbol-to-word ratio,
  * bullet/ellipsis line fractions, alphabetic-word fraction, stopword
  * hits; Rae et al. 2021, "Scaling Language Models", App. A) computed
  * in ONE O(length) scan instead of the spec spelling's split + five
  * HOF passes + two whole-text replaces.
  *
  * Conventions shared verbatim by the kernel, the HOF executable spec
  * ([[graft.ops.TextAnalysis.gopherSignalsSpec]]) and the DuckDB
  * oracle:
  *
  *  - words = single-space split (`split(text, ' ', -1)` /
  *    `string_split(text, ' ')`): consecutive spaces produce empty
  *    words, word lengths are code-point counts;
  *  - lines = consecutive groups of 8 words (the fixture has no
  *    newlines, so line structure is imposed deterministically — the
  *    x89 wrap precedent); a line's first word decides the bullet test
  *    (starts with `-` or `*`), its last word the ellipsis-end test
  *    (ends with `...`);
  *  - `n_hash` counts `#` characters in the whole text; `n_ellipsis`
  *    counts leftmost non-overlapping `...` occurrences (exactly
  *    `(len(text) - len(replace(text, '...', ''))) / 3`);
  *  - a word is alphabetic if it contains at least one ASCII letter;
  *    stopwords are the exact-match x2 set
  *    ([[graft.ops.TextAnalysis.stopwords]]).
  */
object GopherKernel {

  /** Exact-match stopword set — MUST stay equal to
    * [[graft.ops.TextAnalysis.stopwords]] (asserted in
    * KernelPropertySpec).
    */
  val stopwords: Set[String] = Set("the", "a", "and", "of", "in", "is")

  val resultType: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("sum_word_len", LongType, nullable = false),
    StructField("n_alpha_words", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false),
    StructField("n_hash", LongType, nullable = false),
    StructField("n_ellipsis", LongType, nullable = false),
    StructField("n_lines", LongType, nullable = false),
    StructField("n_bullet_lines", LongType, nullable = false),
    StructField("n_ellipsis_lines", LongType, nullable = false)))

  private val WordsPerLine = 8

  def scan(text: UTF8String): InternalRow = {
    val s = text.toString
    val len = s.length
    var nWords = 0L
    var sumWordLen = 0L
    var nAlpha = 0L
    var nStop = 0L
    var nHash = 0L
    var nEllipsis = 0L
    var nLines = 0L
    var nBulletLines = 0L
    var nEllipsisLines = 0L
    var dotRun = 0
    var tokStart = 0

    def endToken(endExcl: Int): Unit = {
      val idx = nWords // 0-based word index
      nWords += 1
      val tl = endExcl - tokStart
      var cp = 0
      var alpha = false
      var i = tokStart
      while (i < endExcl) {
        val c = s.charAt(i)
        if (!Character.isLowSurrogate(c)) cp += 1
        if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) alpha = true
        i += 1
      }
      sumWordLen += cp
      if (alpha) nAlpha += 1
      if (tl >= 1 && tl <= 3 && stopwords.contains(s.substring(tokStart, endExcl)))
        nStop += 1
      if (idx % WordsPerLine == 0) {
        nLines += 1
        if (tl > 0) {
          val c0 = s.charAt(tokStart)
          if (c0 == '-' || c0 == '*') nBulletLines += 1
        }
      }
      // a line ends at its 8th word or at the final word of the text
      if (idx % WordsPerLine == WordsPerLine - 1 || endExcl == len) {
        if (tl >= 3 && s.charAt(endExcl - 1) == '.' &&
            s.charAt(endExcl - 2) == '.' && s.charAt(endExcl - 3) == '.')
          nEllipsisLines += 1
      }
    }

    var i = 0
    while (i < len) {
      val c = s.charAt(i)
      if (c == '#') nHash += 1
      if (c == '.') dotRun += 1
      else { nEllipsis += dotRun / 3; dotRun = 0 }
      if (c == ' ') {
        // a word ending at a space is never the text's final word, so
        // its line-end test fires only when it is a line's 8th word
        endToken(i)
        tokStart = i + 1
      }
      i += 1
    }
    nEllipsis += dotRun / 3
    endToken(len)

    InternalRow(nWords, sumWordLen, nAlpha, nStop, nHash, nEllipsis,
      nLines, nBulletLines, nEllipsisLines)
  }
}

/** `gopher_signals(text)` — see [[GopherKernel.scan]]. Null → null. */
case class GopherSignals(child: Expression) extends UnaryExpression {
  override def dataType: DataType = GopherKernel.resultType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gopher_signals requires string, got ${other.catalogString}")
  }
  override def nullSafeEval(text: Any): Any =
    GopherKernel.scan(text.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.GopherKernel.scan($t);")
  override protected def withNewChildInternal(newChild: Expression): GopherSignals =
    copy(child = newChild)
}

object GopherFunctions {
  /** The nine Gopher signals in one pass — share the one expression
    * across projections (identical trees collapse under codegen
    * subexpression elimination).
    */
  def gopherSignals(text: Column): Column =
    ColumnBridge.column(GopherSignals(ColumnBridge.expression(text)))
}
