package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Span-scrub kernel for surgical decontamination
  * ([[graft.ops.Contamination.scrubSpans]]): given a document's token
  * array and the SORTED start positions of its contaminated k-gram
  * windows, drop every token covered by any window `[w, w+k-1]` and
  * reassemble the survivors — one two-pointer O(tokens + windows) pass
  * per row, replacing the former token-level
  * posexplode → (doc,pos) join → collect_list reassembly (three
  * shuffles of every token in the corpus; this runs where the document
  * row already is, zero extra shuffles).
  */
object ScrubKernel {
  /** Returns `struct(n_scrubbed, scrubbed_text)`. Positions past the
    * last token (windows near a short doc's end) cover nothing.
    * `starts` must be ascending (the caller sorts its per-doc
    * collect_set); null tokens (never produced by `split`) scrub-count
    * as covered and render as empty.
    */
  def scrub(tokens: ArrayData, starts: ArrayData, k: Int): InternalRow = {
    val n = tokens.numElements()
    val m = starts.numElements()
    var j = 0
    var coverEnd = -1L
    var scrubbed = 0L
    val sb = new java.lang.StringBuilder
    var first = true
    var p = 0
    while (p < n) {
      while (j < m && starts.getLong(j) <= p) {
        val e = starts.getLong(j) + (k - 1)
        if (e > coverEnd) coverEnd = e
        j += 1
      }
      if (p <= coverEnd) {
        scrubbed += 1L
      } else {
        if (!first) sb.append(' ')
        first = false
        if (!tokens.isNullAt(p)) sb.append(tokens.getUTF8String(p).toString)
      }
      p += 1
    }
    InternalRow(scrubbed, UTF8String.fromString(sb.toString))
  }

  val resultType: StructType = StructType(Seq(
    StructField("n_scrubbed", LongType, nullable = false),
    StructField("scrubbed_text", StringType, nullable = false)))
}

/** `scrub_tokens(tokens, starts, k)` — see [[ScrubKernel.scrub]].
  * `starts` must be `array<bigint>` ascending; the [[ScrubFunctions]]
  * builder casts and sorts for you.
  */
case class ScrubTokens(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  require(k >= 1, "k must be >= 1")
  override def dataType: DataType = ScrubKernel.resultType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"scrub_tokens requires (array<string>, array<bigint>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }
  override def nullSafeEval(tokens: Any, starts: Any): Any =
    ScrubKernel.scrub(tokens.asInstanceOf[ArrayData],
      starts.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, s) =>
      s"${ev.value} = graft.functions.ScrubKernel.scrub($t, $s, $k);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ScrubTokens =
    copy(left = newLeft, right = newRight)
}

/** Repeat-gram detector for the self-repetition scrub
  * ([[graft.ops.TextAnalysis.selfRepetitionScrub]]): the 0-based start
  * positions whose k-gram (tokens joined by one space — whitespace
  * tokens cannot contain spaces, so the join is injective) equals a
  * k-gram starting EARLIER in the same array. Exact string equality
  * via one hash-map pass, O(tokens·k) per row, replacing the HOF
  * spelling's O(grams²) interpreted `array_position` scan; the HOF
  * spelling survives as
  * [[graft.ops.TextAnalysis.selfRepetitionScrubSpec]] — the executable
  * specification the kernel is property-pinned against (TfIdfSpec)
  * and the exact shape the DuckDB oracle runs.
  */
object RepeatedGramKernel {
  def repeatedStarts(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < k)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Long])
    val seen = new java.util.HashMap[String, Integer](n * 2)
    val out = new java.util.ArrayList[java.lang.Long]
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i + k <= n) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        if (!tokens.isNullAt(i + j))
          sb.append(tokens.getUTF8String(i + j).toString)
        j += 1
      }
      if (seen.putIfAbsent(sb.toString, Integer.valueOf(i)) != null)
        out.add(java.lang.Long.valueOf(i.toLong))
      i += 1
    }
    val arr = new Array[Long](out.size())
    var p = 0
    while (p < arr.length) { arr(p) = out.get(p).longValue(); p += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }
}

/** `repeated_gram_starts(tokens, k)` — see
  * [[RepeatedGramKernel.repeatedStarts]]. Null → null; output is
  * ascending (scan order), ready for [[ScrubKernel]].
  */
case class RepeatedGramStarts(child: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(k >= 1, "k must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"repeated_gram_starts requires array<string>, got " +
        other.catalogString)
  }
  override def nullSafeEval(tokens: Any): Any =
    RepeatedGramKernel.repeatedStarts(tokens.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.RepeatedGramKernel.repeatedStarts($t, $k);")
  override protected def withNewChildInternal(
      newChild: Expression): RepeatedGramStarts =
    copy(child = newChild)
}

object ScrubFunctions {
  import org.apache.spark.sql.functions.sort_array

  /** `struct(n_scrubbed, scrubbed_text)` from a token array and the
    * (any integral type, any order) start positions of contaminated
    * k-windows.
    */
  def scrubTokens(tokens: Column, starts: Column, k: Int): Column =
    ColumnBridge.column(ScrubTokens(
      ColumnBridge.expression(tokens),
      ColumnBridge.expression(
        sort_array(starts.cast(ArrayType(LongType)))),
      k))

  /** Ascending 0-based starts of k-grams repeating an earlier one —
    * see [[RepeatedGramKernel.repeatedStarts]].
    */
  def repeatedGramStarts(tokens: Column, k: Int): Column =
    ColumnBridge.column(RepeatedGramStarts(
      ColumnBridge.expression(tokens), k))
}
