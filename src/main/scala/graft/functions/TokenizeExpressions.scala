package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen kernels for the production tokenizer
  * ([[graft.ops.TextAnalysis.tokensWs]] / `tokensFolded`) — the
  * split-on-`\s+` + ASCII-edge-fold hot path without java.util.regex
  * (the `NGramHashes`/`RollingFingerprint` precedent): one flat byte
  * scan per string instead of Pattern.split plus two interpreted
  * higher-order lambdas per token. The regex spellings survive as
  * `tokensWsSpec`/`foldTokensSpec` — the executable specification the
  * kernels are property-pinned against (TokenizerSpec) and the exact
  * SQL the DuckDB oracle runs.
  *
  * Byte-level scanning is sound on UTF-8: every byte of a multi-byte
  * code point is >= 0x80, so the ASCII whitespace / `[a-z0-9]` tests
  * can never fire inside one, and slicing at ASCII boundaries never
  * splits a code point.
  */
object TokenizeKernels {

  /** Java regex `\s` (no UNICODE_CHARACTER_CLASS): exactly these six
    * ASCII characters — the contract `split(text, "\\s+")` has.
    */
  private def isWs(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0A || b == 0x0B || b == 0x0C ||
      b == 0x0D

  private def isKeep(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')

  /** `filter(split(s, "\\s+", -1), t => t != "")`: maximal runs of
    * non-whitespace bytes, boundary empties never produced.
    */
  def wsTokens(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val out = new java.util.ArrayList[UTF8String]
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !isWs(bytes(i))) i += 1
      if (i > start) out.add(UTF8String.fromBytes(bytes, start, i - start))
    }
    new GenericArrayData(out.toArray)
  }

  /** One token's fold: lowercase (the same `UTF8String.toLowerCase`
    * Spark's `lower()` calls, so kernel ≡ spec by construction), then
    * strip the leading and trailing runs of bytes outside `[a-z0-9]` —
    * exactly `regexp_replace(lower(t), "^[^a-z0-9]+|[^a-z0-9]+$", "")`.
    * Returns null when nothing survives (the spec's filtered-out "").
    */
  def foldToken(t: UTF8String): UTF8String = {
    val bytes = t.toLowerCase.getBytes
    var s = 0
    var e = bytes.length
    while (s < e && !isKeep(bytes(s))) s += 1
    while (e > s && !isKeep(bytes(e - 1))) e -= 1
    if (e <= s) null else UTF8String.fromBytes(bytes, s, e - s)
  }

  /** `filter(transform(arr, fold), t => t != "")`: per token fold, pure
    * punctuation (and null elements — the transform maps them to null,
    * which the filter drops) vanish.
    */
  def foldTokens(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val f = foldToken(arr.getUTF8String(i))
        if (f != null) out.add(f)
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** `ws_tokens(text)` — see [[TokenizeKernels.wsTokens]]. Null → null. */
case class WsTokens(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ws_tokens requires string, got ${other.catalogString}")
  }
  override def nullSafeEval(input: Any): Any =
    TokenizeKernels.wsTokens(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TokenizeKernels.wsTokens($a);")
  override protected def withNewChildInternal(newChild: Expression): WsTokens =
    copy(child = newChild)
}

/** `fold_tokens(tokens)` — see [[TokenizeKernels.foldTokens]].
  * Null array → null.
  */
case class FoldTokens(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"fold_tokens requires array<string>, got ${other.catalogString}")
  }
  override def nullSafeEval(input: Any): Any =
    TokenizeKernels.foldTokens(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TokenizeKernels.foldTokens($a);")
  override protected def withNewChildInternal(newChild: Expression): FoldTokens =
    copy(child = newChild)
}

object TokenizeFunctions {
  def wsTokens(text: Column): Column =
    ColumnBridge.column(WsTokens(ColumnBridge.expression(text)))
  def foldTokens(tokens: Column): Column =
    ColumnBridge.column(FoldTokens(ColumnBridge.expression(tokens)))
}
