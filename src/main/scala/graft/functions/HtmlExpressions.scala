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

/** HTML main-content extraction kernel
  * ([[graft.ops.TextAnalysis.htmlMainContent]]) — the
  * trafilatura/jusText curation stage as ONE deterministic rule,
  * evaluated in a handful of O(length) scans instead of the spec
  * spelling's three whole-document regex passes + tag-split +
  * per-fragment HOF pipeline (the `PiiKernel`/`WsTokens` precedent
  * applied to boilerplate removal).
  *
  * The rule (shared verbatim by the kernel, the HOF/regex executable
  * spec [[graft.ops.TextAnalysis.htmlMainContentSpec]], and the DuckDB
  * oracle):
  *
  *  1. strip `(?s)<script[^>]*>.*?</script>`, then
  *     `(?s)<style[^>]*>.*?</style>`, then `(?s)<!--.*?-->` — three
  *     sequential leftmost-non-overlapping replace-all passes;
  *  2. split the remainder on tags `<[^>]*>` into text fragments;
  *  3. per fragment: decode the five HTML entities
  *     `&lt; &gt; &quot; &#39; &amp;` (sequential literal replaces,
  *     `&amp;` LAST so `&amp;lt;` decodes to the literal `&lt;`), then
  *     trim U+0020 (exactly Spark/DuckDB `trim`);
  *  4. a fragment is a BLOCK if non-empty; a block is KEPT (main
  *     content) if its code-point length is >= 30 AND at least half
  *     its code points are ASCII alphanumeric — the text-density test
  *     in exact integer arithmetic (`2*alnum >= len`);
  *  5. main_text = kept blocks joined with `\n`.
  *
  * Every step is the exact semantics of the public string functions the
  * spec is written in: Java/RE2-common regex constructs only (no
  * backreferences — RE2 has none, which is WHY script and style are two
  * passes), literal `replace` chains, first-`>`-terminates tags, an
  * unterminated `<` staying literal text.
  */
object HtmlKernel {

  /** One leftmost-non-overlapping replace-all pass removing
    * `open[^>]*>` .. `close` blocks (`open` includes the `<`). A
    * candidate whose header run hits EOF without `>`, or with no
    * `close` after the header, fails — the scan resumes at the next
    * `open` occurrence, exactly the regex engine's behavior.
    */
  private def stripBlocks(s: String, open: String, close: String): String = {
    var from = s.indexOf(open)
    if (from < 0) return s
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var copied = 0
    while (from >= 0) {
      var k = from + open.length
      while (k < n && s.charAt(k) != '>') k += 1
      if (k < n) { // header `open[^>]*>` matched, ends at k
        val end = s.indexOf(close, k + 1)
        if (end >= 0) {
          sb.append(s, copied, from)
          copied = end + close.length
          from = s.indexOf(open, copied)
        } else from = -1 // no closer anywhere right of here: done
      } else from = -1 // header ran to EOF: no further match possible
    }
    sb.append(s, copied, n)
    sb.toString
  }

  /** `(?s)<!--.*?-->` replace-all (no `[^>]*` header part). */
  private def stripComments(s: String): String = {
    var from = s.indexOf("<!--")
    if (from < 0) return s
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var copied = 0
    while (from >= 0) {
      val end = s.indexOf("-->", from + 4)
      if (end >= 0) {
        sb.append(s, copied, from)
        copied = end + 3
        from = s.indexOf("<!--", copied)
      } else from = -1
    }
    sb.append(s, copied, n)
    sb.toString
  }

  /** The five-entity decode — literal sequential replaces, `&amp;`
    * last, mirroring the spec's `replace` chain exactly.
    */
  private def decode(s: String): String =
    if (s.indexOf('&') < 0) s
    else s.replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'")
      .replace("&amp;", "&")

  /** Trim U+0020 only — Spark/DuckDB `trim`, NOT `String.trim` (which
    * would also eat control chars like `\n`).
    */
  private def trimSpaces(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    if (a == 0 && b == s.length) s else s.substring(a, b)
  }

  private def isAlnum(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')

  /** `struct(n_blocks, n_kept, main_text)` per the rule above. */
  def extract(html: UTF8String): InternalRow = {
    val cleaned = stripComments(stripBlocks(
      stripBlocks(html.toString, "<script", "</script>"),
      "<style", "</style>"))
    val n = cleaned.length
    var nBlocks = 0L
    var nKept = 0L
    val out = new java.lang.StringBuilder
    var fragStart = 0

    def fragment(fs: Int, fe: Int): Unit = {
      if (fe > fs) {
        val t = trimSpaces(decode(cleaned.substring(fs, fe)))
        if (t.nonEmpty) {
          nBlocks += 1
          val len = t.codePointCount(0, t.length)
          if (len >= 30) {
            var alnum = 0
            var i = 0
            while (i < t.length) {
              if (isAlnum(t.charAt(i))) alnum += 1
              i += 1
            }
            if (2 * alnum >= len) {
              nKept += 1
              if (out.length > 0) out.append('\n')
              out.append(t)
            }
          }
        }
      }
    }

    var lt = cleaned.indexOf('<')
    while (lt >= 0) {
      var k = lt + 1
      while (k < n && cleaned.charAt(k) != '>') k += 1
      if (k < n) { // tag <...> from lt to k
        fragment(fragStart, lt)
        fragStart = k + 1
        lt = cleaned.indexOf('<', k + 1)
      } else lt = -1 // unterminated '<' stays literal text
    }
    fragment(fragStart, n)
    InternalRow(nBlocks, nKept, UTF8String.fromString(out.toString))
  }

  val resultType: StructType = StructType(Seq(
    StructField("n_blocks", LongType, nullable = false),
    StructField("n_kept", LongType, nullable = false),
    StructField("main_text", StringType, nullable = false)))
}

/** `html_main_content(html)` — see [[HtmlKernel.extract]]. Null → null. */
case class HtmlMainContent(child: Expression) extends UnaryExpression {
  override def dataType: DataType = HtmlKernel.resultType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"html_main_content requires string, got ${other.catalogString}")
  }
  override def nullSafeEval(html: Any): Any =
    HtmlKernel.extract(html.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, h =>
      s"${ev.value} = graft.functions.HtmlKernel.extract($h);")
  override protected def withNewChildInternal(newChild: Expression): HtmlMainContent =
    copy(child = newChild)
}

object HtmlFunctions {
  /** `struct(n_blocks, n_kept, main_text)` in one pass — share the one
    * expression across projections (identical trees collapse under
    * codegen subexpression elimination).
    */
  def htmlMainContent(html: Column): Column =
    ColumnBridge.column(HtmlMainContent(ColumnBridge.expression(html)))
}
