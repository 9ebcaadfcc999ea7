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

/** PII scan kernel ([[graft.ops.TextAnalysis.piiScan]]): one expression
  * computing the email count, the IPv4 count, and the fully redacted
  * text in three O(length) character scans — replacing two
  * `java.util.regex` `regexp_replace` passes plus two `regexp_count`
  * passes per document (measured ~20× over the DuckDB twin; the
  * `WsTokens`/`RepeatedGramKernel` precedent applied to the scrub
  * path).
  *
  * The scans are EXACT reimplementations of the two fixed patterns
  * under Java's leftmost-first greedy semantics —
  * `[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}` and
  * `\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b` — including find()-resume
  * positions and `\b` look-arounds over the original characters. The
  * regex spelling survives as
  * [[graft.ops.TextAnalysis.piiRedactSpec]]/`emailCountSpec`/
  * `ipv4CountSpec`, the executable specification the kernel is
  * property-pinned against (KernelPropertySpec) and the exact shape
  * the DuckDB oracle runs.
  */
object PiiKernel {

  @inline private def isLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  @inline private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'
  @inline private def isWord(c: Char): Boolean =
    isLetter(c) || isDigit(c) || c == '_'
  @inline private def isLocal(c: Char): Boolean =
    isLetter(c) || isDigit(c) ||
      c == '.' || c == '_' || c == '%' || c == '+' || c == '-'
  @inline private def isDomain(c: Char): Boolean =
    isLetter(c) || isDigit(c) || c == '.' || c == '-'

  /** Match end of `[A-Za-z0-9.-]+\.[A-Za-z]{2,}` starting at `j`, or -1.
    * Greedy `+` backtracks from the longest domain run, so the matched
    * dot is the LAST dot followed by >=2 letters; the TLD then extends
    * over every following letter (all still inside the domain run).
    */
  private def domainEnd(s: String, j: Int): Int = {
    val len = s.length
    var runEnd = j
    while (runEnd < len && isDomain(s.charAt(runEnd))) runEnd += 1
    if (runEnd == j) return -1
    var k = runEnd - 3
    while (k >= j + 1) {
      if (s.charAt(k) == '.' && isLetter(s.charAt(k + 1)) &&
          isLetter(s.charAt(k + 2))) {
        var e = k + 3
        while (e < runEnd && isLetter(s.charAt(e))) e += 1
        return e
      }
      k -= 1
    }
    -1
  }

  /** All email match spans under find()-loop semantics. A start
    * position maps to exactly one '@' (the local class excludes '@',
    * and a shrunk `+` would end on a local char, never '@'), so the
    * leftmost match for an '@' begins at its maximal backward local
    * run — clipped at the previous match's end, where find() resumes.
    */
  private def emailSpans(s: String): java.util.ArrayList[Array[Int]] = {
    val out = new java.util.ArrayList[Array[Int]]
    var pos = 0
    var at = s.indexOf('@')
    while (at >= 0) {
      var start = at
      while (start > pos && isLocal(s.charAt(start - 1))) start -= 1
      if (start < at) {
        val e = domainEnd(s, at + 1)
        if (e >= 0) {
          out.add(Array(start, e))
          pos = e
          at = s.indexOf('@', e)
        } else at = s.indexOf('@', at + 1)
      } else at = s.indexOf('@', at + 1)
    }
    out
  }

  /** Remaining `(\.[0-9]{1,3}){g}` groups then the closing `\b`, with
    * the digit quantifier backtracking longest-first — Java's order, so
    * the first success IS Java's match end.
    */
  private def ipGroups(s: String, p: Int, g: Int): Int = {
    val len = s.length
    if (g == 0) {
      if (p == len || !isWord(s.charAt(p))) p else -1
    } else {
      if (p < len && s.charAt(p) == '.') {
        var run = 0
        while (run < 3 && p + 1 + run < len && isDigit(s.charAt(p + 1 + run)))
          run += 1
        var d = run
        while (d >= 1) {
          val e = ipGroups(s, p + 1 + d, g - 1)
          if (e >= 0) return e
          d -= 1
        }
      }
      -1
    }
  }

  private def ipMatchAt(s: String, i: Int): Int = {
    if (i > 0 && isWord(s.charAt(i - 1))) return -1
    val len = s.length
    var run = 0
    while (run < 3 && i + run < len && isDigit(s.charAt(i + run))) run += 1
    var d = run
    while (d >= 1) {
      val e = ipGroups(s, i + d, 3)
      if (e >= 0) return e
      d -= 1
    }
    -1
  }

  private def ipSpans(s: String): java.util.ArrayList[Array[Int]] = {
    val out = new java.util.ArrayList[Array[Int]]
    val len = s.length
    var i = 0
    while (i < len) {
      if (isDigit(s.charAt(i))) {
        val e = ipMatchAt(s, i)
        if (e >= 0) { out.add(Array(i, e)); i = e } else i += 1
      } else i += 1
    }
    out
  }

  private def replaceSpans(s: String,
      spans: java.util.ArrayList[Array[Int]], repl: String): String = {
    if (spans.isEmpty) return s
    val sb = new java.lang.StringBuilder(s.length)
    var prev = 0
    var i = 0
    while (i < spans.size()) {
      val sp = spans.get(i)
      sb.append(s, prev, sp(0)).append(repl)
      prev = sp(1)
      i += 1
    }
    sb.append(s, prev, s.length)
    sb.toString
  }

  /** `struct(n_emails, n_ips, redacted)`. Counts are over the RAW text;
    * the redaction is email-pass-then-IP-pass (an email removal can
    * expose an IP word boundary, so the IP spans of the redacted text
    * are found on the intermediate string — exactly the nested
    * `regexp_replace` contract).
    */
  def scan(text: UTF8String): InternalRow = {
    val raw = text.toString
    val emails = emailSpans(raw)
    val nIps = ipSpans(raw).size().toLong
    val intermediate = replaceSpans(raw, emails, "<EMAIL>")
    val redacted = replaceSpans(intermediate, ipSpans(intermediate), "<IP>")
    InternalRow(emails.size().toLong, nIps, UTF8String.fromString(redacted))
  }

  val resultType: StructType = StructType(Seq(
    StructField("n_emails", LongType, nullable = false),
    StructField("n_ips", LongType, nullable = false),
    StructField("redacted", StringType, nullable = false)))
}

/** `pii_scan(text)` — see [[PiiKernel.scan]]. Null → null. */
case class PiiScan(child: Expression) extends UnaryExpression {
  override def dataType: DataType = PiiKernel.resultType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pii_scan requires string, got ${other.catalogString}")
  }
  override def nullSafeEval(text: Any): Any =
    PiiKernel.scan(text.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.PiiKernel.scan($t);")
  override protected def withNewChildInternal(newChild: Expression): PiiScan =
    copy(child = newChild)
}

object PiiFunctions {
  /** `struct(n_emails, n_ips, redacted)` in one pass — share it across
    * the three projections (identical trees also collapse under
    * codegen subexpression elimination).
    */
  def piiScan(text: Column): Column =
    ColumnBridge.column(PiiScan(ColumnBridge.expression(text)))
}
