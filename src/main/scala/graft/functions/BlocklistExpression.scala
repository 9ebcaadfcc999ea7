package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Blocklist-hit counting kernel — the C4/UT1-style "drop any page
  * containing a blocklisted phrase" gate's scoring half, as one
  * per-row scan.
  *
  * Contract (replace-count semantics, the portable SQL spelling):
  * each pattern is counted independently on the ORIGINAL text as
  * non-overlapping left-to-right occurrences — exactly
  * `(len(text) − len(replace(text, p, ''))) / len(p)` — and the hit
  * count is the sum over patterns. Counting is substring-based by
  * design (a phrase list can encode its own word boundaries with
  * spaces); the HOF spelling survives as
  * [[graft.ops.TextAnalysis.blocklistHitsSpec]], the executable
  * specification this kernel is property-pinned against.
  *
  * Scale: the pattern list is a bounded plan literal (a policy
  * artifact, never data-sized); the scan is `O(|patterns| · |text|)`
  * with JIT-intrinsified `indexOf` — no regex, no per-row allocation
  * beyond the decoded string.
  */
object BlocklistKernel {
  def hits(text: UTF8String, pats: Array[String]): Long = {
    val s = text.toString
    var total = 0L
    var pi = 0
    while (pi < pats.length) {
      val p = pats(pi)
      if (p.nonEmpty) {
        var idx = s.indexOf(p)
        while (idx >= 0) {
          total += 1L
          idx = s.indexOf(p, idx + p.length)
        }
      }
      pi += 1
    }
    total
  }
}

/** `blocklist_hits(text)` over a frozen pattern list — see
  * [[BlocklistKernel.hits]]. Null text → null.
  */
case class BlocklistHits(child: Expression, patterns: Seq[String])
    extends UnaryExpression {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "blocklist needs at least one non-empty pattern")
  private lazy val patArr: Array[String] = patterns.toArray
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"blocklist_hits requires string, got ${other.catalogString}")
  }
  override def nullSafeEval(text: Any): Any =
    BlocklistKernel.hits(text.asInstanceOf[UTF8String], patArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // Java SOURCE type name (not "[Ljava.lang.String;") — Janino would
    // reject the binary name and silently demote the stage (the
    // DsirScoreExpr lesson, pinned by the KernelPropertySpec sweep).
    val patsRef = ctx.addReferenceObj("blockPats", patArr, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.BlocklistKernel.hits($t, $patsRef);")
  }
  override protected def withNewChildInternal(
      newChild: Expression): BlocklistHits =
    copy(child = newChild)
}

object BlocklistFunctions {
  /** Long hit count of the frozen `patterns` in `text`. */
  def blocklistHits(text: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(BlocklistHits(ColumnBridge.expression(text), patterns))
}
