package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass kernel for the PORTABLE (md5-based) MinHash signature —
  * bit-identical to the SQL spelling both engines share in the x43
  * verification twin:
  *
  * {{{
  *   sig[i] = list_min(list_transform(toks,
  *              t -> substr(md5('<i/4>|' || t), (i%4)*8 + 1, 8)))
  * }}}
  *
  * Each token is md5'd once per digest seed (k/4 digests), each
  * digest's four 8-hex-char slices update four running minima as raw
  * unsigned 32-bit ints (lowercase-hex lexicographic order IS unsigned
  * numeric order for equal-length strings), and the hex strings are
  * formatted once per row at the end. The HOF spelling evaluates
  * md5 → 32-char hex string → 4 substrings → array_min per slice,
  * allocating ~5 strings per token per digest and re-evaluating the
  * whole subtree wherever the plan references the signature; this
  * allocates nothing per token and generates code, staying inside
  * whole-stage codegen.
  */
object PortableMinHashKernel {
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Lowercase 8-hex-char form of an unsigned 32-bit value. */
  private def hex8(v: Long): UTF8String = {
    val cs = new Array[Byte](8)
    var i = 7
    var x = v
    while (i >= 0) {
      val d = (x & 0xfL).toInt
      cs(i) = (if (d < 10) '0' + d else 'a' + d - 10).toByte
      x >>>= 4
      i -= 1
    }
    UTF8String.fromBytes(cs)
  }

  def sig(toks: ArrayData, k: Int): ArrayData = {
    val digests = k / 4
    val n = toks.numElements()
    // running minima as unsigned ints widened to long; MaxValue means
    // "no token seen" → null slice (the list_min-of-empty contract)
    val mins = Array.fill(k)(Long.MaxValue)
    val md = md5Local.get()
    var t = 0
    while (t < n) {
      if (!toks.isNullAt(t)) {
        val tokBytes = toks.getUTF8String(t).getBytes
        var s = 0
        while (s < digests) {
          md.reset()
          md.update(('0' + s).toByte)
          md.update('|'.toByte)
          md.update(tokBytes)
          val d = md.digest()
          var slice = 0
          while (slice < 4) {
            val o = slice * 4
            val v = ((d(o) & 0xffL) << 24) | ((d(o + 1) & 0xffL) << 16) |
              ((d(o + 2) & 0xffL) << 8) | (d(o + 3) & 0xffL)
            val i = s * 4 + slice
            if (v < mins(i)) mins(i) = v
            slice += 1
          }
          s += 1
        }
      }
      t += 1
    }
    val out = new Array[Any](k)
    var i = 0
    while (i < k) {
      out(i) = if (mins(i) == Long.MaxValue) null else hex8(mins(i))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `portable_minhash_sig(toks, k)` — see [[PortableMinHashKernel]].
  * Requires `k % 4 == 0` (four 32-bit slices per md5) and at most 36
  * digests (single-char seed prefix, matching the SQL's `'<s>|'`).
  */
case class PortableMinHashSig(child: Expression, k: Int)
    extends UnaryExpression {
  require(k % 4 == 0 && k > 0, "k must be a positive multiple of 4")
  require(k / 4 <= 10, "at most 10 digest seeds (single-digit prefix)")
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"portable_minhash_sig requires array<string>, got ${other.catalogString}")
  }
  override def nullSafeEval(input: Any): Any =
    PortableMinHashKernel.sig(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.PortableMinHashKernel.sig($a, $k);")
  override protected def withNewChildInternal(
      newChild: Expression): PortableMinHashSig = copy(child = newChild)
}

object PortableMinHashFunctions {
  def portableMinhashSig(toks: Column, k: Int): Column =
    ColumnBridge.column(
      PortableMinHashSig(ColumnBridge.expression(toks), k))
}
