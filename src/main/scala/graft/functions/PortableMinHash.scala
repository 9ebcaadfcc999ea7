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

/** One-pass kernel for the PORTABLE (md5-based) 32-bit SimHash — the
  * x71 verification twin of the production xxhash64 [[SketchKernels
  * .simhash]]. Bit `i`'s vote per token is the HIGH BIT of hex digit
  * `i` of `md5(token)` (±1), exactly the SQL both engines share:
  *
  * {{{
  *   vote_i = SUM(CASE WHEN substr(md5(t), i+1, 1)
  *                     IN ('8'..'f') THEN 1 ELSE -1 END)
  *   bit_i  = vote_i > 0
  * }}}
  *
  * Multiset voting (no distinct) like the production SimHash: token
  * frequency weights the vote.
  */
object PortableSimHashKernel {
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def sig32(toks: ArrayData): Long = {
    val votes = new Array[Int](32)
    val md = md5Local.get()
    val n = toks.numElements()
    var t = 0
    while (t < n) {
      if (!toks.isNullAt(t)) {
        md.reset()
        md.update(toks.getUTF8String(t).getBytes)
        val d = md.digest()
        var i = 0
        while (i < 32) {
          // hex digit i = high nibble of byte i/2 when i is even, low
          // nibble when odd; its high bit is the vote
          val nib =
            if ((i & 1) == 0) (d(i >> 1) >> 4) & 0xf else d(i >> 1) & 0xf
          if (nib >= 8) votes(i) += 1 else votes(i) -= 1
          i += 1
        }
      }
      t += 1
    }
    var sig = 0L
    var i = 0
    while (i < 32) {
      if (votes(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }
}

/** `portable_simhash32(toks)` — see [[PortableSimHashKernel]]. */
case class PortableSimHash32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"portable_simhash32 requires array<string>, got ${other.catalogString}")
  }
  override def nullSafeEval(input: Any): Any =
    PortableSimHashKernel.sig32(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.PortableSimHashKernel.sig32($a);")
  override protected def withNewChildInternal(
      newChild: Expression): PortableSimHash32 = copy(child = newChild)
}

/** One-pass kernel for the PORTABLE sign-random-projection signature
  * (x72 twin): bit `i` is the sign of the exact integer dot product of
  * the caller-quantized vector with the ±1 weight row derived from
  * `md5("i|j")` ([[graft.ops.Similarity.portableSrpWeight]] spells the
  * same derivation, the oracle spells it in SQL). The weight matrix is
  * data-independent, so it is computed once per JVM and shared; the
  * HOF spelling (32 `aggregate(zip_with(...))` columns) pays ~bits×dim
  * interpreted lambda calls per row and re-evaluates on each side of
  * the pair self-join.
  */
object PortableSrpKernel {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Long]]]

  private def weights(bits: Int, dim: Int): Array[Array[Long]] =
    cache.computeIfAbsent((bits, dim), { case (b, d) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate(b, d) { (i, j) =>
        md.reset()
        val h = md.digest(s"$i|$j".getBytes("UTF-8"))
        if (((h(0) >> 4) & 0xf) >= 8) 1L else -1L
      }
    })

  def sig(qv: ArrayData, bits: Int, dim: Int): Long = {
    val w = weights(bits, dim)
    val n = math.min(qv.numElements(), dim)
    var sigBits = 0L
    var i = 0
    while (i < bits) {
      val wi = w(i)
      var vote = 0L
      var j = 0
      while (j < n) {
        if (!qv.isNullAt(j)) vote += qv.getLong(j) * wi(j)
        j += 1
      }
      if (vote > 0) sigBits |= (1L << i)
      i += 1
    }
    sigBits
  }
}

/** `portable_srp_sig(qv, bits, dim)` — see [[PortableSrpKernel]].
  * Input is the QUANTIZED vector (`array<bigint>`): quantization stays
  * spelled in the query, mirroring the oracle.
  */
case class PortableSrpSig(child: Expression, bits: Int, dim: Int)
    extends UnaryExpression {
  require(bits > 0 && bits <= 63, "bits must fit a long")
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"portable_srp_sig requires array<bigint>, got ${other.catalogString}")
  }
  override def nullSafeEval(input: Any): Any =
    PortableSrpKernel.sig(input.asInstanceOf[ArrayData], bits, dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.PortableSrpKernel.sig($a, $bits, $dim);")
  override protected def withNewChildInternal(
      newChild: Expression): PortableSrpSig = copy(child = newChild)
}

/** `portable_minhash_sig(toks, k)` — see [[PortableMinHashKernel]].
  * Requires `k % 4 == 0` (four 32-bit slices per md5) and at most 10
  * digests, i.e. k <= 40: the seed prefix is one DIGIT character
  * (`'<s>|'`), which only matches the SQL spelling for s <= 9.
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
  def portableSimhash32(toks: Column): Column =
    ColumnBridge.column(PortableSimHash32(ColumnBridge.expression(toks)))
  def portableSrpSig(qv: Column, bits: Int, dim: Int): Column =
    ColumnBridge.column(
      PortableSrpSig(ColumnBridge.expression(qv), bits, dim))
}
