package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the dedup sketches (SURVEY.md §2.2
  * UDF/UDAF surface + north-star near-dedup). Single-pass over the token
  * array per row — the higher-order-function formulation would re-hash
  * every token once per hash function (64×). Interpreted eval
  * (CodegenFallback) is adequate: hashing dominates, and the token
  * arrays are bounded per row.
  *
  * Uses Spark's own xxhash64 kernel, so results match
  * `xxhash64(token, seed)` computed in SQL.
  */

/** 64-bit SimHash over an array<string> of tokens: per token, xxhash64;
  * each of the 64 bits votes +1/-1; the sign of each vote total is the
  * signature bit. Near-duplicate texts differ in few bits (small Hamming
  * distance). Null tokens are skipped; null array → null.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = {
    child.dataType match {
      case ArrayType(StringType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash64 requires array<string>, got ${other.catalogString}")
    }
  }
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(sig)
  }
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** MinHash signature over an array<string> of shingles: the i-th hash
  * family member is h_i(x) = h1(x) + i*h2(x) over two independent
  * xxhash64 seeds (the standard double-hashing construction — Kirsch &
  * Mitzenmacher 2006 — so each token is hashed twice, not `numHashes`
  * times); signature[i] = min over tokens. E[fraction of equal
  * components] ≈ Jaccard similarity of the shingle sets (Broder 1997).
  * Empty/all-null arrays → Long.MaxValue components (never collides
  * with a real min).
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() = {
    child.dataType match {
      case ArrayType(StringType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_sig requires array<string>, got ${other.catalogString}")
    }
  }
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill[Long](numHashes)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val tok = arr.getUTF8String(i)
        val h1 = XxHash64Function.hash(tok, StringType, 0x9E3779B9L)
        val h2 = XxHash64Function.hash(tok, StringType, 0x85EBCA6BL) | 1L
        var s = 0
        var h = h1
        while (s < numHashes) {
          if (h < sig(s)) sig(s) = h
          h += h2 // wraps mod 2^64
          s += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object HashFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))
  def minhashSig(tokens: Column, numHashes: Int = 64): Column =
    ColumnBridge.column(
      MinHashSig(ColumnBridge.expression(tokens), numHashes))
}
