package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProduct, MinHashAgg, MinHashSig, PairCountAgg, SetJaccard, SigAgreement, SimHash64, SimHashAgg, SrpSignature, VectorSumAgg}

/** Registers the engine's native expressions as SQL functions, so the
  * full surface is reachable from `spark.sql(...)` as well as the
  * DataFrame API:
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions)...
  *
  * or via config (no code changes):
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * SQL surface:
  *   simhash64(array<string>)             → bigint
  *   minhash_sig(array<string>[, k])      → array<bigint>
  *   minhash_agg(array<string>[, k])      → array<bigint>  (aggregate)
  *   simhash_agg(array<string>)           → bigint         (aggregate)
  *   dot_product(array<T>, array<T>)      → double   (T ∈ float, double)
  *   set_jaccard(array<string>, array<string>) → double
  *   srp_signature(array<T>[, seed])      → bigint   (sign-projection LSH)
  *   vector_sum(array<double>)            → array<double>  (aggregate)
  *   sig_agreement(array<bigint>, array<bigint>) → double
  *   pair_count(integral)                 → bigint   (aggregate)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit SimHash of a token array"),
      (args: Seq[Expression]) => SimHash64(args.head)))
    e.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(tokens[, k]) - MinHash signature"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => MinHashSig(c, 64)
        case Seq(c, k) => MinHashSig(c,
          k.eval().asInstanceOf[Number].intValue())
        case _ => throw new IllegalArgumentException(
          "minhash_sig expects (tokens[, numHashes])")
      }))
    e.injectFunction((FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - vector dot product"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    e.injectFunction((FunctionIdentifier("set_jaccard"),
      info("set_jaccard", "set_jaccard(a, b) - Jaccard of two string sets"),
      (args: Seq[Expression]) => SetJaccard(args(0), args(1))))
    e.injectFunction((FunctionIdentifier("minhash_agg"),
      info("minhash_agg", "minhash_agg(tokens[, k]) - group-level MinHash sketch"),
      (args: Seq[Expression]) => (args match {
        case Seq(c) => MinHashAgg(c, 64)
        case Seq(c, k) => MinHashAgg(c,
          k.eval().asInstanceOf[Number].intValue())
        case _ => throw new IllegalArgumentException(
          "minhash_agg expects (tokens[, numHashes])")
      }).toAggregateExpression()))
    e.injectFunction((FunctionIdentifier("simhash_agg"),
      info("simhash_agg", "simhash_agg(tokens) - group-level SimHash signature"),
      (args: Seq[Expression]) =>
        SimHashAgg(args.head).toAggregateExpression()))
    e.injectFunction((FunctionIdentifier("srp_signature"),
      info("srp_signature", "srp_signature(vec[, seed]) - sign-projection LSH signature"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => SrpSignature(c, 42L)
        case Seq(c, s) => SrpSignature(c,
          s.eval().asInstanceOf[Number].longValue())
        case _ => throw new IllegalArgumentException(
          "srp_signature expects (vector[, seed])")
      }))
    e.injectFunction((FunctionIdentifier("vector_sum"),
      info("vector_sum", "vector_sum(vec) - elementwise sum aggregate"),
      (args: Seq[Expression]) => VectorSumAgg(args.head).toAggregateExpression()))
    e.injectFunction((FunctionIdentifier("sig_agreement"),
      info("sig_agreement", "sig_agreement(a, b) - fraction of equal signature components"),
      (args: Seq[Expression]) => SigAgreement(args(0), args(1))))
    e.injectFunction((FunctionIdentifier("pair_count"),
      info("pair_count", "pair_count(v) - per-group count of pairs with v_i < v_j"),
      (args: Seq[Expression]) => PairCountAgg(args.head).toAggregateExpression()))
    // kernel selection the optimizer can prove: sorted+distinct inputs
    // switch set_jaccard to the allocation-free merge-walk kernel
    e.injectOptimizerRule(_ => graft.plans.SortedKernelRule)
  }
}

object GraftExtensions {
  /** Registers the same functions on an already-built session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg: FunctionRegistry = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("simhash64",
      args => SimHash64(args.head), "built-in")
    reg.createOrReplaceTempFunction("minhash_sig",
      args => args match {
        case Seq(c) => MinHashSig(c, 64)
        case Seq(c, k) => MinHashSig(c, k.eval().asInstanceOf[Number].intValue())
        case _ => throw new IllegalArgumentException(
          "minhash_sig expects (tokens[, numHashes])")
      }, "built-in")
    reg.createOrReplaceTempFunction("dot_product",
      args => DotProduct(args(0), args(1)), "built-in")
    reg.createOrReplaceTempFunction("set_jaccard",
      args => SetJaccard(args(0), args(1)), "built-in")
    reg.createOrReplaceTempFunction("minhash_agg",
      args => (args match {
        case Seq(c) => MinHashAgg(c, 64)
        case Seq(c, k) => MinHashAgg(c, k.eval().asInstanceOf[Number].intValue())
        case _ => throw new IllegalArgumentException(
          "minhash_agg expects (tokens[, numHashes])")
      }).toAggregateExpression(), "built-in")
    reg.createOrReplaceTempFunction("simhash_agg",
      args => SimHashAgg(args.head).toAggregateExpression(), "built-in")
    reg.createOrReplaceTempFunction("srp_signature",
      args => args match {
        case Seq(c) => SrpSignature(c, 42L)
        case Seq(c, s) => SrpSignature(c, s.eval().asInstanceOf[Number].longValue())
        case _ => throw new IllegalArgumentException(
          "srp_signature expects (vector[, seed])")
      }, "built-in")
    reg.createOrReplaceTempFunction("vector_sum",
      args => VectorSumAgg(args.head).toAggregateExpression(), "built-in")
    reg.createOrReplaceTempFunction("sig_agreement",
      args => SigAgreement(args(0), args(1)), "built-in")
    reg.createOrReplaceTempFunction("pair_count",
      args => PairCountAgg(args.head).toAggregateExpression(), "built-in")
  }
}
