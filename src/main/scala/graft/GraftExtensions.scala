package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DocFreqAgg, DotProduct, FoldTokens, HeavyHittersAgg, MinHashAgg, MinHashSig, MinIdsAgg, NGramHashes, PairCountAgg, PortableMinHashSig, PortableSimHash32, PortableSrpSig, RollingFingerprint, ScrubTokens, SetJaccard, SigAgreement, SimHash64, SimHashAgg, SrpSignature, VectorSumAgg, WsTokens}

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
  *   doc_freq(id, cap)                    → struct&lt;df,ids&gt; (aggregate)
  *   min_ids(id, n)                       → struct&lt;df,ids&gt; (aggregate; n smallest, sorted)
  *   heavy_hitters(item, k)               → array&lt;struct&lt;item,est&gt;&gt; (aggregate; MG sketch)
  *   ngram_hashes(array<string>, n[, keepPartial]) → array<bigint>
  *   rolling_fingerprint(string)          → bigint
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.builders.foreach { case (name, usage, build) =>
      e.injectFunction((FunctionIdentifier(name), info(name, usage), build))
    }
    // kernel selection the optimizer can prove: sorted+distinct inputs
    // switch set_jaccard to the allocation-free merge-walk kernel
    e.injectOptimizerRule(_ => graft.plans.SortedKernelRule)
  }
}

object GraftExtensions {

  private def arity(name: String, signature: String): Nothing =
    throw new IllegalArgumentException(s"$name expects $signature")

  /** Literal scalar parameters (hash counts, caps, flags) must be
    * foldable non-null — a column or NULL argument would otherwise
    * surface as an NPE/ClassCast from the eager eval() instead of a
    * clean analysis error.
    */
  private def litValue(name: String, what: String, e: Expression): Any = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$name: $what must be a literal, got ${e.sql}")
    val v = e.eval()
    if (v == null) throw new IllegalArgumentException(
      s"$name: $what must not be NULL")
    v
  }
  private def litInt(name: String, what: String, e: Expression): Int =
    litValue(name, what, e) match {
      case n: Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"$name: $what must be an integer literal, got $other")
    }
  private def litLong(name: String, what: String, e: Expression): Long =
    litValue(name, what, e) match {
      case n: Number => n.longValue()
      case other => throw new IllegalArgumentException(
        s"$name: $what must be an integer literal, got $other")
    }
  private def litBool(name: String, what: String, e: Expression): Boolean =
    litValue(name, what, e) match {
      case b: Boolean => b
      case other => throw new IllegalArgumentException(
        s"$name: $what must be a boolean literal, got $other")
    }

  /** One builder per SQL function, shared by the extension injection and
    * the temp-function registration so the two surfaces cannot drift.
    * Every builder pattern-matches arity and rejects mismatches with
    * IllegalArgumentException (never a bare NoSuchElementException).
    */
  private val builders: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("simhash64", "simhash64(tokens) - 64-bit SimHash of a token array",
      { case Seq(c) => SimHash64(c)
        case _ => arity("simhash64", "(tokens)") }),
    ("minhash_sig", "minhash_sig(tokens[, k]) - MinHash signature",
      { case Seq(c) => MinHashSig(c, 64)
        case Seq(c, k) => MinHashSig(c, litInt("minhash_sig", "numHashes", k))
        case _ => arity("minhash_sig", "(tokens[, numHashes])") }),
    ("dot_product", "dot_product(a, b) - vector dot product",
      { case Seq(a, b) => DotProduct(a, b)
        case _ => arity("dot_product", "(a, b)") }),
    ("set_jaccard", "set_jaccard(a, b) - Jaccard of two string sets",
      { case Seq(a, b) => SetJaccard(a, b)
        case _ => arity("set_jaccard", "(a, b)") }),
    ("minhash_agg", "minhash_agg(tokens[, k]) - group-level MinHash sketch",
      { case Seq(c) => MinHashAgg(c, 64).toAggregateExpression()
        case Seq(c, k) => MinHashAgg(c,
          litInt("minhash_agg", "numHashes", k)).toAggregateExpression()
        case _ => arity("minhash_agg", "(tokens[, numHashes])") }),
    ("simhash_agg", "simhash_agg(tokens) - group-level SimHash signature",
      { case Seq(c) => SimHashAgg(c).toAggregateExpression()
        case _ => arity("simhash_agg", "(tokens)") }),
    ("srp_signature", "srp_signature(vec[, seed]) - sign-projection LSH signature",
      { case Seq(c) => SrpSignature(c, 42L)
        case Seq(c, s) => SrpSignature(c, litLong("srp_signature", "seed", s))
        case _ => arity("srp_signature", "(vector[, seed])") }),
    ("vector_sum", "vector_sum(vec) - elementwise sum aggregate",
      { case Seq(c) => VectorSumAgg(c).toAggregateExpression()
        case _ => arity("vector_sum", "(vector)") }),
    ("sig_agreement", "sig_agreement(a, b) - fraction of equal signature components",
      { case Seq(a, b) => SigAgreement(a, b)
        case _ => arity("sig_agreement", "(a, b)") }),
    ("pair_count", "pair_count(v) - per-group count of pairs with v_i < v_j",
      { case Seq(c) => PairCountAgg(c).toAggregateExpression()
        case _ => arity("pair_count", "(v)") }),
    ("doc_freq", "doc_freq(id, cap) - per-group struct(df, ids) with ids capped",
      { case Seq(c, cap) => DocFreqAgg(c,
          litInt("doc_freq", "cap", cap)).toAggregateExpression()
        case _ => arity("doc_freq", "(id, cap)") }),
    ("min_ids", "min_ids(id, n) - per-group struct(df, ids): n smallest ids, sorted",
      { case Seq(c, n) => MinIdsAgg(c,
          litInt("min_ids", "n", n)).toAggregateExpression()
        case _ => arity("min_ids", "(id, n)") }),
    ("heavy_hitters", "heavy_hitters(item, k) - Misra-Gries frequent-items sketch",
      { case Seq(c, kk) => HeavyHittersAgg(c,
          litInt("heavy_hitters", "k", kk)).toAggregateExpression()
        case _ => arity("heavy_hitters", "(item, k)") }),
    ("ngram_hashes",
      "ngram_hashes(tokens, n[, keepPartial]) - one-pass hashed k-grams",
      { case Seq(c, n) => NGramHashes(c,
          litInt("ngram_hashes", "n", n), keepPartial = false)
        case Seq(c, n, kp) => NGramHashes(c,
          litInt("ngram_hashes", "n", n),
          litBool("ngram_hashes", "keepPartial", kp))
        case _ => arity("ngram_hashes", "(tokens, n[, keepPartial])") }),
    ("rolling_fingerprint",
      "rolling_fingerprint(s) - portable rolling-hash fingerprint",
      { case Seq(c) => RollingFingerprint(c)
        case _ => arity("rolling_fingerprint", "(s)") }),
    ("portable_minhash_sig",
      "portable_minhash_sig(tokens, k) - md5-based MinHash signature " +
        "(bit-identical to the md5/substr/list_min SQL spelling)",
      { case Seq(c, k) => PortableMinHashSig(c,
          litInt("portable_minhash_sig", "k", k))
        case _ => arity("portable_minhash_sig", "(tokens, k)") }),
    ("portable_simhash32",
      "portable_simhash32(tokens) - 32-bit md5-nibble SimHash",
      { case Seq(c) => PortableSimHash32(c)
        case _ => arity("portable_simhash32", "(tokens)") }),
    ("portable_srp_sig",
      "portable_srp_sig(qv, bits, dim) - md5-weighted integer " +
        "sign-projection signature over a quantized vector",
      { case Seq(c, b, d) => PortableSrpSig(c,
          litInt("portable_srp_sig", "bits", b),
          litInt("portable_srp_sig", "dim", d))
        case _ => arity("portable_srp_sig", "(qv, bits, dim)") }),
    ("scrub_tokens",
      "scrub_tokens(tokens, starts, k) - drop tokens covered by " +
        "k-windows at the given start positions (any order)",
      // sort inside the registration: the two-pointer kernel requires
      // ascending starts, and a raw-SQL caller passing unsorted
      // positions would otherwise get silently wrong scrubs (the
      // DataFrame builder already sorts)
      { case Seq(t, s, k) => ScrubTokens(t,
          org.apache.spark.sql.catalyst.expressions.SortArray(s,
            org.apache.spark.sql.catalyst.expressions.Literal(true)),
          litInt("scrub_tokens", "k", k))
        case _ => arity("scrub_tokens", "(tokens, starts, k)") }),
    ("ws_tokens",
      "ws_tokens(text) - production whitespace tokenizer (split on " +
        "\\s+ runs, no empties)",
      { case Seq(t) => WsTokens(t)
        case _ => arity("ws_tokens", "(text)") }),
    ("fold_tokens",
      "fold_tokens(tokens) - lowercase + strip non-alphanumeric edges, " +
        "drop pure-punctuation tokens",
      { case Seq(t) => FoldTokens(t)
        case _ => arity("fold_tokens", "(tokens)") }))

  /** Registers the same functions on an already-built session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg: FunctionRegistry = spark.sessionState.functionRegistry
    builders.foreach { case (name, _, build) =>
      reg.createOrReplaceTempFunction(name, build, "built-in")
    }
  }
}
