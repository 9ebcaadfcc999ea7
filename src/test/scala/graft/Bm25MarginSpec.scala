package graft

import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis

/** Rounding-boundary margin pins for the x98 BM25 contract
  * (`TextAnalysis.bm25TopK`, r12 environment-proof hardening).
  *
  * The contract publishes two double→DECIMAL(18,6) quantizations per
  * matched (doc, term):
  *  - `tfn` — ONE IEEE division of exact integers (zero libm): the
  *    only cross-engine hazard is the ROUND(double, 6) implementation
  *    itself (multiply-by-1e6 / shortest-repr / exact-binary variants
  *    agree unless the value sits within ~2e-15 of a boundary).
  *  - `idf` — `ln` of one exact-integer division: the only libm call;
  *    a conforming `ln` is within a couple ulps (~4e-16 absolute
  *    here).
  * These tests recompute every factor in pure Scala over BOTH fixture
  * SFs (sf0.001 unit scale + the driver's sf0.01 gate) and pin the
  * EXACT binary distance of each factor from its nearest 6-dp
  * rounding boundary (k+0.5)·1e-6 at ≥1e-11 (tfn) / ≥1e-8 (idf) —
  * 10³–10⁷× the worst conforming-implementation skew — so NO
  * conforming engine/libm can round a factor differently, and (since
  * the decimal product + sum are exact arithmetic, half-up positive)
  * the published scores are bit-deterministic everywhere.
  *
  * Measured fixture minima (exact-decimal audit): tfn 2.07e-9
  * (sf0.001) / 5.08e-11 (sf0.01) / 2.26e-10 (sf0.1); idf ≥8.7e-8 at
  * all three SFs.
  */
class Bm25MarginSpec extends SparkSpec {
  import TextAnalysis.tokens

  private val queryTerms = Seq("hash", "join", "window", "dup")
  private val (k1Pct, bPct) = (120, 75)

  /** Exact binary distance of double `x` from its nearest 6-dp
    * rounding boundary, computed in java.math.BigDecimal (the EXACT
    * binary expansion of `x` — not its shortest repr) so the
    * measurement itself has no floating-point error.
    */
  private def margin6(x: Double): BigDecimal = {
    val g = BigDecimal(new java.math.BigDecimal(x)) * BigDecimal(10).pow(6)
    val frac = g - g.setScale(0, BigDecimal.RoundingMode.FLOOR)
    ((frac - BigDecimal("0.5")).abs) / BigDecimal(10).pow(6)
  }

  /** The per-(doc,term) statistics rows `(tf, df, dl, n, s)` exactly
    * as bm25TopK derives them — bounded by |queryTerms|·|docs| and
    * collected only in this test.
    */
  private def statRows(dir: String): Array[(Long, Long, Long, Long, Long)] = {
    val docs = Tables.load(spark, dir, "documents")
    val base = docs.filter(col("text").isNotNull)
      .select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("dl"),
        tokens(col("text")).as("toks"))
    val Array(nS) = base.agg(count(lit(1)).as("n"), sum(col("dl")).as("s"))
      .collect()
    val (n, s) = (nS.getLong(0), nS.getLong(1))
    val tf = base.select(col("doc_id"), col("dl"),
        explode(col("toks")).as("term"))
      .filter(col("term").isInCollection(queryTerms))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(df, "term")
      .select(col("tf"), col("df"), col("dl"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), n, s))
  }

  test("x98 factors sit far from every 6-dp rounding boundary " +
      "(tfn >= 1e-11, idf >= 1e-8) at both fixture SFs") {
    for (dir <- Seq(sf0001, sf001)) {
      val rows = statRows(dir)
      assert(rows.nonEmpty, s"no query-term hits in $dir")
      var minTfn = BigDecimal(1); var minIdf = BigDecimal(1)
      rows.foreach { case (tf, df, dl, n, s) =>
        val tfn = (tf * (k1Pct + 100) * 100L * s).toDouble /
          (10000L * tf * s + k1Pct * (100L - bPct) * s +
            k1Pct * bPct * dl * n).toDouble
        val idf = math.log((2L * n + 2L).toDouble / (2L * df + 1L).toDouble)
        minTfn = minTfn.min(margin6(tfn))
        minIdf = minIdf.min(margin6(idf))
        // the exactness bound of the integer-ratio contract
        assert(tf * (k1Pct + 100) * 100L * s < (1L << 53),
          s"tfn numerator exceeds 2^53 exactness in $dir")
      }
      assert(minTfn >= BigDecimal("1e-11"),
        s"$dir: tfn margin $minTfn below pin — a round-impl skew " +
          "(~2e-15) could diverge cross-engine")
      assert(minIdf >= BigDecimal("1e-8"),
        s"$dir: idf margin $minIdf below pin — a libm ulp (~4e-16) " +
          "could diverge cross-engine")
    }
  }

  test("x98 published scores equal a pure-Scala decimal recomputation " +
      "bit-for-bit (JVM mini-oracle) at the driver gate SF") {
    val rows = statRows(sf001)
    // pure-Scala recomputation of the published contract
    val byDoc = scala.collection.mutable.Map
      .empty[(Long, Long), (Long, BigDecimal)]
    val docs = Tables.load(spark, sf001, "documents")
    val base = docs.filter(col("text").isNotNull)
      .select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("dl"),
        tokens(col("text")).as("toks"))
    val Array(nS) = base.agg(count(lit(1)).as("n"), sum(col("dl")).as("s"))
      .collect()
    val (n, s) = (nS.getLong(0), nS.getLong(1))
    val tfRows = base.select(col("doc_id"), col("dl"),
        explode(col("toks")).as("term"))
      .filter(col("term").isInCollection(queryTerms))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
    val dfMap = tfRows.groupBy("term").agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    tfRows.collect().foreach { r =>
      val (id, dl, term, tf) =
        (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))
      val df = dfMap(term)
      val idf = BigDecimal(
          math.log((2L * n + 2L).toDouble / (2L * df + 1L).toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      val tfn = BigDecimal(
          (tf * (k1Pct + 100) * 100L * s).toDouble /
          (10000L * tf * s + k1Pct * (100L - bPct) * s +
            k1Pct * bPct * dl * n).toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      val c = (idf * tfn).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      val (nh, sc) = byDoc.getOrElse((id, dl), (0L, BigDecimal(0)))
      byDoc((id, dl)) = (nh + 1L, sc + c)
    }
    val expected = byDoc.toSeq
      .map { case ((id, dl), (nh, sc)) => (id, dl, nh, sc) }
      .sortBy { case (id, _, _, sc) => (-sc, id) }
      .take(12)
    val got = TextAnalysis.bm25TopK(docs, "doc_id", "text",
        queryTerms, k1Pct, bPct, k = 12)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        BigDecimal(r.getDecimal(3))))
      .toSeq
    assert(got === expected)
    assert(rows.length === tfRows.count())
  }
}
