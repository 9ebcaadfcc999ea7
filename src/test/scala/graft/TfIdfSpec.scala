package graft

import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis

/** tfIdfTopK against a hand-computed corpus, plus rank-shape invariants
  * on the fixture.
  */
class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  test("lmQuality: hand-computed add-one bigram scores on a tiny corpus") {
    // corpus: d1 = "a b a b", d2 = "a b c"
    // bigrams (a,b):3 (b,a):1 (b,c):1; prefixes a:3 b:2;
    // participating vocab {a,b,c} -> V=3
    // nll(a,b) = -ln(4/(3+3)); nll(b,a) = nll(b,c) = -ln(2/(2+3))
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val got = TextAnalysis.lmQuality(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val nllAb = BigDecimal(-math.log(4.0 / 6.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val nllLow = BigDecimal(-math.log(2.0 / 5.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L)._1 === 3L)
    assert(got(2L)._1 === 2L)
    assert(math.abs(got(1L)._2 - (2 * nllAb + nllLow) / 3) < 1e-9)
    assert(math.abs(got(2L)._2 - (nllAb + nllLow) / 2) < 1e-9)
    // the repetitive doc is MORE typical of this corpus (lower nll)
    assert(got(1L)._2 < got(2L)._2)
  }

  test("knLmQuality: hand-computed Kneser-Ney scores on a tiny corpus") {
    // corpus: d1 = "a b a b", d2 = "a b c"
    // cb: (a,b)=3 (b,a)=1 (b,c)=1; cu(a)=3 n1f(a)=1; cu(b)=2 n1f(b)=2
    // n1p: a=1 b=1 c=1; B=3 bigram types; d=0.75
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val got = TextAnalysis.knLmQuality(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    def nll(p: Double): Double = BigDecimal(-math.log(p))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pAB = ((3 - 0.75) / 3.0) + (((0.75 * 1) / 3.0) * (1.0 / 3.0))
    val pBA = ((1 - 0.75) / 2.0) + (((0.75 * 2) / 2.0) * (1.0 / 3.0))
    val pBC = pBA // symmetric counts
    assert(got(1L)._1 === 3L && got(2L)._1 === 2L)
    assert(math.abs(got(1L)._2 - (2 * nll(pAB) + nll(pBA)) / 3) < 1e-9)
    assert(math.abs(got(2L)._2 - (nll(pAB) + nll(pBC)) / 2) < 1e-9)
    // every observed-bigram probability here is in (0,1) (this corpus
    // has no single-successor/full-continuation corner, where P = 1
    // and nlp = 0 exactly); the high-continuation doc scores lower nll
    assert(got(1L)._2 > 0.0 && got(2L)._2 > 0.0)
    assert(got(1L)._2 < got(2L)._2)
    // the discounted path orders the same corpus as add-one here, but
    // with a LOWER nll for the frequent bigram (less mass stolen)
    val addOne = TextAnalysis.lmQuality(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(1L)._2 < addOne(1L))
  }

  test("knTrigramQuality: hand-computed trigram Kneser-Ney recursion") {
    // d1 = "a b c a b c": trigrams abc,bca,cab,abc; d2 = "a b c d":
    // abc,bcd. Type counts c3: abc=3 bca=1 cab=1 bcd=1.
    // ctx: (a,b)=(3,1) (b,c)=(2,2) (c,a)=(1,1)
    // cont (distinct w1 per suffix): (b,c)=1 (c,a)=1 (a,b)=1 (c,d)=1
    // mid: b=(1,1) c=(2,2) a=(1,1); pred: all 1; B=4; d=0.75
    val docs = Seq((1L, "a b c a b c"), (2L, "a b c d"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.knTrigramQuality(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    def nll(p: Double): Double = BigDecimal(-math.log(p))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def pcont(cont: Long, mid: Long, n2f: Long, pred: Long): Double =
      ((cont - 0.75) / mid) + (((0.75 * n2f) / mid) * (pred / 4.0))
    def p(c3: Long, ctx: Long, n3f: Long, pc: Double): Double =
      ((c3 - 0.75) / ctx) + (((0.75 * n3f) / ctx) * pc)
    val pAbc = p(3, 3, 1, pcont(1, 1, 1, 1)) // 0.859375
    val pBca = p(1, 2, 2, pcont(1, 2, 2, 1)) // 0.359375
    val pCab = p(1, 1, 1, pcont(1, 1, 1, 1)) // 0.578125
    val pBcd = p(1, 2, 2, pcont(1, 2, 2, 1)) // 0.359375
    assert(got(1L)._1 === 4L && got(2L)._1 === 2L)
    assert(math.abs(got(1L)._2 -
      (2 * nll(pAbc) + nll(pBca) + nll(pCab)) / 4) < 1e-9)
    assert(math.abs(got(2L)._2 - (nll(pAbc) + nll(pBcd)) / 2) < 1e-9)
    // the frequent repeated pattern scores more typical (lower nll)
    assert(got(1L)._2 < got(2L)._2)
    // sub-3-token docs are out of contract: absent, not zero-row'd
    import spark.implicits._
    val withShort = docs.union(Seq((3L, "x y")).toDF("doc_id", "text"))
    val ids = TextAnalysis.knTrigramQuality(withShort, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L, 2L))
  }

  test("corpusKlReport: hand-computed contributions; identical snapshots are zero") {
    val v1 = Seq((1L, "a a b")).toDF("doc_id", "text")
    val v2 = Seq((1L, "a b b")).toDF("doc_id", "text")
    val got = TextAnalysis.corpusKlReport(v1, v2, "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // union vocab {a,b}, V=2, N1=N2=3: p(a)=3/5, q(a)=2/5; p(b)=2/5, q(b)=3/5
    assert(got === Map(
      "a" -> ((2L, 1L, r6(0.6 * math.log(0.6 / 0.4)))),
      "b" -> ((1L, 2L, r6(0.4 * math.log(0.4 / 0.6))))))
    // total KL > 0 for drifted snapshots; exactly 0 token-wise when equal
    assert(got.values.map(_._3).sum > 0.0)
    val same = TextAnalysis.corpusKlReport(v1, v1, "text")
      .collect().map(_.getDouble(3))
    assert(same.forall(_ === 0.0))
  }

  test("normalizeText: absolute pins for fold, collapse, trim, pass-through") {
    def n(s: String): String = spark.range(1)
      .select(TextAnalysis.normalizeText(lit(s)).as("x"))
      .collect().head.getString(0)
    assert(n("HeLLo WoRLD") === "hello world")
    assert(n("H\u00c9llo  W\u00d6rld") === "hello world")
    assert(n("\u00c0\u00c9\u00ce\u00d5\u00dc \u00c7\u00e0") === "aeiou ca")
    assert(n("a\tb\n\nc\rd") === "a b c d")
    assert(n("  lead and trail  ") === "lead and trail")
    assert(n("") === "")
    assert(n(" \t\n ") === "")
    // outside the fold table: passes through (documented contract)
    assert(n("stra\u00dfe \u00f8re") === "stra\u00dfe \u00f8re")
    // the fold table is positionally aligned
    assert(TextAnalysis.AccentFrom.length === TextAnalysis.AccentTo.length)
  }

  test("ccnetBuckets: tercile sizes, boundary order, and full coverage per lang") {
    val docs = Tables.load(spark, sf0001, "documents")
    val got = TextAnalysis.ccnetBuckets(docs, "doc_id", "text", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(3),
        r.getString(4)))
    assert(got.nonEmpty)
    // every scored doc (>= 1 bigram) is bucketed exactly once
    val scored = TextAnalysis.lmQuality(docs, "doc_id", "text").count()
    assert(got.length.toLong === scored)
    assert(got.map(_._1).distinct.length === got.length)
    got.groupBy(_._2).foreach { case (lang, rows) =>
      val sizes = rows.groupBy(_._4).view.mapValues(_.length).toMap
      val ordered = Seq("head", "middle", "tail").map(sizes.getOrElse(_, 0))
      // ntile contract: sizes differ by at most 1, larger terciles first
      assert(ordered.max - ordered.min <= 1, s"lang=$lang sizes=$sizes")
      assert(ordered.head >= ordered(1) && ordered(1) >= ordered(2),
        s"lang=$lang sizes=$sizes")
      // boundary monotonicity: head scores <= middle scores <= tail
      def scores(b: String) = rows.filter(_._4 == b).map(_._3)
      if (scores("head").nonEmpty && scores("middle").nonEmpty)
        assert(scores("head").max <= scores("middle").min, s"lang=$lang")
      if (scores("middle").nonEmpty && scores("tail").nonEmpty)
        assert(scores("middle").max <= scores("tail").min, s"lang=$lang")
    }
  }

  test("ccnetBucketsKn3 (x115): same tercile invariants on the " +
      "trigram-KN score; coverage = every >=1-trigram doc") {
    val docs = Tables.load(spark, sf0001, "documents")
    val got = TextAnalysis.ccnetBucketsKn3(docs, "doc_id", "text", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(3),
        r.getString(4)))
    assert(got.nonEmpty)
    val scored = TextAnalysis.knTrigramQuality(docs, "doc_id", "text")
      .count()
    assert(got.length.toLong === scored)
    assert(got.map(_._1).distinct.length === got.length)
    got.groupBy(_._2).foreach { case (lang, rows) =>
      val sizes = rows.groupBy(_._4).view.mapValues(_.length).toMap
      val ordered = Seq("head", "middle", "tail").map(sizes.getOrElse(_, 0))
      assert(ordered.max - ordered.min <= 1, s"lang=$lang sizes=$sizes")
      assert(ordered.head >= ordered(1) && ordered(1) >= ordered(2),
        s"lang=$lang sizes=$sizes")
      def scores(b: String) = rows.filter(_._4 == b).map(_._3)
      if (scores("head").nonEmpty && scores("middle").nonEmpty)
        assert(scores("head").max <= scores("middle").min, s"lang=$lang")
      if (scores("middle").nonEmpty && scores("tail").nonEmpty)
        assert(scores("middle").max <= scores("tail").min, s"lang=$lang")
    }
  }

  test("foldPackReport (x117): hand-computed folded pairing — fit, " +
      "split, oversize, and odd-count branches") {
    def doc(id: Long, s: String, n: Int) =
      (id, s, Seq.fill(n)("w").mkString(" "))
    // block s, L=10: packable lengths desc 7,6,5,3 → (7,3) fits (1
    // bin), (6,5)=11 splits (2 bins); d5 (12) oversize; block t: one
    // 4-token doc → odd middle, own bin
    val docs = Seq(doc(1, "s", 7), doc(2, "s", 3), doc(3, "s", 6),
      doc(4, "s", 5), doc(5, "s", 12), doc(6, "t", 4))
      .toDF("doc_id", "source", "text")
    val got = TextAnalysis.foldPackReport(docs, "doc_id", "text",
        "source", seqLen = 10)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))))
      .toMap
    assert(got === Map(
      "s" -> ((4L, 1L, 1L, 3L, 21L, 21.0 / 30.0)),
      "t" -> ((1L, 0L, 0L, 1L, 4L, 4.0 / 10.0))))
  }

  test("zipfAudit (x118): pure-Scala recomputation of the contract " +
      "on a hand corpus; fixture slopes are negative") {
    // the r13 portable-quantize contract: FLOOR(ln·10⁴ + 0.5) micros
    def u4(v: Long): Long =
      math.floor(math.log(v.toDouble) * 10000.0 + 0.5).toLong
    // one block: freqs a=4 b=2 c=1 → ranks 1,2,3
    val docs = Seq((1L, "s", "a a a a b b c"))
      .toDF("doc_id", "source", "text")
    val got = TextAnalysis.zipfAudit(docs, "doc_id", "text", "source")
      .collect().head
    val xs = Seq(1L, 2L, 3L).map(u4)
    val ys = Seq(4L, 2L, 1L).map(u4)
    val (n, sx, sy) = (3.0, xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val slope = (n * sxy.toDouble - sx.toDouble * sy.toDouble) /
      (n * sxx.toDouble - sx.toDouble * sx.toDouble)
    assert(got.getLong(1) === 3L)
    assert(got.getLong(2) === sx)
    assert(got.getLong(3) === sy)
    assert(got.getLong(4) === sxy)
    assert(got.getLong(5) === sxx)
    assert(got.getDouble(6) === slope)
    assert(slope < 0.0)
    // the maxRank head cap drops tail types from the fit
    val capped = TextAnalysis.zipfAudit(docs, "doc_id", "text",
      "source", maxRank = 2).collect().head
    assert(capped.getLong(1) === 2L)
    assert(capped.getLong(2) === xs.take(2).sum)
    // fixture: every source's curve slopes down (synthetic vocab is
    // flatter than natural text's ~-1, but monotone decreasing)
    val fix = TextAnalysis.zipfAudit(
        Tables.load(spark, sf0001, "documents"),
        "doc_id", "text", "source")
      .select("slope").collect().map(_.getDouble(0))
    assert(fix.nonEmpty && fix.forall(_ < 0.0))
  }

  test("heapsAudit (x139): level nesting is monotone, the full level " +
      "equals direct totals, slope recomputes from the published row") {
    val docs = Tables.load(spark, sf0001, "documents")
      .filter($"text".isNotNull)
    val got = TextAnalysis.heapsAudit(docs, "doc_id", "text", "source")
      .collect()
    assert(got.nonEmpty)
    // direct full-corpus totals per source
    val direct = docs
      .select($"source", explode(split($"text", " ", -1)).as("tok"))
      .groupBy("source")
      .agg(count(lit(1)).as("t"), countDistinct($"tok").as("v"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    def u4(v: Long): Long =
      math.floor(math.log(v.toDouble) * 10000.0 + 0.5).toLong
    got.foreach { r =>
      val src = r.getString(0)
      val ts = (1 to 4).map(l => r.getLong(1 + (l - 1) * 2))
      val vs = (1 to 4).map(l => r.getLong(2 + (l - 1) * 2))
      // nested samples: token and type counts non-decreasing in level
      assert(ts === ts.sorted, s"$src tokens not monotone: $ts")
      assert(vs === vs.sorted, s"$src types not monotone: $vs")
      // the full level IS the corpus
      assert((ts.last, vs.last) === direct(src))
      // sublinear growth: types never exceed tokens at any level
      ts.zip(vs).foreach { case (t, v) => assert(v <= t) }
      // slope recomputes bit-for-bit from the published counts
      val live = ts.zip(vs).filter(_._1 > 0L)
      val xs = live.map(p => u4(p._1)); val ys = live.map(p => u4(p._2))
      val n = live.size.toLong
      val (sx, sy) = (xs.sum, ys.sum)
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val sxx = xs.map(a => a * a).sum
      val den = n * sxx - sx * sx
      if (n < 2 || den == 0L) assert(r.isNullAt(9))
      else assert(r.getDouble(9) ===
        (n * sxy - sx * sy).toDouble / den.toDouble)
      // co-monotone points make the covariance non-negative
      // (Chebyshev's sum inequality), so a fitted slope is never
      // negative; 0 is legal on a tiny fixture whose vocabulary
      // saturates at the first level (src2 at sf0.001 does)
      if (!r.isNullAt(9))
        assert(r.getDouble(9) >= 0.0 && r.getDouble(9) < 1.5,
          s"$src heaps slope ${r.getDouble(9)} out of range")
    }
  }

  test("psiDriftReport (x140): identical sides give zero contribs; " +
      "a hand shift matches the closed form; buckets cap at the grid") {
    val a = Seq((1L, 10L), (2L, 40L), (3L, 70L), (4L, 300L))
      .toDF("id", "s")
    // identical distributions → every contribution exactly 0.0
    val same = TextAnalysis.psiDriftReport(a, a, $"s", 32L, 8)
      .as[(Long, Long, Long, Double)].collect()
    assert(same.map(_._1).sorted === Array(0L, 1L, 2L, 7L)) // 300→cap 7
    assert(same.forall(_._4 === 0.0))
    // hand shift: old has buckets {0,1}, new has {1}; grid B=4, w=10
    val o = Seq((1L, 5L), (2L, 15L)).toDF("id", "s")
    val nw = Seq((3L, 15L)).toDF("id", "s")
    val got = TextAnalysis.psiDriftReport(o, nw, $"s", 10L, 4)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    def contrib(nOld: Long, nNew: Long, t1: Long, t2: Long): Double = {
      val p = (nOld + 1).toDouble / (t1 + 4)
      val q = (nNew + 1).toDouble / (t2 + 4)
      BigDecimal((p - q) * math.log(p / q))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got(0L)._2 === 1L && got(0L)._3 === 0L)
    assert(got(0L)._4 === contrib(1L, 0L, 2L, 1L))
    assert(got(1L)._4 === contrib(1L, 1L, 2L, 1L))
    // the lost-mass bucket contributes positively, the stable one
    // (old 1 vs new 1 of a smaller side) negatively — signs carry
    // direction like x105
    assert(got(0L)._4 > 0.0)
  }

  test("ksDriftReport (x144): identical sides are 0, disjoint " +
      "supports are 1e6, a hand half-shift is 500000, one-sided " +
      "strata are NULL") {
    // A: complete separation — old {1,2} vs new {3,4} → D = 1
    // B: identical point masses (ties collapse exactly) → D = 0
    // C: old {1,2} vs new {1,5} → sup gap at v=2: |1 − 1/2| = 1/2
    // D: old-only stratum → NULL micros, counts still exact
    val old = Seq(("A", 1L), ("A", 2L), ("B", 7L), ("B", 7L),
      ("C", 1L), ("C", 2L), ("D", 9L)).toDF("src", "v")
    val nw = Seq(("A", 3L), ("A", 4L), ("B", 7L), ("B", 7L),
      ("C", 1L), ("C", 5L)).toDF("src", "v")
    val got = TextAnalysis.ksDriftReport(old, nw, "src", $"v")
      .as[(String, Long, Long, Long, Option[Long])].collect().toSet
    assert(got === Set(
      ("A", 2L, 2L, 4L, Some(1000000L)),
      ("B", 2L, 2L, 0L, Some(0L)),
      ("C", 2L, 2L, 2L, Some(500000L)),
      ("D", 1L, 0L, 0L, None)))
  }

  test("burstinessSpectrum (x146): cf/df ratios land on the exact " +
      "base-2 grid; empty tokens are dropped; masses are exact") {
    val docs = Seq(
      (1L, "S", "a a a a b"), // a: cf 4 / df 1 → ratio 4 → bucket 3
      (2L, "S", "b c"),       // b: cf 2 / df 2 → ratio 1 → bucket 1
      (3L, "S", "c"),         // c: cf 2 / df 2 → ratio 1 → bucket 1
      (4L, "S", "d  d")       // "" dropped; d: 2/1 → ratio 2 → bkt 2
    ).toDF("doc_id", "src", "text")
    val got = TextAnalysis.burstinessSpectrum(docs, "src", "doc_id",
        "text")
      .as[(String, Long, Long, Long, Long, Long, Long)]
      .collect().toSet
    assert(got === Set(
      ("S", 1L, 2L, 4L, 4L, 1L, 1L),  // types b, c
      ("S", 2L, 1L, 2L, 1L, 2L, 3L),  // type d
      ("S", 3L, 1L, 4L, 1L, 4L, 7L))) // type a
  }

  test("lengthSpectrum (x147): base-2 buckets with the zero floor; " +
      "counts and masses exact") {
    val docs = Seq(("L", 1L), ("L", 5L), ("L", 0L), ("L", 8L))
      .toDF("src", "m")
    val got = TextAnalysis.lengthSpectrum(docs, "src", $"m")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      ("L", 0L, 1L, 0L, 0L, 0L),
      ("L", 1L, 1L, 1L, 1L, 1L),
      ("L", 3L, 1L, 5L, 4L, 7L),
      ("L", 4L, 1L, 8L, 8L, 15L)))
  }

  test("kn5Quality (x124): pure-Scala recomputation on a hand corpus; " +
      "the count-prune drops singleton 5-grams") {
    val docs = Seq(
      (1L, "a b c d e a b c d e"),
      (2L, "a b c d e x a b c d e"),
      (3L, "a b c d f a b c d f")).toDF("doc_id", "text")
    val got = TextAnalysis.kn5Quality(docs, "doc_id", "text",
        minCount = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    def d6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    // pruned type table {abcde: 4, abcdf: 2} (every other 5-gram is a
    // singleton); model: ctx5(abcd) = (6, 2), every continuation
    // level has cont = 1, mid = 2, nf = 2, pred = 1, bt = 2 — the
    // back-off chain mirrors the operator's IEEE order exactly
    val inner = ((1.0 - 0.75) / 2) + (((0.75 * 2) / 2) * (1.0 / 2))
    val lvl3 = ((1.0 - 0.75) / 2) + (((0.75 * 2) / 2) * inner)
    val lvl4 = ((1.0 - 0.75) / 2) + (((0.75 * 2) / 2) * lvl3)
    val pE = ((4 - 0.75) / 6) + (((0.75 * 2) / 6) * lvl4)
    val pF = ((2 - 0.75) / 6) + (((0.75 * 2) / 6) * lvl4)
    val nE = d6(-math.log(pE))
    val nF = d6(-math.log(pF))
    assert(got === Map(
      1L -> ((2L, (nE * 2).toDouble / 2)),
      2L -> ((2L, (nE * 2).toDouble / 2)),
      3L -> ((2L, (nF * 2).toDouble / 2))))
    // unpruned (minCount = 1): every doc's 5-grams all score
    val full = TextAnalysis.kn5Quality(docs, "doc_id", "text",
        minCount = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(full === Map(1L -> 6L, 2L -> 7L, 3L -> 6L))
  }

  test("curation funnel: monotone shrink, stage 0 equals the raw corpus") {
    val rows = SparkEntry.queries("x96_curation_funnel")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq ===
      Seq("0_raw", "1_extracted", "2_quality", "3_final"))
    // each stage only removes documents/tokens
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 <= a._2, s"${b._1} grew docs over ${a._1}")
      assert(b._3 <= a._3, s"${b._1} grew tokens over ${a._1}")
    }
    // stage 0 is the raw corpus
    val docs = Tables.load(spark, sf0001, "documents")
      .filter($"text".isNotNull)
    assert(rows.head._2 === docs.count())
    // the pipeline actually discriminates (and doesn't drop everything)
    assert(rows.last._2 > 0L && rows.last._2 < rows.head._2)
  }

  test("PII scrub: counts and redaction on crafted edge cases") {
    val d = Seq(
      (1L, "mail bob.smith+x@sub.example.org then 192.168.1.254 end"),
      (2L, "double a@b.co c@d.io ips 10.0.0.1 10.0.0.2"),
      (3L, "digits-only local 12345@nums.net stays an email"),
      (4L, "not an ip 1.2.3 nor 1.2.3.4.5 is two matches? no words"),
      (5L, "clean text with no pii at all")).toDF("doc_id", "text")
    val got = d.select($"doc_id",
        TextAnalysis.emailCount($"text").as("e"),
        TextAnalysis.ipv4Count($"text").as("i"),
        TextAnalysis.piiRedact($"text").as("r"))
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got(1L) === ((1L, 1L, "mail <EMAIL> then <IP> end")))
    assert(got(2L) === ((2L, 2L, "double <EMAIL> <EMAIL> ips <IP> <IP>")))
    // email pass runs first, so the digit local part is redacted as an
    // email, not half-eaten by the IP pass
    assert(got(3L) === ((1L, 0L, "digits-only local <EMAIL> stays an email")))
    // 1.2.3 is not an IP; 1.2.3.4.5 contains one greedy 4-octet match
    assert(got(4L)._2 === 1L)
    assert(got(5L) === ((0L, 0L, "clean text with no pii at all")))
  }

  test("winnowing: shared >= w+k-1 token run guarantees a shared fingerprint") {
    val shared = (1 to 11).map(i => s"s$i").mkString(" ") // w+k-1 = 11
    val d = Seq(
      (1L, s"a1 a2 a3 a4 a5 $shared a6 a7 a8"),
      (2L, s"b1 b2 $shared b3 b4 b5 b6 b7 b8 b9"),
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12 c13 c14"),
      (4L, "too short")).toDF("doc_id", "text")
    val fps = TextAnalysis.winnowingFingerprints(d, "doc_id", "text",
        k = 4, w = 8)
      .as[(Long, String)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty,
      "planted 11-token overlap must share a fingerprint")
    assert((fps(1L) & fps(3L)).isEmpty && (fps(2L) & fps(3L)).isEmpty,
      "disjoint doc shares nothing")
    assert(!fps.contains(4L), "doc shorter than w+k-1 yields no rows")
    // density: winnowing stores far fewer than all gram hashes but at
    // least one per window-aligned stretch (>= ngrams/w selections)
    val nGrams3 = 14 - 4 + 1
    assert(fps(3L).size < nGrams3 && fps(3L).size >= nGrams3 / 8)
  }

  test("perceptronTrain matches a local integer replay and separates a toy corpus") {
    import graft.functions.SketchKernels
    import org.apache.spark.unsafe.types.UTF8String
    val dim = 8
    val rows = Seq(
      (1L, "good clean prose here", true),
      (2L, "good good text", true),
      (3L, "spam spam junk junk", false),
      (4L, "junk noise spam", false),
      (5L, "good spam mixed", true))
    val got = TextAnalysis.perceptronTrain(
        rows.toDF("doc_id", "text", "lbl"), "doc_id", "text",
        labelPred = col("lbl"), dim = dim, epochs = 3)
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> r._2).toMap
    // local replay of the identical integer algorithm
    def bucket(t: String): Int =
      (SketchKernels.rollingFingerprint(UTF8String.fromString(t)) % dim).toInt
    val feats = rows.map { case (id, text, y) =>
      val bs = text.split(" ").map(bucket).toSeq :+ dim
      (id, y, bs.groupBy(identity).view.mapValues(_.size.toLong).toMap)
    }
    val w = Array.fill[Long](dim + 1)(0L)
    (1 to 3).foreach { _ =>
      val wrong = feats.filter { case (_, y, f) =>
        (f.map { case (b, c) => w(b) * c }.sum > 0L) != y }
      val delta = new Array[Long](dim + 1)
      wrong.foreach { case (_, y, f) =>
        f.foreach { case (b, c) =>
          delta(b) += (if (y) c else -c) } }
      (0 to dim).foreach(b => w(b) += 125000L * delta(b))
    }
    (0 to dim).foreach(b =>
      assert(got(b.toLong) === w(b), s"bucket $b"))
    // the trained weights separate the unambiguous docs
    def margin(f: Map[Int, Long]): Long =
      f.map { case (b, c) => w(b) * c }.sum
    assert(margin(feats(1)._3) > 0L, "pure-positive doc scores positive")
    assert(margin(feats(2)._3) <= 0L, "pure-negative doc scores non-positive")
  }

  test("datasetCard: hand-computed counts, dup rate and discrete percentiles") {
    // source A: 10 docs, lengths 1..10, two sharing identical text;
    // source B: 3 docs, all distinct
    val a = (1 to 10).map(i =>
      (i.toLong, if (i <= 2) "dup text" else s"uniq $i", "A", i.toLong))
    val b = Seq((11L, "b one", "B", 4L), (12L, "b two", "B", 6L),
      (13L, "b three", "B", 8L))
    val docs = (a ++ b).toDF("doc_id", "text", "source", "n_chars")
    val got = TextAnalysis.datasetCard(docs, "source", "text", "n_chars")
      .as[(String, Long, Long, Long, Double, Double, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    // A: 10 docs, 9 uniq texts; tokens: 2×2 + 8×2 = 20; cum over
    // lengths 1..10 → p50 at len 5 (2·5 ≥ 10), p90 at len 9 (10·9 ≥ 90)
    assert(got("A") === (("A", 10L, 20L, 9L, 0.1,
      (1 to 10).sum / 10.0, 5L, 9L)))
    // B: cum 1,2,3 of n=3 → p50 at 6 (2·2 ≥ 3), p90 at 8 (10·3 ≥ 27)
    assert(got("B") === (("B", 3L, 6L, 3L, 0.0, 6.0, 6L, 8L)))
  }

  test("winnowing kernel equals the zip_with-chain spec on the fixture") {
    val docs = Tables.load(spark, sf0001, "documents")
    for ((k, w) <- Seq((4, 8), (3, 5), (2, 1))) {
      val viaKernel = TextAnalysis.winnowingFingerprints(
        docs, "doc_id", "text", k, w)
        .as[(Long, String)].collect().toSet
      val viaSpec = TextAnalysis.winnowingFingerprintsSpec(
        docs, "doc_id", "text", k, w)
        .as[(Long, String)].collect().toSet
      assert(viaKernel === viaSpec, s"k=$k w=$w")
      assert(viaKernel.nonEmpty)
    }
  }

  test("vocabCoverage: hand-computed OOV counts, tie-break, boundary k") {
    // corpus counts: a×4, b×3, c×2, d×1, e×1 — top-2 vocab = {a, b};
    // at the k=4 boundary the d/e tie breaks on token asc → d in, e out
    val docs = Seq(
      (1L, "a a b c"),
      (2L, "a b d"),
      (3L, "a b c e")).toDF("doc_id", "text")
    def cov(k: Int): Map[Long, (Long, Long, Double)] =
      TextAnalysis.vocabCoverage(docs, "doc_id", "text", k)
        .as[(Long, Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val k2 = cov(2)
    assert(k2(1L) === ((4L, 1L, 0.25))) // c OOV
    assert(k2(2L) === ((3L, 1L, 1.0 / 3.0))) // d OOV
    assert(k2(3L) === ((4L, 2L, 0.5))) // c, e OOV
    val k4 = cov(4) // vocab {a,b,c,d}: e is the only OOV occurrence
    assert(k4(1L)._2 === 0L)
    assert(k4(2L)._2 === 0L)
    assert(k4(3L) === ((4L, 1L, 0.25)))
    // k >= distinct vocabulary ⇒ full coverage everywhere
    val k5 = cov(64)
    assert(k5.values.forall(_._2 === 0L))
    // fixture smoke: rates in [0,1], n_oov <= n_tokens, one row per doc
    val fx = TextAnalysis.vocabCoverage(
      Tables.load(spark, sf0001, "documents"), "doc_id", "text", 256)
    assert(fx.count() ===
      Tables.load(spark, sf0001, "documents").count())
    assert(fx.filter($"n_oov" > $"n_tokens" || $"oov_rate" < 0.0 ||
      $"oov_rate" > 1.0).count() === 0L)
  }

  test("hashClassifierScore matches a local-JVM fold; keep respects threshold") {
    val weights = Seq.tabulate(16)(i => (i - 8) / 8.0)
    def localFp(s: String): Long = {
      var acc = 0L; var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        acc = (acc * 31 + cp) % 2147483648L
        i += Character.charCount(cp)
      }
      acc
    }
    def localScore(text: String, bias: Double): Double =
      text.split(" ", -1).foldLeft(0.0) { (acc, t) =>
        acc + weights((localFp(t) % 16).toInt)
      } + bias
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "a a a a a a"), // repeated token: tf weighting, not presence
      (3L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.hashClassifierScore(docs, "doc_id", "text",
        weights, bias = 0.25)
      .as[(Long, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    Seq(1L -> "the quick brown fox", 2L -> "a a a a a a", 3L -> "")
      .foreach { case (id, text) =>
        val want = localScore(text, 0.25)
        assert(got(id)._1 === want, s"doc $id")
        assert(got(id)._2 === (want >= 0.0), s"doc $id keep flag")
      }
    // repeated-token doc scores 6× the single token's weight + bias
    val single = weights((localFp("a") % 16).toInt)
    assert(got(2L)._1 === 6 * single + 0.25 ||
      math.abs(got(2L)._1 - (6 * single + 0.25)) < 1e-12)
  }

  test("noveltyScore: hand-computed df-1 fractions") {
    // k=2 shingles: "a b" in docs 1+2 (df 2); "b c" / "b x" / "z z"
    // unique; doc 3's repeated shingle dedupes to one
    val docs = Seq(
      (1L, "a b c"),
      (2L, "a b x"),
      (3L, "z z z")).toDF("doc_id", "text")
    val got = TextAnalysis.noveltyScore(docs, "doc_id", "text", k = 2)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) === ((2L, 1L, 0.5)))
    assert(got(2L) === ((2L, 1L, 0.5)))
    assert(got(3L) === ((1L, 1L, 1.0)))
    // all-duplicate corpus: every shingle df >= 2 → novelty 0 everywhere
    val dup = Seq((1L, "p q r"), (2L, "p q r")).toDF("doc_id", "text")
    assert(TextAnalysis.noveltyScore(dup, "doc_id", "text", 2)
      .filter($"novelty" =!= 0.0 || $"n_unique" =!= 0L).count() === 0L)
    // hashed (production) and string (oracle) keys agree on the fixture
    val fxDocs = Tables.load(spark, sf0001, "documents")
    val h = TextAnalysis.noveltyScore(fxDocs, "doc_id", "text", 5,
      hashed = true).orderBy($"doc_id").collect()
    val st = TextAnalysis.noveltyScore(fxDocs, "doc_id", "text", 5,
      hashed = false).orderBy($"doc_id").collect()
    assert(h.nonEmpty && h.map(_.toString).toSeq === st.map(_.toString).toSeq)
  }

  test("invertedIndex: bounded sorted postings with exact df") {
    val docs = Seq(
      (3L, "a"), (1L, "a b"), (2L, "a c a")).toDF("doc_id", "text")
    val got = TextAnalysis.invertedIndex(docs, "doc_id", "text",
        maxPostings = 2)
      .as[(String, Long, Seq[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("a") === ((3L, Seq(1L, 2L)))) // df exact, 2 smallest kept
    assert(got("b") === ((1L, Seq(1L))))
    assert(got("c") === ((1L, Seq(2L))))
    // repeated token within a doc counts once (distinct per doc)
    assert(got("a")._1 === 3L)
  }

  test("pmiTopK matches hand-computed PMI on a tiny corpus") {
    // corpus: "a b" ×3, "a c", "b b" → unigrams: a=4, b=5, c=1,
    // N_tok=10; bigrams: (a,b)=3, (a,c)=1, (b,b)=1, N_bi=5
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a b"), (4L, "a c"),
      (5L, "b b")).toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.pmiTopK(docs, "text",
        minPairCount = 1L, k = 10)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    def pmi(cab: Long, ca: Long, cb: Long): Double =
      BigDecimal(math.log(cab.toDouble * 10.0 * 10.0 / (5.0 * ca * cb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(("a", "b")) === ((3L, pmi(3, 4, 5))))
    assert(got(("a", "c")) === ((1L, pmi(1, 4, 1))))
    assert(got(("b", "b")) === ((1L, pmi(1, 5, 5))))
    // min count filter drops the hapax pairs
    assert(graft.ops.TextAnalysis.pmiTopK(docs, "text", 2L, 10)
      .count() === 1L)
    // the rare informative pair outranks the frequent one; the
    // anti-collocation (b,b) scores negative: classic PMI shape
    assert(got(("a", "c"))._2 > got(("a", "b"))._2)
    assert(got(("b", "b"))._2 < 0.0)
  }

  test("top-k TF-IDF matches hand-computed scores, ranks and tie-breaks") {
    val docs = Seq(
      (1L, "a a b"),
      (2L, "a c"),
      (3L, "c c c d")).toDF("doc_id", "text")
    val got = TextAnalysis.tfIdfTopK(docs, "doc_id", "text", k = 2)
      .as[(Long, String, Long, Long, Double, Long)].collect()
      .sortBy(r => (r._1, r._6)).toSeq
    // N=3; df: a→2, b→1, c→2, d→1; ln(3/2)=0.405465, ln(3)=1.098612.
    // doc 2 is an exact score tie (a and c both 1·ln(3/2)) → term order.
    val expected = Seq(
      (1L, "b", 1L, 1L, 1.098612, 1L),
      (1L, "a", 2L, 2L, 0.81093, 2L),
      (2L, "a", 1L, 2L, 0.405465, 1L),
      (2L, "c", 1L, 2L, 0.405465, 2L),
      (3L, "c", 3L, 2L, 1.216395, 1L),
      (3L, "d", 1L, 1L, 1.098612, 2L))
    assert(got === expected)
  }

  test("repetition ratio matches hand-computed bigram repeat fractions") {
    val docs = Seq(
      (1L, "a b a b a"), // bigrams: ab,ba,ab,ba → 4 total, 2 distinct
      (2L, "x y z"),     // 2 distinct bigrams, no repeats
      (3L, "a"),         // shorter than n → 0.0
      (4L, "")).toDF("doc_id", "text")
    for (hashed <- Seq(true, false)) {
      val got = docs.select($"doc_id",
          TextAnalysis.repetitionRatio($"text", 2, hashed).as("rep"))
        .as[(Long, Double)].collect().toMap
      assert(got === Map(1L -> 0.5, 2L -> 0.0, 3L -> 0.0, 4L -> 0.0),
        s"hashed=$hashed")
    }
    // hashed ≡ string on the fixture (no collisions at document scale)
    val fix = Tables.load(spark, sf0001, "documents")
    val h = fix.select($"doc_id",
        TextAnalysis.repetitionRatio($"text", 2, hashed = true).as("r"))
      .as[(Long, Double)].collect().sortBy(_._1)
    val s = fix.select($"doc_id",
        TextAnalysis.repetitionRatio($"text", 2, hashed = false).as("r"))
      .as[(Long, Double)].collect().sortBy(_._1)
    assert(h.nonEmpty && h.sameElements(s))
  }

  test("self-repetition scrub: hand-computed repeats, merge, idempotence") {
    val docs = Seq(
      (1L, "a b c a b c d"), // trigram at 4 repeats start 1 → drop 3 toks
      (2L, "x y x y x y x y"), // starts 3..6 repeat → windows merge, keep "x y"
      (3L, "p q r s"),       // no repeats → untouched
      (4L, "a b"),           // shorter than k → untouched
      (5L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.selfRepetitionScrub(docs, "doc_id", "text", 3)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, 7L, 3L, "a b c d"),
      (2L, 8L, 6L, "x y"),
      (3L, 4L, 0L, "p q r s"),
      (4L, 2L, 0L, "a b"),
      (5L, 1L, 0L, "")))
    // fixture-empirical idempotence: scrubbing a scrubbed corpus is a
    // no-op here (a cross-cut trigram CAN in principle equal an earlier
    // surviving one, so this is a stability observation, not a theorem).
    // localCheckpoint cuts the lineage between the passes: without it
    // CollapseProject inlines pass 1's whole expression tree into every
    // `_t` reference of pass 2, and the interpreted HOF lambdas (no CSE)
    // re-evaluate it per array element — a multiplicative per-row blowup
    // no real pipeline hits (it materializes between passes).
    val fix = Tables.load(spark, sf0001, "documents")
    val once = TextAnalysis.selfRepetitionScrub(fix, "doc_id", "text", 3)
      .withColumnRenamed("scrubbed_text", "text")
      .localCheckpoint()
    val twice = TextAnalysis.selfRepetitionScrub(once, "doc_id", "text", 3)
    assert(twice.filter($"n_scrubbed" > 0).count() === 0L,
      "second scrub pass removed tokens — scrub is not idempotent here")
    // kernel ≡ executable spec: the native hash-map RepeatedGramKernel
    // must agree with the pure-functions array_position spelling on the
    // fixture, row for row (the WsTokens/PortableMinHash pin pattern)
    val spec = TextAnalysis.selfRepetitionScrubSpec(fix, "doc_id", "text", 3)
    assert(TextAnalysis.selfRepetitionScrub(fix, "doc_id", "text", 3)
      .exceptAll(spec).isEmpty && spec.exceptAll(
        TextAnalysis.selfRepetitionScrub(fix, "doc_id", "text", 3)).isEmpty,
      "RepeatedGramKernel diverges from the HOF spec")
    // plan is shuffle-free: a pure per-row pipeline must plan no Exchange
    val plan = TextAnalysis.selfRepetitionScrub(fix, "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "self-repetition scrub shuffles")
  }

  test("token chunks: hand-computed windows, clipping, and no-overlap rebuild") {
    val doc = (1 to 10).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, doc), (2L, "a b"), (3L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.tokenChunks(docs, "doc_id", "text",
        chunkSize = 4, stride = 3)
      .as[(Long, Long, Long, String)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    // len 10, size 4, stride 3 → 1 + ceil(6/3) = 3 windows at 1, 4, 7
    assert(got === Seq(
      (1L, 0L, 4L, "t1 t2 t3 t4"),
      (1L, 1L, 4L, "t4 t5 t6 t7"),
      (1L, 2L, 4L, "t7 t8 t9 t10"),
      (2L, 0L, 2L, "a b"),   // shorter than one window → one clipped chunk
      (3L, 0L, 1L, "")))     // empty text tokenizes to [""]
    // stride == chunkSize → chunks partition the doc: rebuild equals input
    val rebuilt = TextAnalysis.tokenChunks(docs, "doc_id", "text", 4, 4)
      .groupBy($"doc_id")
      .agg(concat_ws(" ", transform(
        sort_array(collect_list(struct($"chunk_id", $"chunk"))),
        c => c.getField("chunk"))).as("t"))
      .as[(Long, String)].collect().toMap
    assert(rebuilt === Map(1L -> doc, 2L -> "a b", 3L -> ""))
  }

  test("bpeLearnMerges: hand-computed merges, driver path ≡ distributed path") {
    // reference corpus (BPE-paper flavor): expected merges computed by
    // hand — (e,w) 6 wins first, chains to "newest"; ties broken
    // (count desc, s1 asc, s2 asc)
    val docs = Seq(
      (1L, "low low lower newest newest newest"),
      (2L, "wide wider new new newest")).toDF("doc_id", "text")
    val expected = Seq(
      (1L, "e", "w", 6L), (2L, "n", "ew", 6L), (3L, "e", "s", 4L),
      (4L, "es", "t", 4L), (5L, "new", "est", 4L), (6L, "l", "o", 3L))
    val viaDriver = TextAnalysis.bpeLearnMerges(docs, "text", k = 6)
      .as[(Long, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(viaDriver === expected)
    // smallVocabThreshold = 0 forces the distributed per-round loop —
    // must be bit-identical to the driver short-circuit
    val viaDistributed = TextAnalysis.bpeLearnMerges(docs, "text", k = 6,
        smallVocabThreshold = 0)
      .as[(Long, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(viaDistributed === expected)
    // overlap semantics: leftmost non-overlapping — "aaaaa" counts 4
    // (a,a) pairs but merges only twice, leaving [aa, aa, a]; round 2
    // then ties (aa,aa) with (aa,a) at 2 and the (s1, s2) tie-break
    // picks (aa, a)
    val runs = Seq((1L, "aaaaa aaaaa")).toDF("doc_id", "text")
    val gotRuns = TextAnalysis.bpeLearnMerges(runs, "text", k = 2)
      .as[(Long, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(gotRuns === Seq((1L, "a", "a", 8L), (2L, "aa", "a", 2L)))
    val gotRunsDist = TextAnalysis.bpeLearnMerges(runs, "text", k = 2,
        smallVocabThreshold = 0)
      .as[(Long, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(gotRunsDist === gotRuns)
    // k larger than the corpus supports: runs dry, returns fewer rows
    val tiny = Seq((1L, "ab")).toDF("doc_id", "text")
    assert(TextAnalysis.bpeLearnMerges(tiny, "text", k = 10)
      .count() === 1L)
  }

  test("bpeLearnMerges: non-BMP tie-break is UTF-8 byte order on both paths") {
    // U+10000 (surrogate pair D800 DC00) sorts BEFORE U+E000 in Java's
    // UTF-16 code-unit order but AFTER it in UTF-8 byte (code-point)
    // order — Spark's orderBy and DuckDB both use the latter, so the
    // driver short-circuit must too. The two candidate pairs tie at
    // count 1 and differ only in s1.
    val supp = "𐀀" // U+10000
    val pua = ""        // U+E000
    val docs = Seq((1L, s"${supp}x ${pua}x")).toDF("doc_id", "text")
    val expected = Seq((1L, pua, "x", 1L), (2L, supp, "x", 1L))
    val viaDriver = TextAnalysis.bpeLearnMerges(docs, "text", k = 2)
      .as[(Long, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(viaDriver === expected)
    val viaDistributed = TextAnalysis.bpeLearnMerges(docs, "text", k = 2,
        smallVocabThreshold = 0)
      .as[(Long, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(viaDistributed === expected)
  }

  test("bpeEncodeSym pads line terminators like any other char (DOTALL)") {
    // pre-fix, '.' skipped '\n' so "a\nb" glued into [a, \nb]; the
    // documented invariant is one symbol per character
    val docs = Seq((1L, "a\nb"), (2L, "\n"), (3L, "a\r\u2028b"))
      .toDF("doc_id", "text")
    val got = docs.select($"doc_id",
        TextAnalysis.bpeTokenCountLearned($"text", Nil).as("n"))
      .as[(Long, Long)].collect().toMap
    // only U+0020 is the word separator; \n, \r and U+2028 (all
    // excluded by a non-DOTALL '.') are ordinary symbols, so
    // "a\r\u2028b" counts [a, \r, \u2028, b] = 4
    assert(got === Map(1L -> 3L, 2L -> 1L, 3L -> 4L))
  }

  test("bpeEncodeSym applies learned merges per word: hand-computed token counts") {
    // merges after k=3 on the corpus above: (e,w), (n,ew), (e,s).
    // Hand segmentation: low=3  lower=5  newest=new|es|t=3  wide=4
    // wider=5  new=1 — word-separator spaces are excluded and block
    // cross-word merges
    val docs = Seq(
      (1L, "low low lower newest newest newest"),
      (2L, "wide wider new new newest")).toDF("doc_id", "text")
    val merges = Seq(("e", "w"), ("n", "ew"), ("e", "s"))
    val got = docs.select($"doc_id",
        TextAnalysis.bpeTokenCountLearned($"text", merges).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> (3 + 3 + 5 + 3 + 3 + 3).toLong,
      2L -> (4 + 5 + 1 + 1 + 3).toLong))
    // empty and single-char texts
    val edge = Seq((1L, ""), (2L, "x")).toDF("doc_id", "text")
    val gotEdge = edge.select($"doc_id",
        TextAnalysis.bpeTokenCountLearned($"text", merges).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(gotEdge === Map(1L -> 0L, 2L -> 1L))
  }

  test("fixture ranks are dense from 1, scores non-increasing per doc") {
    val docs = Tables.load(spark, sf0001, "documents")
    val rows = TextAnalysis.tfIdfTopK(docs, "doc_id", "text", k = 3)
      .select($"doc_id", $"rk", $"score")
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { case (id, rs) =>
      val byRank = rs.sortBy(_._2)
      assert(byRank.map(_._2).toSeq === (1L to byRank.length).toSeq,
        s"doc $id ranks not dense")
      assert(byRank.length <= 3)
      byRank.sliding(2).foreach {
        case Array(hi, lo) =>
          assert(hi._3 >= lo._3, s"doc $id scores increase down the ranking")
        case _ =>
      }
    }
  }

  test("bm25TopK: hand-computed scores, n_hit, and doc_id tie-break at the cut") {
    // d3 and d4 are identical -> equal scores; k=3 must cut d4 (higher id)
    val docs = Seq((1L, "q q x"), (2L, "q y"), (3L, "y y y"),
      (4L, "y y y")).toDF("doc_id", "text")
    // the operator's exact-integer arithmetic (r12 contract): n=4,
    // s=Σdl=11, k1Pct=120, bPct=75 → coefficients 22000/10000/3000/9000
    def c(tf: Long, df: Long, dl: Long): BigDecimal = {
      val n = 4L; val s = 11L
      val idf = BigDecimal(
          math.log((2.0 * n + 2.0) / (2.0 * df + 1.0)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      val tfn = BigDecimal(
          (tf * 22000.0 * s) /
          (10000.0 * tf * s + 3000.0 * s + 9000.0 * dl * n))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      (idf * tfn).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }
    val got = TextAnalysis.bm25TopK(docs, "doc_id", "text",
        queryTerms = Seq("q", "y"), k1Pct = 120, bPct = 75, k = 3)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        BigDecimal(r.getDecimal(3))))
      .toMap
    // df(q)=2 over {d1,d2}; df(y)=3 over {d2,d3,d4}
    val expected = Map(
      1L -> (3L, 1L, c(2, 2, 3)),
      2L -> (2L, 2L, c(1, 2, 2) + c(1, 3, 2)),
      3L -> (3L, 1L, c(3, 3, 3)))
    assert(got === expected) // d4 cut on the (score DESC, doc_id) tie
    // the multi-term doc outranks the high-tf common-term docs here
    assert(got(2L)._3 > got(1L)._3 && got(1L)._3 > got(3L)._3)
  }

  test("bm25TopK: docs without any query term never appear; k bounds rows") {
    val docs = Tables.load(spark, sf0001, "documents")
    val got = TextAnalysis.bm25TopK(docs, "doc_id", "text",
      queryTerms = Seq("dup"), k1Pct = 120, bPct = 75, k = 5).collect()
    assert(got.length <= 5 && got.nonEmpty)
    assert(got.forall(_.getLong(2) === 1L)) // n_hit: single-term query
    // every returned doc really contains the term
    val ids = got.map(_.getLong(0)).toSet
    val withTerm = docs.filter(array_contains(split(col("text"), " "),
      "dup")).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(withTerm))
  }

  test("goodTuringReport (x134): hand corpus exact counts and " +
      "floor-division micros; singleton-free stratum has zero mass") {
    import spark.implicits._
    // A: tokens a a b c  -> N=4 T=3 n1=2(b,c) n2=1(a... a has c=2) 
    //    => N=4, T=3, n1=2, n2=1, p0 = 2e6 div 4 = 500000
    // B: tokens x x y y  -> N=4 T=2 n1=0 n2=2, p0 = 0
    val docs = Seq(
      ("A", "a a b"), ("A", "c"),
      ("B", "x x"), ("B", "y y")).toDF("source", "text")
    val got = graft.ops.TextAnalysis.goodTuringReport(docs, "text",
        "source")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      ("A", 4L, 3L, 2L, 1L, 500000L),
      ("B", 4L, 2L, 0L, 2L, 0L)))
  }

  test("sourceSignatureNgrams (x157): hand corpus — tf and scores " +
      "match the x39 arithmetic at block granularity") {
    import spark.implicits._
    // A: "a b c a b c" → trigrams (a b c)×2, (b c a), (c a b);
    // B: "x y z" → (x y z). S = 2, every gram df = 1 → score =
    // tf·ln(2): 1.386294 for the double, 0.693147 for singles.
    val docs = Seq(("A", "a b c a b c"), ("B", "x y z"))
      .toDF("source", "text")
    val got = graft.ops.TextAnalysis.sourceSignatureNgrams(
        docs, "text", "source", n = 3, k = 5)
      .as[(String, String, Long, Long, Double, Long)].collect().toSet
    assert(got === Set(
      ("A", "a b c", 2L, 1L, 1.386294, 1L),
      ("A", "b c a", 1L, 1L, 0.693147, 2L),
      ("A", "c a b", 1L, 1L, 0.693147, 3L),
      ("B", "x y z", 1L, 1L, 0.693147, 1L)))
    // fixture: rk dense 1..k per block, df ≤ S, scores rank-ordered
    val fx = graft.ops.TextAnalysis.sourceSignatureNgrams(
        Tables.load(spark, sf0001, "documents"), "text", "source",
        n = 3, k = 5)
      .as[(String, String, Long, Long, Double, Long)].collect()
    assert(fx.nonEmpty)
    fx.groupBy(_._1).foreach { case (b, rows) =>
      assert(rows.map(_._6).sorted.toSeq ===
        (1L to rows.length.toLong), s"block $b ranks not dense")
      val byRank = rows.sortBy(_._6).map(_._5)
      assert(byRank.zip(byRank.tail).forall { case (a, c) => a >= c },
        s"block $b scores not rank-ordered")
    }
  }

  test("dupClusterSpectrum (x160): hand corpus — sizes, group counts, " +
      "and floor-division mass shares") {
    import spark.implicits._
    val docs = Seq((1L, "t1"), (2L, "t1"), (3L, "t1"), (4L, "t2"))
      .toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.dupClusterSpectrum(docs,
        "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set((3L, 1L, 3L, 750000L), (1L, 1L, 1L, 250000L)))
  }

  test("dupQualityLift (x182): size classes cap at 5+, means " +
      "micro-round before the lift division") {
    import spark.implicits._
    // "aaaa"x3 (len 4), "cc"x6 (len 2, class caps to 5), "bb"x1 (len 2)
    val docs = (Seq.fill(3)("aaaa") ++ Seq.fill(6)("cc") ++ Seq("bb"))
      .map(t => (t, t.length.toLong)).toDF("text", "n_chars")
    val got = graft.ops.TextAnalysis.dupQualityLift(docs, "text",
        "n_chars").as[(Long, Long, Long, Long)].collect().toSet
    // totals: n=10 docs, l=26 chars -> corpus mean 2_600_000 micros
    // class 3: mean 4_000_000 -> lift 4e12 div 2.6e6 = 1_538_461
    // class 5 (the 6-copy cluster): mean 2e6 -> lift 769_230
    // class 1: mean 2e6 -> lift 769_230
    assert(got === Set(
      (3L, 3L, 4000000L, 1538461L),
      (5L, 6L, 2000000L, 769230L),
      (1L, 1L, 2000000L, 769230L)))
  }

  test("sentenceStats (x186): [.!?]+ segmentation, trimmed non-blank " +
      "segments, boundary-free share, punct-only doc has 0 sentences") {
    import spark.implicits._
    val docs = Seq(
      ("A", "Hi there. Bye!"), // 2 sentences, len 8+3
      ("A", "no punct"),       // 1 sentence, len 8, boundary-free
      ("B", "..."))            // 0 sentences, has boundary
      .toDF("source", "text")
    val got = graft.ops.TextAnalysis.sentenceStats(docs, "text",
        "source")
      .as[(String, Long, Long, Option[Long], Long)].collect().toSet
    assert(got === Set(
      ("A", 2L, 3L, Some(6333333L), 500000L), // (8+3+8)e6 div 3
      ("B", 1L, 0L, None, 0L)))
  }

  test("markupProfile (x187): URL/email/tag doc shares off explicit " +
      "ASCII regex probes") {
    import spark.implicits._
    val docs = Seq(
      ("A", "see https://x.co now"),
      ("A", "mail me a@b.com ok"),
      ("A", "<div class=x> hi"),
      ("A", "plain"))
      .toDF("source", "text")
    val got = graft.ops.TextAnalysis.markupProfile(docs, "text",
        "source")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got === Set(("A", 4L, 250000L, 250000L, 250000L)))
  }

  test("charsetProfile (x156): hand corpus exact class counts; " +
      "shares partition the mass within a quantum each") {
    import spark.implicits._
    // "ab 12" → n=5 alpha=2 digit=2 space=1 other=0
    // "..."   → n=3 all other
    val docs = Seq(("A", "ab 12"), ("B", "...")).toDF("source", "text")
    val got = graft.ops.TextAnalysis.charsetProfile(docs, "text",
        "source")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      ("A", 5L, 400000L, 400000L, 200000L, 0L),
      ("B", 3L, 0L, 0L, 0L, 1000000L)))
    // fixture: per block the four shares sum within 4 quanta of 1e6
    val fx = graft.ops.TextAnalysis.charsetProfile(
        Tables.load(spark, sf0001, "documents"), "text", "source")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(fx.nonEmpty)
    fx.foreach { case (b, n, a, d, s, o) =>
      assert(n > 0L, s"block $b empty")
      val tot = a + d + s + o
      assert(tot <= 1000000L && tot > 1000000L - 4, s"block $b: $tot")
    }
  }

  test("charsetProfile: an all-empty block publishes NULL shares, " +
      "not div-by-zero (r16 ADVICE guard)") {
    import spark.implicits._
    val docs = Seq(("A", ""), ("A", ""), ("B", "ab"))
      .toDF("source", "text")
    val rows = graft.ops.TextAnalysis.charsetProfile(docs, "text",
      "source").collect()
    val a = rows.find(_.getString(0) == "A").get
    assert(a.getLong(1) == 0L && (2 to 5).forall(a.isNullAt))
    val b = rows.find(_.getString(0) == "B").get
    assert(b.getLong(2) == 1000000L)
  }

  test("lexicalDiversityProfile (x164): hand corpus — exact TTR " +
      "deciles and token sums per block") {
    import spark.implicits._
    // "a b c d" ttr=1e6 -> bucket 10; "a a a a" ttr=250000 -> bucket 2
    // "a a b b" ttr=500000 -> bucket 5 (block B)
    val docs = Seq(("A", "a b c d"), ("A", "a a a a"),
      ("B", "a a b b")).toDF("source", "text")
    val got = graft.ops.TextAnalysis.lexicalDiversityProfile(docs,
        "text", "source")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === Set(
      ("A", 10L, 1L, 4L), ("A", 2L, 1L, 4L), ("B", 5L, 1L, 4L)))
  }

  test("prefixDupSpectrum (x165): docs sharing the first k tokens " +
      "group together; differing tails do not split them") {
    import spark.implicits._
    val p = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"
    val docs = Seq(
      s"$p tail one", s"$p another tail entirely", // same 10-prefix
      "t1 t2 t3 t4 t5 t6 t7 t8 t9 DIFF tail",      // 10th token differs
      "short doc")                                  // < k tokens
      .map(Tuple1(_)).toDF("text")
    val got = graft.ops.TextAnalysis.prefixDupSpectrum(docs, "text",
        k = 10)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((2L, 1L, 2L), (1L, 2L, 2L)))
  }

  test("ngramHeadCoverage (x168): hand corpus — bigram ranks, exact " +
      "coverage shares, sub-n docs yield no grams") {
    import spark.implicits._
    // block A bigrams: "a b" ×3 (from "a b a b a b": a b, b a, a b...
    // careful: "a b a b" -> grams "a b","b a","a b"). Use explicit:
    // doc1 "x y x y x y": grams xy, yx, xy, yx, xy -> xy:3 yx:2
    // doc2 "z z": gram "z z" -> 1. Total 6; top10 covers all -> 1e6.
    // block B: one doc "solo" (1 token, no bigram) -> no row.
    val docs = Seq(("A", "x y x y x y"), ("A", "z z"), ("B", "solo"))
      .toDF("source", "text")
    val got = graft.ops.TextAnalysis.ngramHeadCoverage(docs, "text",
        "source", n = 2)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(got === Set(("A", 6L, 6L, 6L, 1000000L, 1000000L)))
  }

  test("langSourceLift (x169): hand corpus — independence lands at " +
      "1e6, concentration above, depletion below") {
    import spark.implicits._
    // en: s1 ×2, s2 ×1; fr: s2 ×1. N=4, n_en=3, n_fr=1, n_s1=2, n_s2=2
    val docs = Seq(("en", "s1"), ("en", "s1"), ("en", "s2"),
      ("fr", "s2")).toDF("lang", "source")
    val got = graft.ops.TextAnalysis.langSourceLift(docs, "lang",
        "source")
      .as[(String, String, Long, Long)].collect().toSet
    // (en,s1): 2*4e6 // (3*2) = 1333333; (en,s2): 1*4e6 // 6 = 666666
    // (fr,s2): 1*4e6 // (1*2) = 2000000
    assert(got === Set(
      ("en", "s1", 2L, 1333333L),
      ("en", "s2", 1L, 666666L),
      ("fr", "s2", 1L, 2000000L)))
  }

  test("crossSourceDupMatrix (x171): shared keys pair sources with " +
      "per-side masses; same-source dups never pair") {
    import spark.implicits._
    // key "dup": s1 ×2, s2 ×1, s3 ×1 -> pairs (s1,s2),(s1,s3),(s2,s3)
    // key "only": s1 ×2 (same-source dup — no pair)
    val docs = Seq(("s1", "dup"), ("s1", "dup"), ("s2", "dup"),
      ("s3", "dup"), ("s1", "only"), ("s1", "only"))
      .toDF("source", "text")
    val got = graft.ops.TextAnalysis.crossSourceDupMatrix(docs,
        "text", "source")
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(got === Set(
      ("s1", "s2", 1L, 2L, 1L),
      ("s1", "s3", 1L, 2L, 1L),
      ("s2", "s3", 1L, 1L, 1L)))
    // prefix keying: tails differ, first-2-token prefixes collide
    val pdocs = Seq(("s1", "p q tail one"), ("s2", "p q other"))
      .toDF("source", "text")
    val pgot = graft.ops.TextAnalysis.crossSourceDupMatrix(pdocs,
        "text", "source", prefixK = 2)
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(pgot === Set(("s1", "s2", 1L, 1L, 1L)))
    assert(graft.ops.TextAnalysis.crossSourceDupMatrix(pdocs,
      "text", "source").count() === 0L)
  }
}
