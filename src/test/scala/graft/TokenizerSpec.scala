package graft

import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis

/** The production `\s+` tokenizer ([[TextAnalysis.tokensWs]]) and its
  * punctuation-folding variant: reference-equivalence on generated
  * messy strings, the whitespace-insensitivity property the dedup path
  * needs, and the hashed≡string gram property re-proven over the new
  * tokenizer's output (the standing argument every hashed-key pipeline
  * rests on, previously proven only over single-space tokens).
  */
class TokenizerSpec extends SparkSpec {

  private val wsChars = Array(' ', '\n', '\t', '\r', '\u000B', '\f')
  private val punct = Array(",", ".", "!", "?", "(", ")", "\"", "--")

  private def messyString(seed: Int): String = {
    val rnd = new scala.util.Random(seed)
    val words = (0 until rnd.nextInt(25)).map { _ =>
      val w = "w" + rnd.nextInt(8)
      val cased = if (rnd.nextBoolean()) w.capitalize else w
      val pre = if (rnd.nextInt(4) == 0) punct(rnd.nextInt(punct.length)) else ""
      val post = if (rnd.nextInt(3) == 0) punct(rnd.nextInt(punct.length)) else ""
      pre + cased + post
    }
    val seps = (0 until math.max(words.size - 1, 0)).map { _ =>
      (0 to rnd.nextInt(2)).map(_ => wsChars(rnd.nextInt(wsChars.length)))
        .mkString
    }
    val lead = if (rnd.nextInt(3) == 0) " \n" else ""
    val trail = if (rnd.nextInt(3) == 0) "\t " else ""
    lead + (if (words.isEmpty) ""
            else words.head + seps.zip(words.tail)
              .map { case (s, w) => s + w }.mkString) + trail
  }

  private def refWs(s: String): Seq[String] =
    s.split("\\s+", -1).toSeq.filter(_.nonEmpty)

  private def refFolded(s: String): Seq[String] =
    refWs(s).map(_.toLowerCase
        .replaceAll("^[^a-z0-9]+|[^a-z0-9]+$", ""))
      .filter(_.nonEmpty)

  private def evalBoth(strs: Seq[String]): Seq[(Seq[String], Seq[String])] = {
    val spark2 = spark
    import spark2.implicits._
    strs.toDF("s")
      .select(TextAnalysis.tokensWs(col("s")).as("ws"),
        TextAnalysis.tokensFolded(col("s")).as("folded"))
      .collect()
      .map(r => (r.getSeq[String](0), r.getSeq[String](1))).toSeq
  }

  test("tokensWs / tokensFolded equal the reference on messy strings") {
    val strs = (1 to 120).map(messyString)
    strs.zip(evalBoth(strs)).foreach { case (s, (ws, folded)) =>
      assert(ws === refWs(s), s"ws of ${s.replace("\n", "\\n")}")
      assert(folded === refFolded(s), s"folded of ${s.replace("\n", "\\n")}")
    }
  }

  test("native kernels ≡ the regex spec expressions (incl. non-ASCII)") {
    // the hot path is the byte-scan kernel (WsTokens/FoldTokens); the
    // regex spellings survive as tokensWsSpec/foldTokensSpec — pin them
    // equal in-engine, on generated mess plus the byte-level edge cases
    // a UTF-8 scanner can get wrong: multi-byte code points at token
    // edges, NBSP (not Java \s), full-width digits, case-fold
    // expansions (İ, ΣΣ), empty/whitespace-only strings
    val spark2 = spark
    import spark2.implicits._
    val strs = (1 to 80).map(messyString) ++ Seq(
      "", " ", "\n\t\r\f", "héllo wörld", "Ünïcode\t\tÉÀ tökens",
      "(héllo), 'quote' über—dash", "日本語 テスト 123", "a£b ...x9... !!!",
      "İstanbul DIŞ Σίσυφος ΣΣ", "ｆｕｌｌｗｉｄｔｈ１２３ ascii123",
      " nbsp keeps glued", "edge£ £edge £ a")
    val rows = strs.toDF("s")
      .select(
        (TextAnalysis.tokensWs(col("s")) ===
          TextAnalysis.tokensWsSpec(col("s"))).as("ws_eq"),
        (TextAnalysis.tokensFolded(col("s")) ===
          TextAnalysis.foldTokensSpec(
            TextAnalysis.tokensWsSpec(col("s")))).as("fold_eq"),
        col("s"))
      .collect()
    rows.foreach { r =>
      assert(r.getBoolean(0), s"ws kernel != spec on '${r.getString(2)}'")
      assert(r.getBoolean(1), s"fold kernel != spec on '${r.getString(2)}'")
    }
    // null propagates like the spec: null text -> null arrays
    val nulls = Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "s")
      .select(TextAnalysis.tokensWs(col("s")).as("ws"),
        TextAnalysis.tokensFolded(col("s")).as("f"))
      .collect().head
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
  }

  test("whitespace-only variants tokenize identically (tokens does not)") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(7)
    val docs = (1 to 40).map { i =>
      val words = (0 until 10).map(_ => "w" + rnd.nextInt(6))
      val base = words.mkString(" ")
      // same words, different whitespace: alternate a newline+tab and
      // a double space as the separator
      val variant = words.zipWithIndex.map { case (w, j) =>
        if (j == 0) w else (if (j % 2 == 0) "\n\t" else "  ") + w
      }.mkString
      (i, base, variant)
    }
    val out = docs.toDF("id", "base", "variant")
      .select(
        (TextAnalysis.tokensWs(col("base")) ===
          TextAnalysis.tokensWs(col("variant"))).as("ws_eq"),
        (TextAnalysis.tokens(col("base")) ===
          TextAnalysis.tokens(col("variant"))).as("naive_eq"),
        // identical token streams ⇒ identical MinHash signature: the
        // near-dup pipeline keyed on tokensWs matches the variants
        (graft.functions.HashFunctions.minhashSig(
          TextAnalysis.tokensWs(col("base")), 16) ===
          graft.functions.HashFunctions.minhashSig(
            TextAnalysis.tokensWs(col("variant")), 16)).as("sig_eq"))
      .collect()
    assert(out.forall(_.getBoolean(0)), "tokensWs must ignore ws form")
    assert(out.forall(r => !r.getBoolean(1)),
      "the naive tokenizer must distinguish them (the gap being fixed)")
    assert(out.forall(_.getBoolean(2)))
  }

  test("scrubSpans with tokensWs sees through whitespace variants") {
    val spark2 = spark
    import spark2.implicits._
    // the train doc contains the eval 5-gram, but separated by
    // newlines/tabs; the default single-space tokenizer cannot see it
    val train = Seq((1L, "keep1 keep2 a\nb\tc  d\ne keep3 keep4"))
      .toDF("doc_id", "text")
    val eval = Seq((100L, "a b c d e")).toDF("doc_id", "text")
    val miss = graft.ops.Contamination
      .scrubSpans(train, eval, "doc_id", "text", k = 5)
      .collect().head
    assert(miss.getAs[Long]("n_scrubbed") === 0L,
      "single-space tokenizer must miss the ws-mangled gram")
    val hit = graft.ops.Contamination
      .scrubSpans(train, eval, "doc_id", "text", k = 5,
        tokenize = TextAnalysis.tokensWs)
      .collect().head
    assert(hit.getAs[Long]("n_tokens") === 9L)
    assert(hit.getAs[Long]("n_scrubbed") === 5L)
    assert(hit.getAs[String]("scrubbed_text") ===
      "keep1 keep2 keep3 keep4")
  }

  test("hashed grams over tokensWs ≡ string grams (cardinality + identity)") {
    val spark2 = spark
    import spark2.implicits._
    val strs = (1 to 60).map(messyString).filter(refWs(_).nonEmpty)
    val rows = strs.toDF("s")
      .select(
        size(array_distinct(graft.functions.HashFunctions.ngramHashes(
          TextAnalysis.tokensWs(col("s")), 3, keepPartial = true)))
          .as("n_hashed"),
        TextAnalysis.tokensWs(col("s")).as("ws"))
      .collect()
    rows.foreach { r =>
      val nHashed = r.getInt(0)
      val toks = r.getSeq[String](1)
      val grams =
        if (toks.size < 3) Seq(toks.mkString(" "))
        else toks.sliding(3).map(_.mkString(" ")).toSeq
      assert(nHashed === grams.distinct.size,
        s"hashed gram cardinality vs string grams for $toks")
    }
  }

  test("langTrigramModel + langIdScore: local integer replay on a toy corpus") {
    import spark.implicits._
    import graft.functions.SketchKernels
    import org.apache.spark.unsafe.types.UTF8String
    val dim = 8
    val rows = Seq(
      (1L, "aa", "the cat sat on the mat"),
      (2L, "aa", "the rat ate the hat"),
      (3L, "zz", "zum zug zoo zig zag"),
      (4L, "zz", "zip zap zug zum"),
      (5L, "aa", "no"))                      // < 3 chars: excluded + dropped
    val docs = rows.toDF("doc_id", "lang", "text")
    val model = TextAnalysis.langTrigramModel(docs, "lang", "text", dim)
    assert(model.langs === IndexedSeq("aa", "zz"))
    // independent replay: trigram buckets via the portable fold
    def buckets(s: String): Seq[Int] =
      (0 to s.length - 3).map(i => (SketchKernels.rollingFingerprint(
        UTF8String.fromString(s.substring(i, i + 3))) % dim).toInt)
    def lam(langDocs: Seq[String]): IndexedSeq[Long] = {
      val bs = langDocs.flatMap(buckets)
      IndexedSeq.tabulate(dim) { b =>
        val c = bs.count(_ == b)
        java.math.BigDecimal.valueOf(
            math.log((c + 1.0) / (bs.size + dim.toDouble)))
          .setScale(6, java.math.RoundingMode.HALF_UP)
          .movePointRight(6).longValueExact()
      }
    }
    assert(model.lamMicros(0) === lam(rows.filter(_._2 == "aa")
      .map(_._3).filter(_.length >= 3)))
    assert(model.lamMicros(1) === lam(rows.filter(_._2 == "zz").map(_._3)))
    val got = TextAnalysis.langIdScore(docs, "doc_id", "text", model)
      .as[(Long, String, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(!got.contains(5L), "docs with < 3 chars are dropped")
    // self-scoring separates the two character distributions
    assert(got(1L)._2 === "aa" && got(2L)._2 === "aa")
    assert(got(3L)._2 === "zz" && got(4L)._2 === "zz")
    // replay doc 3's score exactly
    val s3 = buckets(rows(2)._3).map(b => model.lamMicros(1)(b)).sum
    assert(got(3L)._3 === buckets(rows(2)._3).size.toLong)
    assert(got(3L)._4 === s3.toDouble / 1000000.0)
  }

  test("langIdScore kernel equals the distributed join-window spec on the fixture") {
    import spark.implicits._
    val docs = Tables.load(spark, sf0001, "documents")
    val model = TextAnalysis.langTrigramModel(docs, "lang", "text", 32)
    val viaKernel = TextAnalysis.langIdScore(docs, "doc_id", "text", model)
      .as[(Long, String, Long, Double)].collect().toSet
    val viaSpec = TextAnalysis.langIdScoreSpec(docs, "doc_id", "text", model)
      .as[(Long, String, Long, Double)].collect().toSet
    assert(viaKernel.nonEmpty)
    assert(viaKernel === viaSpec)
  }
}
