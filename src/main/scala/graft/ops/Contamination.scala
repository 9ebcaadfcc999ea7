package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Train/eval contamination detection: for every document in an eval
  * (held-out / benchmark) split, find whether any training document
  * shares a word k-shingle with it — the standard n-gram-overlap
  * decontamination check run before training on web-scale corpora
  * (GPT-3 appendix C / PaLM-style 8-13-gram overlap, here parameterized
  * by k).
  *
  * Scale design (100 TB): both sides explode to (doc, shingle) rows and
  * meet in ONE shuffle join keyed by the shingle; no pairwise document
  * comparison ever happens. The join fan-out for a shingle appearing in
  * `e` eval docs and `f` train docs is `e*f` rows, so ubiquitous
  * shingles (boilerplate) are the skew risk — `maxShingleDf` drops
  * shingles seen in more than that many TRAIN documents (they identify
  * nothing; standard practice) and bounds every bucket. With `hashed`
  * (the production default) the join key is the shingle's xxhash64
  * instead of the string — ~8 bytes vs ~50+ through the shuffle; the
  * 2^-64 collision rate is far below any decontamination threshold.
  */
object Contamination {

  /** Per-eval-doc overlap report: `(eval_id, n_shared_shingles,
    * n_train_docs, contaminated)`. Every eval document appears exactly
    * once (zero counts when clean). `n_shared_shingles` counts the eval
    * doc's distinct shingles that occur in ANY training doc;
    * `n_train_docs` counts the distinct training docs sharing at least
    * one shingle.
    */
  def report(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, k: Int = 5, maxShingleDf: Option[Long] = None,
      hashed: Boolean = true,
      tokenize: Column => Column = TextAnalysis.tokens): DataFrame = {
    def shingleRows(df: DataFrame, as: String): DataFrame = {
      // both paths explode per-doc-distinct grams, so rows are unique
      // per (doc, shingle). The hashed path never materializes gram
      // strings at all: the one-pass NGramHashes kernel hashes each
      // token once and mixes windows (vs build-string-then-xxhash64,
      // which allocates k concats and re-hashes ~k·len bytes per gram).
      // `tokenize` defaults to the oracle-portable single-space split;
      // pass `TextAnalysis.tokensWs`/`tokensFolded` for real-corpus
      // whitespace/punctuation robustness (x70).
      val grams: Column =
        if (hashed) array_distinct(graft.functions.HashFunctions
          .ngramHashes(tokenize(col(textCol)), k, keepPartial = true))
        else array_sort(array_distinct(TextAnalysis.ngrams(
          tokenize(col(textCol)), k, keepPartial = true)))
      df.select(col(idCol).as(as), explode(grams).as("sk"))
    }
    val ev = shingleRows(eval, "eval_id")
    val tr = shingleRows(train, "train_id")
    val joined = maxShingleDf match {
      case Some(cap) =>
        // ONE pass over the train shingles: DocFreqAgg folds the
        // document frequency AND the (≤ cap) carrier-id list into the
        // same map-side-combinable aggregate, so the cap costs one
        // shuffle of capped per-shingle rows — not (as the round-5
        // formulation did) a second full shingle explode plus a
        // df-count shuffle plus a keep-set join. Rows are unique per
        // (train doc, shingle), so df == distinct doc count and a
        // surviving shingle's id list is its complete carrier set.
        // The eval join's right side is then one compact row per
        // surviving shingle; the explode fan-out is ≤ cap per hit.
        val perShingle = tr.groupBy("sk")
          .agg(graft.functions.DocFreqFunctions.docFreq(col("train_id"), cap)
            .as("f"))
          .filter(col("f.df") <= cap)
          .select(col("sk"), col("f.ids").as("tids"))
        ev.join(perShingle, "sk")
          .select(col("eval_id"), col("sk"),
            explode(col("tids")).as("train_id"))
      case None => ev.join(tr, "sk")
    }
    val hits = joined
      .groupBy("eval_id")
      .agg(countDistinct(col("sk")).as("n_shared_shingles"),
        countDistinct(col("train_id")).as("n_train_docs"))
    eval.select(col(idCol).as("eval_id"))
      .join(hits, Seq("eval_id"), "left")
      .select(col("eval_id"),
        coalesce(col("n_shared_shingles"), lit(0L)).as("n_shared_shingles"),
        coalesce(col("n_train_docs"), lit(0L)).as("n_train_docs"),
        when(col("n_shared_shingles").isNotNull, 1L).otherwise(0L)
          .as("contaminated"))
  }

  /** SURGICAL decontamination — [[report]] tells you WHICH training
    * documents overlap the eval set; this removes the overlapping
    * SPANS and keeps the rest of each document (dropping whole
    * documents over one shared sentence wastes data; GPT-3-style
    * pipelines cut the colliding window). Every train token covered by
    * ANY k-gram that also occurs in an eval document is scrubbed; the
    * survivors reassemble in order.
    *
    * Same scale shape as [[report]]: one shuffle join on the shingle
    * key (hashed 8-byte keys in production — `hashed = false` keys the
    * identical pipeline on gram strings, the oracle-portable twin with
    * identical output modulo ~2^-64 collisions, the standing
    * hashed-key argument). The hit windows then aggregate to ONE
    * compact row per contaminated doc (sorted start positions —
    * bounded by windows/doc), left-join back to the train docs on the
    * id, and a single native two-pointer pass ([[graft.functions
    * .ScrubKernel]]) drops the covered tokens where the document row
    * already sits. Untouched docs (the overwhelming majority at scale)
    * never re-tokenize: their text passes through the left join
    * unchanged. No token-level row ever shuffles.
    *
    * Returns one row per train document with non-null text:
    * `(doc_id, n_tokens, n_scrubbed, scrubbed_text)` — `scrubbed_text`
    * is "" when the whole document was eval overlap.
    */
  def scrubSpans(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, k: Int = 5, hashed: Boolean = true,
      tokenize: Column => Column = TextAnalysis.tokens): DataFrame = {
    // with a non-default `tokenize` (e.g. tokensWs) the reassembled
    // text is single-space normalized — original whitespace is not
    // reconstructible once spans are cut, and a whitespace-robust
    // matcher is the point of using that tokenizer
    def gramsOf(text: Column): Column =
      if (hashed) graft.functions.HashFunctions.ngramHashes(
        tokenize(text), k, keepPartial = true)
      else TextAnalysis.ngrams(tokenize(text), k, keepPartial = true)
    val ev = eval.filter(col(textCol).isNotNull)
      .select(explode(array_distinct(gramsOf(col(textCol)))).as("_sk"))
      .distinct()
    val tr = train.filter(col(textCol).isNotNull)
    val windows = tr.select(col(idCol).as("doc_id"),
      posexplode(gramsOf(col(textCol))).as(Seq("_w", "_sk")))
    // one row per contaminated doc: the sorted distinct start
    // positions of its overlapping windows (windows near the end of a
    // short doc "cover" positions past the last token — the kernel
    // clamps by construction: those positions have no token)
    val hitStarts = windows.join(ev, "_sk")
      .groupBy("doc_id")
      .agg(collect_set(col("_w")).as("_ws"))
    tr.select(col(idCol).as("doc_id"),
        tokenize(col(textCol)).as("_toks"))
      .join(hitStarts, Seq("doc_id"), "left")
      .select(col("doc_id"), col("_toks"),
        when(col("_ws").isNull,
          struct(lit(0L).as("n_scrubbed"),
            concat_ws(" ", col("_toks")).as("scrubbed_text")))
          .otherwise(graft.functions.ScrubFunctions
            .scrubTokens(col("_toks"), col("_ws"), k)).as("_s"))
      .select(col("doc_id"),
        size(col("_toks")).cast("long").as("n_tokens"),
        col("_s.n_scrubbed").as("n_scrubbed"),
        col("_s.scrubbed_text").as("scrubbed_text"))
  }
}
