package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The composed training-data curation pipeline — the reason the
  * north-star operators exist as separable stages. Each step is a
  * DataFrame→DataFrame transform, so the same composition runs at any
  * scale and each stage's shuffle budget is what its operator
  * documents:
  *
  *   1. quality gate   — per-row signals, no shuffle
  *   2. exact dedup    — one shuffle on the text hash
  *   3. near-dup sweep — LSH candidates → exact verify (x12 path),
  *                       then drop every pair's larger id: survivors
  *                       provably contain no verified pair (any pair's
  *                       max id is itself dropped)
  *
  * "Keep the smaller id" is the deterministic keep-first policy; a
  * smarter representative choice (longest doc, centroid doc) drops in
  * by changing the aggregation, not the plan shape.
  */
object DataPipeline {

  /** Ids to REMOVE under keep-smallest-id near-dup policy. */
  def nearDupVictims(pairs: DataFrame): DataFrame =
    pairs.select(col("b_id").as("doc_id")).distinct()

  /** Full curation pass over a `documents`-shaped frame. Exact dedup is
    * keep-smallest-id (deterministic — `dropDuplicates` keeps an
    * arbitrary row, which would flap across runs/partitionings), so the
    * whole pipeline is a pure function of its input.
    *
    * `tokenize` flows through BOTH tokenizer consumers — the quality
    * gate's token count and the near-dup token sets — so running the
    * pipeline on [[TextAnalysis.tokensFolded]] makes documents that
    * differ only in whitespace/case/edge-punctuation near-dup-match
    * (the x75 contract); the default single-space [[TextAnalysis
    * .tokens]] keeps the x50 fixture semantics.
    */
  def curate(docs: DataFrame, minTokens: Int = 40,
      minJaccard: Double = 0.9, blockCol: Column = lit(0),
      numHashes: Int = 64, bands: Int = 16,
      tokenize: Column => Column = TextAnalysis.tokens): DataFrame = {
    val gated = docs
      .filter(col("text").isNotNull)
      .filter(size(tokenize(col("text"))).cast("long") >= minTokens)
    val keep = gated.groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"))
    val exact = gated.join(keep, Seq("doc_id", "text"), "left_semi")
    val withTok = exact.withColumn("_tok",
      Dedup.tokenSet(col("text"), tokenize))
    val victims = nearDupVictims(
      Dedup.nearDupPairs(withTok, "doc_id", "_tok", minJaccard,
        numHashes = numHashes, bands = bands, blockCol = blockCol))
    withTok.join(victims, Seq("doc_id"), "left_anti").drop("_tok")
  }

  /** Leakage-safe train/val/test split: the split is a hash of the
    * near-dup CLUSTER id, not the document id, so two near-duplicate
    * documents can never land in different splits — the failure mode
    * that silently inflates eval numbers when a test document's twin
    * sits in train. Documents in no near-dup pair are their own
    * cluster (component = own id) and split exactly as
    * [[Sampling.splitAssign]] would have split them.
    *
    * Same split-stability contract as splitAssign: membership is a
    * pure function of the cluster's canonical (minimum) id, so a
    * cluster never migrates between splits as the corpus grows UNLESS
    * new data joins two clusters — in which case merging their splits
    * is the correct behavior, not a bug.
    *
    * Scale: adds one CC run (O(log d) bounded shuffle rounds over the
    * PAIR list, which near-dup pruning keeps far smaller than the
    * corpus) and one broadcast-or-shuffle join of labels back onto
    * docs; the split predicate itself stays per-row stateless.
    */
  def leakageSafeSplit(docs: DataFrame, idCol: String,
      pairs: DataFrame, aCol: String, bCol: String,
      trainRate: Double, valRate: Double): DataFrame =
    Sampling.splitAssign(
      Clusters.assignComponents(docs, idCol, pairs, aCol, bCol),
      "component", trainRate, valRate)

  /** Corpus snapshot diff — the data-versioning report run between two
    * corpus versions before retraining: per id, `added` (only in new),
    * `removed` (only in old), `modified` (both, content hash differs)
    * or `unchanged`. Content equality is md5-of-text (cross-engine
    * portable; 2^-128 collisions), so the diff never ships text
    * through the shuffle — ONE full-outer join on the id carrying
    * 16-byte hashes, then a stateless per-row classification. Feed the
    * `modified`+`added` ids back into the incremental operators
    * ([[graft.ops.Dedup.incrementalNearDupPairs]],
    * [[graft.ops.Dedup.bloomFreshRows]]) to re-curate only the delta.
    *
    * Returns `(id, status)` for every id in either snapshot.
    */
  def snapshotDiff(oldDocs: DataFrame, newDocs: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val o = oldDocs.select(col(idCol).cast("long").as("id"),
      md5(col(textCol)).as("_ho"))
    val n = newDocs.select(col(idCol).cast("long").as("id"),
      md5(col(textCol)).as("_hn"))
    o.join(n, Seq("id"), "full_outer")
      .select(col("id"),
        when(col("_ho").isNull, "added")
          .when(col("_hn").isNull, "removed")
          .when(col("_ho") =!= col("_hn"), "modified")
          .otherwise("unchanged").as("status"))
  }
}
