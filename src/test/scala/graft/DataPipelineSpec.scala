package graft

import org.apache.spark.sql.functions._

import graft.ops.{DataPipeline, Dedup}

/** End-to-end curation invariants: the pipeline output contains no
  * exact duplicates, no verified near-dup pair, keeps the smallest id
  * of each duplicate family, and never invents rows.
  */
class DataPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("curate removes exact and near duplicates, keeping smallest ids") {
    val base = Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"source", $"text")
    // plant: exact copy of doc 0 at id 100000, near-copy of doc 1 at 100001
    val d0 = base.filter($"doc_id" === 0).select($"text").head().getString(0)
    val d1 = base.filter($"doc_id" === 1).select($"text").head().getString(0)
    val planted = Seq(
      (100000L, "planted", d0),
      (100001L, "planted", d1 + " tail tail")
    ).toDF("doc_id", "source", "text")
    val docs = base.union(planted)

    val out = DataPipeline.curate(docs, minTokens = 5, minJaccard = 0.9)
    val ids = out.select($"doc_id").as[Long].collect().toSet

    // the planted exact copy must fall to keep-smallest exact dedup
    assert(!ids.contains(100000L))
    // the planted near-copy must fall to the near-dup sweep
    assert(!ids.contains(100001L))
    // the global-minimum id can never be a victim
    assert(ids.contains(0L))
    // no exact duplicates remain
    assert(out.count() === out.select($"text").distinct().count())
    // no verified near-dup pair remains among survivors
    val withTok = out.withColumn("_tok", Dedup.tokenSet($"text"))
    val remaining = Dedup.nearDupPairs(withTok, "doc_id", "_tok", 0.9)
    assert(remaining.count() === 0L)
    // no invented rows
    assert(ids.subsetOf(
      docs.select($"doc_id").as[Long].collect().toSet))
  }
}
