package graft

import org.apache.spark.sql.DataFrame

import graft.ops.TextAnalysis

/** Pins the r15 LM-slot liveness contract (the r14 verdict's item 3):
  * a frame returned by any LM-slot-backed op stays EXECUTABLE for the
  * life of the session, even after its slot entry is LRU-evicted by
  * ≥ [[TextAnalysis.LmSlotCapacity]] later builds on different
  * corpus/tokenizer/kind keys.
  *
  * Through r14 the slots held `localCheckpoint`ed frames, and eviction
  * released the checkpoint blocks out from under frames already
  * returned to callers — the green suite survived only via a
  * test-harness rebuild-retry shim while the log filled with
  * `CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND`. r15 holds `persist`ed frames
  * (full lineage kept), so eviction unpersists the cache and a live
  * frame transparently RECOMPUTES. This spec drives >capacity distinct
  * keys and re-executes the FIRST returned frame — with the old
  * checkpoint slots it deterministically threw; now it must succeed
  * with identical results and no retry anywhere.
  */
class LmSlotLivenessSpec extends SparkSpec {

  private def docs: DataFrame =
    spark.read.parquet(s"$sf0001/documents.parquet")

  test("a returned LM-scored frame survives LRU eviction of its slot " +
      "(recompute-on-miss, no CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND)") {
    val d = docs
    // build 1: bigram add-one — the frame under test
    val first = TextAnalysis.lmQuality(d, "doc_id", "text")
    val before = first.orderBy("doc_id").collect()
    assert(before.nonEmpty)
    // now churn through > LmSlotCapacity DISTINCT slot keys: trigram
    // + fivegram rows/scored, then distinct-tokenizer bigram models
    // (each lmQuality call installs TWO keys: rows + scored) — enough
    // to evict the original bigram-model/scored entries at any
    // capacity ≤ 12
    TextAnalysis.knTrigramQuality(d, "doc_id", "text").count()
    TextAnalysis.kn5Quality(d, "doc_id", "text").count()
    for (pat <- Seq("\\s+", " +", "[ ]+", "[\\s]+")) {
      TextAnalysis.lmQuality(d, "doc_id", "text",
        tokenize = c => org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.lower(c), pat)).count()
    }
    // the original frame's slot entry is gone; executing it again must
    // RECOMPUTE (not crash) and reproduce the identical result
    val after = first.orderBy("doc_id").collect()
    assert(after.sameElements(before),
      "recomputed frame diverged from its pre-eviction result")
  }

  test("slot hit returns the SAME cached plan (reuse still works)") {
    val d = docs
    val a = TextAnalysis.knTrigramQuality(d, "doc_id", "text")
    val b = TextAnalysis.knTrigramQuality(d, "doc_id", "text")
    // both rides read the trigram rows through one InMemoryTableScan
    // cache — the physical plans must both carry the barrier
    for (df <- Seq(a, b))
      assert(df.queryExecution.executedPlan.toString.toLowerCase
        .contains("inmemorytablescan"),
        "kn3 lost its trigram-table cache barrier")
    assert(a.orderBy("doc_id").collect()
      .sameElements(b.orderBy("doc_id").collect()))
  }

  test("slot capacity conf is respected and hit/miss counters expose " +
      "thrash (r16, VERDICT r15 item 8)") {
    // fresh session: its own slot cache, counters from zero, and the
    // capacity conf stays scoped away from the other tests
    val s2 = spark.newSession()
    s2.conf.set(TextAnalysis.LmSlotCapacityConf, "2")
    val d = s2.read.parquet(s"$sf0001/documents.parquet")
    assert(TextAnalysis.lmSlotStats(s2) == ((0L, 0L)))
    // first score: both keys (model rows + scored table) are misses
    TextAnalysis.lmQuality(d, "doc_id", "text").count()
    val (h1, m1) = TextAnalysis.lmSlotStats(s2)
    assert(h1 == 0L && m1 >= 2L, s"expected cold misses, got ($h1, $m1)")
    // same-corpus re-score: pure hits, no new misses
    TextAnalysis.lmQuality(d, "doc_id", "text").count()
    val (h2, m2) = TextAnalysis.lmSlotStats(s2)
    assert(h2 >= 1L && m2 == m1,
      s"re-score should hit the cache, got ($h2, $m2) after ($h1, $m1)")
    // churn 2 distinct trigram keys through the capacity-2 cache: the
    // bigram entries are evicted, so the next bigram score MISSES —
    // at the default capacity 8 it would have hit
    TextAnalysis.knTrigramQuality(d, "doc_id", "text").count()
    val (_, m3) = TextAnalysis.lmSlotStats(s2)
    TextAnalysis.lmQuality(d, "doc_id", "text").count()
    val (_, m4) = TextAnalysis.lmSlotStats(s2)
    assert(m4 > m3,
      "capacity-2 cache failed to evict the bigram entries: " +
        s"$LmCapMsg")
    // out-of-domain capacity raises, not silently clamps
    s2.conf.set(TextAnalysis.LmSlotCapacityConf, "0")
    intercept[IllegalArgumentException] {
      TextAnalysis.lmQuality(d, "doc_id", "text").count()
    }
    s2.conf.unset(TextAnalysis.LmSlotCapacityConf)
  }

  private val LmCapMsg = "spark.graft.lm.slotCapacity not respected"
}
