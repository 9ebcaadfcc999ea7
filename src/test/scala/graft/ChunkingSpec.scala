package graft

import org.apache.spark.sql.functions._

/** Q22 chunked-index invariants (frozen spec per SURVEY.md §2.2, derived
  * from the reference demo `src/main.cpp:10-38`): byte conservation,
  * dense non-negative chunk ids, and per-chunk spans bounded by the
  * running-sum rule.
  */
class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  test("chunk bytes conserve the total and ids start at 0") {
    val result = SparkEntry.queries("q22_chunked_index")(spark, sf0001)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    val docs = Tables.load(spark, sf0001, "documents")
      .filter($"text".isNotNull)
      .select((length($"n_chars".cast("string")).cast("long") + $"n_chars")
        .as("bytes"))
      .agg(sum($"bytes"), count(lit(1))).head()
    val (totalBytes, totalDocs) = (docs.getLong(0), docs.getLong(1))
    assert(result.map(_._3).sum === totalBytes)
    assert(result.map(_._2).sum === totalDocs)
    assert(result.head._1 === 0L)
    assert(result.map(_._1).distinct.size === result.size)
    // every chunk except the last must close at or past the 4096 line:
    // bytes(chunk k) >= 4096*(k+1) - running_start(k) → cumulative sums
    // of all but the last chunk reach their boundary
    val cum = result.map(_._3).scanLeft(0L)(_ + _).drop(1)
    result.dropRight(1).zip(cum).foreach { case ((id, _, _), cumBytes) =>
      assert(cumBytes >= (id + 1) * 4096,
        s"chunk $id closed before its 4096 boundary")
    }
  }

  test("sequence packing: hand-computed offsets, spans, and fixture invariants") {
    import graft.ops.TextAnalysis
    // seqLen=4; token counts 3,2,5 → starts 0,3,5 → doc 2 straddles the
    // first boundary (spans 2), doc 3 spans sequences 1-2
    val docs = Seq((1L, "a b c"), (2L, "d e"), (3L, "f g h i j"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.packSequences(docs, "doc_id", "text", seqLen = 4)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got(1L) === ((3L, 0L, 0L, 0L, 1L)))
    assert(got(2L) === ((2L, 3L, 0L, 3L, 2L)))
    assert(got(3L) === ((5L, 5L, 1L, 1L, 2L)))
    // fixture invariants: contiguous coverage (start = running sum of
    // preceding docs), seq_pos < seqLen, n_seqs >= 1
    val fx = TextAnalysis.packSequences(
        Tables.load(spark, sf0001, "documents"), "doc_id", "text", 2048)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    var run = 0L
    fx.foreach { case (id, n, start, _, pos, spans) =>
      assert(start === run, s"doc $id: gap or overlap in packing")
      assert(pos >= 0 && pos < 2048 && spans >= 1, s"doc $id bad addr")
      run += n
    }
  }
}
