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
}
