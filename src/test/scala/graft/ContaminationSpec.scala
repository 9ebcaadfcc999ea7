package graft

import org.apache.spark.sql.functions._

import graft.ops.Contamination

/** Contamination report: hashed and string join keys must agree, the
  * document-frequency cap must only ever remove hits, and a planted
  * exact copy must always be flagged.
  */
class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sf0001, "documents").cache()
  private lazy val eval = docs.filter($"source" === "src0")
  private lazy val train = docs.filter($"source" =!= "src0")

  test("hashed join key gives the identical report to string keys") {
    val byString = Contamination.report(train, eval, "doc_id", "text",
        k = 5, hashed = false)
      .as[(Long, Long, Long, Long)].collect().sorted
    val byHash = Contamination.report(train, eval, "doc_id", "text",
        k = 5, hashed = true)
      .as[(Long, Long, Long, Long)].collect().sorted
    assert(byString.nonEmpty && byString.sameElements(byHash))
  }

  test("every eval doc appears exactly once, clean docs with zero counts") {
    val rep = Contamination.report(train, eval, "doc_id", "text", k = 5)
      .as[(Long, Long, Long, Long)].collect()
    assert(rep.length == eval.count())
    assert(rep.map(_._1).distinct.length == rep.length)
    rep.foreach { case (_, nSh, nTr, flag) =>
      assert((flag == 1L) == (nSh > 0L))
      assert((nSh > 0L) == (nTr > 0L))
    }
  }

  test("one-pass capped report equals the explicit two-pass formulation") {
    // the production path folds df + carrier ids into ONE DocFreqAgg
    // pass; this pins it value-equal to the naive shape (df-count
    // shuffle + keep-set join + row-level eval join)
    val cap = 3L
    def shingleRows(df: org.apache.spark.sql.DataFrame, as: String) =
      df.select(col("doc_id").as(as),
          explode(graft.ops.Dedup.shingles(col("text"), 5)).as("s"))
        .select(col(as), xxhash64(col("s")).as("sk"))
    val ev = shingleRows(eval, "eval_id")
    val tr = shingleRows(train, "train_id")
    val keep = tr.groupBy("sk").agg(count(lit(1)).as("df"))
      .filter(col("df") <= cap).select("sk")
    val expected = eval.select(col("doc_id").as("eval_id"))
      .join(ev.join(tr.join(keep, "sk"), "sk")
          .groupBy("eval_id")
          .agg(countDistinct(col("sk")).as("nSh"),
            countDistinct(col("train_id")).as("nTr")),
        Seq("eval_id"), "left")
      .select(col("eval_id"), coalesce(col("nSh"), lit(0L)),
        coalesce(col("nTr"), lit(0L)))
      .as[(Long, Long, Long)].collect().sorted
    val got = Contamination.report(train, eval, "doc_id", "text", k = 5,
        maxShingleDf = Some(cap), hashed = true)
      .select(col("eval_id"), col("n_shared_shingles"), col("n_train_docs"))
      .as[(Long, Long, Long)].collect().sorted
    assert(got.nonEmpty && got.sameElements(expected))
  }

  test("df cap only removes hits; planted copy is always flagged") {
    // plant an eval doc that is an exact copy of a train doc
    val planted = train.limit(1)
      .select(lit(999999L).as("doc_id"), col("text"))
    val evalPlus = eval.select($"doc_id", $"text").union(planted)
    val uncapped = Contamination.report(train, evalPlus, "doc_id", "text",
        k = 5)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val capped = Contamination.report(train, evalPlus, "doc_id", "text",
        k = 5, maxShingleDf = Some(3L))
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(uncapped(999999L)._4 == 1L, "planted copy must be contaminated")
    capped.foreach { case (id, (_, nSh, nTr, _)) =>
      assert(nSh <= uncapped(id)._2 && nTr <= uncapped(id)._3,
        s"cap increased counts for doc $id")
    }
  }

  test("scrubSpans removes exactly the overlapping span, keeps the rest") {
    // train doc 1 embeds an eval 5-gram mid-document; doc 2 is clean;
    // doc 3 IS the eval text (fully scrubbed); doc 4 is shorter than k
    // and clean (partial-shingle path)
    val train = Seq(
      (1L, "keep1 keep2 e1 e2 e3 e4 e5 keep3 keep4"),
      (2L, "all clean tokens here nothing shared"),
      (3L, "e1 e2 e3 e4 e5"),
      (4L, "tiny doc")).toDF("doc_id", "text")
    val eval = Seq((9L, "x1 e1 e2 e3 e4 e5 x2")).toDF("doc_id", "text")
    val got = Contamination.scrubSpans(train, eval, "doc_id", "text", k = 5)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) === ((9L, 5L, "keep1 keep2 keep3 keep4")))
    assert(got(2L) === ((6L, 0L, "all clean tokens here nothing shared")))
    assert(got(3L) === ((5L, 5L, "")))
    assert(got(4L) === ((2L, 0L, "tiny doc")))
    // hashed and string keys scrub identically on the fixture
    val docs = Tables.load(spark, sf0001, "documents")
    val tr = docs.filter($"source" =!= "src0")
    val ev = docs.filter($"source" === "src0")
    val h = Contamination.scrubSpans(tr, ev, "doc_id", "text", 5,
      hashed = true).orderBy($"doc_id").collect()
    val s = Contamination.scrubSpans(tr, ev, "doc_id", "text", 5,
      hashed = false).orderBy($"doc_id").collect()
    assert(h.nonEmpty)
    assert(h.map(_.toString).toSeq === s.map(_.toString).toSeq)
    // something was actually scrubbed somewhere, and nothing invented:
    // scrubbed docs only ever lose tokens
    val scrubbedTotal = Contamination.scrubSpans(tr, ev, "doc_id", "text", 5)
      .agg(sum($"n_scrubbed")).as[Long].head()
    assert(scrubbedTotal > 0L, "fixture contamination must trigger scrubbing")
  }
}
