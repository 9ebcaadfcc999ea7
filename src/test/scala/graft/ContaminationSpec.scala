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
}
