package graft

import org.apache.spark.sql.functions._

import graft.ops.PrefixSum

/** Direct unit coverage for the two-pass prefix helpers (the scale
  * replacement for no-partition windows): dense positions in partition
  * order, and running sums identical to a driver-side scan.
  */
class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  test("withPosition assigns a dense 0..n-1 ordinal over many partitions") {
    val df = spark.range(0, 10000).repartition(16)
      .select(($"id" * 7 % 1000).as("v"))
    val pos = PrefixSum.withPosition(df, "pos")
    assert(pos.count() === 10000)
    val stats = pos.agg(min($"pos"), max($"pos"),
      countDistinct($"pos")).head()
    assert(stats.getLong(0) === 0L)
    assert(stats.getLong(1) === 9999L)
    assert(stats.getLong(2) === 10000L)
    // position order is (partition, intra-partition) order
    val perPart = pos.withColumn("pid", spark_partition_id())
      .groupBy("pid").agg(min($"pos").as("lo"), max($"pos").as("hi"),
        count(lit(1)).as("n"))
      .collect()
    perPart.foreach(r =>
      assert(r.getAs[Long]("hi") - r.getAs[Long]("lo") + 1 === r.getAs[Long]("n"),
        "positions within a partition must be contiguous"))
  }

  test("withRunningLongSum is stable across repeated evaluations") {
    // the two internal passes share one RDD lineage; re-evaluating the
    // result must not see different range boundaries between passes
    val df = (1L to 4000L).map(i => (i * 37 % 5000, i % 101))
      .toDF("k", "v").repartition(8)
    val run = PrefixSum.withRunningLongSum(df, Seq("k", "v"), "v", "run")
    val a = run.orderBy("k", "v").collect().map(_.toString).toSeq
    val b = run.orderBy("k", "v").collect().map(_.toString).toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("withRunningLongSum equals the sequential scan, nulls count as 0") {
    val rows = (1L to 5000L).map(i =>
      (5000L - i, if (i % 17 == 0) None else Some(i % 97)))
    val df = rows.toDF("k", "v").repartition(8)
    val run = PrefixSum.withRunningLongSum(df, Seq("k"), "v", "run")
      .orderBy("k").select($"k", $"v", $"run")
      .as[(Long, Option[Long], Long)].collect()
    var acc = 0L
    run.foreach { case (_, v, r) =>
      acc += v.getOrElse(0L)
      assert(r === acc)
    }
    assert(run.length === 5000)
  }

  test("packSequencesOrdered: explicit order drives start_tok; spans exact") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // curriculum order (score, doc_id): d2(0.1) < d1(0.5,id1) < d3(0.5,id3)
    val d = Seq((1L, 0.5, 4L), (2L, 0.1, 2L), (3L, 0.5, 3L))
      .toDF("doc_id", "score", "n_tokens")
    val got = graft.ops.TextAnalysis.packSequencesOrdered(
        d, Seq("score", "doc_id"), seqLen = 4)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6))))
      .toMap
    assert(got(2L) === ((0L, 0L, 0L, 1L))) // easiest packs first
    assert(got(1L) === ((2L, 0L, 2L, 2L))) // spans tokens 2..5 -> 2 seqs
    assert(got(3L) === ((6L, 1L, 2L, 2L))) // spans 6..8 -> seqs 1..2
  }
}
