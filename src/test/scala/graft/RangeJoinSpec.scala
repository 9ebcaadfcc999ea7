package graft

import org.apache.spark.sql.functions._

import graft.ops.RangeJoin

/** The bucketized range join must equal the naive theta join for any
  * bucket width, including widths far narrower and far wider than the
  * interval span.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketized range join equals the theta join at several widths") {
    val points = (0 until 2000).map(i =>
      ((i % 7).toLong, i.toLong, (i * 131L) % 100000)).toDF("k", "pid", "t")
    val intervals = (0 until 300).map { i =>
      val lo = (i * 337L) % 95000
      ((i % 7).toLong, i.toLong, lo, lo + 1500 + (i % 5) * 800L)
    }.toDF("k", "iid", "lo", "hi")
    val truth = points.join(intervals, Seq("k"))
      .filter($"t" >= $"lo" && $"t" <= $"hi")
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty)
    Seq(100L, 1500L, 50000L).foreach { width =>
      val got = RangeJoin.byBuckets(points, intervals,
          Seq("k"), "t", "lo", "hi", width)
        .select($"pid", $"iid").as[(Long, Long)].collect().toSet
      assert(got === truth, s"width=$width: " +
        s"missed=${(truth -- got).size} extra=${(got -- truth).size}")
    }
  }
}
