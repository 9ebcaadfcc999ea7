package graft

import org.apache.spark.sql.functions._

import graft.functions.PairCountFunctions.pairCount

/** PairCountAgg must equal the literal self-join pair count on random
  * multisets (duplicates included).
  */
class PairCountSpec extends SparkSpec {
  import spark.implicits._

  test("pairCount equals the self-join count over random multisets") {
    val rows = (0 until 5000).map(i =>
      ((i % 401).toLong, (i * 31 % 9).toLong)) // keys with duplicate values
    val df = rows.toDF("k", "v").repartition(8)
    val got = df.groupBy($"k").agg(pairCount($"v").as("p"))
      .filter($"p" > 0)
      .as[(Long, Long)].collect().toMap
    val a = df.as("a"); val b = df.as("b")
    val truth = a.join(b, col("a.k") === col("b.k") &&
        col("a.v") < col("b.v"))
      .groupBy(col("a.k").as("k")).agg(count(lit(1)).as("p"))
      .as[(Long, Long)].collect().toMap
    assert(got === truth)
  }
}
