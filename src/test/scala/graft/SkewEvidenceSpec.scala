package graft

import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Skew handling exercised on the hot query it matters for: x8's LSH
  * candidate join. A near-dup-heavy corpus drives one (band, hash)
  * bucket to dominate the shuffle; with AQE skew-join enabled the
  * final adaptive plan must show the skewed sort-merge join being
  * split (`skew=true`), and the salted fallback must agree with the
  * unsalted result.
  */
class SkewEvidenceSpec extends SparkSpec {
  import spark.implicits._

  /** 2400 of 3000 docs are exact copies of one text → one dominant LSH
    * bucket; the rest are distinct.
    */
  private def skewedDocs = {
    val hot = (0 until 2400).map(i => (i.toLong, "hot",
      "the quick brown fox jumps over the lazy dog again and again " * 3))
    val cold = (2400 until 3000).map(i => (i.toLong, "cold",
      s"unique document number $i with its own words token$i tok${i * 7} " +
        s"filler${i % 97} extra${i % 13}"))
    (hot ++ cold).toDF("doc_id", "source", "text")
      .select($"doc_id", Dedup.tokenSet($"text").as("tok"))
  }

  test("AQE splits the skewed LSH bucket join (skew=true in final plan)") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.adaptive.forceOptimizeSkewedJoin",
      "spark.sql.shuffle.partitions"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      // identical docs collide in EVERY band, so hotness only shows as
      // partition-level skew when hot buckets occupy a minority of
      // partitions: 16 hot buckets over 64 partitions
      conf.set("spark.sql.shuffle.partitions", "64")
      val pairs = Dedup.minhashLshPairs(skewedDocs, "doc_id", "tok",
        minEstSim = 0.9)
      // execute and inspect the SAME query execution (count() would
      // build a separate plan and leave this one unexecuted)
      val cntDf = pairs.groupBy().count()
      val n = cntDf.collect().head.getLong(0)
      // every hot-hot pair is a candidate and estimates sim 1.0
      assert(n >= 2400L * 2399 / 2)
      val finalPlan = cntDf.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected AQE skew-split SMJ in final plan:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("salted fallback matches the unsalted bucket join on skewed data") {
    val docs = skewedDocs
    val banded = docs.select($"doc_id",
        graft.functions.HashFunctions.minhashSig($"tok", 16).as("sig"))
      .select($"doc_id", explode(transform(sequence(lit(0), lit(3)),
        b => struct(b.as("band_id"),
          xxhash64(slice($"sig", b * 4 + 1, lit(4))).as("band_hash"))))
        .as("band"))
      .select($"doc_id", $"band.band_id", $"band.band_hash")
    val a = banded.select($"band_id", $"band_hash", $"doc_id".as("a_id"))
    val b = banded.select($"band_id", $"band_hash", $"doc_id".as("b_id"))
    val plain = a.join(b, Seq("band_id", "band_hash"))
      .filter($"a_id" < $"b_id").select($"a_id", $"b_id").distinct()
    val salted = graft.ops.SkewJoin.saltedEquiJoin(
        a, b, Seq("band_id", "band_hash"), saltFactor = 4,
        saltExpr = Some(pmod(xxhash64($"a_id"), lit(4))))
      .filter($"a_id" < $"b_id").select($"a_id", $"b_id").distinct()
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
  }
}
