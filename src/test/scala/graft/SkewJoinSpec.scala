package graft

import org.apache.spark.sql.functions._

import graft.ops.SkewJoin

/** Salted join must be result-equivalent to the plain equi-join while
  * spreading a hot key across salt buckets.
  */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on a skewed fixture") {
    // 90% of fact rows share one hot key
    val fact = spark.range(0, 20000)
      .select((when($"id" % 10 === 0, $"id" % 50).otherwise(7L)).as("k"),
        $"id".as("v"))
    val dim = spark.range(0, 50).select($"id".as("k"), ($"id" * 100).as("w"))
    val plain = fact.join(dim, Seq("k")).select($"k", $"v", $"w")
    val salted = SkewJoin.saltedEquiJoin(fact, dim, Seq("k"), saltFactor = 8)
      .select($"k", $"v", $"w")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("salt spreads the hot key over multiple buckets") {
    val fact = spark.range(0, 10000).select(lit(7L).as("k"), $"id".as("v"))
    val salt = fact.withColumn("_salt",
      pmod(xxhash64(fact.columns.map(col).toIndexedSeq: _*), lit(8)))
    assert(salt.select("_salt").distinct().count() === 8)
  }
}
