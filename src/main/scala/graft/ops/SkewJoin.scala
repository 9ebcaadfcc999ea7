package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual fallback when AQE's
  * skew-join splitting isn't available (e.g. the skew is in a
  * broadcast-ineligible dimension or a non-shuffle stage feeds the
  * join).
  *
  * The skewed (large, hot-keyed) side gets a uniform random-ish salt
  * derived deterministically from existing columns (`saltExpr`, default
  * a hash of all columns — NOT a `rand()`, so retries/speculative tasks
  * stay consistent); the build side is replicated `saltFactor` times.
  * Each hot key now spreads over `saltFactor` shuffle partitions at the
  * cost of a `saltFactor`× blow-up of the build side — choose the
  * factor ≈ (hottest-key rows / average-key rows) capped by memory.
  */
object SkewJoin {

  def saltedEquiJoin(skewed: DataFrame, build: DataFrame,
      joinKeys: Seq[String], saltFactor: Int,
      saltExpr: Option[Column] = None): DataFrame = {
    require(saltFactor >= 1)
    val salt = saltExpr.getOrElse(
      pmod(xxhash64(skewed.columns.map(col).toIndexedSeq: _*), lit(saltFactor)))
    val l = skewed.withColumn("_salt", salt.cast("int"))
    val r = build.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    l.join(r, joinKeys :+ "_salt").drop("_salt")
  }
}
