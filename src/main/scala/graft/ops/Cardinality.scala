package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Portable cardinality sketching — the x43/x71 "portable twin"
  * pattern applied to x16's approx-distinct: Spark's native HLL
  * (`approx_count_distinct`) has no cross-engine oracle, so this KMV
  * (k-minimum-values, Bar-Yossef et al. 2002) sketch is spelled from
  * md5 primitives BOTH engines own, letting the driver hash-check the
  * whole sketch→estimate pipeline shape that x16 runs natively.
  */
object Cardinality {

  /** KMV distinct-count estimate per group: hash each distinct value
    * to its md5 hex (uniform on the hex-string order), keep the `k`
    * smallest hashes per group, and estimate
    * `D ≈ (k−1) · 65536 / (v+1)` where `v` is the 16-bit integer
    * value of the k-th smallest hash's 4-hex prefix — the classic
    * (k−1)/h_(k) KMV estimator on a 16-bit grid. Groups with fewer
    * than `k` distinct values short-circuit to the exact count (the
    * sketch saw everything). Estimate arithmetic is exact integers →
    * ONE correctly-rounded IEEE division → floor, spelled identically
    * in the oracle — bit-deterministic cross-engine, no libm.
    *
    * This spelling is the VERIFICATION twin: the per-group
    * row_number window is oracle-portable but sorts each group's
    * distinct hashes. The production sketch at 100 TB stays x16's
    * native one-pass mergeable HLL (or a bounded-heap KMV aggregate);
    * map-side `distinct` partial aggregation already bounds this
    * twin's shuffle at |distinct values| rows of (group, 32-byte
    * hash).
    *
    * Returns `(groupCol, n_k, kth_v, est_distinct)` — `n_k` =
    * `min(k, D)` hashes retained, `kth_v` the 16-bit prefix value of
    * the k-th smallest (the estimator's denominator input).
    */
  def portableKmvDistinct(df: DataFrame, groupCol: String,
      valueCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 2, "KMV needs k >= 2 ((k-1)/h_(k) estimator)")
    val hashed = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("_grp"),
        md5(col(valueCol).cast(StringType)).as("_h"))
      .distinct()
    val w = Window.partitionBy("_grp").orderBy(col("_h").asc)
    val kth = hashed
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= k)
      .groupBy("_grp")
      // among the k smallest full hashes, prefix-of-max = max-of-prefix
      // (substr is monotone on the fixed-width lexicographic order)
      .agg(count(lit(1)).as("n_k"), max(substring(col("_h"), 1, 4)).as("_kh"))
    kth.select(col("_grp").as(groupCol), col("n_k"),
        conv(col("_kh"), 16, 10).cast(LongType).as("kth_v"))
      .select(col(groupCol), col("n_k"), col("kth_v"),
        when(col("n_k") < k, col("n_k"))
          .otherwise(floor(lit((k - 1) * 65536L).cast(DoubleType) /
            (col("kth_v") + lit(1L)).cast(DoubleType)).cast(LongType))
          .as("est_distinct"))
  }
}
