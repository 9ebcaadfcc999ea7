package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-safe interval (range) join: `points` rows match `intervals`
  * rows of the same key with `lo <= t <= hi`.
  *
  * The naive plan is an equi-join on the key with a range residual —
  * fine when keys are selective, quadratic inside a hot key. This
  * implementation BUCKETIZES time: every interval explodes into the
  * fixed-width buckets it overlaps, points map to their single bucket,
  * and the join becomes a pure equi-join on (key, bucket) with the
  * exact containment check as a cheap post-filter. Work per row is
  * O(interval_span / bucketWidth), and the shuffle key (key, bucket)
  * spreads a hot key over its time range — the standard trick Spark
  * lacks natively (Databricks' range-join hint does the same binning).
  *
  * Choose `bucketWidthMicros` ≈ the typical interval span: much wider
  * wastes residual comparisons, much narrower explodes intervals.
  */
object RangeJoin {

  /** `points(keyCols, tCol)` ⋈ `intervals(keyCols, loCol, hiCol)`,
    * inclusive bounds, all time columns in epoch micros (LongType).
    */
  def byBuckets(points: DataFrame, intervals: DataFrame,
      keyCols: Seq[String], tCol: String, loCol: String, hiCol: String,
      bucketWidthMicros: Long): DataFrame = {
    require(bucketWidthMicros > 0)
    val w = lit(bucketWidthMicros)
    val p = points.withColumn("_bucket", floor(col(tCol) / w))
    val iv = intervals.withColumn("_bucket",
      explode(sequence(floor(col(loCol) / w), floor(col(hiCol) / w))))
    p.join(iv, keyCols :+ "_bucket")
      .filter(col(tCol) >= col(loCol) && col(tCol) <= col(hiCol))
      .drop("_bucket")
  }
}
