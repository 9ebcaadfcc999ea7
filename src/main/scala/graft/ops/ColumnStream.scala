package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming column access with global row positions — the Spark analog
  * of the reference's `StringColumnIterator`
  * (`/root/reference/src/reader/parquet_reader.cpp:280-473`), which yields
  * one `(global_pos, len, ptr)` per non-null string value, page by page.
  *
  * The position is a file-order row number computed by the two-pass
  * per-partition-offset pattern ([[PrefixSum.withPosition]] — no
  * single-partition window stage, matching how the reference derives
  * global positions without any global sort:
  * `row_group_base_ + values_read_ + i`, parquet_reader.cpp:330-345).
  * Nulls are skipped exactly like the reference's def-level check, and
  * the pull iterator crosses the executor→driver boundary one partition
  * at a time (`toLocalIterator`) instead of one page at a time —
  * bounded driver memory at any input size.
  */
object ColumnStream {

  /** `(global_pos, value)` stream of a string column, nulls skipped. */
  def positionedValues(spark: SparkSession, path: String, column: String): DataFrame =
    PrefixSum.withPosition(
        spark.read.parquet(path).select(col(column).as("value")), "pos")
      .filter(col("value").isNotNull)
      .select(col("pos").cast("long"), col("value"))

  /** Driver-side pull iterator (the reference's `next()` shape). */
  def stringColumnIterator(spark: SparkSession, path: String,
      column: String): Iterator[(Long, String)] = {
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    positionedValues(spark, path, column).as[(Long, String)]
      .toLocalIterator().asScala
  }
}
