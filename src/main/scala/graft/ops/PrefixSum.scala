package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StructField}

/** Distributed prefix ordinals and prefix sums without a global window.
  *
  * A `row_number()`/`SUM() OVER (ORDER BY ... )` window with no
  * PARTITION BY moves every row to one partition ("WindowExec: No
  * Partition Defined") — correct at test scale, dead at 100 TB. Both
  * helpers here use the classic two-pass pattern instead, mirroring the
  * reference's own global positions which are computed without any
  * global sort (`row_group_base_ + values_read_ + i`,
  * `/root/reference/src/reader/parquet_reader.cpp:330-345,398`):
  *
  *  1. one cheap job computes a per-partition count/subtotal (a handful
  *     of longs, collected to the driver — bounded by partition count,
  *     never by row count);
  *  2. cumulative offsets are broadcast and each partition adds its own
  *     offset to a locally accumulated index/sum.
  *
  * Every stage stays fully parallel; the only serial step is the
  * O(#partitions) scan over subtotals on the driver. Both passes run
  * over the SAME RDD instance, so the second job reuses the first job's
  * shuffle files (for sorted inputs) or its deterministic scan — the
  * partition → offset mapping cannot drift between passes.
  */
object PrefixSum {

  /** Append a 0-based global position column in the DataFrame's current
    * (partition, intra-partition) order — the same total order as
    * `monotonically_increasing_id()`, but materialized as a dense
    * 0..n-1 ordinal with no single-partition stage.
    */
  def withPosition(df: DataFrame, posCol: String): DataFrame = {
    val spark = df.sparkSession
    val schema = df.schema.add(StructField(posCol, LongType, nullable = false))
    // zipWithIndex is exactly the two-pass pattern: a count job over the
    // partitions, then cumulative offsets + local increment per partition.
    val rdd = df.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    spark.createDataFrame(rdd, schema)
  }

  /** Append an inclusive running sum of `valueCol` (LongType, nulls
    * count as 0) over the total order given by `orderCols`. Sort is a
    * normal range-partitioned distributed sort; the cross-partition
    * carry is the broadcast offset array.
    */
  def withRunningLongSum(df: DataFrame, orderCols: Seq[String],
      valueCol: String, outCol: String): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.sort(orderCols.map(col): _*)
    val vIdx = sorted.schema.fieldIndex(valueCol)
    val rdd = sorted.rdd // one instance: pass 2 reuses pass 1's shuffle output
    val partTotals = rdd.mapPartitionsWithIndex { case (pid, it) =>
      var s = 0L
      it.foreach(r => if (!r.isNullAt(vIdx)) s += r.getLong(vIdx))
      Iterator((pid, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partTotals.scanLeft(0L)(_ + _)
    val bc = spark.sparkContext.broadcast(offsets)
    val schema = sorted.schema.add(StructField(outCol, LongType, nullable = false))
    val out = rdd.mapPartitionsWithIndex { case (pid, it) =>
      var acc = bc.value(pid)
      it.map { r =>
        if (!r.isNullAt(vIdx)) acc += r.getLong(vIdx)
        Row.fromSeq(r.toSeq :+ acc)
      }
    }
    spark.createDataFrame(out, schema)
  }
}
