package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-partitioned) table layout — the co-located-join lever
  * for repeated fact⋈fact joins at 100 TB: both sides written with
  * `bucketBy(n, key)` + `sortBy(key)` hash-place rows bucket-wise at
  * WRITE time, so every later equi-join or aggregation on that key
  * reads bucket i against bucket i with ZERO exchange (and, with
  * sortBy, zero sort) in the plan. One write-time shuffle is amortized
  * over every downstream consumer — the batch analog of the
  * reference's single-file locality (row-group = unit of co-location,
  * `include/reader/metadata.hpp:92-98`), generalized to a keyed layout.
  *
  * Spark only honors bucketing through the catalog, hence saveAsTable;
  * `spark.sql.sources.bucketing.enabled` (default true) must stay on.
  */
object BucketedTables {

  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  def drop(spark: SparkSession, table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $table")

  /** Hive-style partitioned directory layout (`key=value` dirs): a
    * filter on the partition column prunes entire directories at
    * planning time (`PartitionFilters` in the scan, zero I/O for
    * excluded partitions) — the coarse-grained pruning lever that
    * composes with bucketing (partition dirs × buckets) for 100 TB
    * layouts. Plain path-based, no catalog needed.
    */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Materialize [[graft.ops.Sampling.shardRepack]]'s packing plan as
    * the on-disk training layout: one `shard=N` directory per shard,
    * rows inside each shard's file in `pos` order — a reproducible
    * global shuffle a training loader can stream sequentially. The
    * plan IS the write plan: repartition on the shard key +
    * sortWithinPartitions is exactly the exchange+sort Spark needs to
    * emit per-shard sorted files, so materialization adds nothing
    * beyond the I/O. Bit-identical layout across runs and cluster
    * sizes (every address is a pure function of the row id).
    */
  def writeSharded(df: DataFrame, idCol: String, numShards: Int,
      path: String): Unit = {
    import org.apache.spark.sql.functions.col
    val packed = graft.ops.Sampling.shardRepack(df, idCol, numShards)
    df.join(packed, idCol)
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode("overwrite")
      .partitionBy("shard")
      .parquet(path)
  }
}
