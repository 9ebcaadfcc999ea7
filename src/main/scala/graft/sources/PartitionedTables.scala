package graft.sources

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hive-partitioned dataset materializer — the multi-file/partitioned
  * path a 100 TB deployment actually lives on, which the single-file
  * driver fixtures (FIXTURES.md) never exercise and the reference
  * cannot read at all (`ColumnChunk.file_path` is parsed but never
  * followed — `/root/reference/src/reader/metadata.cpp:73`; one file =
  * one table is its whole data model,
  * `/root/reference/src/reader/parquet_reader.cpp:14-61`).
  *
  * Each dataset is the corresponding fixture table re-laid-out as a
  * hive-partitioned directory tree (`day=2024-01-07/part-*.parquet`),
  * derived deterministically from the source dir, so a query over it
  * must hash-match the same query over the base table — that equation
  * IS the oracle contract for x205–x207: the oracle computes from the
  * base table, the engine computes from the partitioned round trip,
  * and any row lost or duplicated by the write/prune/read cycle goes
  * red at the driver.
  *
  * Scale notes (the part the single-file fixture can't show):
  *  - file-granularity parallelism: the scan splits per file (and per
  *    row group past `maxPartitionBytes`), so a 1000-executor cluster
  *    reads 1000 files concurrently instead of serializing on one;
  *  - partition-directory pruning: a filter on the partition column
  *    never opens the pruned directories' footers — at 100 TB the
  *    difference between a 7-day scan and a 3-year scan;
  *  - the partition column lives in directory names, not data pages —
  *    zero storage and zero decode for the hottest filter column.
  *
  * Materialization is cached per (dataset, source dir) behind a marker
  * file so bench reruns time the READ path, not the rewrite; the
  * rewrite itself is one `partitionBy` write — the idiomatic Spark
  * spelling of the reference's writer surface (W1–W9) lifted to
  * datasets.
  */
object PartitionedTables {
  private val root = "/tmp/graft_hive"

  /** `events` partitioned by calendar day (`day=YYYY-MM-DD/`, 30
    * directories on the fixture's January span). `day` is
    * `to_date(ts)` at write time; read-back re-infers it as DATE from
    * the directory names.
    */
  def eventsByDay(spark: SparkSession, dir: String): DataFrame =
    materialized(spark, dir, "events_by_day") { () =>
      graft.Tables.load(spark, dir, "events")
        .withColumn("day", to_date(col("ts")))
        .write.mode("overwrite").partitionBy("day")
        .parquet(s"$root/events_by_day")
    }

  /** `documents` partitioned by `source` (20 directories on the
    * fixture). The text column stays in the data files; the partition
    * key moves into the directory names.
    */
  def docsBySource(spark: SparkSession, dir: String): DataFrame =
    materialized(spark, dir, "docs_by_source") { () =>
      spark.read.parquet(s"$dir/documents.parquet")
        .write.mode("overwrite").partitionBy("source")
        .parquet(s"$root/docs_by_source")
    }

  /** Build-once-per-source-dir cache: the marker records which source
    * dir the tree was derived from; a different dir (sf0.01 verify vs
    * sf0.1 bench) rebuilds, an identical one returns the existing tree
    * so warm bench iterations time the scan, not the write.
    */
  private def materialized(spark: SparkSession, dir: String,
      name: String)(write: () => Unit): DataFrame = synchronized {
    val marker = Paths.get(root, s"_${name}_src")
    val current =
      if (Files.exists(marker)) Files.readString(marker) else ""
    if (current != dir) {
      Files.createDirectories(Paths.get(root))
      Files.deleteIfExists(marker)
      write()
      Files.writeString(marker, dir,
        StandardOpenOption.CREATE, StandardOpenOption.WRITE,
        StandardOpenOption.TRUNCATE_EXISTING)
    }
    spark.read.parquet(s"$root/$name")
  }
}
