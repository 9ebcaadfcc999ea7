package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}

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
  * Materialized trees are IMMUTABLE and keyed by the source dir
  * (`/tmp/graft_hive/<dir key>/<dataset>`): a returned DataFrame's
  * file listing can never be invalidated by a later materialization
  * for a different SF (the first cut rewrote one shared path in place,
  * and a suite touching two SFs read deleted files). Publication is
  * write-to-temp + atomic directory rename, so concurrent JVMs
  * (sbt test alongside a bench run) race benignly: one wins the
  * rename, the loser discards its temp tree and reads the winner's —
  * both trees are byte-equivalent derivations of the same source.
  */
object PartitionedTables {
  private val root = "/tmp/graft_hive"

  /** `events` partitioned by calendar day (`day=YYYY-MM-DD/`, 30
    * directories on the fixture's January span). `day` is
    * `to_date(ts)` at write time; read-back re-infers it as DATE from
    * the directory names.
    */
  def eventsByDay(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(eventsByDayPath(spark, dir))

  /** Filesystem path of the [[eventsByDay]] tree (materializing it on
    * first use) — the streaming file source consumes the PATH, not a
    * batch DataFrame: the production ingest shape is new partition
    * directories arriving under a standing hive root.
    */
  def eventsByDayPath(spark: SparkSession, dir: String): String =
    materialized(spark, dir, "events_by_day") { tmp =>
      graft.Tables.load(spark, dir, "events")
        .withColumn("day", to_date(col("ts")))
        .write.partitionBy("day").parquet(tmp)
    }

  /** `documents` partitioned by `source` (20 directories on the
    * fixture). The text column stays in the data files; the partition
    * key moves into the directory names.
    */
  def docsBySource(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(docsBySourcePath(spark, dir))

  /** Filesystem path of the [[docsBySource]] tree (see
    * [[eventsByDayPath]]).
    */
  def docsBySourcePath(spark: SparkSession, dir: String): String =
    materialized(spark, dir, "docs_by_source") { tmp =>
      spark.read.parquet(s"$dir/documents.parquet")
        .write.partitionBy("source").parquet(tmp)
    }

  /** Package-private handle to the materialize-once protocol for
    * derived datasets built OUTSIDE this object (the x208–x210 ingest
    * round trip in [[graft.ops.Ingest]] — its write step needs the
    * dedup ops, which must not become a dependency of the sources
    * package): same per-source-dir immutability, same temp-write +
    * atomic-rename publication, same benign concurrent race.
    */
  private[graft] def dataset(spark: SparkSession, dir: String,
      name: String)(write: String => Unit): String =
    materialized(spark, dir, name)(write)

  /** Build-once-per-source-dir cache behind an atomic rename: absent →
    * write the tree to a process-private temp dir, rename into place
    * (immutable thereafter — warm bench iterations time the scan, not
    * the write); present → read it directly.
    */
  private def materialized(spark: SparkSession, dir: String,
      name: String)(write: String => Unit): String = synchronized {
    val key = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    val path = Paths.get(root, key, name)
    if (!Files.exists(path.resolve("_SUCCESS"))) {
      val tmp = Paths.get(root, key,
        s".tmp_${name}_${ProcessHandle.current().pid()}")
      org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
      write(tmp.toString)
      try Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE)
      catch {
        case _: java.io.IOException =>
          // a concurrent materializer won the rename — use its tree
          org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
          if (!Files.exists(path.resolve("_SUCCESS")))
            throw new IllegalStateException(
              s"hive dataset publish failed for $path")
      }
    }
    path.toString
  }
}
