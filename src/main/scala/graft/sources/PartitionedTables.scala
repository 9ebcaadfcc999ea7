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
  * Materialized trees are IMMUTABLE and keyed by (source dir, source
  * contents fingerprint, producing-code version)
  * (`/tmp/graft_hive/<dir key>/<dataset>_v<N>_<fingerprint>`): a
  * returned DataFrame's file listing can never be invalidated by a
  * later materialization for a different SF (the first cut rewrote one
  * shared path in place, and a suite touching two SFs read deleted
  * files), and neither a code change nor an in-place fixture
  * regeneration can serve a stale tree (r21, VERDICT r20 item 2). Publication is
  * write-to-temp + atomic directory rename, so concurrent JVMs
  * (sbt test alongside a bench run) race benignly: one wins the
  * rename, the loser discards its temp tree and reads the winner's —
  * both trees are byte-equivalent derivations of the same source.
  */
object PartitionedTables {
  private val root = "/tmp/graft_hive"

  /** Version constant of the producing code, part of every dataset's
    * cache key (r21, VERDICT r20 "What's wrong" #2): a tree keyed on
    * the source dir alone would be silently served STALE after a
    * code/config change to the producing writer — the oracle would
    * then flag the consuming query red for a "regression" that is
    * actually cache staleness. Bump this whenever a dataset writer's
    * output could change; LayoutSpec pins that flipping the version
    * re-materializes.
    */
  private[sources] val DatasetVersion = 2

  /** Cheap content fingerprint of the source fixture dir (per-table
    * file length + mtime — the MultipartFixture precedent): a dataset
    * keyed on PATH alone would serve stale rows after the driver
    * regenerates a fixture in place.
    */
  private def contentKey(dir: String): String = {
    val sig = graft.Tables.names.map { t =>
      val f = new java.io.File(graft.Tables.path(dir, t))
      s"$t:${f.length()}:${f.lastModified()}"
    }.mkString("|")
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(sig.getBytes("UTF-8"))
    md5.take(6).map(b => f"$b%02x").mkString
  }

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
      name: String, version: Int = DatasetVersion)(
      write: String => Unit): String =
    materialized(spark, dir, name, version)(write)

  /** Build-once-per-(source contents, producing-code version) cache
    * behind an atomic rename: absent → write the tree to a
    * process-private temp dir, rename into place (immutable thereafter
    * — warm bench iterations time the scan, not the write); present →
    * read it directly. The key embeds [[DatasetVersion]] and the
    * source dir's content fingerprint, so neither a code change nor an
    * in-place fixture regeneration can ever serve a stale tree; trees
    * superseded by either are swept on publish (the MultipartFixture
    * disk-hygiene precedent).
    */
  private def materialized(spark: SparkSession, dir: String,
      name: String, version: Int = DatasetVersion)(
      write: String => Unit): String = synchronized {
    val dirKey = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    val key = s"${name}_v${version}_${contentKey(dir)}"
    val path = Paths.get(root, dirKey, key)
    if (!Files.exists(path.resolve("_SUCCESS"))) {
      val tmp = Paths.get(root, dirKey,
        s".tmp_${key}_${ProcessHandle.current().pid()}")
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
      // sweep superseded trees of the SAME dataset (old version or old
      // fixture contents; also the legacy unversioned `<name>` form):
      // the stale key is unreachable — every reader resolves the
      // current (version, fingerprint) — so no live reader holds it
      Option(path.getParent.toFile.listFiles()).getOrElse(Array.empty)
        .filter { f =>
          f.isDirectory && f.getName != key &&
            (f.getName == name || f.getName.startsWith(s"${name}_v"))
        }
        .foreach(org.apache.commons.io.FileUtils.deleteQuietly)
    }
    path.toString
  }
}
