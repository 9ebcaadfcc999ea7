package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession

/** Multi-part re-materialization of a driver fixture directory — the
  * r17 verdict item 3: the driver's sf tables are ONE small Parquet
  * file with one row group each (FIXTURES.md), an INDIVISIBLE scan
  * that handicaps BOTH engines at bench time (one Spark partition per
  * table serializes every downstream CPU kernel —
  * `graft.ops.Parallelize` exists solely as that rescue — and DuckDB
  * equally lost its per-file parallelism: the 10× crossing's anomaly
  * was DuckDB getting FASTER on 10× data once the fixture became a
  * 32-part directory, BENCH_LOCAL.md). No deployment reads one file:
  * the 100 TB shape is thousands of splits per table. This mirror
  * re-lays each fixture table out as an N-file dataset with the SAME
  * rows, same `<table>.parquet` naming convention (a directory now),
  * so `Tables.load` and DuckDB's glob `read_parquet` over the part
  * files both see the deployment shape.
  *
  * Mirrors are IMMUTABLE and keyed by (source dir, parts), built once
  * behind the [[PartitionedTables]] publish protocol: write to a
  * process-private temp tree, stamp `_READY`, atomic-rename into
  * place; concurrent builders race benignly (both trees derive the
  * same rows from the same source).
  *
  * Row fidelity: tables round-trip through `Tables.load`, so `events`
  * carries the SAME micro-truncated `timestamp_ntz` every declared
  * query computes on; the round-robin split moves rows between files,
  * never changes them — and no declared query depends on file order
  * (outputs are explicitly ordered; running sums order by key
  * columns).
  */
object MultipartFixture {
  private val root = "/tmp/graft_multipart"
  val DefaultParts = 32

  /** Per-table part count: ~1 MB/file with a 2-file floor, capped at
    * the session width. Adjudicated by THREE r18 full-suite runs
    * (BENCH_LOCAL.md r18 layout A/B): a flat 32-part layout shredded
    * the 0.6–2 MB tables into 19–64 KB shards and taxed ~150
    * sub-second rows one 32-task scan-launch round EACH (+25 s
    * suite-wide vs the single-file 125.9 s; even 32-sharding only the
    * kernel tables cost +16.5 s and pushed ~20 doc/embedding-light
    * rows toward the ≥1 s weak bar against a ~0.1 s DuckDB
    * denominator — manufactured weak rows with zero deployment
    * meaning, since real writers target 128 MB–1 GB files and the
    * PLAN is identical either way). Byte-sizing keeps every table a
    * genuine multi-file dataset while the CPU kernels' session-width
    * parallelism comes from `Parallelize.ensure`'s documented rescue —
    * live at toy scale, a no-op at deployment scale where splits ≥
    * cores (pinned in ParallelizeSpec).
    */
  def partsFor(table: String, bytes: Long): Int =
    math.max(2, math.min(DefaultParts,
      math.ceil(bytes / (1024.0 * 1024.0)).toInt))

  /** True when `dir` looks like a single-file driver fixture (its
    * tables are plain files, not dataset directories).
    */
  def isSingleFile(dir: String): Boolean =
    new java.io.File(graft.Tables.path(dir, "lineitem")).isFile

  /** Cheap content fingerprint of a source fixture dir (per-table
    * file length + mtime, r18 ADVICE): a mirror keyed on PATH alone
    * would silently serve stale rows after the driver regenerates a
    * fixture in place — Bench/StageGate would measure old data while
    * DuckDB pairings pointed at the raw dir read the new rows.
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

  /** Resolve (building on first use) the N-part mirror of `dir`.
    * Returns a directory usable anywhere a fixture dir is: each table
    * at `<mirror>/<table>.parquet/` as `parts` Parquet files.
    */
  def mirror(spark: SparkSession, dir: String): String = synchronized {
    val sanitized = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    val key = sanitized + s"_sized_v3_${contentKey(dir)}"
    val out = Paths.get(root, key)
    if (!Files.exists(out.resolve("_READY"))) {
      val tmp = Paths.get(root, s".tmp_${key}_${ProcessHandle.current().pid()}")
      org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
      Files.createDirectories(tmp)
      graft.Tables.names.foreach { t =>
        val bytes = new java.io.File(graft.Tables.path(dir, t)).length()
        graft.Tables.load(spark, dir, t)
          .repartition(partsFor(t, bytes))
          .write.mode("overwrite")
          .parquet(tmp.resolve(s"$t.parquet").toString)
      }
      Files.write(tmp.resolve("_READY"), Array.emptyByteArray)
      try Files.move(tmp, out, StandardCopyOption.ATOMIC_MOVE)
      catch {
        case _: java.io.IOException =>
          org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
          if (!Files.exists(out.resolve("_READY")))
            throw new IllegalStateException(
              s"multipart mirror publish failed for $out")
      }
      // Superseded-mirror sweep (r19 ADVICE): content-fingerprinted
      // keys mean every fixture regeneration publishes a NEW mirror
      // while the old content key's tree would otherwise live under
      // /tmp/graft_multipart forever — unbounded disk growth across
      // rounds. Any sibling sharing this source dir's sanitized
      // prefix but carrying a different content key is a mirror of
      // rows that no longer exist on disk; no live reader can hold
      // it (the stale key is unreachable — mirror() always resolves
      // the CURRENT fingerprint), so it is deleted on publish.
      Option(out.getParent.toFile.listFiles()).getOrElse(Array())
        .filter { f =>
          f.isDirectory && f.getName != key &&
            f.getName.startsWith(s"${sanitized}_sized_v3_")
        }
        .foreach(org.apache.commons.io.FileUtils.deleteQuietly)
    }
    out.toString
  }
}
