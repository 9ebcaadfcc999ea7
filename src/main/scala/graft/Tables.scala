package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table catalog over a driver-generated testdata directory
  * (`TESTDATA.md` / `FIXTURES.md`): one Parquet file per table.
  *
  * The reference models "a table" as exactly one Parquet file with a
  * footer-derived schema (`/root/reference/src/reader/parquet_reader.cpp:14-61`);
  * here `spark.read.parquet` gives the same self-describing behavior plus
  * multi-file datasets, predicate pushdown, and column pruning for free.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  /** Loads a table. `events.ts` has appeared in two fixture layouts:
    * Parquet TIMESTAMP(NANOS) (readable only as a raw nanosecond Long
    * under the legacy conf) and real TIMESTAMP_MICROS. Like the
    * reference — which takes column types from the footer it parses
    * (`/root/reference/src/reader/metadata.cpp:198-243`) — we branch on
    * the footer-derived type instead of assuming a byte layout, and
    * normalize to `timestamp_ntz` for session-timezone stability.
    */
  // Catalog cache: keeps analyzed relations (schema + footer-derived file
  // listing) so repeated loads of the same table skip schema inference.
  // Handles only — no data is pinned in memory.
  private val handles =
    new java.util.concurrent.ConcurrentHashMap[(Int, String, String), DataFrame]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    handles.computeIfAbsent((System.identityHashCode(spark), dir, name), { _ =>
      if (name == "events") {
        // Lets a legacy TIMESTAMP(NANOS) column load (as Long) instead of
        // failing; has no effect on micros/millis timestamp columns.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val raw = spark.read.parquet(path(dir, name))
        raw.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType =>
            raw.withColumn("ts",
              timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
          case _ =>
            raw.withColumn("ts", col("ts").cast("timestamp_ntz"))
        }
      } else spark.read.parquet(path(dir, name))
    })
}
