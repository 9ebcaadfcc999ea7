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

  /** Loads a table. `events.ts` is written as Parquet TIMESTAMP(NANOS),
    * which Spark's vectorized reader rejects; we read it as a raw
    * nanosecond Long (legacy conf) and truncate to microseconds — the
    * same value DuckDB produces for `CAST(ts_ns AS TIMESTAMP)`.
    */
  // Catalog cache: keeps analyzed relations (schema + footer-derived file
  // listing) so repeated loads of the same table skip schema inference.
  // Handles only — no data is pinned in memory.
  private val handles =
    new java.util.concurrent.ConcurrentHashMap[(Int, String, String), DataFrame]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    handles.computeIfAbsent((System.identityHashCode(spark), dir, name), { _ =>
      if (name == "events") {
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val raw = spark.read.parquet(path(dir, name))
        raw.withColumn("ts",
          timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
      } else spark.read.parquet(path(dir, name))
    })
}
