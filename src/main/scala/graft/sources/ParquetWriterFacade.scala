package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Parquet writer facade — the Spark analog of the reference writer
  * (`/root/reference/src/writer/parquet_writer.cpp:13-581`, W1–W9). The
  * reference hand-encodes pages with two tunables: dictionary-vs-plain
  * fallback ("threshold matching DuckDB",
  * `src/writer/parquet_writer.cpp:270-276`) and a max uncompressed page
  * size (`include/writer/parquet_writer.hpp:34-35`). parquet-java owns
  * the same decisions here; this facade surfaces them as knobs instead of
  * reimplementing the encoders (which would be both slower and
  * single-threaded — the executor-parallel write path is the point of
  * the rebuild).
  */
object ParquetWriterFacade {

  final case class WriterOptions(
      dictionaryEnabled: Boolean = true,
      /** Reference default 1024 B (`MAX_UNCOMPRESSED_PAGE_SIZE`). */
      pageSizeBytes: Int = 1024 * 1024,
      rowGroupSizeBytes: Long = 128L * 1024 * 1024,
      compression: String = "snappy")

  /** The reference's exact knob values, for behavioral comparison runs. */
  val referenceLike: WriterOptions = WriterOptions(
    dictionaryEnabled = true, pageSizeBytes = 1024,
    compression = "uncompressed")

  def write(df: DataFrame, path: String,
      opts: WriterOptions = WriterOptions(),
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    df.write
      .mode(mode)
      .option("parquet.enable.dictionary", opts.dictionaryEnabled.toString)
      .option("parquet.page.size", opts.pageSizeBytes.toString)
      .option("parquet.block.size", opts.rowGroupSizeBytes.toString)
      .option("compression", opts.compression)
      .parquet(path)
  }
}
