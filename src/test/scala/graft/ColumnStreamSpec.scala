package graft

import org.apache.spark.sql.functions._

import graft.inspect.ParquetInspector
import graft.ops.ColumnStream

/** R17/R14/R18 analogs: positioned streaming column access and raw reads. */
class ColumnStreamSpec extends SparkSpec {

  private val docs = Tables.path(sf0001, "documents")

  test("positioned values cover the column in order with nulls skipped") {
    val it = ColumnStream.stringColumnIterator(spark, docs, "text")
    val rows = it.toVector
    val expected = spark.read.parquet(docs)
      .filter(col("text").isNotNull).count()
    assert(rows.size.toLong === expected)
    assert(rows.map(_._1) === rows.map(_._1).sorted)
    // positions are global row numbers: the first document's text matches
    val first = spark.read.parquet(docs)
      .orderBy("doc_id").select("text").head().getString(0)
    assert(rows.head._2 === first)
  }

  test("readPageData returns the page's raw bytes") {
    val pages = ParquetInspector.pages(docs)
      .filter(_.pageType != "DICTIONARY_PAGE")
    val p = pages.head
    val bytes = ParquetInspector.readPageData(docs, p.pageId)
    assert(bytes.nonEmpty)
  }

  test("rowGroupSlice partitions the file exactly by row group") {
    // write a multi-row-group file (tiny block size forces several)
    val dir = java.nio.file.Files.createTempDirectory("graft-rg").toString + "/t"
    val df = spark.range(0, 50000).selectExpr("id", "CAST(id AS STRING) AS s")
      .coalesce(1)
    graft.sources.ParquetWriterFacade.write(df, dir,
      graft.sources.ParquetWriterFacade.WriterOptions(
        rowGroupSizeBytes = 64 * 1024, pageSizeBytes = 16 * 1024))
    val file = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head.getPath
    val f = ParquetInspector.footer(file)
    assert(f.numRowGroups > 1, s"expected several row groups, got $f")
    val sizes = (0 until f.numRowGroups).map(rg =>
      ParquetInspector.rowGroupSlice(spark, file, rg).count())
    assert(sizes.sum === 50000L)
    val all = (0 until f.numRowGroups).flatMap(rg =>
      ParquetInspector.rowGroupSlice(spark, file, rg)
        .select("id").collect().map(_.getLong(0)))
    assert(all.sorted === (0L until 50000L))
  }

  test("readRange reads the parquet magic") {
    assert(new String(ParquetInspector.readRange(docs, 0, 4), "ASCII") === "PAR1")
    val size = new java.io.File(docs).length()
    assert(new String(ParquetInspector.readRange(docs, size - 4, 4), "ASCII") === "PAR1")
  }
}
