package graft

import graft.inspect.{InspectorCli, ParquetInspector}

/** Inspector parity with the data it describes (reference R2/R8/R13–R16
  * analogs; see SURVEY.md §2.1).
  */
class InspectorSpec extends SparkSpec {

  private val lineitem = Tables.path(sf0001, "lineitem")

  test("open rejects a non-parquet file (reference magic validation)") {
    val f = java.nio.file.Files.createTempFile("graft-notparquet", ".parquet")
    java.nio.file.Files.write(f, "PAR2 this is not a parquet file".getBytes)
    intercept[Exception] { ParquetInspector.footer(f.toString) }
  }

  test("footer num_rows matches a full scan") {
    val f = ParquetInspector.footer(lineitem)
    assert(f.numRows === spark.read.parquet(lineitem).count())
    assert(f.numRowGroups >= 1)
  }

  test("leaf columns carry def levels and cover the schema") {
    val leaves = ParquetInspector.leafColumns(lineitem)
    assert(leaves.map(_.path).contains("l_comment") === false)
    assert(leaves.size === spark.read.parquet(lineitem).schema.size)
    assert(leaves.forall(_.maxDefLevel >= 0))
  }

  test("page walk accounts for every value") {
    val chunks = ParquetInspector.columnChunks(lineitem)
    val pages = ParquetInspector.pages(lineitem)
    val perColumnPageValues = pages
      .filter(_.pageType != "DICTIONARY_PAGE")
      .groupBy(p => (p.rowGroup, p.column))
      .view.mapValues(_.map(_.numValues).sum).toMap
    chunks.foreach { c =>
      assert(perColumnPageValues((c.rowGroup, c.column)) === c.numValues,
        s"page values != chunk values for ${c.column}")
    }
  }

  test("pageChunks respects the byte cap (reference read_pages_chunk)") {
    val cap = 64L * 1024
    val chunks = ParquetInspector.pageChunks(lineitem, cap)
    assert(chunks.nonEmpty)
    // every chunk with >1 page must be under the cap; single-page chunks
    // may exceed it (a chunk always takes at least one page)
    chunks.filter(c => c.lastPageId > c.firstPageId)
      .foreach(c => assert(c.bytes <= cap))
    assert(chunks.map(_.chunkId) === chunks.indices.map(_.toLong))
  }

  test("readPagesChunk concatenates page bytes and truncates at the cap") {
    val ids = 0L to 5L
    val perPage = ids.map(ParquetInspector.readPageData(lineitem, _))
    val full = perPage.reduce(_ ++ _)
    // uncapped: byte-identical to the per-page reads
    val chunk = ParquetInspector.readPagesChunk(lineitem, 0, 5, Long.MaxValue)
    assert(chunk.sameElements(full))
    // capped mid-page: exactly cap bytes, a strict prefix
    val cap = perPage.head.length + perPage(1).length / 2
    val capped = ParquetInspector.readPagesChunk(lineitem, 0, 5, cap.toLong)
    assert(capped.length === cap)
    assert(capped.sameElements(full.take(cap)))
    // out-of-range end page throws unless the cap ends the walk first
    intercept[NoSuchElementException] {
      ParquetInspector.readPagesChunk(lineitem, 0, Long.MaxValue - 1, Long.MaxValue)
    }
  }

  test("lazy raw page iterator matches the eager page walk and page bytes") {
    val eager = ParquetInspector.pages(lineitem)
      .filter(_.pageType != "DICTIONARY_PAGE")
    val it = ParquetInspector.rawPageIterator(lineitem)
    try {
      val first = it.next()
      assert(first._1 === eager.head)
      assert(first._2.sameElements(
        ParquetInspector.readPageData(lineitem, 0)))
      var n = 1L
      while (it.hasNext) { n += 1; it.next() }
      assert(n === eager.size)
    } finally it.close()
  }

  test("footer surfaces key_value_metadata; leaves carry logical types") {
    // the pyarrow-written fixture stamps pandas + arrow schema entries
    val f = ParquetInspector.footer(lineitem)
    assert(f.keyValueMetadata.nonEmpty)
    assert(f.keyValueMetadata.contains("ARROW:schema"))
    // a Spark-written file stamps the row schema
    val dir = java.nio.file.Files.createTempDirectory("graft-kv").toString
    graft.sources.ParquetWriterFacade.write(
      spark.range(3).selectExpr("id"), dir)
    val file = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head.getAbsolutePath
    val sparkF = ParquetInspector.footer(file)
    assert(sparkF.keyValueMetadata.keys.exists(_.contains("spark")),
      s"expected spark keys in ${sparkF.keyValueMetadata.keySet}")
    val docLeaves = ParquetInspector.leafColumns(Tables.path(sf0001, "documents"))
    val text = docLeaves.find(_.path == "text").get
    assert(text.physicalType === "BINARY")
    assert(text.logicalType === "STRING")
    assert(text.decimalPrecision === -1 && text.decimalScale === -1)
  }

  test("DECIMAL scale/precision surface through leafColumns on a written file") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dec").toString
    val dec = spark.range(10).selectExpr(
      "cast(id as decimal(9,2)) as d", "cast(id as string) as s")
    graft.sources.ParquetWriterFacade.write(dec, dir)
    val file = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head.getAbsolutePath
    val leaves = ParquetInspector.leafColumns(file)
    val d = leaves.find(_.path == "d").get
    assert(d.logicalType.startsWith("DECIMAL"))
    assert(d.decimalPrecision === 9)
    assert(d.decimalScale === 2)
  }

  test("INT96 timestamps round-trip with real semantics (reference stringifies)") {
    // the reference decodes INT96 to a debug string with no timestamp
    // semantics (column_reader.cpp:257-263); Spark converts properly
    val dir = java.nio.file.Files.createTempDirectory("graft-i96").toString
    val src = spark.sql(
      "SELECT id, timestamp'2024-03-01 12:34:56.789' + make_interval(0,0,0,0,0,0,id) AS ts FROM range(5)")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    try src.write.mode("overwrite").parquet(dir)
    finally spark.conf.unset("spark.sql.parquet.outputTimestampType")
    val file = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head.getAbsolutePath
    val tsLeaf = ParquetInspector.leafColumns(file).find(_.path == "ts").get
    assert(tsLeaf.physicalType === "INT96")
    val back = spark.read.parquet(dir)
    assert(back.orderBy("id").collect().map(_.toString).toSeq ===
      src.orderBy("id").collect().map(_.toString).toSeq)
  }

  test("nested struct/array/map schemas carry real def/rep levels") {
    // the reference discards repetition levels and flattens nesting
    // (parquet_reader.cpp:503-510, column_reader.cpp:157-164); here
    // nested values round-trip and the inspector surfaces the levels
    val dir = java.nio.file.Files.createTempDirectory("graft-nested").toString
    val src = spark.sql(
      """SELECT id,
        |  named_struct('a', id, 'b', CAST(id AS STRING)) AS st,
        |  array(id, id + 1, id + 2) AS arr,
        |  map(CAST(id AS STRING), id * 2) AS mp
        |FROM range(10)""".stripMargin)
    src.write.mode("overwrite").parquet(dir)
    val file = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head.getAbsolutePath
    val leaves = ParquetInspector.leafColumns(file)
    val arrLeaf = leaves.find(_.path.startsWith("arr.")).get
    assert(arrLeaf.maxRepLevel === 1, s"array leaf rep level: $arrLeaf")
    val stLeaf = leaves.find(_.path == "st.a").get
    assert(stLeaf.maxRepLevel === 0) // struct nests without repetition
    // map values sit under a REPEATED key_value group → def AND rep
    val mpValue = leaves.find(l => l.path.startsWith("mp.") &&
      l.path.endsWith("value")).get
    assert(mpValue.maxRepLevel === 1 && mpValue.maxDefLevel >= 1)
    assert(leaves.count(_.path.startsWith("mp.")) === 2) // key + value
    val back = spark.read.parquet(dir)
    assert(back.orderBy("id").collect().map(_.toString).toSeq ===
      src.orderBy("id").collect().map(_.toString).toSeq)
  }

  test("chunkindex packs every tuple with >=4096-byte closed chunks") {
    val (chunks, tuples) = InspectorCli.chunkIndex(
      spark, Tables.path(sf0001, "documents"), "text")
    val docs = Tables.load(spark, sf0001, "documents")
    assert(tuples === docs.filter(
      org.apache.spark.sql.functions.col("text").isNotNull).count())
    // every closed chunk holds >= 4096 bytes, so the chunk count is
    // bounded by total bytes / 4096 (+1 open chunk)
    val totalBytes = docs.selectExpr(
      "sum(length(cast(n_chars AS STRING)) + n_chars)").head().getLong(0)
    assert(chunks <= totalBytes / 4096 + 1)
    assert(chunks > 1)
  }

  test("regex page report totals equal the column row count") {
    val report = InspectorCli.regexPageReport(
      spark, Tables.path(sf0001, "documents"), "text", "merge.*join",
      negate = false)
    val total = report.map(_._2).sum
    assert(total === spark.read.parquet(Tables.path(sf0001, "documents")).count())
    val matched = report.map(_._3).sum
    val expected = Tables.load(spark, sf0001, "documents")
      .filter(org.apache.spark.sql.functions.col("text").rlike("merge.*join"))
      .count()
    assert(matched === expected)
  }
}
