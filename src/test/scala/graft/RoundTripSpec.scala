package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen

import graft.sources.ParquetWriterFacade
import graft.inspect.ParquetInspector

/** Writer↔reader round-trip (the Spark analog of the reference's
  * W1–W9 ↔ R1–R17 loop, SURVEY.md §5.4): generated rows incl. nulls and
  * empty partitions survive write+read semantically unchanged, under both
  * default and reference-like (dict + 1 KB pages) writer options.
  */
class RoundTripSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("s", StringType, nullable = true),
    StructField("d", DoubleType, nullable = true),
    StructField("i", IntegerType, nullable = true),
    StructField("b", BooleanType, nullable = true),
    StructField("arr", ArrayType(DoubleType), nullable = true)))

  private val rowGen: Gen[(String, Option[String], Option[Double],
      Option[Int], Option[Boolean], Option[List[Double]])] = for {
    s <- Gen.option(Gen.asciiPrintableStr.map(_.take(20)))
    d <- Gen.option(Gen.chooseNum(-1e6, 1e6))
    i <- Gen.option(Gen.chooseNum(Int.MinValue, Int.MaxValue))
    b <- Gen.option(Gen.oneOf(true, false))
    arr <- Gen.option(Gen.listOfN(4, Gen.chooseNum(-10.0, 10.0)))
  } yield ("", s, d, i, b, arr)

  // normalize Seq implementations (List vs ArraySeq) before rendering
  private def canon(rows: Seq[Row]): Seq[String] =
    rows.map(_.toSeq.map {
      case s: scala.collection.Seq[_] => s.mkString("[", ",", "]")
      case x => String.valueOf(x)
    }.mkString("|")).sorted

  test("random rows round-trip under default and reference-like options") {
    val gen = Gen.listOfN(200, rowGen).sample.getOrElse(Nil)
    val rows = gen.zipWithIndex.map { case ((_, s, d, i, b, arr), idx) =>
      Row(idx.toLong, s.orNull, d.map(Double.box).orNull,
        i.map(Int.box).orNull, b.map(Boolean.box).orNull,
        arr.orNull)
    }
    // 8 partitions over 200 rows: some partitions may be empty
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 8), schema)
    for (opts <- Seq(ParquetWriterFacade.WriterOptions(),
        ParquetWriterFacade.referenceLike)) {
      val dir = Files.createTempDirectory("graft-rt").toString + "/t"
      ParquetWriterFacade.write(df, dir, opts)
      val back = spark.read.parquet(dir)
      assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
        schema.fields.map(f => (f.name, f.dataType)).toSeq)
      assert(canon(back.collect().toSeq) === canon(rows))
    }
  }

  test("reference-like options actually produce dictionary-encoded 1KB-page files") {
    val dir = Files.createTempDirectory("graft-rt").toString + "/t"
    val df = spark.range(0, 10000)
      .selectExpr("id", "CAST(id % 7 AS STRING) AS s")
    ParquetWriterFacade.write(df, dir, ParquetWriterFacade.referenceLike)
    val file = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head.getPath
    val chunks = ParquetInspector.columnChunks(file)
    assert(chunks.exists(_.encodings.exists(_.contains("DICTIONARY"))),
      s"expected dictionary encoding in $chunks")
    assert(chunks.forall(_.codec == "UNCOMPRESSED"))
    // 1 KB pages → the long column must split into many small pages
    val pages = ParquetInspector.pages(file)
      .filter(p => p.column == "id" && p.pageType != "DICTIONARY_PAGE")
    assert(pages.size > 10, s"expected many 1KB pages, got ${pages.size}")
  }
}
