package graft

import org.apache.spark.sql.functions._

import graft.sources.{BucketedTables, ParquetWriterFacade}

/** Storage-layout levers: Hive-partitioned layout must prune at plan
  * time, and the writer facade must round-trip through every codec and
  * columnar/text format the library claims.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned layout prunes non-matching directories at plan time") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val docs = Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"text", $"lang")
    BucketedTables.writePartitioned(docs, dir, Seq("lang"))
    val langs = docs.select($"lang").distinct().as[String].collect()
    assert(langs.length > 1, "fixture must have several langs")
    val one = langs.sorted.head
    val pruned = spark.read.parquet(dir).filter($"lang" === one)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"no partition filters:\n$plan")
    // the pruned scan must read strictly fewer files than the full scan
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect() // populate metrics
      df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metrics("numFiles").value
      }.sum
    }
    val all = spark.read.parquet(dir)
    assert(scannedFiles(pruned) < scannedFiles(all),
      s"pruned=${scannedFiles(pruned)} all=${scannedFiles(all)}")
    // and the data survives the layout round trip
    assert(pruned.count() === docs.filter($"lang" === one).count())
  }

  test("hive dataset cache re-materializes when the producing-code " +
      "version flips (r21 stale-key fix)") {
    // unique probe name per run: the cache is a cross-JVM /tmp tree,
    // so a fixed name would make the build-count assertions depend on
    // prior runs' leftovers
    val probe = s"layoutspec_probe_${System.nanoTime()}"
    var builds = 0
    def build(v: Int): String =
      graft.sources.PartitionedTables.dataset(spark, sf0001, probe, v) {
        tmp =>
          builds += 1
          Tables.load(spark, sf0001, "documents").limit(1)
            .withColumn("p", lit(1))
            .write.partitionBy("p").parquet(tmp)
      }
    val p1 = build(901)
    val p1again = build(901)
    assert(p1 === p1again && builds === 1,
      "same version + same source must reuse the materialized tree")
    val p2 = build(902)
    assert(p2 !== p1, "version flip must change the cache key")
    assert(builds === 2, "version flip must re-materialize")
    // the superseded tree is swept on publish — a stale tree can
    // never be read after a producing-code change
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(p1)),
      "superseded dataset tree must be swept")
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(p2))
  }

  test("sharded training layout: shard dirs, pos-ordered files, stable addresses") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shard").toString
    val docs = Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"text")
    BucketedTables.writeSharded(docs, "doc_id", numShards = 4, dir + "/out")
    // one shard=N directory per non-empty shard, data round-trips
    val back = spark.read.parquet(dir + "/out")
    assert(back.count() === docs.count())
    val dirs = new java.io.File(dir + "/out").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.forall(_.startsWith("shard=")) && dirs.nonEmpty)
    // addresses on disk equal the pure-function plan
    val plan = graft.ops.Sampling.shardRepack(docs, "doc_id", 4)
      .as[(Long, Long, Long)].collect().toSet
    val disk = back.select($"doc_id", $"shard".cast("long"), $"pos")
      .as[(Long, Long, Long)].collect().toSet
    assert(disk === plan)
    // within each shard's file, rows are physically in pos order (a
    // loader streams sequentially): single local file per dir → scan
    // preserves file order
    dirs.foreach { d =>
      val rows = spark.read.parquet(s"$dir/out/$d").select($"pos")
        .as[Long].collect()
      assert(rows.nonEmpty && (rows, rows.sorted).zipped.forall(_ == _),
        s"$d not in pos order")
    }
  }

  test("writer facade round-trips snappy, zstd, gzip, uncompressed") {
    val src = Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"text", $"n_chars")
    Seq("snappy", "zstd", "gzip", "uncompressed").foreach { codec =>
      val dir = java.nio.file.Files.createTempDirectory(s"graft-$codec").toString
      ParquetWriterFacade.write(src, dir,
        ParquetWriterFacade.WriterOptions(compression = codec))
      val back = spark.read.parquet(dir)
      assert(back.count() === src.count(), s"$codec row count")
      assert(back.exceptAll(src).count() === 0L, s"$codec contents")
      // verify the codec actually landed in the chunk metadata
      val file = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).head.getAbsolutePath
      val codecs = graft.inspect.ParquetInspector.columnChunks(file)
        .map(_.codec).distinct
      val expected = codec.toUpperCase
      assert(codecs === Seq(expected), s"wanted $expected got $codecs")
    }
  }

  test("json and csv sinks round-trip the scalar columns") {
    val src = Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"text", $"n_chars")
    val jdir = java.nio.file.Files.createTempDirectory("graft-json").toString
    src.write.mode("overwrite").json(jdir)
    val jback = spark.read.schema(src.schema).json(jdir)
    assert(jback.count() === src.count())
    assert(jback.exceptAll(src).count() === 0L)
    val cdir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    src.write.mode("overwrite").option("header", "true")
      .option("escape", "\"").csv(cdir)
    val cback = spark.read.schema(src.schema)
      .option("header", "true").option("escape", "\"").csv(cdir)
    assert(cback.count() === src.count())
    assert(cback.exceptAll(src).count() === 0L)
  }
}
