package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** Round-20 scale evidence tools.
  *
  * [[X12ShuffleScale]] — r19 verdict item 4: the x12/x126 100×
  * single-host boundary was adjudicated as a bench-box artifact
  * ("quadratic candidate volume, linear per-pair cost — the plan
  * stays bucketed; one JVM just can't hold the spill"); this backs
  * it with numbers: per fixture scale, the LSH candidate-pair count
  * and the measured shuffle/spill BYTES of the declared x12 run, so
  * bytes-per-candidate-pair is a committed row — flat 1×→10× ⟺ the
  * shuffle budget grows with pair VOLUME only, exactly what spreads
  * over executors on a real cluster.
  *
  * [[X109Scale]] — r19 verdict item 1 (the only weak row): Spark-side
  * crossing-vs-scale legs for x109_curriculum_pack (plus its x73
  * score-only baseline) at 1× and 10×. The DuckDB denominators run
  * SEPARATELY via scripts/duck_time.py on the same dirs — never
  * concurrently (the CPU-contention protocol).
  */
object X12ShuffleScale {
  def main(args: Array[String]): Unit = {
    val small = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    val big = args.lift(2).getOrElse(s"/tmp/sf${copies}r17w")
    // x126_cluster_reps rides the same generator config; the 4th arg
    // swaps the measured declared query
    val query = args.lift(3).getOrElse("x12_neardup_pairs")
    if (!Files.exists(Paths.get(s"$big/documents.parquet")))
      ScaleFixture.main(Array(small, big, copies.toString))
    val spark = Sessions.local("graft-x12-shuffle")
    val stages = new StageCollector(spark)
    def probe(dir: String): String = {
      val toks = graft.Tables.load(spark, dir, "documents")
        .select(col("doc_id"), col("source"),
          graft.ops.Dedup.tokenSet(col("text")).as("tok"))
      // the declared generator config (x12/x126: 96×24, source blocks)
      val cand = graft.ops.Dedup.lshCandidatePairs(
        toks, "doc_id", "tok", 96, 24, col("source")).count()
      stages.drain() // candidate count is NOT part of the measured run
      val fn = graft.SparkEntry.queries(query)
      def run(): Double = {
        val t0 = System.nanoTime()
        fn(spark, dir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      run() // cold, discarded
      stages.drain()
      val wall = run()
      val rows = stages.drain()
      val (rb, wb, sp) = (rows.map(_.shuffleReadBytes).sum,
        rows.map(_.shuffleWriteBytes).sum, rows.map(_.spillBytes).sum)
      f""""$dir":{"cand_pairs":$cand,"wall_s":$wall%.2f,""" +
        s""""shuffle_read_b":$rb,"shuffle_write_b":$wb,""" +
        s""""spill_b":$sp,""" +
        f""""write_bytes_per_pair":${wb.toDouble / cand}%.1f}"""
    }
    val parts = Seq(small, big).map(probe)
    println(s"""{"query":"$query","copies":$copies,""" +
      parts.mkString("", ",", "}"))
    spark.stop()
  }
}

object X109Scale {
  def main(args: Array[String]): Unit = {
    val small = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    val big = args.lift(2).getOrElse(s"/tmp/sf${copies}r17w")
    // trailing args = declared query names (default: the x109
    // adjudication pair); any weak-queue row rides the same protocol
    val names =
      if (args.length > 3) args.drop(3).toSeq
      else Seq("x73_lm_quality", "x109_curriculum_pack")
    if (!Files.exists(Paths.get(s"$big/documents.parquet")))
      ScaleFixture.main(Array(small, big, copies.toString))
    val spark = Sessions.local("graft-x109-scale")
    val warm = sys.env.getOrElse("SPARK_GRAFT_SCALE_WARM", "4").toInt
    def bestN(name: String, dir: String): Double = {
      val fn = graft.SparkEntry.queries(name)
      def run(): Double = {
        val t0 = System.nanoTime()
        fn(spark, dir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      run() // cold, discarded (model build lands here, as in Bench)
      Seq.fill(warm)(run()).min
    }
    val parts = names.map { n =>
      val s = bestN(n, small)
      val b = bestN(n, big)
      f""""$n":[$s%.2f,$b%.2f,${b / s}%.2f]"""
    }
    println(s"""{"copies":$copies,""" + parts.mkString("", ",", "}"))
    spark.stop()
  }
}
