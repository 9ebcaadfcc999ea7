package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** Round-21 scale-evidence tools.
  *
  * [[CodecProbe]] — r20 verdict item 5 (guide §2.3): lz4-vs-zstd
  * shuffle-codec rows at the 10× scale fixture, where shuffle bytes
  * are material (at sf0.1 they are KB-scale and the codec is
  * invisible). The codec is a SparkContext-level setting, so each
  * codec is one JVM: run this main twice with
  * `SPARK_GRAFT_IO_CODEC=lz4|zstd` (the [[Sessions.local]] knob) and
  * compare the printed wall + shuffle-byte rows. Protocol per query:
  * 1 discarded cold, then min of `SPARK_GRAFT_SCALE_WARM` (default 3)
  * warm runs; bytes from the min-wall run's drained stages.
  *
  * [[X102Spread]] — r20 verdict item 7: the sf0.1 negative result on
  * spreading x102's dim²-explode (`Parallelize.ensure` raised CPU
  * 1.1 → 2.8 s for zero wall) re-tried at 10× embeddings, where the
  * stage is long enough for the exchange to possibly pay. A/B in one
  * session: the declared op (no spread) vs the identical op over a
  * pre-spread input.
  */
object CodecProbe {
  def main(args: Array[String]): Unit = {
    val small = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_SCALE_COPIES", "10").toInt
    val big = args.lift(1).getOrElse(s"/tmp/sf${copies}r17w")
    val names = if (args.length > 2) args.drop(2).toSeq
      else Seq("x12_neardup_pairs", "x50_curate", "x126_cluster_reps")
    if (!Files.exists(Paths.get(s"$big/documents.parquet")))
      ScaleFixture.main(Array(small, big, copies.toString))
    val spark = Sessions.local("graft-codec-probe")
    val codec = spark.conf.get("spark.io.compression.codec")
    val warm = sys.env.getOrElse("SPARK_GRAFT_SCALE_WARM", "3").toInt
    val stages = new StageCollector(spark)
    val rows = names.map { n =>
      val fn = graft.SparkEntry.queries(n)
      def run(): (Double, Seq[StageCollector.StageRow]) = {
        stages.drain()
        val t0 = System.nanoTime()
        fn(spark, big).write.mode("overwrite").format("noop").save()
        ((System.nanoTime() - t0) / 1e9, stages.drain())
      }
      run() // cold, discarded
      val best = Seq.fill(warm)(run()).minBy(_._1)
      val (wall, st) = best
      val (rb, wb, sp) = (st.map(_.shuffleReadBytes).sum,
        st.map(_.shuffleWriteBytes).sum, st.map(_.spillBytes).sum)
      // summed executor CPU proves a clean window (wall >> cpu with
      // cpu in band = host steal — the r19 adjudication protocol)
      f""""$n":{"wall_s":$wall%.2f,"cpu_s":${st.map(_.cpu).sum}%.2f,""" +
        f""""shuffle_read_b":$rb,""" +
        s""""shuffle_write_b":$wb,"spill_b":$sp}"""
    }
    println(s"""{"codec":"$codec","dir":"$big","copies":$copies,""" +
      rows.mkString("", ",", "}"))
    spark.stop()
  }
}

object X102Spread {
  def main(args: Array[String]): Unit = {
    val small = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_SCALE_COPIES", "10").toInt
    val big = args.lift(1).getOrElse(s"/tmp/sf${copies}r17w")
    if (!Files.exists(Paths.get(s"$big/documents.parquet")))
      ScaleFixture.main(Array(small, big, copies.toString))
    val spark = Sessions.local("graft-x102-spread")
    val stages = new StageCollector(spark)
    val warm = sys.env.getOrElse("SPARK_GRAFT_SCALE_WARM", "3").toInt
    def probe(label: String, dir: String, spread: Boolean): String = {
      val emb0 = graft.Tables.load(spark, dir, "embeddings")
      val emb = if (spread) emb0.repartition(
        spark.sparkContext.defaultParallelism) else emb0
      def run(): (Double, Double) = {
        stages.drain()
        val t0 = System.nanoTime()
        graft.ops.Similarity.topPrincipalComponent(emb, "vec_id",
            "embedding")
          .write.mode("overwrite").format("noop").save()
        ((System.nanoTime() - t0) / 1e9, stages.drain().map(_.cpu).sum)
      }
      run() // cold
      val runs = Seq.fill(warm)(run())
      val best = runs.minBy(_._1)
      f""""$label":{"wall_s":${best._1}%.2f,"cpu_s":${best._2}%.2f}"""
    }
    val parts = Seq(
      probe("declared_1x", small, spread = false),
      probe("spread_1x", small, spread = true),
      probe(s"declared_${copies}x", big, spread = false),
      probe(s"spread_${copies}x", big, spread = true))
    println(s"""{"copies":$copies,""" + parts.mkString("", ",", "}"))
    spark.stop()
  }
}
