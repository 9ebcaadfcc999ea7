package graft.tools

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** Stage-level breakdown for the x103 drift adjudication (VERDICT r16
  * item 3): x103_containment read 4.05 s in the r15 crossing and 8.1 s
  * solo min-of-5 this round with its code untouched since r12 and the
  * DuckDB side back in its r15 band — so the doubling is Spark-side
  * and persistent, not host noise. This probe splits the query into
  * its two phases and reports executor-side spill/shuffle totals, to
  * separate "the scan/tokenize got slower" from "the pair-join
  * aggregate got slower" from "we started spilling".
  *
  * Phases (the containmentTopHost shape, Dedup.scala):
  *   A  tokenize + distinct-explode + lazy localCheckpoint, counted
  *   B  the (block, token) self-join → per-pair shared-count aggregate
  *   C  the full declared query (join with sizes + window rank cut)
  * Invariants printed alongside (fixture-content fingerprints — equal
  * across rounds iff the driver's seed-42 generator really is
  * byte-stable): token-row count, Σ df, Σ df² (the pair-join bucket
  * volume), shared-pair row count.
  */
object X103Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local("graft-x103-probe")
    val spillMem = new LongAdder; val spillDisk = new LongAdder
    val shufWrite = new LongAdder; val cpuNs = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(
          s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        spillMem.add(m.memoryBytesSpilled)
        spillDisk.add(m.diskBytesSpilled)
        shufWrite.add(m.shuffleWriteMetrics.bytesWritten)
        cpuNs.add(m.executorCpuTime)
        val wall = (for {
          a <- s.stageInfo.completionTime
          b <- s.stageInfo.submissionTime
        } yield (a - b) / 1e3).getOrElse(-1.0)
        println(f"[stage] id=${s.stageInfo.stageId}%-4d " +
          f"tasks=${s.stageInfo.numTasks}%-3d wall=$wall%6.2f " +
          f"cpu=${m.executorCpuTime / 1e9}%7.2f " +
          f"run=${m.executorRunTime / 1e3}%7.2f " +
          f"sRead=${m.shuffleReadMetrics.recordsRead}%-9d " +
          f"sWrite=${m.shuffleWriteMetrics.recordsWritten}%-9d " +
          s"${s.stageInfo.name.takeWhile(_ != '\n').take(40)}")
      }
    })
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val sets = docs.filter(col("text").isNotNull)
      .select(col("doc_id").as("id"), col("source").as("block"),
        explode(array_distinct(graft.ops.TextAnalysis.tokens(col("text"))))
          .as("tok"))
      .localCheckpoint(eager = false)
    val nTok = timed("A tokenize+ckpt count")(sets.count())

    val df = sets.groupBy("block", "tok").agg(count(lit(1)).as("df"))
      .agg(sum(col("df")).as("s1"), sum(col("df") * col("df")).as("s2"))
      .collect()(0)
    println(s"[probe] invariants: tokenRows=$nTok sumDf=${df.getLong(0)} " +
      s"sumDf2=${df.getLong(1)}")

    val pairSide = sets.toDF("a_id", "block", "tok")
    val shared = pairSide
      .join(sets.toDF("b_id", "block", "tok"), Seq("block", "tok"))
      .filter(col("a_id") =!= col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("shared"))
    val nPairs = timed("B pair-join shared agg")(shared.count())
    println(s"[probe] sharedPairs=$nPairs")

    // B with the expansion-aware spelling: EXPLICIT numPartitions on the
    // join key repartition — AQE coalesces exchanges by INPUT bytes
    // (~3 MB here), blind to the 200× row expansion the join performs,
    // so the default plan runs the whole 22M-pair expansion in one
    // coalesced task
    val pairSide2 = sets.toDF("a_id", "block", "tok")
      .repartition(32, col("block"), col("tok"))
    val shared2 = pairSide2
      .join(sets.toDF("b_id", "block", "tok")
          .repartition(32, col("block"), col("tok")),
        Seq("block", "tok"))
      .filter(col("a_id") =!= col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("shared"))
    val nPairs2 = timed("B' explicit-32 pair join")(shared2.count())
    println(s"[probe] sharedPairs2=$nPairs2")

    // B'' — partition by BLOCK alone: pairs are within-block, so the
    // (a_id, b_id) partial aggregate reduces fully inside each task
    // (unlike B', where a pair's token buckets scatter), and
    // HashPartitioning(block) still satisfies the join's clustering
    // requirement on (block, tok), so no extra exchange
    val left3 = sets.toDF("a_id", "block", "tok")
      .repartition(32, col("block"))
    val right3 = sets.toDF("b_id", "block", "tok")
      .repartition(32, col("block"))
    val shared3 = left3.join(right3, Seq("block", "tok"))
      .filter(col("a_id") =!= col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("shared"))
    val nPairs3 = timed("B'' block-partitioned join")(shared3.count())
    println(s"[probe] sharedPairs3=$nPairs3")

    for (_ <- 1 to 3) timed("C full x103 (warm)") {
      graft.SparkEntry.queries("x103_containment")(spark, dir)
        .write.mode("overwrite").format("noop").save()
    }
    println(f"[probe] spillMem=${spillMem.sum() / 1e6}%.0f MB " +
      f"spillDisk=${spillDisk.sum() / 1e6}%.0f MB " +
      f"shufWrite=${shufWrite.sum() / 1e6}%.0f MB " +
      f"execCpu=${cpuNs.sum() / 1e9}%.1f s")
    spark.stop()
  }
}
