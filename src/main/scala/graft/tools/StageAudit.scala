package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Per-stage runtime audit for any declared query — the generalized
  * X103Probe listener (r17): the x103 drift turned out to be an
  * EXPANSION-BLIND AQE coalesce (a ~3 MB exchange hiding a df²-fold
  * row expansion folded the whole pair stage into one task), a class
  * invisible to plan-shape gates because the partition count is a
  * runtime decision. This audit surfaces it: run a query, print every
  * stage's task count / wall / CPU / shuffle rows, and flag
  * single-task stages burning >1 s of CPU — the signature of a
  * parallelizable stage that AQE serialized.
  *
  * Usage: runMain graft.tools.StageAudit <sfDir> <query> [query...]
  */
object StageAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("x103_containment")
    val spark = Sessions.local("graft-stage-audit")
    val stages =
      new java.util.concurrent.ConcurrentLinkedQueue[(Int, Int, Double, Double, Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(
          s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        val wall = (for {
          a <- s.stageInfo.completionTime
          b <- s.stageInfo.submissionTime
        } yield (a - b) / 1e3).getOrElse(-1.0)
        stages.add((s.stageInfo.stageId, s.stageInfo.numTasks, wall,
          m.executorCpuTime / 1e9,
          m.shuffleReadMetrics.recordsRead,
          m.shuffleWriteMetrics.recordsWritten))
      }
    })
    names.foreach { name =>
      stages.clear()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[audit] $name total=$wall%.2f s")
      stages.forEach { case (id, tasks, w, cpu, rIn, rOut) =>
        val flag = if (tasks == 1 && cpu > 1.0) "  <-- SERIAL HOT" else ""
        println(f"[audit]   stage=$id%-4d tasks=$tasks%-3d wall=$w%6.2f " +
          f"cpu=$cpu%7.2f sRead=$rIn%-10d sWrite=$rOut%-10d$flag")
      }
    }
    spark.stop()
  }
}
