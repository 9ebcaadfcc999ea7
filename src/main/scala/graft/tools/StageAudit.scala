package graft.tools

/** Per-stage runtime audit for any declared query — the generalized
  * X103Probe listener (r17): the x103 drift turned out to be an
  * EXPANSION-BLIND AQE coalesce (a ~3 MB exchange hiding a df²-fold
  * row expansion folded the whole pair stage into one task), a class
  * invisible to plan-shape gates because the partition count is a
  * runtime decision. This audit surfaces it: run a query, print every
  * stage's task count / wall / CPU / shuffle rows, and flag
  * single-task stages burning >1 s of CPU — the signature of a
  * parallelizable stage that AQE serialized. The CI form of the same
  * check is [[StageGate]].
  *
  * Usage: runMain graft.tools.StageAudit <sfDir> <query> [query...]
  */
object StageAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("x103_containment")
    val spark = Sessions.local("graft-stage-audit")
    val collector = new StageCollector(spark)
    names.foreach { name =>
      collector.drain() // flush + discard any prior query's stages
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[audit] $name total=$wall%.2f s")
      collector.drain().foreach { r =>
        val flag =
          if (r.tasks == 1 && r.cpu > 1.0) "  <-- SERIAL HOT" else ""
        println(f"[audit]   stage=${r.id}%-4d tasks=${r.tasks}%-3d " +
          f"wall=${r.wall}%6.2f cpu=${r.cpu}%7.2f " +
          f"sRead=${r.shuffleRead}%-10d sWrite=${r.shuffleWrite}%-10d$flag")
      }
    }
    spark.stop()
  }
}
