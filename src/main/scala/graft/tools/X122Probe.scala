package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis

/** Phase breakdown for the x122 rework decision (VERDICT r16 item 2):
  * at the 100× fixture the crossing ratio closes 17.6× → 10.9× but
  * misses the <2× retirement bar, so the op needs a rework — this
  * probe establishes WHICH phase carries the 3.7 s before touching
  * the spelling. Phases: A bare scan+explode count; B the
  * (source, tok) distinct; C distinct via per-doc array_distinct
  * BEFORE the explode (x103's `sets` shape — rows into the shuffle
  * drop ~2.3×); D the full declared query.
  */
object X122Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/sf100r17w")
    val spark = Sessions.local("graft-x122-probe")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("text").isNotNull)

    for (i <- 1 to 2) {
      val a = timed(s"A explode count (pass $i)")(
        docs.select(explode(TextAnalysis.tokens(col("text"))).as("tk"))
          .count())
      println(s"[probe] tokenRows=$a")
      val b = timed(s"B (source,tok) distinct (pass $i)")(
        docs.select(col("source"),
            explode(TextAnalysis.tokens(col("text"))).as("tk"))
          .distinct().count())
      println(s"[probe] distinctRows=$b")
      val c = timed(s"C array_distinct-first (pass $i)")(
        docs.select(col("source"),
            explode(array_distinct(TextAnalysis.tokens(col("text"))))
              .as("tk"))
          .distinct().count())
      println(s"[probe] distinctRowsC=$c")
      timed(s"D full x122 (pass $i)") {
        graft.SparkEntry.queries("x122_portable_corpus_sig")(spark, dir)
          .write.mode("overwrite").format("noop").save()
      }
    }
    spark.stop()
  }
}
