package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Connected components over a near-duplicate pair list — the step that
  * turns pairwise matches (x5/x12's output) into dedup CLUSTERS, so a
  * pipeline can keep one canonical document per group of mutual
  * near-dups instead of dropping both ends of every pair.
  *
  * Algorithm: minimum-label propagation with pointer jumping. Every
  * vertex starts labeled with itself; each round every vertex takes the
  * minimum of (a) its own label, (b) its neighbors' labels, and (c) its
  * label's label — the path-halving step of classic pointer-jumping
  * (Shiloach–Vishkin style), realized as one extra self-join of the
  * label table on `component = id`. Step (c) makes the distance to the
  * component minimum contract geometrically, so convergence needs
  * O(log d) rounds on a diameter-d graph rather than the d rounds plain
  * propagation needs — a 1000-hop chain converges in ~10 rounds (see
  * ClustersSpec's chain-graph test). Near-dup graphs are unions of
  * near-cliques (Jaccard >= 0.9 is close to transitive) and converge in
  * 2–3 rounds either way; the jumping step is what makes adversarial
  * path-shaped drift chains safe. If the fixpoint is still not reached
  * within `maxIter` rounds the call THROWS (IllegalStateException)
  * instead of silently returning a partial labeling — wrong canonical
  * ids in a dedup pipeline mean wrongly dropped documents, so
  * non-convergence must be observable.
  *
  * Scale design (100 TB): each round is one shuffle join (edges ⋈
  * labels on vertex id), one label self-join (labels are one row per
  * vertex — far smaller than the edge set), and one map-side-combinable
  * min-aggregate — no driver-side graph state, no O(n²) stage. Lineage
  * is truncated every round (`localCheckpoint`) so the plan does not
  * grow with iteration count, and the superseded round's blocks are
  * unpersisted as soon as the next round materializes, keeping cache
  * footprint at O(1) rounds. (`localCheckpoint` trades fault tolerance
  * for speed: an executor loss aborts the job. For long production runs
  * pass `checkpointDir` — the same loop switches to reliable
  * `checkpoint`s recomputable from durable storage; ClustersSpec
  * exercises both modes.) Convergence is detected from the
  * strictly-decreasing sum of labels: labels only ever decrease, so an
  * unchanged sum means an unchanged labeling — one cheap aggregate
  * instead of a join against the previous labeling. The checkpoints are
  * LAZY (`localCheckpoint(eager = false)`), so the sum aggregate is the
  * action that materializes each round's blocks: one job per round, not
  * a materialize-job plus an aggregate-job. The sum is accumulated as
  * DECIMAL(38,0) so it cannot overflow at any vertex count.
  */
object Clusters {

  /** Components of the undirected graph given by `pairs(aCol, bCol)`.
    * Returns one row per vertex that appears in any pair:
    * `(id, component)` with `component` = the minimum vertex id in the
    * component (a deterministic canonical representative).
    *
    * @throws IllegalStateException if the fixpoint is not CONFIRMED
    *         within `maxIter` rounds. The sum-based check needs one
    *         no-change round past the fixpoint to observe it, so a
    *         labeling that becomes final exactly on round `maxIter`
    *         still throws — conservative by design (wrong canonical ids
    *         silently drop documents; an exception does not). With
    *         pointer jumping, needing many rounds means a component
    *         diameter around 2^rounds — adversarial input, not normal
    *         data.
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 20, checkpointDir: Option[String] = None): DataFrame = {
    // lineage truncation: `localCheckpoint` by default (fast, but an
    // executor loss aborts the job); pass `checkpointDir` to use
    // RELIABLE checkpoints instead — same loop, recomputable from
    // durable storage, the right mode for a multi-hour 100 TB run.
    // Reliable checkpoint files accumulate per round unless
    // `spark.cleaner.referenceTracking.cleanCheckpoints=true`; point
    // `checkpointDir` at job-scoped storage the caller removes.
    val cp: DataFrame => DataFrame = checkpointDir match {
      case Some(dir) =>
        pairs.sparkSession.sparkContext.setCheckpointDir(dir)
        df => df.checkpoint(eager = false)
      case None => df => df.localCheckpoint(eager = false)
    }
    val e = pairs.select(col(aCol).cast(LongType).as("src"),
      col(bCol).cast(LongType).as("dst"))
    // symmetric closure; parallel edges collapse so each round's join
    // fan-out is bounded by the true degree
    // all checkpoints are lazy: the labelSum aggregate right after each
    // one doubles as the materializing action (one job per round)
    val edges = cp(
      e.union(e.select(col("dst").as("src"), col("src").as("dst")))
        .distinct())

    var labels = cp(edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("component")))
    var prevSum = labelSum(labels)
    var converged = false
    var round = 0
    while (!converged && round < maxIter) {
      // (b) neighbor propagation: one shuffle join on the edge list
      val propagated = edges
        .join(labels.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), col("component"))
      // (c) pointer jumping: label(v) := label(label(v)). Labels form a
      // forest pointing at each vertex's current best-known minimum;
      // following two hops at once halves pointer chains every round.
      val jumped = labels.as("l")
        .join(labels.select(col("id").as("component"),
          col("component").as("jumped")), Seq("component"))
        .select(col("id"), col("jumped").as("component"))
      val next = cp(labels.union(propagated).union(jumped)
        .groupBy("id").agg(min("component").as("component")))
      val s = labelSum(next)
      converged = s == prevSum
      prevSum = s
      labels.unpersist()
      labels = next
      round += 1
    }
    edges.unpersist()
    if (!converged) throw new IllegalStateException(
      s"connectedComponents: fixpoint not confirmed within $maxIter " +
        "rounds (the sum check needs one unchanged round past the " +
        "fixpoint) — raise maxIter")
    labels
  }

  /** Full-corpus canonical-id assignment: every document gets the id of
    * its cluster representative; documents in no near-dup pair are their
    * own representative. `docs` must carry a unique long `idCol`.
    * Downstream dedup is then `filter(idCol === component)` (keep
    * representatives) — the complete pairs → clusters → survivors path.
    */
  def assignComponents(docs: DataFrame, idCol: String,
      pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 20): DataFrame = {
    val comp = connectedComponents(pairs, aCol, bCol, maxIter)
    docs.join(comp.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .withColumn("component",
        coalesce(col("component"), col(idCol).cast(LongType)))
  }

  private def labelSum(labels: DataFrame): java.math.BigDecimal =
    labels.agg(sum(col("component").cast(DecimalType(38, 0))))
      .head().getDecimal(0)
}
