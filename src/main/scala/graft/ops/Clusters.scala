package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Connected components over a near-duplicate pair list — the step that
  * turns pairwise matches (x5/x12's output) into dedup CLUSTERS, so a
  * pipeline can keep one canonical document per group of mutual
  * near-dups instead of dropping both ends of every pair.
  *
  * Algorithm: minimum-label propagation. Every vertex starts labeled
  * with itself; each round every vertex takes the min of its own label
  * and its neighbors' labels; fixpoint when no label changes. Rounds
  * needed = graph diameter. Near-dup graphs are unions of near-cliques
  * (Jaccard >= 0.9 is close to transitive), so 2–3 rounds suffice in
  * practice; the `maxIter` bound guards adversarial path graphs, where
  * the alternating-star variant (Kiveris et al., "Connected Components
  * in MapReduce and Beyond", SoCC'14) would be the O(log² n) upgrade
  * with the same per-round plan shape.
  *
  * Scale design (100 TB): each round is one shuffle join (edges ⋈
  * labels on vertex id) followed by one map-side-combinable
  * min-aggregate — no driver-side graph state, no O(n²) stage. Lineage
  * is truncated every round (`localCheckpoint`), so the plan does not
  * grow with the iteration count. Convergence is detected from the
  * strictly-decreasing sum of labels: labels only ever decrease, so an
  * unchanged sum means an unchanged labeling — one cheap aggregate per
  * round instead of a join against the previous labeling. The sum is
  * accumulated as DECIMAL(38,0) so it cannot overflow at any vertex
  * count.
  */
object Clusters {

  /** Components of the undirected graph given by `pairs(aCol, bCol)`.
    * Returns one row per vertex that appears in any pair:
    * `(id, component)` with `component` = the minimum vertex id in the
    * component (a deterministic canonical representative).
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 20): DataFrame = {
    val e = pairs.select(col(aCol).cast(LongType).as("src"),
      col(bCol).cast(LongType).as("dst"))
    // symmetric closure; parallel edges collapse so each round's join
    // fan-out is bounded by the true degree
    val edges = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()

    var labels = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("component"))
      .localCheckpoint()
    var prevSum = labelSum(labels)
    var converged = false
    var round = 0
    while (!converged && round < maxIter) {
      val propagated = edges
        .join(labels.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), col("component"))
      val next = labels.union(propagated)
        .groupBy("id").agg(min("component").as("component"))
        .localCheckpoint()
      val s = labelSum(next)
      converged = s == prevSum
      prevSum = s
      labels = next
      round += 1
    }
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
