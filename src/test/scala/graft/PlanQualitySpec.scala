package graft

import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow}

/** Plan-quality regression gate over EVERY declared query: the two
  * scale-killers that cannot be caught by row-level correctness —
  * single-partition windows (all data through one task) and cartesian
  * products (quadratic blow-up) — must never appear in any plan.
  * Broadcast nested-loop joins from explicit `crossJoin(broadcast(...))`
  * against one-row/seed frames are fine and are NOT CartesianProduct
  * nodes.
  */
class PlanQualitySpec extends SparkSpec {

  test("no declared query plans an unpartitioned window or cartesian product") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df = fn(spark, sf0001)
      val unpartitioned = df.queryExecution.optimizedPlan.collect {
        case w: LogicalWindow if w.partitionSpec.isEmpty => w
      }
      assert(unpartitioned.isEmpty,
        s"$name plans an unpartitioned (single-partition) window")
      val phys = df.queryExecution.executedPlan.toString
      assert(!phys.contains("CartesianProduct"),
        s"$name plans a CartesianProduct")
    }
  }
}
