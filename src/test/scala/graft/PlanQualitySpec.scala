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

  test("filters and projections reach the parquet scans") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    def scan(name: String): FileSourceScanExec =
      // sparkPlan, not executedPlan: AdaptiveSparkPlanExec hides its
      // children from collect until execution
      SparkEntry.queries(name)(spark, sf0001)
        .queryExecution.sparkPlan.collectFirst {
          case s: FileSourceScanExec => s
        }.get
    // q2: both predicates pushed, and only the 5 needed of lineitem's
    // 11 columns read
    val s2 = scan("q2_project_filter")
    val pushed2 = s2.metadata("PushedFilters")
    assert(pushed2.contains("GreaterThan(l_quantity"), pushed2)
    assert(pushed2.contains("GreaterThanOrEqual(l_discount"), pushed2)
    assert(s2.requiredSchema.size <= 5,
      s"q2 reads ${s2.requiredSchema.size} columns: ${s2.requiredSchema}")
    // q1: 6 needed columns, shipdate filter pushed
    val s1 = scan("q1_pricing_summary")
    assert(s1.metadata("PushedFilters").contains("l_shipdate"),
      s1.metadata("PushedFilters"))
    assert(s1.requiredSchema.size <= 6,
      s"q1 reads ${s1.requiredSchema.size} columns")
  }

  test("round-6 plan shapes: broadcast vocab, rank-limit pushdown, zero-shuffle scoring") {
    def phys(name: String): String =
      SparkEntry.queries(name)(spark, sf0001)
        .queryExecution.executedPlan.toString
    // x55: the bounded vocab side must be a broadcast join, never a
    // shuffle join of corpus tokens against corpus tokens
    assert(phys("x55_vocab_coverage").contains("BroadcastHashJoin"),
      "x55 lost its broadcast vocab join")
    // x57: Spark's rank-limit pushdown must apply the cap BEFORE the
    // exchange (partial top-k per partition)
    assert(phys("x57_source_cap").contains("WindowGroupLimit"),
      "x57 lost the WindowGroupLimit partial top-k")
    // x60: classifier scoring is a pure projection — the ONLY exchange
    // in the plan is the final presentation sort
    val x60 = phys("x60_quality_classifier")
    val exchanges = "Exchange".r.findAllIn(x60).length
    assert(exchanges <= 2, // rangepartitioning sort exchange (+AQE read)
      s"x60 plans $exchanges exchanges — scoring should not shuffle:\n$x60")
  }

  test("round-7 plan shapes: x73 scores via broadcast model joins") {
    // the model side (bigram counts / prefix totals) is
    // vocabulary-bounded — the scoring join must broadcast it, never
    // shuffle the corpus-sized probe against it at fixture scale
    val x73 = SparkEntry.queries("x73_lm_quality")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(x73.contains("BroadcastHashJoin"),
      "x73 lost its broadcast model join")
    assert(!x73.contains("SortMergeJoin"),
      "x73 shuffles the probe against the vocabulary-bounded model")
    // x74: the per-doc rank cut must keep k rows per partition BEFORE
    // the exchange
    assert(SparkEntry.queries("x74_knn_neardups")(spark, sf0001)
      .queryExecution.executedPlan.toString.contains("WindowGroupLimit"),
      "x74 lost the WindowGroupLimit partial top-k")
  }

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
