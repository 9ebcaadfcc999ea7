package graft

import org.apache.spark.sql.functions._

/** HLL++ approximate distinct (x16's engine) must stay inside its
  * advertised relative standard deviation against the exact count.
  */
class ApproxDistinctSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct within 3 rsd of exact per group") {
    val e = Tables.load(spark, sf0001, "events")
    val rsd = 0.05
    val rows = e.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("exact"),
        approx_count_distinct($"user_id", rsd).as("approx"))
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (tpe, exact, approx) =>
      val relErr = math.abs(approx - exact).toDouble / exact
      assert(relErr <= 3 * rsd,
        s"$tpe: approx=$approx exact=$exact relErr=$relErr")
    }
  }

  test("percentile_approx rank error bounded by n/accuracy (x52's engine)") {
    val e = Tables.load(spark, sf0001, "events")
    val acc = 100
    Seq(0.5, 0.9).foreach { p =>
      val rows = e.groupBy($"event_type")
        .agg(percentile_approx($"value", lit(p), lit(acc)).as("approx"),
          sort_array(collect_list($"value")).as("all"))
        .as[(String, Double, Seq[Double])].collect()
      assert(rows.nonEmpty)
      rows.foreach { case (tpe, approx, all) =>
        val n = all.size
        // GK contract: the returned value has SOME 1-based rank r in its
        // tie interval [count(<)+1, count(<=)] with |r − p·n| ≤
        // n/accuracy (+1 discretization). Testing against the interval,
        // not count(<=) alone, keeps duplicate values from inflating
        // the measured error past the sketch's actual guarantee.
        val rMin = all.count(_ < approx) + 1
        val rMax = all.count(_ <= approx)
        val bound = n.toDouble / acc + 1
        assert(p * n >= rMin - bound && p * n <= rMax + bound,
          s"$tpe p=$p: rank interval [$rMin,$rMax] target=${p * n} " +
            s"n=$n approx=$approx")
      }
    }
  }
}
