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
}
