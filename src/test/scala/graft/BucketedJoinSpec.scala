package graft

import org.apache.spark.sql.functions._

import graft.sources.BucketedTables

/** Bucketed layout must remove the join-time exchanges: the same
  * equi-join that shuffles both sides when read from plain parquet
  * runs exchange-free (bucket i ⋈ bucket i) from bucketed tables.
  */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed equi-join plans without exchanges and matches plain join") {
    val conf = spark.conf
    val savedThreshold = conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val orders = Tables.load(spark, sf0001, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      val customer = Tables.load(spark, sf0001, "customer")
        .select($"c_custkey", $"c_mktsegment")
      BucketedTables.writeBucketed(orders, "b_orders", "o_custkey", 8)
      BucketedTables.writeBucketed(customer, "b_customer", "c_custkey", 8)
      try {
        val bo = spark.table("b_orders")
        val bc = spark.table("b_customer")
        val bucketed = bo.join(bc, bo("o_custkey") === bc("c_custkey"))
          .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
        val cnt = bucketed.orderBy("c_mktsegment").collect()
        val plan = bucketed.queryExecution.executedPlan.toString
        // the join itself must read bucket-vs-bucket: the only exchange
        // allowed in the whole plan is the one for the final groupBy
        val exchanges = "Exchange hashpartitioning".r
          .findAllIn(plan).size
        assert(exchanges <= 1,
          s"expected no join-side exchanges, got $exchanges:\n$plan")
        assert(plan.contains("SelectedBucketsCount") ||
          plan.contains("Bucketed: true"), s"scan not bucketed:\n$plan")
        // same result as the plain-parquet join
        val plain = orders.join(customer,
            orders("o_custkey") === customer("c_custkey"))
          .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
          .orderBy("c_mktsegment").collect()
        assert(cnt.map(_.toString).toSeq === plain.map(_.toString).toSeq)
        // and the plain join DOES shuffle both sides
        val plainPlan = plain.length // force
        val plainExchanges = "Exchange hashpartitioning".r.findAllIn(
          orders.join(customer, orders("o_custkey") === customer("c_custkey"))
            .queryExecution.executedPlan.toString).size
        assert(plainExchanges >= 2, s"plain join should shuffle ($plainExchanges)")
      } finally {
        BucketedTables.drop(spark, "b_orders")
        BucketedTables.drop(spark, "b_customer")
      }
    } finally savedThreshold match {
      case Some(v) => conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
