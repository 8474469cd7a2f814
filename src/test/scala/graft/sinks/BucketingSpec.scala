package graft.sinks

import graft.{SparkSpec, Tables}

/** Proves the bucketed layout delivers its 100 TB promise on the real
  * physical plan: an equi-join of two tables bucketed on their join
  * keys is a SortMergeJoin with NO Exchange on either side. */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables plans without a shuffle") {
    val orders = Tables.load(spark, sf(), "orders")
    val customer = Tables.load(spark, sf(), "customer")
    Bucketing.writeBucketed(orders, "b_orders", "o_custkey", 8)
    Bucketing.writeBucketed(customer, "b_customer", "c_custkey", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the shuffle-or-not decision to matter (no broadcast out)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.coLocatedJoin(spark,
        "b_orders", "b_customer", "o_custkey", "c_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")

      // and it computes the same thing as the plain shuffled join
      val expected = orders.join(customer,
        orders("o_custkey") === customer("c_custkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
