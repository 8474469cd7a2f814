package graft.ops

import graft.SparkSpec

/** Join-strategy hints must actually steer the planner: q83 pins the
  * nation join to broadcast and the orders join to sort-merge. */
class HintsSpec extends SparkSpec {

  test("q83 hints land in the physical plan") {
    val df = SqlSurface.sqlJoinHints(spark, sf())
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("SortMergeJoin"), plan)
    assert(df.count() > 0)
  }

  test("runtime bloom filter prunes the fact side of a selective join") {
    // Catalyst's runtime row-level filtering: a selective filter on
    // the dimension side of a shuffle join injects a bloom-filter
    // aggregate over the dim keys and a might_contain probe under the
    // fact scan — at 100 TB this is the difference between shuffling
    // the whole fact table and shuffling the ~matching rows. The size
    // thresholds exist for cluster economics; lowering them here just
    // lets the tiny test tables qualify.
    import org.apache.spark.sql.functions._
    import graft.Tables
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0")
      // the rule skips joins it expects to broadcast (a broadcast
      // build side already prunes); force the shuffle-join estimate
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val l = Tables.load(spark, sf(), "lineitem")
      // filter on a NON-join column: a join-key predicate would be
      // inferred onto the fact side by constraint propagation and the
      // bloom rule would rightly see nothing left to prune
      val o = Tables.load(spark, sf(), "orders")
        .where(col("o_custkey") % 50 === 0)
      val j = l.hint("SHUFFLE_MERGE")
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .select(col("l_orderkey"), col("o_orderkey"))
      val optimized = j.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"), optimized)
      assert(j.count() > 0)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
