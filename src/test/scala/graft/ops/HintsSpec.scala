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
}
