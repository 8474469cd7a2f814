package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The custom top-k operator must agree row-for-row with the built-in
  * window spelling, and actually plan through TopKPerGroupExec. */
class TopKSpec extends SparkSpec {

  private def viaWindow(k: Int) = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.load(spark, sf(), "orders")
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k).drop("rn")
  }

  private def viaCustom(k: Int) =
    TopK.topKPerGroup(
      Tables.load(spark, sf(), "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice"),
      Seq("o_custkey"), "o_totalprice", "o_orderkey", k)

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("heap top-k equals the window row_number spelling (k=3)") {
    assert(rows(viaCustom(3)) == rows(viaWindow(3)))
    assert(viaCustom(3).count() == viaWindow(3).count())
  }

  test("k larger than every group returns all rows") {
    val all = Tables.load(spark, sf(), "orders").count()
    assert(viaCustom(1000000).count() == all)
  }

  test("the plan goes through TopKPerGroupExec with a clustered exchange") {
    val plan = viaCustom(3).queryExecution.executedPlan
    // string match: AQE wraps the plan and collect() cannot descend
    // into AdaptiveSparkPlanExec before execution
    assert(plan.toString.contains("TopKPerGroup"),
      s"custom operator not planned:\n$plan")
    // the operator declares distribution; the planner inserts the
    // shuffle — no hand-wired exchange anywhere
    assert(plan.toString.contains("Exchange hashpartitioning"),
      s"expected a planner-inserted clustered exchange:\n$plan")
    // and no Window/Sort operator: the full sort is gone
    assert(!plan.toString.contains("Window"),
      "window operator should be absent")
  }
}
