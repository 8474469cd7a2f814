package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import graft.SparkEntry

/** Measured-plan auditor — the "measure, don't guess" half of
  * [[Explain]]: EXECUTES a query (a collect — a write would run a
  * separate QueryExecution whose metrics this plan never sees), then
  * walks the final adaptive plan printing each operator's actual
  * runtime metrics (rows, shuffle bytes, spills, broadcast sizes).
  * This is how the shuffle-volume claims in PLANS.md are checked
  * against reality rather than read off the plan shape.
  *
  * Usage: runMain graft.tools.PlanMetrics <queryName> [sfDir]
  */
object PlanMetrics {

  private val Wanted = Set(
    "number of output rows", "shuffle bytes written", "data size",
    "spill size", "number of files read", "peak memory",
    "time to broadcast")

  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse(
      sys.error("usage: PlanMetrics <queryName> [sfDir]"))
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries.getOrElse(which,
      sys.error(s"unknown query '$which'"))(spark, sfDir)
    // collect, not a noop write: a write runs a SEPARATE
    // QueryExecution whose metrics this plan would never see
    val n = df.collect().length
    println(s"$which: $n result rows\n")
    walk(finalPlan(df.queryExecution.executedPlan), 0)
    spark.stop()
  }

  private def finalPlan(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => finalPlan(a.executedPlan)
    // AQE wraps materialized stages; the subtree hangs off .plan,
    // not .children
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      finalPlan(q.plan)
    case other => other
  }

  private def walk(p: SparkPlan, depth: Int): Unit = {
    val metrics = p.metrics.toSeq
      .map { case (key, m) => (m.name.getOrElse(key), m.value) }
      .filter { case (n, v) => Wanted.contains(n) && v > 0 }
      .sortBy(_._1)
      .map { case (n, v) => s"$n=${fmt(n, v)}" }
    println("  " * depth + p.nodeName +
      (if (metrics.isEmpty) "" else metrics.mkString("  [", ", ", "]")))
    p.children.foreach(c => walk(finalPlan(c), depth + 1))
    // descend into reused/broadcast subtrees via innerChildren? keep
    // to the main spine: ReusedExchange prints as a leaf by design
  }

  private def fmt(name: String, v: Long): String =
    if (name.contains("size") || name.contains("bytes") ||
        name.contains("memory"))
      f"${v / 1024.0 / 1024.0}%.2f MiB"
    else v.toString
}
