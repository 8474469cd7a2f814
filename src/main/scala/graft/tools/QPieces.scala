package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe (r14): piece-level timings for queries under
  * optimization. Ad-hoc by design; edit per investigation.
  * Usage: runMain graft.tools.QPieces [sfDir]
  */
object QPieces {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.util.Sessions.build(dir, 32, logLevel = "ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pieces] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // job counter
    var jobs = 0
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs += 1
      })

    // q198 decomposition: zone warm-up, then construction (includes
    // eager zone memo), planning, execution — twice for noise.
    val fn = graft.SparkEntry.queries("q198_graph_search")
    for (pass <- 1 to 2) {
      val j0 = jobs
      val df = time(s"p$pass construct")(fn(spark, dir))
      time(s"p$pass plan")(df.queryExecution.executedPlan)
      time(s"p$pass exec")(
        df.write.format("noop").mode("overwrite").save())
      println(s"[pieces] p$pass jobs=${jobs - j0}")
    }
    spark.stop()
  }
}
