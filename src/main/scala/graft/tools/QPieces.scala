package graft.tools

/** Dev probe (r14): per-query cost split — construct (eager
  * zone/checkpoint work), plan (executedPlan), exec (noop write) —
  * plus the slowest stages of the exec, two passes so zone builds
  * land in pass 1.
  * Usage: runMain graft.tools.QPieces <sfDir> <query> [passes]
  */
object QPieces {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val passes = 2
    val spark = graft.util.Sessions.build(dir, 32, logLevel = "ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val stages = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Long, Long, Long, Int)]
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          val i = e.stageInfo
          val m = i.taskMetrics
          stages.synchronized {
            stages += ((i.stageId,
              i.completionTime.getOrElse(0L)
                - i.submissionTime.getOrElse(0L),
              m.executorRunTime, m.executorCpuTime / 1000000,
              i.numTasks)): Unit
          }
        }
      })
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    for (name <- names; pass <- 1 to passes) {
      val fn = graft.SparkEntry.queries(name)
      stages.synchronized(stages.clear())
      val (df, tc) = time(fn(spark, dir))
      val (_, tp) = time(df.queryExecution.executedPlan)
      val (_, te) = time(
        df.write.format("noop").mode("overwrite").save())
      Thread.sleep(200)
      if (pass == passes) {
        println(f"[stage] == $name p$pass construct=$tc%.2f " +
          f"plan=$tp%.2f exec=$te%.2f ==")
        stages.synchronized {
          stages.sortBy(-_._2).take(4).foreach {
            case (id, wall, run, cpu, nt) =>
              println(f"[stage] id=$id wall=${wall / 1e3}%.2f " +
                f"taskRun=${run / 1e3}%.2f taskCpu=${cpu / 1e3}%.2f " +
                f"tasks=$nt")
          }
        }
      }
    }
    spark.stop()
  }
}
