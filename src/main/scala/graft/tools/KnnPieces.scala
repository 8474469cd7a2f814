package graft.tools

/** Dev probe (r14): decompose q168's wall time into its pieces —
  * zone build/read, the banded derive, and the witness join — so the
  * optimization lands where the time actually goes.
  * Usage: runMain graft.tools.KnnPieces [sfDir]
  */
object KnnPieces {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.util.Sessions.build(dir, 32, logLevel = "ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val df = mk
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // analysis+optimization+planning
      val t2 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t3 = System.nanoTime()
      println(f"[pieces] $name build=${(t1 - t0) / 1e9}%.2f " +
        f"plan=${(t2 - t1) / 1e9}%.2f exec=${(t3 - t2) / 1e9}%.2f s")
    }
    // zone warm-up (exact graph + codes) happens inside the first call
    time("q155_knnGraph_cold")(graft.sim.Similarity.knnGraph(spark, dir))
    time("q155_knnGraph_warm")(graft.sim.Similarity.knnGraph(spark, dir))
    time("banded_only_1")(graft.sim.Similarity.knnGraphBanded(spark, dir))
    time("banded_only_2")(graft.sim.Similarity.knnGraphBanded(spark, dir))
    time("witness_full_1")(graft.sim.Similarity.knnBandedWitness(spark, dir))
    time("witness_full_2")(graft.sim.Similarity.knnBandedWitness(spark, dir))
    spark.stop()
  }
}
