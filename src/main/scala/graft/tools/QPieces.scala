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

    // one CC round decomposed, on q193's edge relation
    val pairs = graft.text.TextVectors.queries("q192_tf_cosine_pairs")(
      spark, dir).select(col("id1").as("a"), col("id2").as("b"))
    val canonical = pairs
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .where(col("a") =!= col("b")).distinct()
    var edges = time("cc_root_initial")(
      graft.util.Checkpoints.root(canonical))
    for (r <- 1 to 3) {
      val j0 = jobs
      val next = time(s"round${r}_contract+checkpoint")(
        graft.util.Checkpoints.root(
          graft.dedup.Dedup.starContractRoundProbe(edges)))
      time(s"round${r}_count2")(
        (next.count(), edges.count()))
      time(s"round${r}_exceptAll")(
        next.exceptAll(edges).isEmpty)
      println(s"[pieces] round$r jobs=${jobs - j0}")
      edges = next
    }
    spark.stop()
  }
}
