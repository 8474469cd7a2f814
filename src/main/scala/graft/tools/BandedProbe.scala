package graft.tools

/** Dev probe for the PRODUCTION kNN path at large SF: times
  * [[graft.sim.Similarity.knnGraphBanded]] (SRP band-equality
  * candidates + exact int8 rescore — the 100 TB shape) without
  * touching the exact-graph gate derivation, whose corpus² scoring
  * is gate-mode-only and measured at sf1 (extrapolating it to sf10
  * is arithmetic, not information: ~4.7e10 int8 dots ≈ 80 min on
  * this box). Partition count derives from the dir's bytes
  * (util.Sessions). Usage:
  *   runMain graft.tools.BandedProbe <sfDir>
  */
object BandedProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/sf10")
    val spark = graft.util.Sessions.build(dir, 32, logLevel = "ERROR")
    val parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val t0 = System.nanoTime()
    val g = graft.sim.Similarity.knnGraphBanded(spark, dir)
    val n = g.count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[banded-probe] dir=$dir edges=$n sec=$sec%.1f parts=$parts")
    spark.stop()
  }
}
