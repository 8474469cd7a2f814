package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe for the PRODUCTION kNN path at large SF: times
  * [[graft.sim.Similarity.knnGraphBanded]] (SRP band-equality
  * candidates + exact int8 rescore — the 100 TB shape) without
  * touching the exact-graph gate derivation, whose corpus² scoring
  * is gate-mode-only and measured at sf1 (extrapolating it to sf10
  * is arithmetic, not information: ~4.7e10 int8 dots ≈ 80 min on
  * this box). Usage:
  *   SPARK_GRAFT_SHUFFLE=256 runMain graft.tools.BandedProbe <sfDir>
  */
object BandedProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/sf10")
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "256")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val t0 = System.nanoTime()
    val g = graft.sim.Similarity.knnGraphBanded(spark, dir)
    val n = g.count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[banded-probe] dir=$dir edges=$n sec=$sec%.1f parts=$parts")
    spark.stop()
  }
}
