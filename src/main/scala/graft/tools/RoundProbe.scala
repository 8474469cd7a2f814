package graft.tools
import org.apache.spark.sql.SparkSession
object RoundProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val n = graft.dedup.Dedup.dedupClusters(spark, dir).count()
    println(f"[probe] rows=$n time=${(System.nanoTime()-t0)/1e9}%.2f")
  }
}
