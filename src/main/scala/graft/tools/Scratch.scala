package graft.dedup
import org.apache.spark.sql.SparkSession
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // mirror Bench: noop write, repeated
    for (i <- 1 to 3)
      time(s"q36 noop pass$i")(
        Dedup.jaccardPairs(spark, dir)
          .write.format("noop").mode("overwrite").save())
    for (i <- 1 to 2)
      time(s"q36 count pass$i")(Dedup.jaccardPairs(spark, dir).count())
    for (i <- 1 to 2)
      time(s"q36 unordered noop pass$i")(
        Dedup.jaccardPairsUnordered(spark, dir)
          .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
