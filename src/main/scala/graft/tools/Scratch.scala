package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

/** Dev scratch main for plan/perf experiments; not part of the API. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val li = Tables.load(spark, dir, "lineitem")
    li.write.format("noop").mode("overwrite").save() // warm
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    time("approx only")(run(li.groupBy(col("l_returnflag")).agg(
      approx_count_distinct(col("l_orderkey"), rsd = 0.05).as("a"),
      expr("approx_percentile(l_extendedprice, array(0.5,0.9), 10000)").as("p"),
      count(lit(1)).as("n"))))
    time("plus countDistinct")(run(li.groupBy(col("l_returnflag")).agg(
      approx_count_distinct(col("l_orderkey"), rsd = 0.05).as("a"),
      countDistinct(col("l_orderkey")).as("cd"),
      expr("approx_percentile(l_extendedprice, array(0.5,0.9), 10000)").as("p"),
      count(lit(1)).as("n"))))
    time("plus exact percentile")(run(li.groupBy(col("l_returnflag")).agg(
      approx_count_distinct(col("l_orderkey"), rsd = 0.05).as("a"),
      expr("approx_percentile(l_extendedprice, array(0.5,0.9), 10000)").as("p"),
      expr("percentile(l_extendedprice, array(0.5,0.9))").as("ep"),
      count(lit(1)).as("n"))))
    time("full q84")(run(graft.ops.Wave3.approxStats(spark, dir)))
    spark.stop()
  }
}
