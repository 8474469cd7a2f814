package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Plan auditor: prints the formatted physical plan of one query (or
  * all) so shuffle count, pushdown, broadcast choice, and codegen spans
  * can be inspected — the 100 TB design review loop.
  *
  * Usage: runMain graft.tools.Explain [queryName|all] [sfDir]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("all")
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val selected =
      if (which == "all") SparkEntry.queries.toSeq.sortBy(_._1)
      else SparkEntry.queries.filter(_._1 == which).toSeq
    require(selected.nonEmpty, s"unknown query '$which'")
    selected.foreach { case (name, fn) =>
      println(s"\n========== $name ==========")
      fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
