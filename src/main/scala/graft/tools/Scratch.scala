package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch main: times named SparkEntry queries (noop write, min of
  * two interleaved passes) against a scale dir; not part of the API.
  *
  * Usage: runMain graft.tools.Scratch <sfDir> <q1,q2,...>
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1).headOption.map(_.split(',').toSeq)
      .getOrElse(Seq("q37_minhash_lsh", "q38_simhash"))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val qs = names.map(n => n -> graft.SparkEntry.queries(n))
    def one(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val p1 = qs.map { case (_, f) => one(f) }
    val p2 = qs.map { case (_, f) => one(f) }
    qs.zip(p1.zip(p2)).foreach { case ((n, _), (a, b)) =>
      println(f"[scratch] $n: ${math.min(a, b)}%.2f s (passes $a%.2f / $b%.2f)")
    }
    spark.stop()
  }
}
