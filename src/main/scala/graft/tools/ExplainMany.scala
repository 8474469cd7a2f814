package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: dump the formatted physical plan of several SparkEntry
  * queries to files in one JVM — the batch sibling of ExplainQ, used
  * to populate `plans/rNN/<query>_{before,after}.txt`.
  *
  * Usage: runMain graft.tools.ExplainMany <outDir> <suffix> <sfDir> q... q...
  * writes <outDir>/<query>_<suffix>.txt per query.
  */
object ExplainMany {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "usage: ExplainMany <outDir> <suffix> <sfDir> <q>...")
    val Array(outDir, suffix, sfDir) = args.take(3)
    val names = args.drop(3).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Files.createDirectories(Paths.get(outDir))
    for (name <- names) {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      Files.write(
        Paths.get(outDir, s"${name}_$suffix.txt"),
        txt.getBytes(StandardCharsets.UTF_8))
      println(s"[explain-many] wrote $name")
    }
    spark.stop()
  }
}
