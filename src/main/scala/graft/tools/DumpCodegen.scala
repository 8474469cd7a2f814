package graft.tools
object DumpCodegen {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.util.Sessions.build(dir, 8, logLevel = "ERROR")
    spark.conf.set("graft.pairBands.memoMinBytes", "0")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val df = graft.SparkEntry.queries("q38_simhash")(spark, dir)
    val txt = df.queryExecution.debug.codegenToSeq()
      .map(t => t._1 + "\n" + t._2).mkString("\n====REGION====\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/tmp/codegen_q38_dump.txt"), txt)
    spark.stop()
  }
}
