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
    def noop(name: String)(df: => org.apache.spark.sql.DataFrame): Unit =
      time(name)(df.write.format("noop").mode("overwrite").save())

    // q313 decomposition
    val docs = graft.util.Scratch.memo(spark, "span-tokens",
      s"span-tokens:$dir")(
      graft.Tables.load(spark, dir, "documents")
        .select(col("doc_id"),
          graft.util.Tokens.whitespace(col("text")).as("w")))
    noop("sfx_explode")(
      graft.text.CorpusStats.suffixRows(docs, 5, 32))
    val parts = math.min(4096,
      spark.conf.get("spark.sql.shuffle.partitions").toInt *
        math.max(1, 32 / 4))
    println(s"[pieces] parts=$parts")
    val ranged = graft.text.CorpusStats.suffixRows(docs, 5, 32)
      .repartitionByRange(parts, col("key"), col("doc_id"), col("p"))
      .sortWithinPartitions("key", "doc_id", "p")
    noop("sfx_ranged_sorted")(ranged)
    val rdd = ranged.rdd.map(r =>
      (r.getLong(0), r.getInt(1), r.getSeq[String](2).toArray))
    time("sfx_rdd_bounds_pass")(rdd.mapPartitionsWithIndex { (i, it) =>
      if (!it.hasNext) Iterator.empty
      else {
        val first = it.next(); var last = first
        while (it.hasNext) last = it.next()
        Iterator.single((i, first._3, last._3))
      }
    }.collect().length)
    time("q313_full_1")(graft.SparkEntry
      .queries("q313_dup_substrings")(spark, dir)
      .write.format("noop").mode("overwrite").save())
    time("q313_full_2")(graft.SparkEntry
      .queries("q313_dup_substrings")(spark, dir)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
