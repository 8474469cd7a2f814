package graft.tools

/** Dev probe: time named SparkEntry queries (noop write, 2 passes,
  * min) at a given sf dir. Usage:
  * runMain graft.tools.RoundProbe <sfDir> q144_incremental_clusters ...
  */
object RoundProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q36_jaccard_pairs", "q98_dedup_clusters",
        "q144_incremental_clusters")
    // Partition count derives from the dir's bytes (util.Sessions —
    // the 100 TB dial: per-task aggregation state shrinks with
    // partition count, so larger SFs need more partitions, not more
    // heap). SPARK_GRAFT_SHUFFLE remains an explicit override.
    val spark = graft.util.Sessions.build(dir, 32, logLevel = "ERROR")
    // conf=k:v,k:v anywhere in args applies session overrides (the
    // SrpProbe convention) — bisecting a plan under codegen/AQE
    // toggles without a rebuild
    names.filter(_.startsWith("conf=")).foreach { kvs =>
      kvs.stripPrefix("conf=").split(',').foreach { kv =>
        // split on the FIRST colon only — conf values may themselves
        // contain colons (file:/tmp paths, URIs); r13 ADVICE
        kv.split(":", 2) match {
          case Array(k, v) => spark.conf.set(k, v)
          case _ => sys.error(s"conf= entry needs key:value, got '$kv'")
        }
      }
    }
    spark.range(1000000).selectExpr("sum(id)").collect()
    for (n <- names.filterNot(_.startsWith("conf="))) {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $n min=${ts.min}%.2f passes=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
