package graft.tools

/** Dev probe for the q52/q107 SRP pair derivation at large SF —
  * bisects the sf10 OOM (round-9): counts the banded candidate
  * stream, then times the full derive under switchable conf.
  * Usage: runMain graft.tools.SrpProbe <sfDir> [cand|full] [conf=k:v,...]
  */
object SrpProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/sf10")
    val step = args.drop(1).headOption.getOrElse("full")
    val spark = graft.util.Sessions.build(dir, 32, logLevel = "ERROR")
    args.drop(2).headOption.foreach { kvs =>
      kvs.stripPrefix("conf=").split(',').foreach { kv =>
        val Array(k, v) = kv.split(':')
        spark.conf.set(k, v)
      }
    }
    val t0 = System.nanoTime()
    val n = step match {
      case "cand" =>
        // candidate volume only: derive up to the pre-join union by
        // re-running the derive but counting before the emb joins is
        // not exposed; approximate with the full derive's input via
        // a SQL respelling of the bucket sizes instead
        val sizes = graft.sim.Similarity
          .bucketSizes(spark, dir)
        sizes.show(40, false)
        sizes.selectExpr("sum(sz * (sz - 1) / 2) AS cand_pairs")
          .collect()(0).getLong(0)
      case "scaled" =>
        graft.sim.Similarity.nearDupPairsScaled(spark, dir, 0.45).count()
      case "scaledstats" =>
        val st = graft.sim.Similarity.scaledBucketStats(spark, dir)
        st.show(20, false)
        st.count()
      case _ =>
        graft.sim.Similarity.nearDupPairsDerive(spark, dir, 0.45).count()
    }
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[srp-probe] dir=$dir step=$step n=$n sec=$sec%.1f " +
      s"parts=${spark.conf.get("spark.sql.shuffle.partitions")}")
    spark.stop()
  }
}
