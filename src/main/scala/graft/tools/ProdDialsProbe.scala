package graft.tools

import java.nio.file.{Files, Paths, StandardOpenOption}

/** Probe a family's PRODUCTION dial configuration at a scale where
  * the oracle-contract gate spelling is a named edge. First use: q38
  * at sf100 — the gate runs 4-bit uncapped SimHash bands so the
  * DuckDB brute-force oracle sees the identical pair set, but 4-bit
  * bands have 16 values, so candidate volume is O(n²/16) BY THAT
  * CONTRACT (~1.2·10¹³ at 5M docs — hours of pure enumeration, at
  * any memory shape). The production dials documented in
  * [[graft.dedup.Dedup.simhashPairs]] (8-bit bands: recall guarantee
  * hamming ≤ 7; BandBucketCap: linear star+chain above it) are what
  * a 100 TB run uses; this probe measures THEM and records the gate
  * spelling as the edge it is.
  *
  * Usage: runMain graft.tools.ProdDialsProbe [sfDir] [out.jsonl]
  */
object ProdDialsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/sf100")
    val out = Paths.get(args.drop(1).headOption
      .getOrElse("records/probe_sf100_r12.jsonl"))
    val spark = graft.util.Sessions.build(dir, 32, logLevel = "ERROR")
    def append(line: String): Unit =
      Files.write(out, (line + "\n").getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND): Unit
    def run(name: String, config: String, note: String)
           (df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      try {
        df.write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        append(f"""{"name":"$name","sec":$sec%.1f,"config":"$config","note":"$note"}""")
        System.err.println(f"[prod-dials] $name ${sec}%.1f s")
      } catch { case e: Throwable =>
        val sec = (System.nanoTime() - t0) / 1e9
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
          .replaceAll("[\"\\\\\n\r\t]", " ").take(300)
        append(f"""{"name":"$name","sec":$sec%.1f,"config":"$config","err":"$msg"}""")
      }
    }
    run("q38_simhash",
      "bandBits=8 maxBucket=1000 (production dials)",
      "gate spelling (4-bit uncapped, oracle-contract) is a named " +
        "edge at this scale: 16-value bands make candidate volume " +
        "O(n^2/16) ~ 1.2e13 at 5M docs by design; the production " +
        "dials bound it (8-bit bands keep the hamming<=7 pigeonhole " +
        "guarantee, the cap makes over-cap buckets linear)") {
      graft.dedup.Dedup.simhashPairs(spark, dir,
        bandBits = 8, maxBucket = graft.util.Caps.BandBucketCap)
    }
    run("q302_minhash_witness",
      "withWitness=false (production API, r11)",
      "gate spelling is a named edge at this scale BY CONTRACT: the " +
        "witness re-shuffles the quadratic-by-construction clone " +
        "pair relation (2.5e9 rows on the verbatim-1000x corpus) " +
        "through the exact-jaccard member joins 4 more times - " +
        "witness-free is what a deployment that trusts the banding " +
        "pays, the same dial the sweep runbook documents for " +
        "q308/q199/q168") {
      graft.dedup.Dedup.minhashWitness(spark, dir, withWitness = false)
    }
    spark.stop()
  }
}
