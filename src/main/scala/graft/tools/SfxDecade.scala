package graft.tools

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.functions._

/** sf100 decade probe for the q313 suffix zone (judge round-11 item
  * #2): init the incremental [[graft.streaming.SuffixMaint]] zone at
  * sf10 (100× gate) and fold the REMAINING sf100 copies in as
  * batches, compacting between folds — the production path for the
  * corpus whose batch rebuild exceeded this box's disk at sf100
  * (`records/probe_sf100_r11.jsonl`: 48 GB suffix range shuffle vs
  * 28 GB free; the zone pays that sort once, bucket-locally, at
  * init). Appends one JSON line per phase (init, each fold, each
  * compact, the report read) so a mid-probe death loses nothing.
  *
  * ScaleUp layout fact this probe rides: sf10 and sf100 derive from
  * the same sf0.1 base with the same [[ScaleUp.KeyStride]], so sf10's
  * documents are exactly sf100's copies 0–99 — "init at sf10, fold
  * to sf100" is a genuine superset admission, not a re-ingest.
  *
  * Usage: runMain graft.tools.SfxDecade [sf10Dir] [sf100Dir]
  *          [zoneRoot] [out.jsonl] [batches] [buckets]
  */
object SfxDecade {
  def main(args: Array[String]): Unit = {
    val sf10 = args.headOption.getOrElse("target/sf10")
    val sf100 = args.drop(1).headOption.getOrElse("target/sf100")
    val root = args.drop(2).headOption.getOrElse("target/sfx_decade")
    val out = Paths.get(args.drop(3).headOption
      .getOrElse("records/sfx_decade_r12.jsonl"))
    val batches = args.drop(4).headOption.map(_.toInt).getOrElse(3)
    val buckets = args.drop(5).headOption.map(_.toInt).getOrElse(256)
    val spark = graft.util.Sessions.build(sf100, 32, logLevel = "ERROR")
    def append(line: String): Unit =
      Files.write(out, (line + "\n").getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND): Unit
    def timed[T](name: String, note: String = "")(f: => T): T = {
      val t0 = System.nanoTime()
      val r = try f catch { case e: Throwable =>
        val sec = (System.nanoTime() - t0) / 1e9
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
          .replaceAll("[\"\\\\\n\r\t]", " ").take(300)
        append(f"""{"phase":"$name","sec":$sec%.1f,"err":"$msg"}""")
        throw e
      }
      val sec = (System.nanoTime() - t0) / 1e9
      val n = if (note.isEmpty) "" else s""","note":"$note""""
      append(f"""{"phase":"$name","sec":$sec%.1f$n}""")
      System.err.println(f"[sfx-decade] $name ${sec}%.1f s")
      r
    }
    val d10 = graft.Tables.load(spark, sf10, "documents")
      .select(col("doc_id"), col("text"))
    val d100 = graft.Tables.load(spark, sf100, "documents")
      .select(col("doc_id"), col("text"))
    val stride = ScaleUp.KeyStride
    timed("init_sf10", s"buckets=$buckets") {
      graft.streaming.SuffixMaint.init(spark, d10, root, buckets)
    }
    val per = 900 / batches
    for (k <- 0 until batches) {
      val lo = 100 + k * per
      val hi = if (k == batches - 1) 1000 else lo + per
      val b = d100.where(expr(s"doc_id div $stride") >= lo &&
        expr(s"doc_id div $stride") < hi)
      timed(s"fold_${k + 1}", s"copies [$lo,$hi)") {
        graft.streaming.SuffixMaint.foldBatch(spark, b, root, k + 1L)
      }
      // strictly below the newest batch (k+1) — squash all earlier
      if (k > 0) timed(s"compact_$k", s"upToEpoch=$k") {
        graft.streaming.SuffixMaint.compact(spark, root, k.toLong)
      }
    }
    timed("read_report", "sf100 duplicate-substring report") {
      graft.streaming.SuffixMaint.readDupSubstrings(spark, root)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
    System.err.println("[sfx-decade] COMPLETE")
  }
}
