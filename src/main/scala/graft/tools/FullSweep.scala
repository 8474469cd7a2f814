package graft.tools

import java.nio.file.{Files, Paths, StandardOpenOption}

/** The sf10 full-sweep probe (judge round-8 item #1): run EVERY
  * SparkEntry query once, cold, at a given scale dir, appending one
  * JSON line per query to a results file as it completes — so a
  * mid-sweep JVM death (the failure mode the probe exists to find)
  * loses nothing, and a restart SKIPS already-recorded queries and
  * the last in-flight one (recorded in a marker file before each
  * attempt, so the killer query is identified and not re-run into
  * the same death).
  *
  * Unlike Bench (the driver's noise-arbitrated artifact), this is a
  * one-pass measurement harness: per-query wall seconds, failures
  * recorded as err strings, progress on stderr.
  *
  * Usage: runMain graft.tools.FullSweep <sfDir> <resultsFile> [only...]
  */
object FullSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/sf10")
    val out = Paths.get(args.drop(1).headOption.getOrElse("/tmp/sweep_sf10.jsonl"))
    val marker = Paths.get(out.toString + ".inflight")
    val only = args.drop(2).toSet

    val done: Set[String] =
      if (Files.exists(out))
        scala.io.Source.fromFile(out.toFile).getLines()
          .flatMap(l => "\"name\":\"([^\"]+)\"".r.findFirstMatchIn(l).map(_.group(1)))
          .toSet
      else Set.empty
    val inflight: Set[String] =
      if (Files.exists(marker))
        scala.io.Source.fromFile(marker.toFile).getLines().toSet
      else Set.empty

    def append(p: java.nio.file.Path, line: String): Unit =
      Files.write(p, (line + "\n").getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND): Unit

    // record JVM-killed queries as failures so the sweep converges
    (inflight -- done).foreach { n =>
      append(out, s"""{"name":"$n","sec":-1.0,"err":"jvm died (inflight marker)"}""")
    }

    val spark = graft.util.Sessions.build(dir, 32, logLevel = "ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val todo = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (n, _) => done.contains(n) || (inflight -- done).contains(n) }
      .filter { case (n, _) => only.isEmpty || only.contains(n) }
    System.err.println(s"[sweep] ${todo.size} to run, ${done.size} already recorded, dir=$dir")
    for (((name, fn), i) <- todo.zipWithIndex) {
      append(marker, name)
      val t0 = System.nanoTime()
      val rec =
        try {
          fn(spark, dir).write.format("noop").mode("overwrite").save()
          val sec = (System.nanoTime() - t0) / 1e9
          f"""{"name":"$name","sec":$sec%.1f}"""
        } catch { case e: Throwable =>
          val sec = (System.nanoTime() - t0) / 1e9
          val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
            .replaceAll("[\"\\\\\n\r\t]", " ").take(300)
          f"""{"name":"$name","sec":$sec%.1f,"err":"$msg"}"""
        }
      append(out, rec)
      System.err.println(s"[sweep] ${i + 1}/${todo.size} $rec")
      // A single-JVM multi-hour sweep accumulates every query's
      // shuffle files: Spark deletes them only when the driver GC
      // collects the ShuffleDependency (ContextCleaner), and with
      // hundreds of queries the backlog filled the disk mid-sweep
      // (q138: "No space left on device" after 49 queries). Each
      // query's plan is unreferenced once recorded — one explicit GC
      // per query lets the cleaner reclaim its shuffle dirs now, not
      // at the default 30-min periodic GC.
      System.gc()
    }
    spark.stop()
    System.err.println("[sweep] COMPLETE")
  }
}
