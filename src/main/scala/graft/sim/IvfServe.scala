package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The IVF index as a SERVED ARTIFACT — the 100 TB shape of
  * approximate nearest neighbor, where q53 computes the index inside
  * one query: [[build]] writes the corpus PARTITIONED BY CELL (the
  * cell id becomes the directory key) next to the tiny centroid
  * table; [[search]] probes each query's nProbe closest cells and the
  * zone scan carries a LITERAL cell predicate, so parquet prunes at
  * the directory level — a 16-cell index with nProbe 4 reads 1/4 of
  * the corpus BY CONSTRUCTION, visible as `PartitionFilters` in the
  * plan (pinned in IvfServeSpec). The mirror of
  * [[graft.sinks.IndexMaintain]]'s "serve from the maintained zone"
  * move, for vectors instead of postings.
  *
  * The fit/assignment spelling is [[Similarity.ivfFit]] — the same
  * code q53 runs — so the served index can never disagree with the
  * in-query path; with nProbe = nCells the served result is
  * bit-identical to q50's brute force (the q53 gate contract, proven
  * from the zone in IvfServeSpec).
  */
object IvfServe {

  /** Fit the seeded quantizer and write the serving zone:
    * `zoneDir/corpus` (cell-partitioned) + `zoneDir/centroids`. */
  def build(s: SparkSession, dir: String, zoneDir: String,
            nCells: Int = Similarity.IvfCells): Unit = {
    val (assigned, cdf) = Similarity.ivfFit(s, dir, nCells)
    assigned.write.mode("overwrite").partitionBy("cell")
      .parquet(s"$zoneDir/corpus")
    cdf.write.mode("overwrite").parquet(s"$zoneDir/centroids")
  }

  /** Top-k from the zone. `queries` carries (query_id, qv). The
    * distinct probe-cell list collects to ≤ nCells values — a bounded
    * artifact (the bloom-word-array discipline), which is exactly
    * what makes the zone filter LITERAL and the scan
    * partition-pruned; the per-cell re-rank is the exact FloatDot. */
  def search(s: SparkSession, zoneDir: String, queries: DataFrame,
             k: Int = 5, nProbe: Int = 4): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val cdf = s.read.parquet(s"$zoneDir/centroids")
    val probed = queries.crossJoin(broadcast(cdf))
      .withColumn("cdot",
        call_function("float_dot", col("qv"), col("cvec")))
      .withColumn("crank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cdot").desc, col("cell"))))
      .where(col("crank") <= nProbe)
      .select(col("query_id"), col("qv"), col("cell"))
    val cells = probed.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).sorted
    val zone = s.read.parquet(s"$zoneDir/corpus")
      .where(col("cell").isin(cells.map(Integer.valueOf).toSeq: _*))
    val scored = zone.join(broadcast(probed),
        zone("cell") === probed("cell") &&
          col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        call_function("float_dot", col("embedding"), col("qv"))
          .as("cosine"))
    Similarity.rankTopK(scored, k)
  }
}
