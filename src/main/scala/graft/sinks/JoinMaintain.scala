package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental maintenance of a materialized equi-JOIN view — the
  * third member of the IVM family ([[IncrementalAgg]] = scalar
  * aggregates, [[IndexMaintain]] = collect-style aggregates, this =
  * the join itself): keep `V = fact ⋈ dim` current as INSERT batches
  * arrive on EITHER side, in any interleaving, without ever
  * recomputing the full join.
  *
  * The insert-only delta rule (Griffin & Libkin 1995, specialized):
  * on a fact batch, `ΔV = Δfact ⋈ dim_current`; on a dim batch,
  * `ΔV = fact_current ⋈ Δdim`. Because each side's "current" store is
  * appended AFTER its batch's join, every (f, d) pair is emitted by
  * exactly ONE of the two rules — whichever side arrived second —
  * so the fold is order-invariant: any batch split/interleaving of
  * the same rows converges to `fact_all ⋈ dim_all` (JoinMaintainSpec
  * pins a 5-fold out-of-order interleaving against the one-shot
  * join, including late-arriving-dimension rows that must wait in
  * the fact store until their key shows up).
  *
  * Scale shape: the fact store is laid out PARTITIONED BY
  * `kb = pmod(hash(key), Buckets)` — a dim batch prunes its fact
  * scan to the partitions its keys hash into (directory-level, the
  * [[graft.sim.IvfServe]] cell discipline; pinned via inputFiles in
  * the spec), so a small dim delta reads O(|touched buckets|), not
  * O(fact). A fact batch joins only against the dim store (the small
  * side at 100 TB — customer/part-sized, not lineitem-sized). View
  * deltas commit as epoch dirs via staging+rename (the MergeOnRead
  * exactly-once idiom): a crashed writer leaves only an ignored
  * `.staging` dir.
  *
  * Contract: insert-only on both sides; each fact row's id and each
  * dim key arrives EXACTLY once across all batches (upstream
  * exactly-once ingest); dim keys are unique. Inner-join view: fact
  * rows whose dim key never arrives simply stay out of the view.
  */
object JoinMaintain {

  /** Fact-store hash buckets. 32 matches the local gate; at cluster
    * scale this is the fact table's bucket count (≥ shuffle
    * parallelism, sized so one bucket ≪ executor memory). */
  val Buckets = 32

  private def factPath(root: String) = s"$root/fact"
  private def dimPath(root: String) = s"$root/dim"
  private def viewRoot(root: String) = s"$root/view"

  private def fs(s: SparkSession, p: String) =
    new Path(p).getFileSystem(s.sparkContext.hadoopConfiguration)

  private def kb(key: String) =
    pmod(hash(col(key)), lit(Buckets)).as("kb")

  /** Create the three stores. `fact0`/`dim0` may be empty but must
    * carry the schema; `key` must exist on both sides. */
  def init(s: SparkSession, root: String, fact0: DataFrame,
           dim0: DataFrame, key: String): Unit = {
    require(!fs(s, root).exists(new Path(factPath(root))),
      s"join view already exists at $root")
    fact0.withColumn("kb", kb(key))
      .write.mode(SaveMode.ErrorIfExists)
      .partitionBy("kb").parquet(factPath(root))
    dim0.write.mode(SaveMode.ErrorIfExists).parquet(dimPath(root))
    commitViewDelta(s, root, fact0.join(dim0, key))
  }

  private def commitViewDelta(s: SparkSession, root: String,
                              delta: DataFrame): Unit = {
    val f = fs(s, root)
    val vr = new Path(viewRoot(root))
    val next = (if (f.exists(vr))
      f.listStatus(vr).toSeq.filter(st => st.isDirectory &&
          st.getPath.getName.startsWith("epoch="))
        .map(_.getPath.getName.stripPrefix("epoch=").toLong)
        .maxOption.getOrElse(0L)
    else 0L) + 1
    val staging = new Path(s"${viewRoot(root)}/.staging-$next")
    val committed = new Path(s"${viewRoot(root)}/epoch=$next")
    try {
      delta.write.mode(SaveMode.Overwrite).parquet(staging.toString)
      if (!f.rename(staging, committed))
        sys.error(s"join view: could not commit $staging to $committed")
    } finally f.delete(staging, true)
  }

  /** Insert a fact batch: `ΔV = batch ⋈ dim_current`, then append the
    * batch to the fact store. O(|batch| + matched dim keys). */
  def applyFactBatch(s: SparkSession, root: String, key: String,
                     batch: DataFrame): Unit = {
    val dim = s.read.parquet(dimPath(root))
    commitViewDelta(s, root, batch.join(dim, key))
    batch.withColumn("kb", kb(key))
      .write.mode(SaveMode.Append).partitionBy("kb")
      .parquet(factPath(root))
  }

  /** Insert a dim batch: `ΔV = fact_current ⋈ batch`, with the fact
    * scan pruned to the batch's hash buckets, then append the batch
    * to the dim store. O(|batch| + touched fact buckets). The bucket
    * list is collected driver-side — bounded by min(|batch|,
    * [[Buckets]]) values. */
  def applyDimBatch(s: SparkSession, root: String, key: String,
                    batch: DataFrame): Unit = {
    val buckets = batch
      .select(pmod(hash(col(key)), lit(Buckets)).as("kb"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val fact = s.read.parquet(factPath(root))
      .where(col("kb").isin(buckets: _*)).drop("kb")
    commitViewDelta(s, root, fact.join(batch, key))
    batch.write.mode(SaveMode.Append).parquet(dimPath(root))
  }

  /** The current view: union of all committed deltas. */
  def read(s: SparkSession, root: String): DataFrame =
    s.read.parquet(viewRoot(root)).drop("epoch")

  /** The pruned-scan witness for the spec: the fact scan a dim batch
    * of these keys performs (its plan must carry PartitionFilters on
    * `kb`). */
  private[graft] def prunedFactScan(s: SparkSession, root: String,
                                    key: String,
                                    batch: DataFrame): DataFrame = {
    val buckets = batch
      .select(pmod(hash(col(key)), lit(Buckets)).as("kb"))
      .distinct().collect().map(_.getInt(0)).toSeq
    s.read.parquet(factPath(root))
      .where(col("kb").isin(buckets: _*))
  }
}
