package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tokens

/** Incremental maintenance of the sharded inverted index
  * ([[graft.text.Postings.invertedIndex]]'s relational shape) over a
  * [[MergeOnRead]] zone — the "don't rebuild the index for every
  * ingest batch" path a corpus-scale pipeline needs: a batch of new
  * documents rewrites ONLY the (term, block) groups whose doc-id
  * block the batch touches, in O(batch + touched blocks), never
  * O(corpus).
  *
  * This works because the index's group key already carries the
  * doc-block shard (`doc_id DIV blockSize`): a new document can only
  * change groups in its own block, so maintenance = re-aggregate the
  * touched blocks from (existing exploded postings ∪ batch postings)
  * and MERGE them in — an incremental view maintenance step for a
  * collect-style aggregate, complementing [[IncrementalAgg]]'s
  * scalar-aggregate state.
  *
  * Contract: each doc_id arrives EXACTLY once across all batches
  * (upstream exactly-once ingest, e.g.
  * [[graft.streaming.KafkaShaped.exactlyOnceSink]]); batches may
  * arrive in any doc-id order.
  */
object IndexMaintain {

  /** (term, doc_id, tf, blk) postings of one batch of documents. */
  private def tfOf(batch: DataFrame, blockSize: Int): DataFrame =
    batch.select(col("doc_id"),
        explode(Tokens.whitespace(lower(col("text")))).as("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("blk", expr(s"doc_id DIV $blockSize"))

  /** The index relation: per (term, blk) — df, cf, and doc-sorted
    * postings/tfs arrays (the zone keeps arrays; the q118 query emits
    * the comma-joined export form). */
  private def aggIndex(tf: DataFrame): DataFrame =
    tf.groupBy(col("term"), col("blk"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"),
        array_sort(collect_list(struct(col("doc_id"), col("tf"))))
          .as("pl"))
      .select(col("term"), col("blk"), col("df"), col("cf"),
        transform(col("pl"), x => x.getField("doc_id")).as("postings"),
        transform(col("pl"), x => x.getField("tf")).as("tfs"))

  /** Create the index zone from an initial corpus (may be empty). */
  def init(spark: SparkSession, root: String, docs: DataFrame,
           blockSize: Int = 100): Unit =
    MergeOnRead.init(spark, root, aggIndex(tfOf(docs, blockSize)))

  /** Fold one batch of new documents into the zone. Only the blocks
    * containing batch doc-ids are re-read (broadcast semi-join on the
    * touched block set), re-aggregated together with the batch
    * postings, and merged as one delta epoch — O(touched), and the
    * epoch layout keeps every pre-batch index state time-travelable. */
  def applyBatch(spark: SparkSession, root: String, batch: DataFrame,
                 blockSize: Int = 100): Long = {
    val btf = tfOf(batch, blockSize)
    // touched block ids come to the driver ON PURPOSE: the set is
    // bounded by the batch's doc count (metadata-scale), and an `isin`
    // PREDICATE pushes below the reconcile window (blk is one of its
    // partition keys) all the way into the parquet scans — a
    // broadcast-join spelling would sit ABOVE the window and silently
    // reconcile the whole index per batch
    val touched = btf.select(col("blk")).distinct()
      .collect().map(_.getLong(0)).toSeq
    val existing = MergeOnRead.read(spark, root, Seq("term", "blk"))
      .where(col("blk").isInCollection(touched))
    // restore the tf-relation shape from the zipped arrays
    val exploded = existing.select(col("term"), col("blk"),
        explode(arrays_zip(col("postings"), col("tfs"))).as("z"))
      .select(col("term"), col("blk"),
        col("z.postings").as("doc_id"), col("z.tfs").as("tf"))
    val merged = aggIndex(exploded.unionByName(btf))
    MergeOnRead.merge(spark, root, merged, Seq("term", "blk"))
  }

  /** The current index view (reconciled across all epochs). */
  def read(spark: SparkSession, root: String): DataFrame =
    MergeOnRead.read(spark, root, Seq("term", "blk"))

  /** The from-scratch spelling maintenance must match exactly. */
  def rebuild(docs: DataFrame, blockSize: Int = 100): DataFrame =
    aggIndex(tfOf(docs, blockSize))
}
