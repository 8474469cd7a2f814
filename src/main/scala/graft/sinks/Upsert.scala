package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Keyed upsert (MERGE) over parquet zone tables — the incremental
  * alternative to the reference's TRUNCATE+INSERT full refresh (M1):
  * rows in `updates` replace same-key rows in the target; everything
  * else is carried over.
  *
  * Plain-parquet merge is copy-on-write: target ∖ updates (left-anti
  * join on the key, one shuffle) ∪ updates, rewritten atomically via a
  * staging directory swap. At 100 TB one bounds the rewrite by
  * partitioning the target (see Pipeline.materializePartitioned) and
  * merging only the partitions the updates touch — the anti-join shape
  * is unchanged. (A table format with deletion vectors — Delta/Iceberg
  * — replaces the rewrite; the logical MERGE here is identical.)
  */
object Upsert {

  def merge(spark: SparkSession, targetPath: String, updates: DataFrame,
            keyCols: Seq[String]): Long = {
    require(keyCols.nonEmpty, "merge requires at least one key column")
    val existing =
      try Some(spark.read.parquet(targetPath))
      catch { case _: Exception => None }

    val merged = existing match {
      case None => updates
      case Some(cur) =>
        val kept = cur.join(updates.select(keyCols.map(col): _*),
          keyCols, "left_anti")
        kept.unionByName(updates.select(cur.columns.map(col).toIndexedSeq: _*))
    }

    // copy-on-write via staging dir: never read and overwrite the same
    // path in one job (Spark would delete the input mid-read)
    val staging = targetPath + ".staging"
    merged.write.mode(SaveMode.Overwrite).parquet(staging)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val target = new org.apache.hadoop.fs.Path(targetPath)
    fs.delete(target, true)
    fs.rename(new org.apache.hadoop.fs.Path(staging), target)
    spark.read.parquet(targetPath).count()
  }
}
