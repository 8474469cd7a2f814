package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed tables: the shuffle-free co-located join layout.
  *
  * At 100 TB the dominant join cost is the shuffle of both sides on
  * the join key. Writing each side `bucketBy(n, key).sortBy(key)` fixes
  * the partitioning AT WRITE TIME: a later equi-join on the bucket key
  * needs no exchange on either side (bucket i joins bucket i), turning
  * an all-to-all network stage into local merges. The write itself
  * pays one clustering pass — amortized over every subsequent join.
  *
  * Both sides must use the same bucket COUNT; the bucket columns may
  * differ in name as long as they are the join keys.
  */
object Bucketing {

  /** Materialize `df` as a catalog table bucketed and sorted by `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Equi-join two bucketed tables on their bucket keys. With equal
    * bucket counts the plan is a SortMergeJoin with NO Exchange on
    * either side (asserted in BucketingSpec). */
  def coLocatedJoin(spark: SparkSession, leftTable: String,
                    rightTable: String, leftKey: String,
                    rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
