package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-file compaction for parquet zone tables.
  *
  * Streaming appends and per-batch ingests accrete many small files;
  * at 100 TB the scan cost becomes dominated by file-open overhead and
  * driver-side listing. Compaction rewrites a table into
  * ceil(bytes / targetFileBytes) files via `coalesce` — a NARROW
  * dependency, no shuffle: each output task concatenates input splits.
  * Publication is the same backup-then-swap used by [[Upsert]], so a
  * crash leaves either the original or a recoverable backup.
  *
  * Partitioned layouts compact per-partition (pass the partition dir),
  * which also bounds rewrite size — the same incremental story as
  * MERGE.
  */
object Compact {

  final case class Report(filesBefore: Int, filesAfter: Int,
                          bytes: Long, rows: Long)

  def compact(spark: SparkSession, tablePath: String,
              targetFileBytes: Long = 128L * 1024 * 1024): Report = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val target = new Path(tablePath)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles() = {
      val it = fs.listFiles(target, true)
      val b = Seq.newBuilder[org.apache.hadoop.fs.LocatedFileStatus]
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) b += f
      }
      b.result()
    }
    val before = dataFiles()
    val bytes = before.map(_.getLen).sum
    val desired = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes)
      .min(Int.MaxValue).toInt

    val staging = new Path(tablePath + ".compacting")
    val backup = new Path(tablePath + ".old")
    val df = spark.read.parquet(tablePath)
    var rows = 0L
    try {
      // coalesce = narrow repartitioning: no shuffle, tasks concatenate
      // input splits. (coalesce never increases partition count, so a
      // table already wider than `desired` only ever shrinks.)
      df.coalesce(desired).write.mode(SaveMode.Overwrite)
        .parquet(staging.toString)
      rows = spark.read.parquet(staging.toString).count()
      fs.delete(backup, true)
      if (!fs.rename(target, backup))
        sys.error(s"compact: could not move $target aside to $backup")
      if (!fs.rename(staging, target)) {
        fs.rename(backup, target) // restore
        sys.error(s"compact: could not publish $staging to $target")
      }
      fs.delete(backup, true)
    } finally fs.delete(staging, true)
    Report(before.size, dataFiles().size, bytes, rows)
  }
}
