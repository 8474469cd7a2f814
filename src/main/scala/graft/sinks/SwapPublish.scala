package graft.sinks

import org.apache.hadoop.fs.{FileSystem, LocatedFileStatus, Path}

/** Shared primitives for the copy-on-write sinks (Upsert, Compact):
  * the backup-then-swap atomic-ish publish and the recursive parquet
  * data-file listing. One implementation so a crash-safety fix cannot
  * silently miss one of the paths. */
private[graft] object SwapPublish {

  /** Publish `staging` over `target`: move the existing target aside
    * to `backup`, swap staging in, drop the backup. On a failed swap
    * the restore is ATTEMPTED and the error says exactly where the
    * original data is — restored at the target, or surviving only at
    * the backup (never silently lost). Callers own deleting `staging`
    * in their finally block. */
  def publish(fs: FileSystem, staging: Path, target: Path, backup: Path,
              targetExists: Boolean): Unit = {
    fs.delete(backup, true)
    // rename returns false instead of throwing on most Hadoop
    // filesystems — unchecked, a failed publish would be silent.
    if (targetExists && !fs.rename(target, backup))
      sys.error(s"publish: could not move $target aside to $backup")
    if (!fs.rename(staging, target)) {
      val restored = !targetExists || fs.rename(backup, target)
      sys.error(s"publish: could not publish $staging to $target; " +
        (if (restored) s"original left in place at $target"
         else s"original NOT at $target — recover it from $backup"))
    }
    fs.delete(backup, true)
  }

  /** Stage-write `df` as parquet and atomically publish it as
    * `<dir>/epoch=<epoch>` (staging dir + backup-swap via
    * [[publish]]; staging always cleaned). The ONE epoch-publish
    * spelling shared by the streaming maintenance sinks
    * (ClusterMaint, NearDupMaint and its compaction) — same rule as
    * this object's header: a crash-safety fix must not have
    * per-sink copies to miss. */
  def writeEpoch(df: org.apache.spark.sql.DataFrame, dir: String,
                 epoch: Long): Unit = {
    val spark = df.sparkSession
    val hconf = spark.sparkContext.hadoopConfiguration
    val target = new Path(s"$dir/epoch=$epoch")
    val staging = new Path(s"$dir/.staging-$epoch")
    val backup = new Path(s"$dir/.backup-$epoch")
    val fs = target.getFileSystem(hconf)
    try {
      df.write.mode("overwrite").parquet(staging.toString)
      publish(fs, staging, target, backup,
        targetExists = fs.exists(target))
    } finally { fs.delete(staging, true); () }
  }

  /** Restore orphaned `.backup-<e>` dirs left by a crash inside
    * [[publish]]'s rename window (target moved aside, staging not
    * yet swapped in): a backup whose `epoch=<e>` target is ABSENT is
    * the SOLE surviving copy of that epoch — a naive compaction
    * re-run would both miss it (epoch listings skip dot-dirs) and
    * destroy it (publish begins by deleting the backup) — so restore
    * it; a backup whose target exists is a post-swap leftover (the
    * target already holds a superset) and drops. Shared by the
    * epoch-zone compactions (NearDupMaint, SuffixMaint) — the
    * header's one-implementation rule. */
  def recoverOrphanBackups(fs: FileSystem, dir: Path): Unit = {
    if (!fs.exists(dir)) return
    fs.listStatus(dir).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith(".backup-")) {
        val target = new Path(dir,
          "epoch=" + name.stripPrefix(".backup-"))
        if (!fs.exists(target))
          require(fs.rename(st.getPath, target),
            s"could not restore orphan backup ${st.getPath} to $target")
        else fs.delete(st.getPath, true): Unit
      }
    }
  }

  /** Epoch numbers present under `dir` (Hive-style `epoch=N`
    * children); empty when the directory does not exist. */
  def listEpochs(spark: org.apache.spark.sql.SparkSession,
                 dir: String): Seq[Long] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("epoch="))
      .map(_.stripPrefix("epoch=").toLong)
  }

  /** All parquet data files under `root`, recursively. */
  def parquetFiles(fs: FileSystem, root: Path): Seq[LocatedFileStatus] = {
    if (!fs.exists(root)) return Seq.empty
    val it = fs.listFiles(root, true)
    val b = Seq.newBuilder[LocatedFileStatus]
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) b += f
    }
    b.result()
  }

  /** True if any data file sits under a Hive-style `k=v` partition
    * directory strictly BELOW `root`. Root must be qualified with the
    * same fs as the listed files or the stop-at-root comparison never
    * matches (listFiles returns scheme-qualified paths). */
  def hasPartitionDirs(fs: FileSystem, root: Path,
                       files: Seq[LocatedFileStatus]): Boolean = {
    val qRoot = fs.makeQualified(root)
    files.exists { f =>
      var p = f.getPath.getParent
      var found = false
      while (p != null && p != qRoot && !found) {
        if (p.getName.contains("=")) found = true
        p = p.getParent
      }
      found
    }
  }
}
