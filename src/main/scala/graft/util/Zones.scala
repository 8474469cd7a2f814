package graft.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Build-once zone caches for the gate queries that materialize a
  * derived directory per scale dir (events-by-day, SCD2 chain,
  * erasure chain, join view, digest copy).
  *
  * Two failure modes of the previous per-site spelling, fixed here
  * once (round-8 advice):
  *   - the cache key was `dir.hashCode` — a REGENERATED data dir at
  *     the same path silently reused a stale zone. The key is now a
  *     metadata fingerprint (relative path + size + mtime of every
  *     file), so new content ⇒ new zone path ⇒ rebuild;
  *   - the staging dir was a fixed shared path — two concurrent
  *     sessions that both passed the exists-check could clobber each
  *     other's in-flight write before the rename. Staging is now
  *     uniquely suffixed per attempt; losing the publish race is
  *     harmless (both builds read the same fingerprinted source, so
  *     the content is identical) and the loser just deletes its own
  *     staging dir.
  */
object Zones {

  /** Metadata fingerprint of a source data dir: every regular file's
    * (relative path, size, mtime) folded into one 64-bit hex token.
    * Metadata-only — never reads file contents — so it costs one
    * directory walk. Order-independent fold (XOR of per-file hashes):
    * filesystem listing order cannot change the key. */
  def fingerprint(dir: String): String = {
    val root = java.nio.file.Paths.get(dir)
    var acc = 0L
    if (java.nio.file.Files.isDirectory(root)) {
      val s = java.nio.file.Files.walk(root)
      try s.filter(java.nio.file.Files.isRegularFile(_)).forEach { f =>
        val key = root.relativize(f).toString + "|" +
          java.nio.file.Files.size(f) + "|" +
          java.nio.file.Files.getLastModifiedTime(f).toMillis
        // FNV-1a over the entry string, XOR-folded across entries
        var h = 0xcbf29ce484222325L
        key.foreach { c => h ^= c.toLong; h *= 0x100000001b3L }
        acc ^= h
      }
      finally s.close()
    }
    java.lang.Long.toHexString(acc)
  }

  /** Returns the published zone path for (kind, content of dir),
    * running `build(stagingPath)` only when absent. Publish is
    * directory-rename atomic; readers never see a half-built zone. */
  def oncePerDir(s: SparkSession, kind: String, dir: String)
                (build: String => Unit): String = {
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_zone_v2/" +
      s"${kind}_${fingerprint(dir)}"
    val p = new Path(root)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) {
      val staging = new Path(
        root + ".staging-" + java.util.UUID.randomUUID().toString.take(8))
      build(staging.toString)
      // a concurrent run may have published first — losing the race is
      // fine, the content is identical (same fingerprinted source)
      if (!fs.rename(staging, p) && !fs.exists(p))
        sys.error(s"could not publish zone at $root")
      fs.delete(staging, true): Unit
    }
    root
  }
}
