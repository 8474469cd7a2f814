package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.CorpusStats

/** The q313 incremental-admission contract: initializing the suffix
  * zone from part of the corpus and folding the rest in as batches —
  * with a replayed batch and re-admitted doc_ids thrown in — must
  * reproduce EXACTLY the batch path's duplicate-substring report
  * (q313's grouped output), because the per-position neighbor-LCP is
  * a pure function of the global suffix order and the maintainer
  * rebuilds precisely the buckets whose neighborhoods an insertion
  * can reach. */
class SuffixMaintSpec extends SparkSpec {

  private def docsOf(dir: String) =
    graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))

  private def report(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[String]("sub"),
      r.getAs[Long]("tok_len"), r.getAs[Long]("n_starts"),
      r.getAs[Long]("n_docs"))).toSet

  test("delta-admitted ≡ full rebuild, hash-identical q313 output, " +
    "under replay and re-admission") {
    val dir = sf()
    val root = java.nio.file.Files
      .createTempDirectory("graft-sfxmaint-").toString
    val docs = docsOf(dir)
    // init on ~60%, then two out-of-order batches; 8 buckets so a
    // batch genuinely touches a subset and neighbors matter
    SuffixMaint.init(spark, docs.where(pmod(col("doc_id"), lit(5)) < 3),
      root, buckets = 8)
    val b1 = docs.where(pmod(col("doc_id"), lit(5)) === 4)
    val b2 = docs.where(pmod(col("doc_id"), lit(5)) === 3)
    SuffixMaint.foldBatch(spark, b1, root, 1L)
    // crash replay: same batch id folds again — idempotent
    SuffixMaint.foldBatch(spark, b1, root, 1L)
    // re-admission: batch 2 carries already-admitted docs
    SuffixMaint.foldBatch(spark, b2.unionByName(b1.limit(5)), root, 2L)
    val got = report(SuffixMaint.readDupSubstrings(spark, root))
    val want = report(CorpusStats.dupSubstrings(spark, dir))
    assert(want.nonEmpty, "fixture has no duplicate substrings")
    assert(got == want,
      s"incremental/batch drift: extra=${(got diff want).take(3)} " +
        s"missing=${(want diff got).take(3)}")
  }

  test("single-bucket layout and empty batches behave") {
    val dir = sf()
    val root = java.nio.file.Files
      .createTempDirectory("graft-sfxmaint1-").toString
    val docs = docsOf(dir)
    SuffixMaint.init(spark, docs.where(col("doc_id") % 2 === 0),
      root, buckets = 1)
    SuffixMaint.foldBatch(spark, docs.where(col("doc_id") % 2 === 1),
      root, 1L)
    // a fully re-admitted (hence empty) batch is a no-op
    SuffixMaint.foldBatch(spark, docs.limit(7), root, 2L)
    val got = report(SuffixMaint.readDupSubstrings(spark, root))
    val want = report(CorpusStats.dupSubstrings(spark, dir))
    assert(got == want)
  }

  test("inflight marker fences reads; re-running the fold converges") {
    val dir = sf()
    val root = java.nio.file.Files
      .createTempDirectory("graft-sfxmaint2-").toString
    val docs = docsOf(dir)
    SuffixMaint.init(spark, docs.where(col("doc_id") % 2 === 0),
      root, buckets = 4)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    fs.create(new org.apache.hadoop.fs.Path(
      s"$root/${SuffixMaint.InflightMarker}"), true).close()
    intercept[IllegalArgumentException] {
      SuffixMaint.readDupSubstrings(spark, root)
    }
    // the re-run clears the marker and converges
    SuffixMaint.foldBatch(spark, docs.where(col("doc_id") % 2 === 1),
      root, 1L)
    val got = report(SuffixMaint.readDupSubstrings(spark, root))
    assert(got == report(CorpusStats.dupSubstrings(spark, dir)))
  }
}
