package graft.sinks

import java.nio.file.Files

import graft.{SparkSpec, Tables}

/** Compaction must reduce file count, preserve data exactly, and
  * leave no staging/backup litter. */
class CompactSpec extends SparkSpec {

  test("compaction merges small files and preserves every row") {
    val dir = Files.createTempDirectory("compact").toString + "/t.parquet"
    val src = Tables.load(spark, sf(), "customer")
    src.repartition(8).write.parquet(dir)
    val beforeRows = spark.read.parquet(dir).count()

    val report = Compact.compact(spark, dir) // default target ≫ data size
    assert(report.filesBefore == 8, report.toString)
    assert(report.filesAfter == 1, report.toString)
    assert(report.rows == beforeRows)

    val after = spark.read.parquet(dir)
    assert(after.count() == beforeRows)
    assert(after.columns.toSeq == src.columns.toSeq)
    // exact content: symmetric difference empty
    assert(after.exceptAll(src).isEmpty && src.exceptAll(after).isEmpty)
    // no staging or backup litter
    val parent = new java.io.File(dir).getParentFile.list().toSeq
    assert(parent == Seq("t.parquet"), parent.toString)
  }
}
