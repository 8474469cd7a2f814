package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bit-identity of the native md5-prefix expression against the
  * composable spelling it replaces — the cross-engine hash contract
  * every LSH/split/CDC oracle depends on. */
class Md5Prefix60Spec extends SparkSpec {

  private val composed =
    (c: org.apache.spark.sql.Column) =>
      conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  test("native == composed on random strings incl. unicode and empties") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val samples = Seq("", " ", "a", "hello world", "naïve café 東京",
      "\n\t", "0" * 1000) ++
      Seq.fill(500)(rnd.alphanumeric.take(rnd.nextInt(40)).mkString) ++
      Seq.fill(100)(List.fill(rnd.nextInt(8))(rnd.nextPrintableChar())
        .mkString)
    val df = samples.toDF("s")
    val bad = df.select(
        graft.dedup.Md5Prefix.h(col("s")).as("native"),
        composed(col("s")).as("composed"))
      .where(col("native") =!= col("composed") || col("native") < 0)
      .count()
    assert(bad == 0)
  }

  test("native == composed over the documents corpus (text + ids)") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val bad = docs.select(
        graft.dedup.Md5Prefix.h(col("text")).as("n1"),
        composed(col("text")).as("c1"),
        graft.dedup.Md5Prefix.h(col("doc_id").cast("string")).as("n2"),
        composed(col("doc_id").cast("string")).as("c2"))
      .where(col("n1") =!= col("c1") || col("n2") =!= col("c2"))
      .count()
    assert(bad == 0)
  }

  test("binary input hashes its raw bytes (md5 implicit-cast parity)") {
    import spark.implicits._
    val df = Seq("abc", "").toDF("s")
      .select(col("s"), encode(col("s"), "UTF-8").as("b"))
    val bad = df.select(
        graft.dedup.Md5Prefix.h(col("s")).as("hs"),
        org.apache.spark.sql.GraftBridge.column(Md5Prefix60(
          org.apache.spark.sql.GraftBridge.expression(col("b")))).as("hb"))
      .where(col("hs") =!= col("hb")).count()
    assert(bad == 0)
  }

  test("null propagates; type check rejects non-strings") {
    import spark.implicits._
    val r = Seq[Option[String]](Some("x"), None).toDF("s")
      .select(graft.dedup.Md5Prefix.h(col("s")).as("h")).collect()
    assert(r.count(_.isNullAt(0)) == 1)
    intercept[Exception] {
      Seq(1L).toDF("v")
        .select(org.apache.spark.sql.GraftBridge.column(
          Md5Prefix60(org.apache.spark.sql.GraftBridge
            .expression(col("v"))))).collect()
    }
  }
}
