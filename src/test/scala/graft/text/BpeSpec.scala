package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("BPE learns the classic merge sequence deterministically") {
    // the Sennrich example vocabulary: low×5, lower×2, newest×6,
    // widest×3 (no end-of-word marker) — first merges hand-derivable:
    // (e,s) ties (s,t) at 9 → lexicographic; then (es,t)=9; then
    // (l,o) ties (o,w) at 7 → lexicographic; then (lo,w)=7
    val tmp = java.nio.file.Files.createTempDirectory("bpe").toString
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    Seq((1L, text, "en", "src0", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val merges = Bpe.learnBpe(spark, tmp, nMerges = 4)
    assert(merges.map(m => (m.left, m.right)) ==
      Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
    assert(merges.map(_.rank) == Seq(0, 1, 2, 3))
    val enc = Bpe.encode(spark, tmp, merges).head()
    // compression sits strictly between the char and word baselines
    assert(enc.getAs[Long]("n_bpe_tokens") < enc.getAs[Long]("n_chars"))
    assert(enc.getAs[Long]("n_bpe_tokens") > enc.getAs[Long]("n_words"))
  }

  test("BPE on the testdata corpus: 16 merges, deterministic encode") {
    val merges = Bpe.learnBpe(spark, sf(), nMerges = 16)
    assert(merges.length == 16)
    // retrain reproduces the identical merge table (pure function of
    // the corpus — the property rand-seeded trainers lack)
    assert(Bpe.learnBpe(spark, sf(), nMerges = 16) == merges)
    val enc = Bpe.encode(spark, sf(), merges)
    val agg = enc.agg(sum("n_bpe_tokens"), sum("n_chars"), sum("n_words"))
      .head()
    assert(agg.getLong(0) < agg.getLong(1), "BPE must beat chars")
    assert(agg.getLong(0) >= agg.getLong(2), "BPE can't beat words")
  }
}
