package graft.text

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Behavioral tests for the two corpus-model scorers: q171 DSIR
  * importance weights (target slice = en) must systematically prefer
  * en documents, and the q172 bigram LM (trained on en) must score
  * en text as more fluent (lower conditional surprisal) than text in
  * an unrelated script. Both run on the real sf0.001 corpus — the
  * signal has to emerge from the actual generator documents, not a
  * planted fixture. */
class ModelScoreSpec extends SparkSpec {

  private def withLang(df: org.apache.spark.sql.DataFrame) =
    df.join(Tables.load(spark, sf(), "documents")
      .select(col("doc_id"), col("lang").as("true_lang")), "doc_id")

  test("q171: en documents carry higher importance weight than zh") {
    val w = withLang(CorpusStats.dsirWeights(spark, sf()))
      .select(col("true_lang"),
        (col("iw_q16").cast("double") / col("n_tokens"))
          .as("per_tok"))
      .groupBy(col("true_lang")).agg(avg(col("per_tok")).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(w("en") > w("zh"),
      s"en per-token weight ${w("en")} must beat zh ${w("zh")}")
    // the selection quota actually bites: a strict, nonempty subset
    val sel = CorpusStats.dsirWeights(spark, sf())
    val total = sel.count()
    val selected = sel.where(col("selected")).count()
    assert(selected > 0 && selected < total)
  }

  test("q172: bigram LM trained on en scores en as most fluent") {
    val m = withLang(CorpusStats.bigramLm(spark, sf()))
      .groupBy(col("true_lang")).agg(avg(col("mean_bits")).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // en must beat every off-target language under its own model
    (m.keySet - "en").foreach { l =>
      assert(m("en") < m(l),
        s"en mean_bits ${m("en")} must be below $l ${m(l)}")
    }
    // scoring covers every document with at least a bigram
    val n = CorpusStats.bigramLm(spark, sf()).count()
    val eligible = Tables.load(spark, sf(), "documents")
      .where(size(split(trim(col("text")), "[ \\t\\n\\x0B\\f\\r]+")) >= 2)
      .count()
    assert(n == eligible)
  }

  test("q185: trigram backoff separates en harder than the bigram LM") {
    def byLang(df: org.apache.spark.sql.DataFrame) =
      withLang(df).groupBy(col("true_lang"))
        .agg(avg(col("mean_bits")).as("m"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val t = byLang(CorpusStats.trigramLm(spark, sf()))
    (t.keySet - "en").foreach { l =>
      assert(t("en") < t(l),
        s"en mean_bits ${t("en")} must be below $l ${t(l)}")
    }
    // more context = a sharper in-language advantage: the en-vs-rest
    // gap must not shrink relative to the bigram model
    val b = byLang(CorpusStats.bigramLm(spark, sf()))
    val gapT = (t - "en").values.min - t("en")
    val gapB = (b - "en").values.min - b("en")
    assert(gapT >= gapB * 0.8,
      s"trigram gap $gapT collapsed vs bigram gap $gapB")
    // coverage: every ≥3-token document
    val n = CorpusStats.trigramLm(spark, sf()).count()
    val eligible = Tables.load(spark, sf(), "documents")
      .where(size(split(trim(col("text")), "[ \\t\\n\\x0B\\f\\r]+")) >= 3)
      .count()
    assert(n == eligible)
  }
}
