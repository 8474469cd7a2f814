package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.util.Tokens

/** Text-analysis operators for a training-data pipeline, over the
  * `documents` table: token statistics, quality scoring, language-ID,
  * and canonical fingerprinting. All are single-pass, map-side-only
  * column expressions (no shuffle except the final presentation sort) —
  * at 100 TB these run at scan speed with whole-stage codegen.
  *
  * Every operator here is deliberately expressible in both Spark and
  * ANSI/DuckDB SQL with bit-identical results (integer counts, fixed
  * double-arithmetic order), so the whole module is oracle-checked.
  */
object TextAnalysis {

  /** Whitespace tokenization, both engines split on the same RE2/Java
    * compatible pattern. */
  private def tokens(c: Column): Column = Tokens.whitespace(c)

  /** q30: per-document token statistics. */
  def tokenStats(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents").select(
      col("doc_id"),
      size(tokens(col("text"))).as("n_tokens"),
      size(array_distinct(tokens(col("text")))).as("n_distinct_tokens"),
      length(col("text")).as("len_chars"))
      .orderBy("doc_id")

  /** q31: heuristic quality score — stopword ratio, length saturation,
    * type-token ratio, combined with fixed weights. The exact formula
    * is engine-defined; what matters is determinism + scan-speed. */
  def qualityScore(s: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks)
    val nStop = size(expr(
      "filter(split(trim(text), '\\\\s+'), w -> w IN ('the', 'a', 'of', 'and'))"))
    val stopRatio = nStop / nTok
    val lenSat = least(lit(1.0), nTok / lit(100.0))
    val ttr = size(array_distinct(toks)) / nTok
    Tables.load(s, dir, "documents").select(
      col("doc_id"),
      nTok.as("n_tokens"),
      (stopRatio * 0.3 + lenSat * 0.4 + ttr * 0.3).as("quality"))
      .orderBy("doc_id")
  }

  /** q32: language-ID via marker-token counts (n-gram heuristic class;
    * CJK presence short-circuits). Fixed priority on ties. */
  def langId(s: SparkSession, dir: String): DataFrame = {
    def markers(pat: String): Column =
      size(regexp_extract_all(col("text"), lit(pat), lit(0)))
    val cEn = markers("\\b(the|of|and)\\b")
    val cFr = markers("\\b(le|la|et|les)\\b")
    val cEs = markers("\\b(el|los|las|y)\\b")
    val cDe = markers("\\b(der|die|und|das)\\b")
    val cZh = markers("[\\x{4e00}-\\x{9fff}]")
    Tables.load(s, dir, "documents").select(
      col("doc_id"),
      when(cZh > 0, "zh")
        .when(cEn >= greatest(cFr, cEs, cDe), "en")
        .when(cFr >= greatest(cEs, cDe), "fr")
        .when(cEs >= cDe, "es")
        .otherwise("de").as("lang_pred"))
      .orderBy("doc_id")
  }

  /** q33: canonical fingerprint (sorted distinct lowercase tokens,
    * md5) — the normalize-and-hash doc identity used for fuzzy dedup
    * blocking. */
  def fingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents").select(
      col("doc_id"),
      md5(array_join(array_sort(array_distinct(tokens(lower(col("text"))))),
        " ")).as("fp"))
      .orderBy("doc_id")

  /** q95: corpus token frequency — explode (UNNEST) + groupBy count,
    * the vocabulary-building primitive. Map-side partial counts make
    * the shuffle carry one row per (partition, token), not per
    * occurrence. */
  def tokenFrequency(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(explode(tokens(col("text"))).as("tok"))
      .groupBy("tok")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q95_token_freq"    -> (tokenFrequency _),
    "q30_token_stats"   -> (tokenStats _),
    "q31_quality_score" -> (qualityScore _),
    "q32_langid"        -> (langId _),
    "q33_fingerprint"   -> (fingerprint _))

  val oracle: Map[String, String] = Map(
    "q95_token_freq" ->
      """SELECT t.tok, count(*) AS n
        |FROM documents, UNNEST(string_split_regex(trim(text), '\s+')) AS t(tok)
        |GROUP BY 1 ORDER BY n DESC, tok""".stripMargin,
    "q30_token_stats" ->
      """SELECT doc_id,
        |  len(string_split_regex(trim(text), '\s+')) AS n_tokens,
        |  len(list_distinct(string_split_regex(trim(text), '\s+'))) AS n_distinct_tokens,
        |  length(text) AS len_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q31_quality_score" ->
      """SELECT doc_id,
        |  len(string_split_regex(trim(text), '\s+')) AS n_tokens,
        |  (len(list_filter(string_split_regex(trim(text), '\s+'),
        |       w -> w IN ('the', 'a', 'of', 'and')))
        |     / len(string_split_regex(trim(text), '\s+'))) * 0.3
        |  + LEAST(1.0, len(string_split_regex(trim(text), '\s+')) / 100.0) * 0.4
        |  + (len(list_distinct(string_split_regex(trim(text), '\s+')))
        |     / len(string_split_regex(trim(text), '\s+'))) * 0.3 AS quality
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q32_langid" ->
      """SELECT doc_id,
        |  CASE WHEN len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) > 0 THEN 'zh'
        |    WHEN len(regexp_extract_all(text, '\b(the|of|and)\b')) >=
        |      GREATEST(len(regexp_extract_all(text, '\b(le|la|et|les)\b')),
        |               len(regexp_extract_all(text, '\b(el|los|las|y)\b')),
        |               len(regexp_extract_all(text, '\b(der|die|und|das)\b'))) THEN 'en'
        |    WHEN len(regexp_extract_all(text, '\b(le|la|et|les)\b')) >=
        |      GREATEST(len(regexp_extract_all(text, '\b(el|los|las|y)\b')),
        |               len(regexp_extract_all(text, '\b(der|die|und|das)\b'))) THEN 'fr'
        |    WHEN len(regexp_extract_all(text, '\b(el|los|las|y)\b')) >=
        |      len(regexp_extract_all(text, '\b(der|die|und|das)\b')) THEN 'es'
        |    ELSE 'de' END AS lang_pred
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q33_fingerprint" ->
      """SELECT doc_id,
        |  md5(array_to_string(list_sort(list_distinct(
        |    string_split_regex(trim(lower(text)), '\s+'))), ' ')) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin)
}
