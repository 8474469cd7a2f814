package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator's named query;
  * `oracleSql` carries the DuckDB-equivalent SQL for each SQL-
  * expressible one (driver's t2 correctness gate).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the reference's full transform data path (SURVEY.md §3.2). */
  def entry(spark: SparkSession): DataFrame =
    ops.CoreParity.cleanedTransform(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.CoreParity.queries ++ ops.Relational.queries ++
      ops.Extras.queries ++
      text.TextAnalysis.queries ++ dedup.Dedup.queries ++
      sim.Similarity.queries ++ ops.EventOps.queries ++
      multimodal.Multimodal.queries ++ ops.SqlSurface.queries ++
      ops.Advanced.queries ++ ops.Wave2.queries ++ ops.Wave3.queries ++
      ops.SkewJoin.queries ++ ops.Sampling.queries ++
      text.CorpusStats.queries ++ text.Postings.queries ++
      text.Normalize.queries ++ multimodal.Perceptual.queries ++
      ops.Quality.queries ++ ops.Blocklist.queries ++
      text.Bpe.queries ++ sim.KMeans.queries ++ sim.Spectral.queries ++
      text.Sketches.queries ++ sim.Pq.queries ++
      text.TextVectors.queries ++ ops.Fuzzy.queries ++
      text.RetrievalEval.queries ++ ops.Mining.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ops.CoreParity.oracle ++ ops.Relational.oracle ++
      ops.Extras.oracle ++
      text.TextAnalysis.oracle ++ dedup.Dedup.oracle ++
      sim.Similarity.oracle ++ ops.EventOps.oracle ++
      multimodal.Multimodal.oracle ++ ops.SqlSurface.oracle ++
      ops.Advanced.oracle ++ ops.Wave2.oracle ++ ops.Wave3.oracle ++
      ops.SkewJoin.oracle ++ ops.Sampling.oracle ++
      text.CorpusStats.oracle ++ text.Postings.oracle ++
      text.Normalize.oracle ++ multimodal.Perceptual.oracle ++
      ops.Quality.oracle ++ ops.Blocklist.oracle ++
      text.Bpe.oracle ++ sim.KMeans.oracle ++ sim.Spectral.oracle ++
      text.Sketches.oracle ++ sim.Pq.oracle ++
      text.TextVectors.oracle ++ ops.Fuzzy.oracle ++
      text.RetrievalEval.oracle ++ ops.Mining.oracle
}
