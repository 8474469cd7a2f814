package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.util.Tokens

/** Corpus-relative document statistics — operators whose score for one
  * document depends on aggregates over the WHOLE corpus (unlike the
  * per-doc map-side stats in [[TextAnalysis]]): characteristic-term
  * extraction and bigram-novelty scoring.
  *
  * Both gates are deliberately FLOAT-FREE: ranking keys and outputs
  * are integer counts or a single int/int division (one IEEE op,
  * bit-identical cross-engine). A classic tf·idf = tf·ln(N/df) ranking
  * would hang the hash gate on libm's ln agreeing to the last ulp
  * between engines; ranking by (tf DESC, df ASC) is order-equivalent
  * for fixed tf and needs no transcendentals. Consumers wanting the
  * float score compute it from the emitted (tf, df) pair.
  */
object CorpusStats {

  /** q104: top-k characteristic terms per document — highest in-doc
    * frequency, then rarest in the corpus (df ASC), then term. The
    * tf table is built once per branch from one explode + count; df
    * re-aggregates the tf relation (distinct doc-term pairs), NOT the
    * token stream, so the second pass is over the much smaller
    * postings relation. Shuffles: tokens→(doc,term) agg, join on term,
    * window on doc — all key-partitioned, nothing quadratic. At 100 TB
    * the tf relation is checkpointed once instead of recomputed per
    * branch. */
  def tfidfTopTerms(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val tf = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        explode(Tokens.whitespace(lower(col("text")))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    tf.join(df, "term")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("rn"))
      .orderBy("doc_id", "rn")
  }

  /** q105: bigram novelty — per-doc mean corpus frequency of its
    * bigrams (high = boilerplate) and hapax-bigram ratio (high =
    * gibberish/unique), the two cheap LM-free proxies for the
    * perplexity filters a curation pipeline runs. Corpus bigram counts
    * are one explode + partial-aggregated count; the join back is
    * key-partitioned on the bigram. Ratios are a single int/int
    * division — exact cross-engine. */
  def bigramNovelty(s: SparkSession, dir: String): DataFrame = {
    import graft.dedup.Md5Prefix
    // token arrays materialize into a column FIRST: inlining the split
    // into the n-gram lambda re-evaluates it per element (O(tokens²))
    // bigrams hash to 8 bytes map-side (Md5Prefix, oracle-replayed —
    // the q145/q149 discipline): the count shuffle and join key stop
    // scaling with gram length, and the strings never leave the scan
    val bigrams = Tables.load(s, dir, "documents")
      .select(col("doc_id"), Tokens.whitespace(lower(col("text"))).as("w"))
      .select(col("doc_id"),
        explode(transform(Tokens.ngramsOf(col("w"), 2),
          g => Md5Prefix.h(g))).as("bg"))
    val counts = bigrams.groupBy(col("bg")).agg(count(lit(1)).as("c"))
    bigrams.join(counts, "bg")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("c")).as("sum_freq"),
        sum(when(col("c") <= 1, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("doc_id"), col("n_bigrams"), col("sum_freq"),
        col("n_hapax"),
        (col("sum_freq") / col("n_bigrams")).as("avg_freq"),
        (col("n_hapax") / col("n_bigrams")).as("hapax_ratio"))
      .orderBy("doc_id")
  }

  /** q106: content-defined chunking + shared-chunk detection — the
    * sub-document dedup primitive (what whole-doc dedup can't see:
    * templated pages sharing paragraphs). Token-level gear hash: a
    * chunk boundary falls BEFORE token i wherever
    * hash(token[i-1], token[i]) ≡ 0 (mod 8) — boundaries depend only
    * on local content, so an insertion early in a doc shifts token
    * positions but not later boundaries (the property fixed-width
    * chunking lacks). Chunk fingerprints are md5 of the span; a chunk
    * is "shared" if it occurs in more than one doc corpus-wide.
    *
    * Scale shape: the per-doc chunking is pure map-side array math
    * (boundary indices via `filter` over positions, fingerprints via
    * `slice` per boundary window), so the first shuffle in the plan is
    * already the corpus-wide (chunk_hash → ndocs) count, followed by
    * one key-partitioned join back. The cross-engine hash is
    * [[graft.dedup.Md5Prefix]] so DuckDB replays boundary placement
    * exactly. */
  def cdcChunks(s: SparkSession, dir: String): DataFrame = {
    val chunks = chunkZone(s, dir).select(col("doc_id"), col("chunk_hash"))
    val shared = chunks.groupBy(col("chunk_hash"))
      .agg(countDistinct(col("doc_id")).as("ndocs"))
    chunks.join(shared, "chunk_hash")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("ndocs") > 1, 1L).otherwise(0L)).as("n_shared"))
      .select(col("doc_id"), col("n_chunks"), col("n_shared"),
        (col("n_shared") / col("n_chunks")).as("shared_ratio"))
      .orderBy("doc_id")
  }

  /** Per-doc CDC chunk relation: (doc_id, j, ctoks, ctext, chunk_hash),
    * shared by q106 (scoring) and q113 (scrubbing). Each consumer scans
    * it twice (once into the corpus-wide fingerprint aggregate, once
    * into the join back), so [[chunkZone]] below stores it to a
    * parquet scratch zone and both branches read the stored copy — the
    * chunk relation is a multiple of the corpus and must not be
    * re-derived per branch or pinned in executor memory at 100 TB.
    *
    * The whole per-doc chunking runs MAP-SIDE on the token array —
    * boundary indices via `filter` over positions, chunk text via
    * `slice` per boundary window — so the first shuffle in any
    * consumer's plan is already a corpus-wide aggregate over chunk
    * fingerprints. An earlier explode + lag/running-sum-window
    * spelling shuffled the full token stream twice before producing a
    * single chunk (measured 2.3 s → 1.9 s at sf0.1). All lambda
    * captures are plain attributes; per-element work is O(1) array
    * indexing (the O(tokens²) HOF trap is re-evaluating a SPLIT per
    * element, which materializing `w` first avoids). The boundary
    * predicate is the shared Md5Prefix.h via Column lambdas — a
    * string-expr copy of the hash arithmetic here would silently
    * detach the q106/q113 oracles from the family. CASE guard:
    * size(w) < 2 must yield NO boundaries — `sequence(1, size-1)`
    * DESCENDS when size = 1 (sequence(1,0) = [1,0]) and the lambda
    * would index out of bounds (review finding; the testdata never
    * triggers it, a single-token doc does). */
  private def chunkSpans(s: SparkSession, dir: String): DataFrame = {
    import graft.dedup.Md5Prefix
    val w = col("w")
    val boundary = (i: org.apache.spark.sql.Column) =>
      Md5Prefix.h(concat(
        element_at(w, i.cast("int")), lit(" "),
        element_at(w, i.cast("int") + 1))) % 8 === 0
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), Tokens.whitespace(col("text")).as("w"))
      // boundary BEFORE token i (1-based array positions: boundary at
      // position i+1 when hash(w[i], w[i+1]) ≡ 0 mod 8)
      .withColumn("bounds",
        when(size(w) < 2, expr("CAST(array() AS ARRAY<BIGINT>)"))
          .otherwise(filter(sequence(lit(1L), size(w).cast("long") - 1L),
            boundary)))
      .withColumn("starts",
        concat(array(lit(0L)), col("bounds")))
      .withColumn("ends",
        concat(col("bounds"), array(size(w).cast("long"))))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(starts) - 1), j -> named_struct(" +
          "'j', j, 'ctoks', ends[j] - starts[j], " +
          "'ctext', concat_ws(' ', slice(w, CAST(starts[j] AS INT) + 1, " +
          "CAST(ends[j] - starts[j] AS INT)))))")).as("c"))
      .select(col("doc_id"), col("c.j").as("j"),
        col("c.ctoks").as("ctoks"), col("c.ctext").as("ctext"),
        md5(col("c.ctext")).as("chunk_hash"))
  }

  /** The chunk relation materialized once ([[graft.util.Scratch]]);
    * q106 and q113 consume the stored copy from both plan branches. */
  private[text] def chunkZone(s: SparkSession, dir: String): DataFrame =
    // memoized per application: q106 and q113 (and re-runs) share the
    // same deterministic chunking of the same corpus
    graft.util.Scratch.memo(s, "cdc-chunks", s"cdc-chunks:$dir")(
      chunkSpans(s, dir))

  /** q113: shared-span SCRUB — the destructive rewrite q106 only
    * scores: drop every chunk whose fingerprint occurs in more than
    * one document corpus-wide, and reassemble each document's cleaned
    * text from the surviving chunks in original order. This is the
    * C4/RefinedWeb "remove duplicated lines across the corpus" step,
    * done at CDC-chunk granularity (this corpus has no line
    * structure). Emits the audit trail alongside the rewrite:
    * chunk counts, dropped count, surviving token count.
    *
    * Scale shape: identical to q106 up to the join (map-side chunking,
    * one fingerprint aggregate, one key-partitioned join back); the
    * reassembly is collect_list of (j, text) per doc — bounded by
    * document size, the same invariant every per-doc array op here
    * relies on. The chunk relation is stored once ([[chunkZone]]);
    * the count and the join both scan the zone copy. */
  def sharedSpanScrub(s: SparkSession, dir: String): DataFrame = {
    val ch = chunkZone(s, dir)
    val shared = ch.groupBy(col("chunk_hash"))
      .agg(countDistinct(col("doc_id")).as("ndocs"))
    ch.join(shared, "chunk_hash")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("ndocs") > 1, 1L).otherwise(0L)).as("n_dropped"),
        sum(when(col("ndocs") === 1, col("ctoks")).otherwise(0L))
          .as("n_tokens_kept"),
        // collect_list skips the when()'s nulls; array_sort orders by
        // j (unique per doc), so the reassembly is deterministic
        array_join(transform(array_sort(collect_list(
          when(col("ndocs") === 1, struct(col("j"), col("ctext"))))),
          x => x.getField("ctext")), " ").as("cleaned_text"))
      .orderBy("doc_id")
  }

  /** q112: sequence packing — the GPT-style pretraining layout:
    * concatenate every document's tokens in a deterministic
    * hash-shuffled order and cut the stream into fixed `seqLen`-token
    * training sequences. Emits, per document, its global token offset
    * and the range of sequence ids it lands in — the manifest a
    * packing writer consumes.
    *
    * Scale shape: the global running offset is a DISTRIBUTED prefix
    * sum, not one giant window — a single unpartitioned window would
    * funnel the whole corpus through one task. The order key h (60-bit
    * md5 of doc_id) is split into 128 range buckets by its HIGH bits
    * (global h order ≡ (bucket, h) order): in-bucket running sums are
    * key-partitioned windows; bucket totals (≤128 rows) take one tiny
    * driver-side-scale window; the final offset is base + local — one
    * broadcast join. DuckDB replays it as the single global window,
    * which is the semantic spec the two-level plan must (and does)
    * reproduce exactly. */
  def sequencePack(s: SparkSession, dir: String,
                   seqLen: Int = 512): DataFrame =
    tokenOffsets(s, dir)
      // integral DIV, not floor(float/): exact at any corpus size
      .withColumn("seq_first", expr(s"start_off DIV $seqLen"))
      .withColumn("seq_last",
        when(col("n_tokens") > 0,
          expr(s"(start_off + n_tokens - 1) DIV $seqLen"))
          .otherwise(expr(s"start_off DIV $seqLen")))
      .withColumn("n_seqs",
        when(col("n_tokens") > 0,
          col("seq_last") - col("seq_first") + 1L).otherwise(0L))
      .select(col("doc_id"), col("n_tokens"), col("start_off"),
        col("seq_first"), col("seq_last"), col("n_seqs"))
      .orderBy("doc_id")

  /** (doc_id, n_tokens, start_off): the corpus-wide token prefix sum
    * in deterministic hash order — the two-level spelling (128
    * order-preserving hash buckets: in-bucket window + a ≤128-row
    * broadcast base-offset relation, never a global single-partition
    * window) factored out of q112 so sequence packing and shard
    * export share ONE offset definition. */
  private def tokenOffsets(s: SparkSession, dir: String): DataFrame = {
    import graft.dedup.Md5Prefix
    val docs = Tables.load(s, dir, "documents")
      // null text packs as 0 tokens — without the coalesce a null
      // n_tokens nulls the whole running offset downstream of it
      .select(col("doc_id"),
        coalesce(size(Tokens.whitespace(col("text"))).cast("long"),
          lit(0L)).as("n_tokens"),
        Md5Prefix.h(col("doc_id").cast("string")).as("h"))
      // h ∈ [0, 2⁶⁰): the top 7 bits give 128 order-preserving buckets
      .withColumn("bkt", shiftright(col("h"), 53))
    val wIn = Window.partitionBy(col("bkt")).orderBy(col("h"), col("doc_id"))
    val local = docs.withColumn("cum", sum(col("n_tokens")).over(wIn))
    // ≤128 rows: the one intentionally-unpartitioned window
    val wB = Window.orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = docs.groupBy(col("bkt"))
      .agg(sum(col("n_tokens")).as("tot"))
      .withColumn("base", coalesce(sum(col("tot")).over(wB), lit(0L)))
      .select(col("bkt"), col("base"))
    local.join(broadcast(prefix), "bkt")
      .withColumn("start_off", col("base") + col("cum") - col("n_tokens"))
      .select(col("doc_id"), col("n_tokens"), col("start_off"))
  }

  /** Shard count of the q158 manifest — shared with its oracle SQL. */
  val NShards = 32

  /** q162: top collocations by integer PMI — pointwise mutual
    * information log₂(p(xy)/(p(x)p(y))) scored in the q151 bits
    * discipline (`length(bin(n))` = ⌊log₂ n⌋+1 on both engines):
    * pmi_bits = bits(c_xy) + 2·bits(T) − bits(T₂) − bits(c_x) −
    * bits(c_y), within a few bits of true PMI with zero libm
    * dependence — the collocation/phrase-mining signal (tokenizer
    * vocab candidates, multi-word expressions) every corpus pipeline
    * computes, made hash-gateable. Min support c_xy ≥ 5 cuts the
    * hapax noise PMI is notorious for; top 50 under a TOTAL order
    * (pmi_bits desc, bigram asc) so LIMIT is deterministic.
    *
    * Scale shape: one pass from the span-tokens zone → bigram
    * partial-agg counts; unigram model joins are token-keyed and
    * vocab-bounded (unhinted — the q151 discipline); totals ride
    * 1-row cross joins; top-50 is a TakeOrdered, no global sort
    * materialization. */
  def pmiCollocations(s: SparkSession, dir: String,
                      minSupport: Int = 5, topK: Int = 50): DataFrame = {
    val docs = graft.util.Scratch.memo(s, "span-tokens",
      s"span-tokens:$dir")(
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), Tokens.whitespace(col("text")).as("w")))
    val uni = docs.select(explode(col("w")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
    val tt = uni.agg(sum(col("c")).as("t_total"))
    val bg = docs.where(size(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(w) - 2), " +
          "i -> struct(w[i] AS x, w[i + 1] AS y))")).as("b"))
      .select(col("b.x").as("x"), col("b.y").as("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("cxy"))
    val t2 = bg.agg(sum(col("cxy")).as("t2_total"))
    bg.where(col("cxy") >= minSupport)
      .join(uni.select(col("t").as("x"), col("c").as("cx")), "x")
      .join(uni.select(col("t").as("y"), col("c").as("cy")), "y")
      .crossJoin(broadcast(tt)).crossJoin(broadcast(t2))
      .select(concat_ws(" ", col("x"), col("y")).as("bigram"),
        col("cxy"), col("cx"), col("cy"),
        (length(bin(col("cxy"))) + lit(2) * length(bin(col("t_total")))
          - length(bin(col("t2_total"))) - length(bin(col("cx")))
          - length(bin(col("cy")))).cast("long").as("pmi_bits"))
      .orderBy(col("pmi_bits").desc, col("bigram"))
      .limit(topK)
  }

  /** q159: exact per-source token-length quantiles (p25/p50/p75/p95 +
    * max) — the length-distribution panel of a curation scorecard
    * (padding budgets, truncation thresholds and packing efficiency
    * all read these). EXACT, not approximate, and float-free: the
    * classic value-histogram method — (source, length) counts, a
    * running count over the TINY post-agg relation (distinct lengths
    * per source, not documents), and quantile q = the smallest length
    * whose running count reaches ⌈q·n⌉ (integer ceil-division) —
    * valid precisely because token lengths have a bounded domain,
    * which is the training-data case. Interpolating percentile
    * functions were rejected on cross-engine grounds: engines
    * disagree on the interpolation spelling's rounding; rank
    * selection has no floats to disagree on.
    *
    * Scale shape: one corpus scan → (source, length) partial agg; the
    * only window runs over the histogram (≤ sources × max-length
    * rows), never the corpus. */
  def lengthQuantiles(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
      .select(col("source"),
        coalesce(size(Tokens.whitespace(col("text"))).cast("long"),
          lit(0L)).as("n"))
    val counts = docs.groupBy(col("source"), col("n"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("source")).orderBy(col("n"))
    val cum = counts.withColumn("cum", sum(col("c")).over(w))
    val tot = counts.groupBy(col("source")).agg(sum(col("c")).as("tot"))
    def q(pct: Int): org.apache.spark.sql.Column =
      min(when(col("cum") >= expr(s"(tot * $pct + 99) DIV 100"), col("n")))
    cum.join(tot, "source")
      .groupBy(col("source"), col("tot"))
      .agg(q(25).as("p25"), q(50).as("p50"), q(75).as("p75"),
        q(95).as("p95"), max(col("n")).as("max_tokens"))
      .select(col("source"), col("tot").as("n_docs"), col("p25"),
        col("p50"), col("p75"), col("p95"), col("max_tokens"))
      .orderBy("source")
  }

  /** q158: token-balanced export-shard manifest — the write side of a
    * curation pipeline: cut the corpus (in the same deterministic
    * hash order q112 packs by) into [[NShards]] CONTIGUOUS token
    * ranges, `shard = start_off·N DIV total`, so every shard carries
    * total/N tokens to within one document — the property that makes
    * downstream training readers stream equal-sized files. Per-shard
    * row: doc/token counts and the token interval. All-integer (one
    * multiply, one DIV); the `least` guard pins a trailing zero-token
    * document into the last shard.
    *
    * Scale shape: [[tokenOffsets]]'s two-level prefix sum (no global
    * window), a 1-row total broadcast, and a [[NShards]]-key rollup.
    * The assignment column — not materialized here — is what a real
    * export would partitionBy-write; the manifest is the audit
    * artifact. */
  def shardManifest(s: SparkSession, dir: String): DataFrame = {
    val off = tokenOffsets(s, dir)
    val total = off.agg(sum(col("n_tokens")).as("tot"))
    off.crossJoin(broadcast(total))
      .withColumn("shard_id",
        expr(s"least((start_off * $NShards) DIV tot, ${NShards - 1})"))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col("start_off")).as("first_off"),
        max(col("start_off") + col("n_tokens")).as("end_off"))
      .orderBy("shard_id")
  }

  /** q116: length-bucketed batch assignment — group documents of
    * similar token length into fixed-size batches so per-batch padding
    * (to the batch max) is small: the standard batching step before
    * tokenized training/inference, where padding waste is compute
    * waste. Docs land in `bucketWidth`-token length buckets; within a
    * bucket they are ranked in deterministic hash order and cut into
    * `batchSize`-doc batches; `pad` reports each doc's padding to its
    * batch max — the waste metric the bucketing exists to minimize.
    *
    * Scale shape: a plain per-length-bucket rank would put one task
    * per length bucket (there are only ~max_len/width of them — heavy
    * skew at corpus scale), so the rank uses the q112 two-level
    * pattern INSIDE each length bucket: hash high-bits split every
    * length bucket into 128 order-preserving sub-buckets, in-sub
    * window ranks run key-partitioned, sub-bucket counts (≤128 rows
    * per length bucket) take a tiny per-bucket window, and the final
    * rank is base + local after a broadcast join. The padding window
    * partitions by (bucket, batch_no) — fine-grained, skew-free. */
  def lengthBatches(s: SparkSession, dir: String, bucketWidth: Int = 32,
                    batchSize: Int = 16): DataFrame = {
    import graft.dedup.Md5Prefix
    val docs = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        coalesce(size(Tokens.whitespace(col("text"))).cast("long"),
          lit(0L)).as("n_tokens"),
        Md5Prefix.h(col("doc_id").cast("string")).as("h"))
      .withColumn("bucket", expr(s"n_tokens DIV $bucketWidth"))
      .withColumn("sub", shiftright(col("h"), 53))
    val wIn = Window.partitionBy(col("bucket"), col("sub"))
      .orderBy(col("h"), col("doc_id"))
    val local = docs.withColumn("lrn",
      row_number().over(wIn).cast("long"))
    val wSub = Window.partitionBy(col("bucket")).orderBy(col("sub"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = docs.groupBy(col("bucket"), col("sub"))
      .agg(count(lit(1)).as("c"))
      .withColumn("base", coalesce(sum(col("c")).over(wSub), lit(0L)))
      .select(col("bucket"), col("sub"), col("base"))
    val ranked = local.join(broadcast(prefix), Seq("bucket", "sub"))
      .withColumn("rn", col("base") + col("lrn"))
      .withColumn("batch_no", expr(s"(rn - 1) DIV $batchSize"))
    val wBatch = Window.partitionBy(col("bucket"), col("batch_no"))
    ranked
      .withColumn("pad",
        max(col("n_tokens")).over(wBatch) - col("n_tokens"))
      .select(col("doc_id"), col("n_tokens"), col("bucket"),
        col("batch_no"), col("pad"))
      .orderBy("doc_id")
  }

  /** q110: per-source scorecard — the one-page summary a curation run
    * reports per provenance: volume, exact-dup rate, and size stats.
    * One scan, one aggregation (a single DISTINCT aggregate alongside
    * plain ones is the two-phase plan, no Expand); ratios are exact
    * int/int divisions. The decision artifact that drives the q103
    * quota and q31-style quality thresholds. */
  def sourceScorecard(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("source"), md5(col("text")).as("h"),
        size(Tokens.whitespace(col("text"))).as("nt"),
        length(col("text")).as("nc"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("h")).as("distinct_texts"),
        sum(col("nt")).as("total_tokens"),
        sum(col("nc")).as("total_chars"))
      .select(col("source"), col("n_docs"), col("distinct_texts"),
        ((col("n_docs") - col("distinct_texts")) / col("n_docs"))
          .as("dup_ratio"),
        (col("total_tokens") / col("n_docs")).as("avg_tokens"),
        (col("total_chars") / col("n_docs")).as("avg_chars"))
      .orderBy("source")

  /** q111: vocabulary coverage — rank the corpus vocabulary by
    * frequency (deterministic: freq DESC, token ASC), take the top
    * `vocabSize` as the "tokenizer vocab", and score every document's
    * out-of-vocabulary token rate. The coverage analysis run before
    * committing to a tokenizer: a corpus slice with high OOV under
    * the candidate vocab will fragment into byte-fallback tokens.
    *
    * Scale shape: everything downstream of the one explode runs on
    * the (doc, token, tf) POSTINGS relation, not the token stream —
    * vocab = postings re-aggregated by token + global top-K (tiny,
    * broadcast); per-doc scoring = postings probed against the
    * broadcast vocab with tf-weighted sums, so the probe shuffles
    * distinct doc-token pairs instead of every occurrence (the q104
    * pattern; at 100 TB the postings relation is checkpointed once
    * instead of recomputed per branch). The OOV ratio is one exact
    * int/int division. */
  def vocabCoverage(s: SparkSession, dir: String,
                    vocabSize: Int = 1000): DataFrame = {
    val tf = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        explode(Tokens.whitespace(lower(col("text")))).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val vocab = tf.groupBy(col("tok")).agg(sum(col("tf")).as("freq"))
      .orderBy(col("freq").desc, col("tok"))
      .limit(vocabSize)
      .select(col("tok"), lit(1).as("in_vocab"))
    tf.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"),
        sum(when(col("in_vocab").isNull, col("tf")).otherwise(0L))
          .as("n_oov"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        (col("n_oov") / col("n_tokens")).as("oov_ratio"))
      .orderBy("doc_id")
  }

  /** q133: frequent-items sketch with an in-result guarantee witness
    * — completes the approx-sketch family (q84's HLL++ and quantile
    * sketches): [[graft.functions.MisraGries]] is a single-pass
    * k-counter heavy-hitter sketch whose CONTRACT is no false
    * negatives (every item with frequency > n/supportDen is in the
    * summary; false positives allowed). The query emits exactly the
    * provable part: one row per TRUE heavy hitter (exact count) with
    * `captured` = sketch-membership — which the oracle pins to literal
    * TRUE, so a sketch that ever dropped a real heavy hitter fails the
    * hash gate. The candidate LIST itself is partitioning-dependent
    * (merge order) and deliberately not emitted.
    *
    * One corpus scan, fully lazy: the sketch is a typed Aggregator
    * riding partial aggregation (unlike `stat.freqItems`, which runs
    * an eager driver-side `rdd.aggregate` at CALL time — the old
    * spelling double-counted the scan before any action). Its weighted
    * updates consume the exact (token, cnt) relation the witness needs
    * anyway — a legal weighted stream with the same bound — so exact,
    * total, and sketch all hang off ONE tokenize shuffle, which
    * exchange reuse dedups (plan-pinned in PlanAuditSpec). */
  def freqItemsWitness(s: SparkSession, dir: String,
                       supportDen: Int = 50): DataFrame = {
    val toks = Tables.load(s, dir, "documents")
      .select(explode(Tokens.whitespace(lower(col("text")))).as("t"))
    val exact = toks.groupBy(col("t")).agg(count(lit(1)).as("cnt"))
    // n re-aggregates the tiny token-count relation — a toks.count()
    // spelling would be a second corpus tokenize-scan
    val tot = exact.agg(sum(col("cnt")).as("n"))
    val mg = udaf(new graft.functions.MisraGries(supportDen),
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong))
    val cand = exact.agg(mg(col("t"), col("cnt")).as("cand"))
    exact.crossJoin(broadcast(tot)).crossJoin(broadcast(cand))
      .where(col("cnt") * supportDen > col("n"))
      .select(col("t").as("token"), col("cnt"),
        array_contains(col("cand"), col("t")).as("captured"))
      .orderBy("token")
  }

  /** q140: duplicated n-gram fraction — the Gopher/RefinedWeb quality
    * rule q89 does NOT cover: q89 scores repetition WITHIN a document;
    * this scores each document by the fraction of its 5-gram
    * occurrences that also appear in ANOTHER document (boilerplate,
    * templated pages, licence headers). A gram repeated only inside
    * one doc is not "duplicated" here (`countDistinct(doc_id) > 1`) —
    * the two signals are deliberately orthogonal.
    *
    * Scale shape: one corpus scan → gram explode → one (gram →
    * distinct-doc count) aggregate → one key-partitioned join back →
    * per-doc aggregate; the single double division at the end (q106
    * discipline). Hot grams (stop-phrase n-grams) spread across the
    * gram-key shuffle; no per-doc state exceeds document size. */
  def dupGramFraction(s: SparkSession, dir: String,
                      n: Int = 5): DataFrame = {
    // grams hash to 8 bytes map-side (Md5Prefix, oracle-replayed —
    // the q145/q149 discipline): both the distinct-doc aggregate and
    // the join back key on the hash, never the 5-gram string.
    // r14: the hashes come pre-computed from the shared span-grams
    // zone — this relation feeds TWO branches (the distinct-doc
    // aggregate and the join back), and deriving it inline ran the
    // explode+hash CPU once per branch on the single-row-group scan
    // task (measured 0.67 + 0.52 s serial at sf0.1). Short docs keep
    // ngramsOf's whole-doc fallback gram via the explicit union (the
    // zone stores only the sliding-window regime, q145's guard).
    val docsZone = spanTokens(s, dir)
    val short = docsZone.where(size(col("w")) < n)
      .select(col("doc_id"),
        graft.dedup.Md5Prefix.h(concat_ws(" ", col("w"))).as("g"))
    val grams = spanGramZone(s, dir, n)
      .select(col("doc_id"), col("gh").as("g"))
      .unionByName(short)
    val shared = grams.groupBy(col("g"))
      .agg(countDistinct(col("doc_id")).as("nd"))
    grams.join(shared, "g")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_dup"))
      .select(col("doc_id"), col("n_grams"), col("n_dup"),
        (col("n_dup") / col("n_grams")).as("dup_fraction"))
      .orderBy("doc_id")
  }

  /** q145: EXACT duplicated-span scrub (Lee et al., "Deduplicating
    * Training Data Makes Language Models Better") — remove every
    * token whose position is covered by a k-gram that occurs verbatim
    * in ANOTHER document, and reassemble the survivors. Sharper than
    * q113's content-defined chunks (exact gram coverage, token
    * resolution: a shared sentence disappears even when chunk
    * boundaries straddle it) and destructive where q140 only scores.
    * A token at position p is covered iff any of the k grams starting
    * at p−k+1..p is cross-doc shared — spelled as coverage-interval
    * explode here and replayed in DuckDB as the same expansion.
    *
    * Scale shape: the tokenized (doc_id, w) relation is stored ONCE
    * to the parquet scratch zone ([[graft.util.Scratch]], the
    * q117/q106 discipline) — the gram, token, and doc-length branches
    * all scan the zone, never the corpus (plan-pinned in
    * PlanAuditSpec). Grams hash to 8 bytes ([[graft.dedup.Md5Prefix]],
    * the q87 discipline) before the corpus-wide (gram →
    * distinct-doc-count) aggregate; shared-gram occurrences explode
    * k coverage positions each (k× a vanishing fraction — only
    * SHARED occurrences expand); survivors reassemble per doc via
    * the bounded collect_list-sort (q113's invariant). */
  /** The tokenized corpus zone + cross-doc-covered positions shared
    * by q145 (scrub) and q269 (span report): (docs, covered) where
    * covered = DISTINCT (doc_id, pos) for every token position inside
    * a k-gram that occurs verbatim in ANOTHER document. */
  /** The shared span-tokens scratch zone (one tokenization per
    * application — the q145/q151 discipline). */
  private def spanTokens(s: SparkSession, dir: String): DataFrame =
    graft.util.Scratch.memo(s, "span-tokens",
      s"span-tokens:$dir")(
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), Tokens.whitespace(col("text")).as("w")))

  /** Positioned k-gram hashes (doc_id, p, gh) over the span-tokens
    * zone, materialized ONCE per (dir, k) (r14): every caller
    * (q145's scrub, q269's report, q140's fraction) consumes the
    * gram relation from TWO plan branches — the corpus-wide shared
    * aggregate and the join back — and deriving it inline ran the
    * posexplode + per-gram md5 (the family's whole CPU) once per
    * branch, serially, on the zone's single-row-group scan task
    * (measured 1.15 + 0.78 s at sf0.1 in q145 alone). The build
    * spreads to the derived width first (Sessions.spreadScan);
    * consumers scan 3 fixed-width columns. The size ≥ k guard keeps
    * Tokens.ngramsOf in its sliding-window branch only — short docs
    * have NO rows here (the whole-doc fallback would fabricate one);
    * callers that NEED the fallback add it explicitly (q140). */
  private[text] def spanGramZone(s: SparkSession, dir: String,
                                 k: Int): DataFrame =
    graft.util.Scratch.memo(s, s"span-grams-$k",
      s"span-grams:$dir:$k")(
      graft.util.Sessions.spreadScan(s, dir, spanTokens(s, dir))
        .where(size(col("w")) >= k)
        .select(col("doc_id"),
          posexplode(Tokens.ngramsOf(col("w"), k)).as(Seq("p", "g")))
        .select(col("doc_id"), col("p"),
          graft.dedup.Md5Prefix.h(col("g")).as("gh")))

  private def coveredPositions(s: SparkSession, dir: String,
                               k: Int): (DataFrame, DataFrame) = {
    val docs = spanTokens(s, dir)
    val grams = spanGramZone(s, dir, k)
    val shared = grams.groupBy(col("gh"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .where(col("nd") > 1)
      .select(col("gh"))
    val covered = grams.join(shared, "gh")
      .select(col("doc_id"),
        explode(sequence(col("p"), col("p") + lit(k - 1))).as("pos"))
      .distinct()
    (docs, covered)
  }

  def exactSpanScrub(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val (docs, covered) = coveredPositions(s, dir, k)
    val tokens = docs
      .select(col("doc_id"), posexplode(col("w")).as(Seq("pos", "tok")))
    val kept = tokens
      .join(covered, Seq("doc_id", "pos"), "left_anti")
    docs.select(col("doc_id"), size(col("w")).as("n_tokens"))
      .join(kept.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_kept"),
            array_join(transform(array_sort(collect_list(
              struct(col("pos"), col("tok")))),
              x => x.getField("tok")), " ").as("cleaned_text")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L)))
          .as("n_scrubbed"),
        coalesce(col("cleaned_text"), lit("")).as("cleaned_text"))
      .orderBy("doc_id")
  }

  /** q269: duplicated-span INVENTORY — the diagnostic report q145's
    * scrub destroys on its way out: every MAXIMAL run of cross-doc-
    * duplicated token positions per document, as (doc, start, end,
    * length). This is what a curation engineer reads before turning
    * the scrub on — where the boilerplate lives, how long the shared
    * license headers are, which docs are near-total duplication —
    * and it is exactly the "duplicate span" unit of Lee et al. 2021
    * (§3: maximal repeated substrings), relational edition.
    *
    * Scale shape: the q145 coverage chain verbatim (shared span-
    * tokens zone, 8-byte gram hashes, only SHARED occurrences
    * explode), then gaps-and-islands per document — one doc-keyed
    * window whose partition is bounded by document length (the q218
    * SCD2 island idiom applied to token positions). */
  def dupSpanReport(s: SparkSession, dir: String,
                    k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (_, covered) = coveredPositions(s, dir, k)
    val win = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    covered
      .withColumn("grp", col("pos") - row_number().over(win))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).cast("long").as("span_start"),
        max(col("pos")).cast("long").as("span_end"),
        count(lit(1)).as("span_len"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        col("span_len"))
      .orderBy("doc_id", "span_start")
  }

  /** Minimum duplicated-substring length (tokens) and the reported-
    * length cap of [[dupSubstrings]] — shared by the Spark path, the
    * brute-force oracle and CorpusStatsSpec. The cap is the Lee et
    * al. 2021 move (their §4 threshold is 50 BPE tokens ≈ one
    * sentence): spans longer than the window still surface — as
    * window-length substrings with their full occurrence counts —
    * while the suffix keys stay bounded (window tokens per row, the
    * quantity the sort shuffles). */
  val DupSubMinLen = 5
  val DupSubWindow = 32

  /** q313: corpus-wide EXACT duplicate-substring finder for UNKNOWN
    * spans — the suffix-array construction of the training-data-dedup
    * literature (Lee et al. 2021, "Deduplicating Training Data Makes
    * Language Models Better", §4), relational edition. q140 SCORES
    * per-doc duplicated-gram fractions and q145/q269 scrub/report
    * gram-COVERED positions, but none of them identifies the
    * duplicated substrings THEMSELVES; this does: for every token
    * position whose [[DupSubMinLen]]-gram occurs anywhere else in the
    * corpus (any doc INCLUDING its own — within-doc boilerplate
    * counts, unlike q140's cross-doc contract), the LONGEST
    * duplicated substring starting there (capped at
    * [[DupSubWindow]] tokens), grouped into the distinct-substring
    * inventory (sub, tok_len, n_starts, n_docs) a curation engineer
    * reads to see WHAT the boilerplate is — license headers,
    * templated pages, degenerate repeats — with corpus-wide counts,
    * longest first.
    *
    * Definition (= the brute-force oracle, replayed in DuckDB): for
    * position (d, p), tok_len = max m ∈ [minLen, min(window, tail)]
    * such that the m-gram at p occurs at ≥ 2 positions corpus-wide;
    * sub = those tok_len tokens; positions with no such m don't
    * report. n_starts counts positions whose maximal substring is
    * exactly `sub` (it can be 1: the OTHER occurrences of a shared
    * span may each extend further with different partners), but
    * every reported sub occurs ≥ 2 times by construction.
    *
    * Spark spelling — suffix sort + neighbor LCP, ONE range shuffle:
    * the classic suffix-array fact that the suffix sharing the
    * longest prefix with s is ADJACENT to s in sorted suffix order,
    * so tok_len(d, p) = max(lcp(prev), lcp(next)) after one global
    * sort of the window-truncated suffixes. Doc boundaries are
    * structural (suffixes never cross documents). The sort is
    * `repartitionByRange` + partition-local sort — Spark's own
    * global-orderBy shape, no single-node stage; the suffix relation
    * is re-keyed at the expansion point (the round-9 find-#2 rule:
    * ~window× the tokenized corpus bytes, so the partition dial
    * multiplies by window/4 over the bytes-derived count, capped at
    * 4096). Adjacent-LCP then needs NO self-join and NO ids: each
    * partition streams its sorted run once with one-row lookahead,
    * and the two boundary comparisons per partition use the
    * first/last suffix keys collected in a prior pass — ≤ 2·numParts
    * keys of ≤ window tokens on the driver (bounded; the stableIds
    * precedent: per-partition imperative position logic is the one
    * sanctioned mapPartitions family, and everything before and
    * after stays declarative). Output is content-bounded (≤ one row
    * per DISTINCT duplicated substring — the find-#5 rule; the
    * quadratic all-pairs match relation is never formed).
    */
  /** THE one derivation of the window-truncated suffix relation over
    * a tokenized (doc_id, w) corpus — shared by [[dupSubstrings]] and
    * the incremental admission twin
    * ([[graft.streaming.SuffixMaint]]), so the two sides cannot drift
    * (the NearDupMaint/bandRows discipline). */
  private[graft] def suffixRows(docs: DataFrame, minLen: Int,
                                window: Int): DataFrame =
    docs.where(size(col("w")) >= minLen)
      .select(col("doc_id"), col("w"),
        explode(sequence(lit(0), size(col("w")) - minLen)).as("p"))
      .select(col("doc_id"), col("p"),
        slice(col("w"), col("p") + lit(1), lit(window)).as("key"))

  /** Token-wise longest common prefix; null-tolerant (no neighbor =
    * 0). Shared with [[graft.streaming.SuffixMaint]]. */
  private[graft] def lcpTokens(a: Array[String], b: Array[String]): Int = {
    if (a == null || b == null) return 0
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n && a(i) == b(i)) i += 1
    i
  }

  def dupSubstrings(s: SparkSession, dir: String,
                    minLen: Int = DupSubMinLen,
                    window: Int = DupSubWindow): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val docs = graft.util.Scratch.memo(s, "span-tokens",
      s"span-tokens:$dir")(
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), Tokens.whitespace(col("text")).as("w")))
    // one suffix row per position that can hold a minLen-gram; the
    // key is the window-truncated suffix (what the sort compares).
    // The zone is one parquet file = one scan task, and the explode
    // below materializes a window-token array slice PER POSITION —
    // this query's map-side CPU — which therefore ran on one core,
    // twice (the range partitioner's sampling job and the shuffle map
    // stage both evaluate it). Spread the doc rows to the derived
    // width first (Sessions.spreadScan: scale-guarded no-op once the
    // backing scan is parallel on its own).
    val sfx = suffixRows(
      graft.util.Sessions.spreadScan(s, dir, docs), minLen, window)
    val baseParts = s.conf.get("spark.sql.shuffle.partitions").toInt
    val parts = math.min(4096, baseParts * math.max(1, window / 4))
    // DataFrame-level persist of the SORTED suffix relation (r14):
    // the boundary-keys pass and the neighbor-LCP pass are two jobs
    // over the same range shuffle — uncached, the second job re-runs
    // the explode map stage's shuffle fetch AND the reduce-side sort,
    // and the range partitioner's sampling job evaluates the explode
    // a third time. Caching compact UnsafeRow bytes (NOT the decoded
    // Array[String] tuples — a Java-object RDD cache measured 2×
    // WORSE from allocation pressure) runs sampling+shuffle+sort once
    // and streams the rows twice. Intra-query reuse only; explicitly
    // unpersisted below once the final aggregate is materialized.
    val ranged = sfx
      .repartitionByRange(parts, col("key"), col("doc_id"), col("p"))
      .sortWithinPartitions("key", "doc_id", "p")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rdd = ranged.rdd.map(r =>
      (r.getLong(0), r.getInt(1), r.getSeq[String](2).toArray))
    def lcp(a: Array[String], b: Array[String]): Int = lcpTokens(a, b)
    // pass 1: per-partition (first, last) suffix keys — ≤ 2·numParts
    // keys of ≤ window tokens ever reach the driver (bounded)
    val bounds = rdd.mapPartitionsWithIndex { (i, it) =>
      if (!it.hasNext) Iterator.empty
      else {
        val first = it.next(); var last = first
        while (it.hasNext) last = it.next()
        Iterator.single((i, first._3, last._3))
      }
    }.collect().sortBy(_._1)
    // neighbor keys across (possibly empty) partition gaps
    val prevKey = Array.fill[Array[String]](parts)(null)
    val nextKey = Array.fill[Array[String]](parts)(null)
    var carry: Array[String] = null
    bounds.foreach { case (i, _, last) => prevKey(i) = carry; carry = last }
    carry = null
    bounds.reverse.foreach { case (i, first, _) =>
      nextKey(i) = carry; carry = first
    }
    val bc = s.sparkContext.broadcast((prevKey, nextKey))
    // pass 2 (same shuffle files, re-read): streaming neighbor LCP
    val hits = rdd.mapPartitionsWithIndex { (i, it) =>
      val (pk, nk) = bc.value
      val buf = it.buffered
      var prev: Array[String] = pk(i)
      val out = new Iterator[Row] {
        def hasNext: Boolean = buf.hasNext
        def next(): Row = {
          val (doc, _, k) = buf.next()
          val nxt = if (buf.hasNext) buf.head._3 else nk(i)
          val h = math.max(lcp(prev, k), lcp(k, nxt))
          prev = k
          if (h >= minLen)
            Row(k.take(h).mkString(" "), h.toLong, doc)
          else null
        }
      }
      out.filter(_ != null)
    }
    val schema = StructType(Seq(
      StructField("sub", StringType, nullable = false),
      StructField("tok_len", LongType, nullable = false),
      StructField("doc_id", LongType, nullable = false)))
    // Eagerly reduce to the (much smaller) aggregate while the suffix
    // cache is hot, then DROP the cache before returning: a DF-level
    // persist is registered in the session CacheManager and is NOT
    // freed by the ContextCleaner when the plan dies — left in place
    // it (a) squeezes execution memory for every later query in the
    // same session and (b) lets a plan-identical re-invocation
    // silently serve the cached sort instead of recomputing.
    // localCheckpoint blocks ARE RDD-level and GC-freed, and the
    // aggregate is the query's own output size. Only the final
    // orderBy stays lazy (deterministic, same rows either way).
    val agg = s.createDataFrame(hits, schema)
      .groupBy(col("sub"), col("tok_len"))
      .agg(count(lit(1)).as("n_starts"),
        countDistinct(col("doc_id")).as("n_docs"))
      .localCheckpoint(true)
    ranged.unpersist(false)
    agg.orderBy(col("tok_len").desc, col("sub"))
  }

  /** q149: within-document repetition filter — the Gopher/MassiveText
    * repetition rules (Rae et al. 2021 §A1.1) that catch boilerplate
    * and degenerate generations WHOLE-corpus dedup cannot see (a
    * document that repeats ITSELF is unique corpus-wide). Complements
    * q89's ratio signals (duplicate-bigram, adjacent-repeat) with the
    * CONCENTRATION rules — how much of the document the single most
    * frequent gram owns — plus a composite threshold verdict: fraction of
    * tokens in the single most frequent token, fraction of bigram
    * occurrences in the most frequent bigram, fraction of trigram
    * occurrences whose trigram repeats within the document. All
    * ranking keys are integer counts and each emitted fraction is ONE
    * int/int IEEE division (the module's float-free gate discipline),
    * so the flag thresholds compare bit-identical doubles on both
    * engines.
    *
    * Scale shape: unigram/bigram/trigram occurrences are built
    * MAP-SIDE into one tagged array per document (one corpus scan, one
    * explode — not three), each gram hashed to 8 bytes
    * ([[graft.dedup.Md5Prefix]], replayed in DuckDB — measured ~3×
    * less shuffle than shipping gram strings), then ONE shuffle on
    * (doc_id, n, gram-hash) with map-side partial counts; the per-doc
    * rollups re-key on doc_id prefixes of the same key, so nothing
    * exceeds document size and no corpus-wide state exists. Every doc
    * has ≥1 token in this corpus
    * (verified at all SFs), so the inner explode drops no documents;
    * a corpus with empty texts would left-join from `documents` and
    * coalesce counts to 0. */
  def repetitionFilter(s: SparkSession, dir: String): DataFrame = {
    import graft.dedup.Md5Prefix
    val w = col("w")
    val tagged = (n: Int, g: Column) =>
      transform(g, x => struct(lit(n).as("n"), Md5Prefix.h(x).as("g")))
    // r14: the gate corpus is one parquet row group = one scan task,
    // so the tokenize + 3×n-gram build + hash (this query's whole
    // CPU, measured 1.8 s serial at sf0.1) ran on one core. Spread
    // the raw rows to the derived width first (Sessions.spreadScan —
    // explicit-count repartition, exempt from AQE coalescing;
    // scale-guarded no-op once the scan itself is parallel).
    val grams = graft.util.Sessions.spreadScan(s, dir,
      Tables.load(s, dir, "documents").select(col("doc_id"), col("text")))
      .select(col("doc_id"), Tokens.whitespace(col("text")).as("w"))
      .select(col("doc_id"), explode(concat(
        tagged(1, w),
        tagged(2, Tokens.ngramsOf(w, 2)),
        tagged(3, Tokens.ngramsOf(w, 3)))).as("x"))
      .select(col("doc_id"), col("x.n").as("n"), col("x.g").as("g"))
    val perGram = grams.groupBy(col("doc_id"), col("n"), col("g"))
      .agg(count(lit(1)).as("c"))
    val perN = perGram.groupBy(col("doc_id"), col("n"))
      .agg(sum(col("c")).as("tot"), max(col("c")).as("mx"),
        coalesce(sum(when(col("c") > 1, col("c"))), lit(0L)).as("dup"))
    def pick(n: Int, c: Column): Column = max(when(col("n") === n, c))
    perN.groupBy(col("doc_id"))
      .agg(
        pick(1, col("tot")).as("n_tokens"),
        pick(1, col("mx")).as("top_token_count"),
        pick(2, col("tot")).as("n_bigrams"),
        pick(2, col("mx")).as("top_bigram_count"),
        pick(3, col("tot")).as("n_trigrams"),
        pick(3, col("dup")).as("dup_trigram_count"))
      .select(col("doc_id"), col("n_tokens"), col("top_token_count"),
        (col("top_token_count") / col("n_tokens")).as("top_token_frac"),
        col("n_bigrams"), col("top_bigram_count"),
        (col("top_bigram_count") / col("n_bigrams")).as("top_bigram_frac"),
        col("n_trigrams"), col("dup_trigram_count"),
        (col("dup_trigram_count") / col("n_trigrams"))
          .as("dup_trigram_frac"))
      .withColumn("flagged",
        col("top_token_frac") > 0.2 || col("top_bigram_frac") > 0.18 ||
          col("dup_trigram_frac") > 0.3)
      .orderBy("doc_id")
  }

  /** q151: integer-surprisal quality score — the CCNet-style
    * language-model perplexity filter re-expressed FLOAT-FREE (the
    * module's gate discipline): per-token surprisal under the corpus'
    * own unigram model is bits(T) − bits(c) — binary magnitude of the
    * corpus token total minus magnitude of the token's count — an
    * integer within ±1 bit of −log₂ p(token) that needs no libm call
    * on either engine (`length(bin(x))` both sides). Low mean-bits =
    * boilerplate made of the corpus' most common tokens; high = rare
    * or garbled vocabulary — the same two tails a KenLM filter cuts,
    * without hanging the cross-engine hash gate on transcendental ulp
    * agreement. The doc score is an exact integer sum (order-free)
    * plus ONE int/int division.
    *
    * Scale shape: the tokenized corpus comes from the SAME parquet
    * scratch zone q145 stores (one tokenization per application); the
    * unigram model is a token-keyed partial-agg count, the score join
    * re-keys on the token (vocab-bounded model side, deliberately
    * UNHINTED — broadcast is AQE's call below threshold, shuffle
    * above), and the corpus total rides a 1-row cross join. */
  def surprisalFilter(s: SparkSession, dir: String): DataFrame = {
    val toks = graft.util.Scratch.memo(s, "span-tokens",
      s"span-tokens:$dir")(
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), Tokens.whitespace(col("text")).as("w")))
      .select(col("doc_id"), explode(col("w")).as("tok"))
    val counts = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val total = counts.agg(sum(col("c")).as("t"))
    toks.join(counts, "tok")
      .crossJoin(broadcast(total))
      .select(col("doc_id"),
        (length(bin(col("t"))) - length(bin(col("c"))))
          .cast("long").as("bits"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("bits")).as("sum_bits"))
      .select(col("doc_id"), col("n_tokens"), col("sum_bits"),
        (col("sum_bits") / col("n_tokens")).as("mean_bits"))
      .orderBy("doc_id")
  }

  /** q154: hashed-feature linear quality classifier — the
    * fastText-shaped filter production curation stacks run (CCNet,
    * RefinedWeb: a linear model over hashed token features):
    * score(doc) = Σ_tokens w[h(token)], keep = score ≥ 0. The weight
    * table is hash-DERIVED — w = h(token) mod 2001 − 1000 ∈ [−1000,
    * 1000] under [[graft.dedup.Md5Prefix]]'s cross-engine 60-bit hash
    * — a deterministic stand-in for trained parameters carrying the
    * REAL plumbing: the per-token weight lookup is pure map-side
    * column math (no weight relation, no join, no UDF — hashing-trick
    * models need no vocabulary side at all), the per-doc reduce is a
    * partial-agg integer sum, and a trained model swaps in as a
    * broadcast (bucket → weight) lookup without changing the shape.
    * Integer score and verdict; ONE double division for the mean.
    *
    * Scale shape: tokens stream from the shared span-tokens scratch
    * zone (one tokenization per application — the q145/q151
    * discipline); everything before the doc-keyed partial agg is
    * map-side, so the only shuffle is the 2-long-column doc rollup. */
  def linearQuality(s: SparkSession, dir: String): DataFrame = {
    import graft.dedup.Md5Prefix
    val toks = graft.util.Scratch.memo(s, "span-tokens",
      s"span-tokens:$dir")(
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), Tokens.whitespace(col("text")).as("w")))
      .select(col("doc_id"), explode(col("w")).as("tok"))
    toks
      .select(col("doc_id"),
        (Md5Prefix.h(col("tok")) % 2001 - 1000).as("wt"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("wt")).as("w_sum"))
      .select(col("doc_id"), col("n_tokens"), col("w_sum"),
        (col("w_sum") / col("n_tokens")).as("mean_w"),
        (col("w_sum") >= 0).as("keep"))
      .orderBy("doc_id")
  }

  /** q150: keep-FIRST shared-chunk scrub — the C4-production variant
    * of q113: where q113 drops EVERY occurrence of a cross-doc shared
    * chunk (the content vanishes from the corpus entirely), this keeps
    * the globally first occurrence — min (doc_id, chunk index) — and
    * scrubs only the later repeats, so exactly one copy of every
    * distinct chunk survives. Also catches WITHIN-doc chunk repeats
    * (same chunk twice in one doc: q113's ndocs=1 test keeps both;
    * here the second is a repeat and drops).
    *
    * Scale shape: identical to q113 up to the survivor rule — the
    * chunk relation comes from the shared parquet scratch zone
    * ([[chunkZone]]), the survivor per fingerprint is a groupBy-MIN
    * (map-side partial min — a mass-duplicated chunk's million
    * occurrences reduce inside their partitions; the deliberate
    * NON-window spelling, same skew argument as connectedComponents'
    * groupBy-min), one key-partitioned join back, and the bounded
    * per-doc collect_list reassembly. */
  def keepFirstScrub(s: SparkSession, dir: String): DataFrame = {
    val ch = chunkZone(s, dir)
    val surv = ch.groupBy(col("chunk_hash"))
      .agg(min(struct(col("doc_id"), col("j"))).as("sv"))
    ch.join(surv, "chunk_hash")
      .withColumn("kept",
        col("doc_id") === col("sv.doc_id") && col("j") === col("sv.j"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(!col("kept"), 1L).otherwise(0L)).as("n_dropped"),
        sum(when(col("kept"), col("ctoks")).otherwise(0L))
          .as("n_tokens_kept"),
        // collect_list skips the when()'s nulls; array_sort orders by
        // j (unique per doc) — q113's deterministic reassembly idiom
        array_join(transform(array_sort(collect_list(
          when(col("kept"), struct(col("j"), col("ctext"))))),
          x => x.getField("ctext")), " ").as("cleaned_text"))
      .orderBy("doc_id")
  }

  /** q153: inverse-cloze positive pairs — the training-pair extraction
    * for contrastive embedding models (ICT, Lee et al. 2019; the
    * unsupervised recipe Contriever-class retrievers start from):
    * adjacent CDC chunks of the same document form (anchor, positive)
    * pairs — "nearby spans are semantically related" — the positive
    * counterpart of q148's hard negatives. Documents with a single
    * chunk emit nothing.
    *
    * Scale shape: a self-join of the chunk zone on
    * (doc_id, j → j+1) — co-partitioned on the doc, bounded by
    * document size, reading the SAME stored chunk relation as
    * q106/q113/q150 (no corpus re-scan, no re-chunking). */
  def ictPairs(s: SparkSession, dir: String): DataFrame = {
    val ch = chunkZone(s, dir)
    ch.as("a").join(ch.as("b"),
        col("a.doc_id") === col("b.doc_id") &&
          col("a.j") + 1 === col("b.j"))
      .select(col("a.doc_id").as("doc_id"), col("a.j").as("j"),
        col("a.ctext").as("anchor"), col("b.ctext").as("positive"))
      .orderBy("doc_id", "j")
  }

  /** Hashed-feature bucket count of [[dsirWeights]] — shared with its
    * oracle SQL. */
  val DsirBuckets = 4096

  /** Fixed-point log₂ with 16 fractional bits — the q151 bits trick
    * sharpened for operators where the RATIO being scored sits inside
    * one octave (DSIR's target/raw bucket ratios hover around the
    * corpus' target fraction, so ⌊log₂⌋ granularity quantizes every
    * weight to 0): ilog₂(x) ≈ b·2¹⁶ + (x·2¹⁶ >> b) − 2¹⁶ with
    * b = ⌊log₂ x⌋ — the classic leading-bit + linear-interpolation
    * approximation (max error ≈ 0.086 bits), in PURE integer ops both
    * engines share (`length(bin())`, shift, multiply). Valid for
    * x ≥ 1; x·2¹⁶ stays inside BIGINT for x up to 2⁴⁶ ≈ 7·10¹³ —
    * above any per-bucket token count a 100 TB corpus produces. */
  private def ilogFp(xSql: String): Column = expr(
    s"CAST((length(bin($xSql)) - 1) * 65536 + " +
      s"shiftright(($xSql) * 65536, length(bin($xSql)) - 1) - 65536 " +
      s"AS BIGINT)")

  /** DuckDB spelling of [[ilogFp]] (same algebra, `>>` shift). */
  private def ilogFpSql(x: String): String =
    s"(length(bin($x)) - 1) * 65536 + ((($x) * 65536) >> (length(bin($x)) - 1)) - 65536"

  /** q171: DSIR-style importance weights — the data-selection recipe
    * of Xie et al. 2023 ("Data Selection for Language Models via
    * Importance Resampling"): estimate target and raw feature
    * distributions over HASHED n-gram buckets, weight every document
    * by how much more likely its features are under the target, keep
    * the heaviest. Target slice here = the `lang='en'` documents (the
    * stand-in for "looks like wikipedia/books"); features = unigram
    * tokens hashed into [[DsirBuckets]] buckets ([[graft.dedup.Md5Prefix]]
    * — the q154 hashing-trick discipline: no vocabulary relation at
    * all, the model is a BOUNDED 4096-row table no matter the corpus
    * size). Per-token log-ratio log₂(p_target/p_raw) is scored with
    * add-one smoothing in Q16 fixed point via [[ilogFp]]:
    * ilog(tc+1) − ilog(rc+1) + ilog(R) − ilog(T) — pure-integer,
    * within ~0.35 bits of the true ratio, zero libm (the q151 bits
    * trick alone is too coarse here: bucket ratios sit inside one
    * octave of the corpus' target fraction and every ⌊log₂⌋ weight
    * quantizes to 0 — measured). Selection: the top quarter
    * by weight via the q159 value-histogram cutoff (p75 over the
    * iw_bits histogram), NOT a global row_number — the window runs
    * over the histogram (distinct weight values), never the corpus.
    *
    * Scale shape: one pass from the span-tokens zone; the per-bucket
    * model is a partial-agg count whose key domain is FIXED at 4096
    * rows (hint-free join back — AQE will broadcast it at any scale);
    * totals ride 1-row cross joins; the selection threshold is a
    * histogram scan. Nothing grows faster than the corpus. */
  def dsirWeights(s: SparkSession, dir: String): DataFrame = {
    import graft.dedup.Md5Prefix
    val zone = graft.util.Scratch.memo(s, "span-tokens",
      s"span-tokens:$dir")(
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), Tokens.whitespace(col("text")).as("w")))
    val langs = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("lang"))
    val b = zone.join(langs, "doc_id")
      .select(col("doc_id"), col("lang"), explode(col("w")).as("tok"))
      .select(col("doc_id"), col("lang"),
        (Md5Prefix.h(col("tok")) % DsirBuckets).as("bk"))
    val m = b.groupBy(col("bk")).agg(
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("tc"),
      count(lit(1)).as("rc"))
    val t = m.agg(sum(col("tc")).as("tt"), sum(col("rc")).as("rt"))
    // the per-doc weight relation is consumed THREE times (cutoff
    // histogram, doc count, output join) — memoized to the scratch
    // zone per the ≥3-consumer materialize rule, or the whole
    // tokenize→bucket→score subtree replans per consumer
    val doc = graft.util.Scratch.memo(s, "dsir-doc",
      s"dsir-doc:$dir:$DsirBuckets")(
      b.join(m, "bk")
        .crossJoin(broadcast(t))
        .select(col("doc_id"),
          (ilogFp("tc + 1") - ilogFp("rc + 1") +
            ilogFp("rt") - ilogFp("tt")).as("wt"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"), sum(col("wt")).as("iw_q16"))
        // cutoff domain: WHOLE bits (arithmetic shift = floor-by-2¹⁶,
        // identical for negatives on both engines) — Q16 doc weights
        // are near-unique, so the q159 histogram must run over the
        // coarsened domain (bounded by max-doc-bits, corpus-size-free)
        // or the cutoff window would be corpus-sized
        .withColumn("cw", shiftright(col("iw_q16"), 16)))
    val h = doc.groupBy(col("cw").as("v"))
      .agg(count(lit(1)).as("c"))
    val hc = h.withColumn("cum",
      sum(col("c")).over(Window.orderBy(col("v"))))
    val n = doc.agg(count(lit(1)).as("n"))
    val thr = hc.crossJoin(broadcast(n))
      .agg(min(when(col("cum") >= expr("(n * 75 + 99) div 100"),
        col("v"))).as("p75"))
    doc.crossJoin(broadcast(thr))
      .select(col("doc_id"), col("n_tokens"), col("iw_q16"),
        (col("cw") >= col("p75")).as("selected"))
      .orderBy("doc_id")
  }

  /** q172: bigram language-model scoring — the KenLM/CCNet perplexity
    * filter proper (where q151 scores under a UNIGRAM model and q105
    * proxies novelty, this conditions on context): train add-one
    * smoothed bigram counts on a reference slice (`lang='en'` — the
    * "clean" corpus CCNet trains KenLM on), then score EVERY document
    * by its mean conditional surprisal. Per bigram (x,y):
    * bits(c(x)+V) − bits(c(x,y)+1) ≈ −log₂ p̂(y|x), integer (the q151
    * bits discipline); V = continuation-type count of the reference
    * model (the add-one denominator). Unseen context ⇒ c(x)=0 and the
    * score degrades to bits(V) — the uniform-model fallback, exactly
    * what add-one smoothing means. Low mean = fluent under the
    * reference model; high = off-language or garbled — the CCNet
    * head/middle/tail signal, hash-gateable because no float ever
    * enters the ranking.
    *
    * Scale shape: bigrams stream from the span-tokens zone (no
    * re-tokenization); model counts are bigram-keyed partial aggs
    * over the REFERENCE slice only; score joins are (x,y)- and
    * x-keyed and UNHINTED (the model is corpus-growing — AQE
    * broadcasts small, shuffles large: the q151 discipline); V rides
    * a 1-row cross join; the per-doc reduce is one integer rollup. */
  def bigramLm(s: SparkSession, dir: String): DataFrame = {
    val zone = graft.util.Scratch.memo(s, "span-tokens",
      s"span-tokens:$dir")(
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), Tokens.whitespace(col("text")).as("w")))
    val langs = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("lang"))
    val bg = zone.join(langs, "doc_id")
      .where(size(col("w")) >= 2)
      .select(col("doc_id"), col("lang"), explode(expr(
        "transform(sequence(0, size(w) - 2), " +
          "i -> struct(w[i] AS x, w[i + 1] AS y))")).as("b"))
      .select(col("doc_id"), col("lang"),
        col("b.x").as("x"), col("b.y").as("y"))
    val c2 = bg.where(col("lang") === "en")
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("cxy"))
    val c1 = c2.groupBy(col("x")).agg(sum(col("cxy")).as("cx"))
    val v = c2.select(col("y")).distinct()
      .agg(count(lit(1)).as("v"))
    bg.join(c2, Seq("x", "y"), "left")
      .join(c1, Seq("x"), "left")
      .crossJoin(broadcast(v))
      .select(col("doc_id"), col("lang"),
        (length(bin(coalesce(col("cx"), lit(0L)) + col("v"))) -
          length(bin(coalesce(col("cxy"), lit(0L)) + 1)))
          .cast("long").as("bits"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("bits")).as("sum_bits"))
      .select(col("doc_id"), col("lang"), col("n_bigrams"),
        col("sum_bits"),
        (col("sum_bits") / col("n_bigrams")).as("mean_bits"))
      .orderBy("doc_id")
  }

  /** q185: trigram stupid-backoff scoring — the production n-gram LM
    * shape above q172's bigram (Brants et al. 2007, "Large Language
    * Models in Machine Translation": no normalization, no discounting
    * — when the trigram is unseen, back off a level and pay a fixed
    * penalty). Integer-bits flavor of the module's float-free gate
    * discipline: score per position is
    *   bits(c(x₁x₂)) − bits(c(x₁x₂y))            trigram seen
    *   2 + bits(c(x₂)) − bits(c(x₂y))            bigram backoff
    *   4 + bits(T) − bits(c(y))                   unigram backoff
    *   4 + bits(T)                                OOV
    * (2 bits per backoff level ≈ α = ¼; every arm is non-negative so
    * the doc mean is one positive IEEE division, the q172 contract).
    * Trigram context counts derive FROM the trigram relation
    * (Σ over y), bigram/unigram from the adjacent-pair relation —
    * each model level is one partial agg over the en slice.
    *
    * Scale shape: grams stream from the span-tokens zone; model
    * joins are gram-keyed and UNHINTED (corpus-growing — the
    * q151/q172 discipline); T rides a 1-row broadcast; per-doc
    * reduce is one integer rollup. Coverage: every ≥3-token doc. */
  def trigramLm(s: SparkSession, dir: String): DataFrame = {
    val zone = graft.util.Scratch.memo(s, "span-tokens",
      s"span-tokens:$dir")(
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), Tokens.whitespace(col("text")).as("w")))
    val langs = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("lang"))
    val base = zone.join(langs, "doc_id")
    val tg = base.where(size(col("w")) >= 3)
      .select(col("doc_id"), col("lang"), explode(expr(
        "transform(sequence(0, size(w) - 3), " +
          "i -> struct(w[i] AS x1, w[i + 1] AS x2, w[i + 2] AS y))"))
        .as("t"))
      .select(col("doc_id"), col("lang"), col("t.x1").as("x1"),
        col("t.x2").as("x2"), col("t.y").as("y"))
    val bgEn = base.where(col("lang") === "en" && size(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(w) - 2), " +
          "i -> struct(w[i] AS x, w[i + 1] AS y))")).as("b"))
      .select(col("b.x").as("bx"), col("b.y").as("by"))
    val c3 = tg.where(col("lang") === "en")
      .groupBy(col("x1"), col("x2"), col("y"))
      .agg(count(lit(1)).as("cxyz"))
    val cctx = c3.groupBy(col("x1"), col("x2"))
      .agg(sum(col("cxyz")).as("cctx"))
    val c2m = bgEn.groupBy(col("bx"), col("by"))
      .agg(count(lit(1)).as("cxy"))
    val c1 = c2m.groupBy(col("bx")).agg(sum(col("cxy")).as("cx"))
    val cu = c2m.groupBy(col("by")).agg(sum(col("cxy")).as("cy"))
    val t = cu.agg(sum(col("cy")).as("tt"))
    tg.join(c3, Seq("x1", "x2", "y"), "left")
      .join(cctx, Seq("x1", "x2"), "left")
      .join(c2m, col("x2") === col("bx") && col("y") === col("by"),
        "left")
      .join(c1.select(col("bx").as("cbx"), col("cx")),
        col("x2") === col("cbx"), "left")
      .join(cu.select(col("by").as("uby"), col("cy")),
        col("y") === col("uby"), "left")
      .crossJoin(broadcast(t))
      .select(col("doc_id"), col("lang"), expr(
        """CAST(CASE
          |  WHEN cxyz IS NOT NULL
          |    THEN length(bin(cctx)) - length(bin(cxyz))
          |  WHEN cxy IS NOT NULL
          |    THEN 2 + length(bin(cx)) - length(bin(cxy))
          |  WHEN cy IS NOT NULL
          |    THEN 4 + length(bin(tt)) - length(bin(cy))
          |  ELSE 4 + length(bin(tt)) END AS BIGINT)""".stripMargin)
        .as("bits"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_trigrams"),
        sum(col("bits")).as("sum_bits"))
      .select(col("doc_id"), col("lang"), col("n_trigrams"),
        col("sum_bits"),
        (col("sum_bits") / col("n_trigrams")).as("mean_bits"))
      .orderBy("doc_id")
  }

  /** The q185 per-doc relation memoized: q185 and q205 both read the
    * stored copy (the ≥2-consumer materialize rule). */
  private def trigramPpl(s: SparkSession, dir: String): DataFrame =
    graft.util.Scratch.memo(s, "trigram-ppl", s"trigram-ppl:$dir")(
      trigramLm(s, dir))

  /** q205: perplexity BUCKETS — CCNet's head/middle/tail split
    * (Wenzek et al. 2020: rank each source's documents by LM score
    * and cut into terciles; the buckets drive mixing/filtering
    * decisions). Ranking is per-source on the q185 mean-bits score
    * with doc_id tie-break; the tercile cut is exact integer
    * arithmetic (rank·3 vs n), no percentile approximation.
    *
    * Scale shape: the window is keyed BY SOURCE (corpus-partitioned,
    * never global); counts are a partial agg joined back; the scored
    * relation streams from the memoized q185 zone. */
  def pplBuckets(s: SparkSession, dir: String): DataFrame = {
    val ppl = trigramPpl(s, dir)
      .select(col("doc_id"), col("n_trigrams"), col("mean_bits"))
    val src = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("source"))
    val r = ppl.join(src, "doc_id")
      .withColumn("ppl_rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("source"))
          .orderBy(col("mean_bits"), col("doc_id"))))
    val cnt = r.groupBy(col("source")).agg(count(lit(1)).as("n"))
    r.join(cnt, "source")
      .select(col("doc_id"), col("source"), col("n_trigrams"),
        col("mean_bits"), col("ppl_rank"),
        when(col("ppl_rank") * 3 <= col("n"), "head")
          .when(col("ppl_rank") * 3 <= col("n") * 2, "middle")
          .otherwise("tail").as("bucket"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q205_ppl_buckets" -> ((s: SparkSession, d: String) =>
      pplBuckets(s, d)),
    "q171_dsir_weights" -> ((s: SparkSession, d: String) =>
      dsirWeights(s, d)),
    "q172_bigram_lm" -> ((s: SparkSession, d: String) =>
      bigramLm(s, d)),
    "q185_trigram_backoff" -> ((s: SparkSession, d: String) =>
      trigramPpl(s, d).orderBy("doc_id")),
    "q153_ict_pairs" -> ((s: SparkSession, d: String) =>
      ictPairs(s, d)),
    "q149_repetition_filter" -> ((s: SparkSession, d: String) =>
      repetitionFilter(s, d)),
    "q150_keepfirst_scrub" -> ((s: SparkSession, d: String) =>
      keepFirstScrub(s, d)),
    "q151_surprisal" -> ((s: SparkSession, d: String) =>
      surprisalFilter(s, d)),
    "q154_linear_quality" -> ((s: SparkSession, d: String) =>
      linearQuality(s, d)),
    "q158_shard_manifest" -> ((s: SparkSession, d: String) =>
      shardManifest(s, d)),
    "q159_length_quantiles" -> ((s: SparkSession, d: String) =>
      lengthQuantiles(s, d)),
    "q162_pmi_collocations" -> ((s: SparkSession, d: String) =>
      pmiCollocations(s, d)),
    "q133_freq_items"     -> ((s: SparkSession, d: String) =>
      freqItemsWitness(s, d)),
    "q145_exact_span_scrub" -> ((s: SparkSession, d: String) =>
      exactSpanScrub(s, d)),
    "q269_dup_span_report" -> ((s: SparkSession, d: String) =>
      dupSpanReport(s, d)),
    "q140_dup_grams"      -> ((s: SparkSession, d: String) =>
      dupGramFraction(s, d)),
    "q313_dup_substrings" -> ((s: SparkSession, d: String) =>
      dupSubstrings(s, d)),
    "q104_tfidf_terms"    -> ((s: SparkSession, d: String) =>
      tfidfTopTerms(s, d)),
    "q105_bigram_novelty" -> (bigramNovelty _),
    "q106_cdc_chunks"     -> (cdcChunks _),
    "q110_source_scorecard" -> (sourceScorecard _),
    "q111_vocab_coverage" -> ((s: SparkSession, d: String) =>
      vocabCoverage(s, d)),
    "q112_sequence_pack"  -> ((s: SparkSession, d: String) =>
      sequencePack(s, d)),
    "q113_span_scrub"     -> (sharedSpanScrub _),
    "q116_length_batches" -> ((s: SparkSession, d: String) =>
      lengthBatches(s, d)))

  /** Shared CDC-chunking CTE prefix (documents → per-token chunk_idx)
    * for the q106/q113 oracles — one spelling of boundary placement so
    * the two can never drift. */
  private[text] val cdcCtes: String =
    raw"""WITH d AS (
      |  SELECT doc_id, string_split_regex(trim(text), '[ \t\n\v\f\r]+') AS arr
      |  FROM documents),
      |tok AS (
      |  SELECT d.doc_id, u.pos, u.tok
      |  FROM d JOIN LATERAL (
      |    SELECT unnest(arr) AS tok,
      |      generate_subscripts(arr, 1) - 1 AS pos) u ON true),
      |f AS (
      |  SELECT doc_id, pos, tok,
      |    CASE WHEN lag(tok) OVER w IS NOT NULL AND
      |      ('0x' || substr(md5(lag(tok) OVER w || ' ' || tok), 1, 15))
      |        ::BIGINT % 8 = 0
      |    THEN 1 ELSE 0 END AS b
      |  FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
      |c AS (
      |  SELECT doc_id, pos, tok,
      |    CAST(sum(b) OVER (PARTITION BY doc_id ORDER BY pos) AS BIGINT)
      |      AS chunk_idx
      |  FROM f)""".stripMargin

  /** The q185 model+scoring CTE chain shared with q205 - one
    * spelling of the trigram LM so the bucket query can never
    * drift from the score it buckets. */
  private val trigramSqlCtes: String =
    raw"""WITH d AS (
        |  SELECT doc_id, lang,
        |    string_split_regex(trim(text), '[ \t\n\v\f\r]+') AS w
        |  FROM documents),
        |tg AS (
        |  SELECT doc_id, lang,
        |    unnest([{'x1': w[i+1], 'x2': w[i+2], 'y': w[i+3]}
        |      for i in range(0, len(w) - 2)], recursive := true)
        |  FROM d WHERE len(w) >= 3),
        |bg AS (
        |  SELECT unnest([{'bx': w[i+1], 'by': w[i+2]}
        |      for i in range(0, len(w) - 1)], recursive := true)
        |  FROM d WHERE lang = 'en' AND len(w) >= 2),
        |c3 AS (
        |  SELECT x1, x2, y, CAST(count(*) AS BIGINT) AS cxyz
        |  FROM tg WHERE lang = 'en' GROUP BY 1, 2, 3),
        |cctx AS (
        |  SELECT x1, x2, CAST(sum(cxyz) AS BIGINT) AS cctx
        |  FROM c3 GROUP BY 1, 2),
        |c2m AS (
        |  SELECT bx, by, CAST(count(*) AS BIGINT) AS cxy
        |  FROM bg GROUP BY 1, 2),
        |c1 AS (SELECT bx, CAST(sum(cxy) AS BIGINT) AS cx
        |       FROM c2m GROUP BY 1),
        |cu AS (SELECT by, CAST(sum(cxy) AS BIGINT) AS cy
        |       FROM c2m GROUP BY 1),
        |t AS (SELECT CAST(sum(cy) AS BIGINT) AS tt FROM cu),
        |sc AS (
        |  SELECT tg.doc_id, tg.lang,
        |    CAST(CASE
        |      WHEN c3.cxyz IS NOT NULL
        |        THEN length(bin(cctx.cctx)) - length(bin(c3.cxyz))
        |      WHEN c2m.cxy IS NOT NULL
        |        THEN 2 + length(bin(c1.cx)) - length(bin(c2m.cxy))
        |      WHEN cu.cy IS NOT NULL
        |        THEN 4 + length(bin(t.tt)) - length(bin(cu.cy))
        |      ELSE 4 + length(bin(t.tt)) END AS BIGINT) AS bits
        |  FROM tg
        |  LEFT JOIN c3 ON tg.x1 = c3.x1 AND tg.x2 = c3.x2
        |    AND tg.y = c3.y
        |  LEFT JOIN cctx ON tg.x1 = cctx.x1 AND tg.x2 = cctx.x2
        |  LEFT JOIN c2m ON tg.x2 = c2m.bx AND tg.y = c2m.by
        |  LEFT JOIN c1 ON tg.x2 = c1.bx
        |  LEFT JOIN cu ON tg.y = cu.by
        |  CROSS JOIN t),
        |ppl AS (
        |  SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_trigrams,
        |    CAST(sum(bits) AS BIGINT) AS sum_bits,
        |    CAST(sum(bits) AS BIGINT) / CAST(count(*) AS BIGINT)
        |      AS mean_bits
        |  FROM sc GROUP BY doc_id, lang)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q171_dsir_weights" ->
      (raw"""WITH d AS (
        |  SELECT doc_id, lang,
        |    string_split_regex(trim(text), '[ \t\n\v\f\r]+') AS w
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, lang,
        |    ('0x' || substr(md5(unnest(w)), 1, 15))::BIGINT % 4096 AS bk
        |  FROM d),
        |m AS (
        |  SELECT bk,
        |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS tc,
        |    CAST(count(*) AS BIGINT) AS rc
        |  FROM b GROUP BY 1),
        |t AS (SELECT CAST(sum(tc) AS BIGINT) AS tt,
        |             CAST(sum(rc) AS BIGINT) AS rt FROM m),
        |doc AS (
        |  SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |    CAST(sum(""".stripMargin +
        ilogFpSql("m.tc + 1") + " - (" + ilogFpSql("m.rc + 1") +
        ") + " + ilogFpSql("t.rt") + " - (" + ilogFpSql("t.tt") + ")" +
        raw""") AS BIGINT) AS iw_q16
        |  FROM b JOIN m USING (bk) CROSS JOIN t GROUP BY 1),
        |dc AS (SELECT doc_id, n_tokens, iw_q16, iw_q16 >> 16 AS cw
        |       FROM doc),
        |h AS (SELECT cw AS v, CAST(count(*) AS BIGINT) AS c
        |      FROM dc GROUP BY 1),
        |hc AS (SELECT v, CAST(sum(c) OVER (ORDER BY v) AS BIGINT)
        |         AS cum FROM h),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM dc),
        |thr AS (
        |  SELECT min(CASE WHEN cum >= (n.n * 75 + 99) // 100 THEN v END)
        |    AS p75
        |  FROM hc CROSS JOIN n)
        |SELECT doc_id, n_tokens, iw_q16,
        |  cw >= thr.p75 AS selected
        |FROM dc CROSS JOIN thr ORDER BY doc_id""".stripMargin),
    "q172_bigram_lm" ->
      raw"""WITH d AS (
        |  SELECT doc_id, lang,
        |    string_split_regex(trim(text), '[ \t\n\v\f\r]+') AS w
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id, lang,
        |    unnest([{'x': w[i+1], 'y': w[i+2]}
        |      for i in range(0, len(w) - 1)], recursive := true)
        |  FROM d WHERE len(w) >= 2),
        |c2 AS (
        |  SELECT x, y, CAST(count(*) AS BIGINT) AS cxy
        |  FROM bg WHERE lang = 'en' GROUP BY 1, 2),
        |c1 AS (SELECT x, CAST(sum(cxy) AS BIGINT) AS cx
        |       FROM c2 GROUP BY 1),
        |v AS (SELECT CAST(count(DISTINCT y) AS BIGINT) AS v FROM c2),
        |sc AS (
        |  SELECT bg.doc_id, bg.lang,
        |    CAST(length(bin(coalesce(c1.cx, 0) + v.v)) -
        |         length(bin(coalesce(c2.cxy, 0) + 1)) AS BIGINT)
        |      AS bits
        |  FROM bg
        |  LEFT JOIN c2 ON bg.x = c2.x AND bg.y = c2.y
        |  LEFT JOIN c1 ON bg.x = c1.x
        |  CROSS JOIN v)
        |SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  CAST(sum(bits) AS BIGINT) AS sum_bits,
        |  CAST(sum(bits) AS BIGINT) / CAST(count(*) AS BIGINT)
        |    AS mean_bits
        |FROM sc GROUP BY doc_id, lang ORDER BY doc_id""".stripMargin,
    "q185_trigram_backoff" ->
      (trigramSqlCtes +
        "\nSELECT doc_id, lang, n_trigrams, sum_bits, mean_bits" +
        "\nFROM ppl ORDER BY doc_id"),
    "q205_ppl_buckets" ->
      (trigramSqlCtes + raw""",
        |src AS (SELECT doc_id, source FROM documents),
        |r AS (
        |  SELECT p.doc_id, s.source, p.n_trigrams, p.mean_bits,
        |    row_number() OVER (PARTITION BY s.source
        |      ORDER BY p.mean_bits, p.doc_id) AS ppl_rank
        |  FROM ppl p JOIN src s ON s.doc_id = p.doc_id),
        |cnt AS (SELECT source, CAST(count(*) AS BIGINT) AS n
        |        FROM r GROUP BY 1)
        |SELECT r.doc_id, r.source, r.n_trigrams, r.mean_bits,
        |  r.ppl_rank,
        |  CASE WHEN r.ppl_rank * 3 <= cnt.n THEN 'head'
        |       WHEN r.ppl_rank * 3 <= 2 * cnt.n THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM r JOIN cnt ON cnt.source = r.source
        |ORDER BY r.doc_id""".stripMargin),
    // the n<2/n<3 CASE arms mirror Tokens.ngramsOf's whole-text
    // fallback for short docs exactly
    "q149_repetition_filter" ->
      raw"""WITH w AS (
        |  SELECT doc_id, string_split_regex(trim(text), '[ \t\n\v\f\r]+') AS w
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, 1 AS n, unnest(w) AS g FROM w
        |  UNION ALL
        |  SELECT doc_id, 2 AS n, unnest(
        |    CASE WHEN len(w) < 2 THEN [array_to_string(w, ' ')]
        |         ELSE [array_to_string(w[i+1:i+2], ' ')
        |               for i in range(0, len(w) - 1)] END) FROM w
        |  UNION ALL
        |  SELECT doc_id, 3 AS n, unnest(
        |    CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
        |         ELSE [array_to_string(w[i+1:i+3], ' ')
        |               for i in range(0, len(w) - 2)] END) FROM w),
        |c AS (
        |  SELECT doc_id, n,
        |    ('0x' || substr(md5(g), 1, 15))::BIGINT AS gh,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM g GROUP BY 1, 2, 3),
        |a AS (
        |  SELECT doc_id, n, CAST(sum(c) AS BIGINT) AS tot,
        |    CAST(max(c) AS BIGINT) AS mx,
        |    CAST(coalesce(sum(c) FILTER (WHERE c > 1), 0) AS BIGINT) AS dup
        |  FROM c GROUP BY 1, 2),
        |p AS (
        |  SELECT doc_id,
        |    max(CASE WHEN n = 1 THEN tot END) AS n_tokens,
        |    max(CASE WHEN n = 1 THEN mx END) AS top_token_count,
        |    max(CASE WHEN n = 2 THEN tot END) AS n_bigrams,
        |    max(CASE WHEN n = 2 THEN mx END) AS top_bigram_count,
        |    max(CASE WHEN n = 3 THEN tot END) AS n_trigrams,
        |    max(CASE WHEN n = 3 THEN dup END) AS dup_trigram_count
        |  FROM a GROUP BY 1)
        |SELECT doc_id, n_tokens, top_token_count,
        |  top_token_count / n_tokens AS top_token_frac,
        |  n_bigrams, top_bigram_count,
        |  top_bigram_count / n_bigrams AS top_bigram_frac,
        |  n_trigrams, dup_trigram_count,
        |  dup_trigram_count / n_trigrams AS dup_trigram_frac,
        |  (top_token_count / n_tokens > 0.2 OR
        |   top_bigram_count / n_bigrams > 0.18 OR
        |   dup_trigram_count / n_trigrams > 0.3) AS flagged
        |FROM p ORDER BY doc_id""".stripMargin,
    "q153_ict_pairs" ->
      (cdcCtes +
        raw""",
        |ch AS (
        |  SELECT doc_id, chunk_idx,
        |    array_to_string(list(tok ORDER BY pos), ' ') AS ctext
        |  FROM c GROUP BY 1, 2)
        |SELECT a.doc_id AS doc_id, a.chunk_idx AS j,
        |  a.ctext AS anchor, b.ctext AS positive
        |FROM ch a JOIN ch b
        |  ON a.doc_id = b.doc_id AND a.chunk_idx + 1 = b.chunk_idx
        |ORDER BY a.doc_id, j""".stripMargin),
    "q162_pmi_collocations" ->
      raw"""WITH d AS (
        |  SELECT doc_id,
        |    string_split_regex(trim(text), '[ \t\n\v\f\r]+') AS w
        |  FROM documents),
        |tok AS (SELECT unnest(w) AS t FROM d),
        |uni AS (SELECT t, CAST(count(*) AS BIGINT) AS c
        |        FROM tok GROUP BY 1),
        |tt AS (SELECT CAST(sum(c) AS BIGINT) AS t_total FROM uni),
        |bgr AS (
        |  SELECT unnest([{'x': w[i+1], 'y': w[i+2]}
        |    for i in range(0, len(w) - 1)], recursive := true)
        |  FROM d WHERE len(w) >= 2),
        |bc AS (SELECT x, y, CAST(count(*) AS BIGINT) AS cxy
        |       FROM bgr GROUP BY 1, 2),
        |t2 AS (SELECT CAST(sum(cxy) AS BIGINT) AS t2_total FROM bc)
        |SELECT bc.x || ' ' || bc.y AS bigram, bc.cxy, ux.c AS cx,
        |  uy.c AS cy,
        |  CAST(length(bin(bc.cxy)) + 2 * length(bin(tt.t_total))
        |    - length(bin(t2.t2_total)) - length(bin(ux.c))
        |    - length(bin(uy.c)) AS BIGINT) AS pmi_bits
        |FROM bc
        |JOIN uni ux ON ux.t = bc.x
        |JOIN uni uy ON uy.t = bc.y
        |CROSS JOIN tt CROSS JOIN t2
        |WHERE bc.cxy >= 5
        |ORDER BY pmi_bits DESC, bigram LIMIT 50""".stripMargin,
    "q159_length_quantiles" ->
      raw"""WITH d AS (
        |  SELECT source,
        |    CAST(coalesce(len(string_split_regex(trim(text), '[ \t\n\v\f\r]+')), 0)
        |      AS BIGINT) AS n
        |  FROM documents),
        |c AS (
        |  SELECT source, n, CAST(count(*) AS BIGINT) AS c
        |  FROM d GROUP BY 1, 2),
        |cc AS (
        |  SELECT source, n, c,
        |    CAST(sum(c) OVER (PARTITION BY source ORDER BY n) AS BIGINT)
        |      AS cum
        |  FROM c),
        |t AS (SELECT source, CAST(sum(c) AS BIGINT) AS tot FROM c GROUP BY 1)
        |SELECT cc.source, t.tot AS n_docs,
        |  min(CASE WHEN cum >= (tot * 25 + 99) // 100 THEN n END) AS p25,
        |  min(CASE WHEN cum >= (tot * 50 + 99) // 100 THEN n END) AS p50,
        |  min(CASE WHEN cum >= (tot * 75 + 99) // 100 THEN n END) AS p75,
        |  min(CASE WHEN cum >= (tot * 95 + 99) // 100 THEN n END) AS p95,
        |  max(n) AS max_tokens
        |FROM cc JOIN t USING (source) GROUP BY cc.source, t.tot
        |ORDER BY source""".stripMargin,
    "q158_shard_manifest" ->
      raw"""WITH d AS (
        |  SELECT doc_id,
        |    CAST(coalesce(len(string_split_regex(trim(text), '[ \t\n\v\f\r]+')), 0)
        |      AS BIGINT) AS n_tokens,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |      AS h
        |  FROM documents),
        |o AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS start_off
        |  FROM d),
        |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot FROM d),
        |a AS (
        |  SELECT doc_id, n_tokens, start_off,
        |    least((start_off * 32) // tot, 31) AS shard_id
        |  FROM o CROSS JOIN t)
        |SELECT shard_id, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |  CAST(min(start_off) AS BIGINT) AS first_off,
        |  CAST(max(start_off + n_tokens) AS BIGINT) AS end_off
        |FROM a GROUP BY shard_id ORDER BY shard_id""".stripMargin,
    "q154_linear_quality" ->
      raw"""WITH tok AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(text), '[ \t\n\v\f\r]+')) AS tok
        |  FROM documents),
        |w AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(tok), 1, 15))::BIGINT % 2001 - 1000 AS wt
        |  FROM tok)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(wt) AS BIGINT) AS w_sum,
        |  CAST(sum(wt) AS BIGINT) / CAST(count(*) AS BIGINT) AS mean_w,
        |  sum(wt) >= 0 AS keep
        |FROM w GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q151_surprisal" ->
      raw"""WITH tok AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(text), '[ \t\n\v\f\r]+')) AS tok
        |  FROM documents),
        |c AS (
        |  SELECT tok, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1),
        |t AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM c),
        |b AS (
        |  SELECT tok.doc_id,
        |    CAST(length(bin(t.t)) - length(bin(c.c)) AS BIGINT) AS bits
        |  FROM tok JOIN c USING (tok) CROSS JOIN t)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(bits) AS BIGINT) AS sum_bits,
        |  CAST(sum(bits) AS BIGINT) / CAST(count(*) AS BIGINT)
        |    AS mean_bits
        |FROM b GROUP BY 1 ORDER BY doc_id""".stripMargin,
    // survivor = lexicographic min (doc_id, chunk_idx) per
    // fingerprint, spelled as the two-level min the struct-min
    // computes on the Spark side
    "q150_keepfirst_scrub" ->
      (cdcCtes +
        raw""",
        |ch AS (
        |  SELECT doc_id, chunk_idx,
        |    array_to_string(list(tok ORDER BY pos), ' ') AS ctext,
        |    md5(array_to_string(list(tok ORDER BY pos), ' '))
        |      AS chunk_hash,
        |    CAST(count(*) AS BIGINT) AS ctoks
        |  FROM c GROUP BY 1, 2),
        |s1 AS (
        |  SELECT chunk_hash, min(doc_id) AS sdoc FROM ch GROUP BY 1),
        |s2 AS (
        |  SELECT ch.chunk_hash, s1.sdoc, min(ch.chunk_idx) AS sj
        |  FROM ch JOIN s1 ON ch.chunk_hash = s1.chunk_hash
        |    AND ch.doc_id = s1.sdoc
        |  GROUP BY 1, 2)
        |SELECT ch.doc_id, count(*) AS n_chunks,
        |  CAST(sum(CASE WHEN ch.doc_id = s2.sdoc AND
        |    ch.chunk_idx = s2.sj THEN 0 ELSE 1 END) AS BIGINT)
        |    AS n_dropped,
        |  CAST(coalesce(sum(CASE WHEN ch.doc_id = s2.sdoc AND
        |    ch.chunk_idx = s2.sj THEN ctoks END), 0) AS BIGINT)
        |    AS n_tokens_kept,
        |  coalesce(array_to_string(list(ctext ORDER BY chunk_idx)
        |    FILTER (WHERE ch.doc_id = s2.sdoc AND ch.chunk_idx = s2.sj),
        |    ' '), '') AS cleaned_text
        |FROM ch JOIN s2 USING (chunk_hash)
        |GROUP BY ch.doc_id ORDER BY ch.doc_id""".stripMargin),
    "q133_freq_items" ->
      raw"""WITH tok AS (
        |  SELECT unnest(string_split_regex(trim(lower(text)), '[ \t\n\v\f\r]+'))
        |    AS t
        |  FROM documents),
        |e AS (SELECT t, CAST(count(*) AS BIGINT) AS cnt
        |      FROM tok GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tok)
        |SELECT t AS token, cnt, TRUE AS captured
        |FROM e, n WHERE cnt * 50 > n ORDER BY token""".stripMargin,
    // coverage replay: token at pos is scrubbed iff a cross-doc
    // shared 5-gram starts at any of pos-4..pos
    // brute-force spelling of the q313 contract: enumerate EVERY
    // m-gram for m in [minLen, window], keep the duplicated ones
    // (count >= 2 over all occurrences — within-doc repeats count),
    // take per-position max m, group into the substring inventory
    "q313_dup_substrings" ->
      raw"""WITH w AS (
        |  SELECT doc_id, string_split_regex(trim(text), '[ \t\n\v\f\r]+') AS w
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, m,
        |    unnest([{'p': i, 'sub': array_to_string(w[i+1:i+m], ' ')}
        |      for i in range(0, len(w) - m + 1)], recursive := true)
        |  FROM w, range($DupSubMinLen, ${DupSubWindow + 1}) r(m)
        |  WHERE len(w) >= m),
        |dup AS (
        |  SELECT m, sub FROM g GROUP BY m, sub HAVING count(*) >= 2),
        |best AS (
        |  SELECT g.doc_id, g.p, max(g.m) AS tok_len
        |  FROM g JOIN dup USING (m, sub) GROUP BY 1, 2),
        |subs AS (
        |  SELECT b.doc_id,
        |    array_to_string(w.w[b.p+1:b.p+b.tok_len], ' ') AS sub,
        |    b.tok_len
        |  FROM best b JOIN w USING (doc_id))
        |SELECT sub, CAST(tok_len AS BIGINT) AS tok_len,
        |  CAST(count(*) AS BIGINT) AS n_starts,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        |FROM subs GROUP BY 1, 2
        |ORDER BY tok_len DESC, sub""".stripMargin,
    // the q145 coverage CTE chain verbatim, then gaps-and-islands
    "q269_dup_span_report" ->
      raw"""WITH w AS (
        |  SELECT doc_id, string_split_regex(trim(text), '[ \t\n\v\f\r]+') AS w
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, unnest([{'p': i,
        |      'gh': ('0x' || substr(md5(array_to_string(w[i+1:i+5], ' ')),
        |        1, 15))::BIGINT}
        |    for i in range(0, len(w) - 4)], recursive := true)
        |  FROM w WHERE len(w) >= 5),
        |shared AS (
        |  SELECT gh FROM g GROUP BY gh HAVING count(DISTINCT doc_id) > 1),
        |cov AS (
        |  SELECT DISTINCT g.doc_id, g.p + t.j AS pos
        |  FROM g JOIN shared USING (gh) CROSS JOIN range(5) t(j)),
        |isl AS (
        |  SELECT doc_id, pos,
        |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
        |      AS grp
        |  FROM cov)
        |SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
        |  CAST(max(pos) AS BIGINT) AS span_end,
        |  CAST(count(*) AS BIGINT) AS span_len
        |FROM isl GROUP BY doc_id, grp
        |ORDER BY doc_id, span_start""".stripMargin,
    "q145_exact_span_scrub" ->
      raw"""WITH w AS (
        |  SELECT doc_id, string_split_regex(trim(text), '[ \t\n\v\f\r]+') AS w
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, unnest([{'p': i,
        |      'gh': ('0x' || substr(md5(array_to_string(w[i+1:i+5], ' ')),
        |        1, 15))::BIGINT}
        |    for i in range(0, len(w) - 4)], recursive := true)
        |  FROM w WHERE len(w) >= 5),
        |shared AS (
        |  SELECT gh FROM g GROUP BY gh HAVING count(DISTINCT doc_id) > 1),
        |cov AS (
        |  SELECT DISTINCT g.doc_id, g.p + t.j AS pos, 1 AS hit
        |  FROM g JOIN shared USING (gh) CROSS JOIN range(5) t(j)),
        |tok AS (
        |  SELECT w.doc_id, u.pos, u.tok
        |  FROM w JOIN LATERAL (
        |    SELECT unnest(w) AS tok,
        |      generate_subscripts(w, 1) - 1 AS pos) u ON true),
        |kept AS (
        |  SELECT tok.doc_id, tok.pos, tok.tok
        |  FROM tok LEFT JOIN cov USING (doc_id, pos)
        |  WHERE cov.hit IS NULL),
        |agg AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |    array_to_string(list(tok ORDER BY pos), ' ') AS cleaned_text
        |  FROM kept GROUP BY 1)
        |SELECT w.doc_id, CAST(len(w.w) AS BIGINT) AS n_tokens,
        |  coalesce(a.n_kept, 0) AS n_kept,
        |  CAST(len(w.w) AS BIGINT) - coalesce(a.n_kept, 0) AS n_scrubbed,
        |  coalesce(a.cleaned_text, '') AS cleaned_text
        |FROM w LEFT JOIN agg a USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    // all 5-gram OCCURRENCES (not distinct — within-doc repeats each
    // count), dup = gram appears in >1 distinct doc
    "q140_dup_grams" ->
      raw"""WITH w AS (
        |  SELECT doc_id, string_split_regex(trim(text), '[ \t\n\v\f\r]+') AS w
        |  FROM documents),
        |g0 AS (
        |  SELECT doc_id, unnest(
        |    CASE WHEN len(w) < 5 THEN [array_to_string(w, ' ')]
        |         ELSE [array_to_string(w[i+1:i+5], ' ')
        |               for i in range(0, len(w) - 4)] END) AS gs
        |  FROM w),
        |g AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(gs), 1, 15))::BIGINT AS g
        |  FROM g0),
        |nd AS (
        |  SELECT g, count(DISTINCT doc_id) AS nd FROM g GROUP BY 1)
        |SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |  CAST(sum(CASE WHEN nd.nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dup,
        |  CAST(sum(CASE WHEN nd.nd > 1 THEN 1 ELSE 0 END) AS BIGINT) /
        |    CAST(count(*) AS BIGINT) AS dup_fraction
        |FROM g JOIN nd USING (g)
        |GROUP BY 1 ORDER BY doc_id""".stripMargin,
    "q111_vocab_coverage" ->
      raw"""WITH tok AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '[ \t\n\v\f\r]+')) AS tok
        |  FROM documents),
        |vocab AS (
        |  SELECT tok FROM (
        |    SELECT tok, count(*) AS freq FROM tok GROUP BY tok
        |    ORDER BY freq DESC, tok LIMIT 1000)),
        |scored AS (
        |  SELECT t.doc_id, count(*) AS n_tokens,
        |    CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_oov
        |  FROM tok t LEFT JOIN vocab v USING (tok)
        |  GROUP BY t.doc_id)
        |SELECT doc_id, n_tokens, n_oov, n_oov / n_tokens AS oov_ratio
        |FROM scored ORDER BY doc_id""".stripMargin,
    "q110_source_scorecard" ->
      raw"""SELECT source, count(*) AS n_docs,
        |  count(DISTINCT md5(text)) AS distinct_texts,
        |  (count(*) - count(DISTINCT md5(text))) / count(*) AS dup_ratio,
        |  CAST(sum(len(string_split_regex(trim(text), '[ \t\n\v\f\r]+'))) AS BIGINT)
        |    / count(*) AS avg_tokens,
        |  CAST(sum(length(text)) AS BIGINT) / count(*) AS avg_chars
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q104_tfidf_terms" ->
      raw"""WITH tok AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '[ \t\n\v\f\r]+')) AS term
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |r AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |    row_number() OVER (PARTITION BY tf.doc_id
        |      ORDER BY tf.tf DESC, df.df ASC, tf.term ASC) AS rn
        |  FROM tf JOIN df USING (term))
        |SELECT doc_id, term, tf, df, rn FROM r
        |WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin,
    "q105_bigram_novelty" ->
      raw"""WITH w AS (
        |  SELECT doc_id,
        |    string_split_regex(trim(lower(text)), '[ \t\n\v\f\r]+') AS w
        |  FROM documents),
        |bg0 AS (
        |  SELECT doc_id, unnest(
        |    CASE WHEN len(w) < 2 THEN [array_to_string(w, ' ')]
        |         ELSE [array_to_string(w[i+1:i+2], ' ')
        |               for i in range(0, len(w) - 1)] END) AS g
        |  FROM w),
        |bg AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(g), 1, 15))::BIGINT AS bg
        |  FROM bg0),
        |c AS (SELECT bg, count(*) AS c FROM bg GROUP BY 1)
        |SELECT b.doc_id,
        |  count(*) AS n_bigrams,
        |  CAST(sum(c.c) AS BIGINT) AS sum_freq,
        |  CAST(sum(CASE WHEN c.c <= 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_hapax,
        |  CAST(sum(c.c) AS BIGINT) / count(*) AS avg_freq,
        |  CAST(sum(CASE WHEN c.c <= 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    / count(*) AS hapax_ratio
        |FROM bg b JOIN c USING (bg)
        |GROUP BY b.doc_id ORDER BY b.doc_id""".stripMargin,
    "q106_cdc_chunks" ->
      (cdcCtes +
        raw""",
        |ch AS (
        |  SELECT doc_id, chunk_idx,
        |    md5(array_to_string(list(tok ORDER BY pos), ' ')) AS chunk_hash
        |  FROM c GROUP BY 1, 2),
        |sh AS (
        |  SELECT chunk_hash, count(DISTINCT doc_id) AS ndocs
        |  FROM ch GROUP BY 1)
        |SELECT ch.doc_id, count(*) AS n_chunks,
        |  CAST(sum(CASE WHEN sh.ndocs > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_shared,
        |  CAST(sum(CASE WHEN sh.ndocs > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    / count(*) AS shared_ratio
        |FROM ch JOIN sh USING (chunk_hash)
        |GROUP BY ch.doc_id ORDER BY ch.doc_id""".stripMargin),
    "q113_span_scrub" ->
      (cdcCtes +
        raw""",
        |ch AS (
        |  SELECT doc_id, chunk_idx,
        |    array_to_string(list(tok ORDER BY pos), ' ') AS ctext,
        |    md5(array_to_string(list(tok ORDER BY pos), ' '))
        |      AS chunk_hash,
        |    CAST(count(*) AS BIGINT) AS ctoks
        |  FROM c GROUP BY 1, 2),
        |sh AS (
        |  SELECT chunk_hash, count(DISTINCT doc_id) AS ndocs
        |  FROM ch GROUP BY 1)
        |SELECT ch.doc_id, count(*) AS n_chunks,
        |  CAST(sum(CASE WHEN sh.ndocs > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dropped,
        |  CAST(coalesce(sum(CASE WHEN sh.ndocs = 1 THEN ctoks END), 0)
        |    AS BIGINT) AS n_tokens_kept,
        |  coalesce(array_to_string(list(ctext ORDER BY chunk_idx)
        |    FILTER (WHERE sh.ndocs = 1), ' '), '') AS cleaned_text
        |FROM ch JOIN sh USING (chunk_hash)
        |GROUP BY ch.doc_id ORDER BY ch.doc_id""".stripMargin),
    "q116_length_batches" ->
      raw"""WITH d AS (
        |  SELECT doc_id,
        |    CAST(coalesce(len(string_split_regex(trim(text), '[ \t\n\v\f\r]+')), 0)
        |      AS BIGINT) AS n_tokens,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |      AS h
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, n_tokens, n_tokens // 32 AS bucket,
        |    row_number() OVER (PARTITION BY n_tokens // 32
        |      ORDER BY h, doc_id) AS rn
        |  FROM d),
        |b AS (
        |  SELECT doc_id, n_tokens, bucket,
        |    CAST((rn - 1) // 16 AS BIGINT) AS batch_no
        |  FROM r)
        |SELECT doc_id, n_tokens, bucket, batch_no,
        |  CAST(max(n_tokens) OVER (PARTITION BY bucket, batch_no)
        |    - n_tokens AS BIGINT) AS pad
        |FROM b ORDER BY doc_id""".stripMargin,
    "q112_sequence_pack" ->
      raw"""WITH d AS (
        |  SELECT doc_id,
        |    CAST(coalesce(len(string_split_regex(trim(text), '[ \t\n\v\f\r]+')), 0)
        |      AS BIGINT) AS n_tokens,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |      AS h
        |  FROM documents),
        |o AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS start_off
        |  FROM d)
        |SELECT doc_id, n_tokens, start_off,
        |  start_off // 512 AS seq_first,
        |  CASE WHEN n_tokens > 0 THEN (start_off + n_tokens - 1) // 512
        |       ELSE start_off // 512 END AS seq_last,
        |  CASE WHEN n_tokens > 0
        |    THEN (start_off + n_tokens - 1) // 512 - start_off // 512 + 1
        |    ELSE CAST(0 AS BIGINT) END AS n_seqs
        |FROM o ORDER BY doc_id""".stripMargin)
}
