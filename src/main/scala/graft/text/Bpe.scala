package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.{Checkpoints, Tokens}

/** Byte-pair-encoding tokenizer TRAINING — the producer for the vocab
  * q111's coverage analysis consumes. Classic Sennrich-style BPE:
  * start from characters, repeatedly merge the globally most frequent
  * adjacent symbol pair.
  *
  * Scale shape — the part that matters at 100 TB: training runs on the
  * distinct-WORD frequency table, not the token stream. The corpus is
  * scanned ONCE (word → freq aggregation); every merge round then
  * operates on that table, which is orders of magnitude smaller than
  * the corpus (Heaps' law) and shrinks further as merges fuse symbols.
  * Per round: one explode of adjacent pairs weighted by word freq, one
  * partial-aggregated count, one global argmax (tiny), one map-side
  * merge application. The driver holds only the argmax pair per round
  * and the final merge table — never word data. Real pipelines also
  * cap the word table (sample or min-freq floor) — the `minFreq`
  * parameter is that floor.
  *
  * Determinism: ties on pair count break lexicographically, so the
  * learned merge sequence is a pure function of the corpus.
  */
object Bpe {

  /** One learned merge: rank = order learned, (left, right) → fused. */
  final case class Merge(rank: Int, left: String, right: String)

  /** The word-frequency table: one corpus scan, then training never
    * touches the corpus again. */
  private def wordFreqs(s: SparkSession, dir: String,
                        minFreq: Long): DataFrame =
    graft.Tables.load(s, dir, "documents")
      .select(explode(Tokens.whitespace(lower(col("text")))).as("word"))
      .where(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .where(col("freq") >= minFreq)

  /** Train `nMerges` BPE merges on the corpus at `dir`. Returns the
    * ordered merge table. Symbols start as single characters; each
    * round fuses the most frequent adjacent pair (count desc, then
    * (left, right) asc — deterministic). Stops early if no pair
    * remains. */
  def learnBpe(s: SparkSession, dir: String, nMerges: Int = 32,
               minFreq: Long = 1L): Seq[Merge] = {
    import s.implicits._
    // (symbol sequence, freq) per distinct word — the training state.
    // Checkpoint per round: same plan-growth reasoning as the CC loop
    // (each round otherwise nests all prior rounds' plans).
    // Checkpoints.root = the durability dial (graft.checkpoint.dir ⇒
    // reliable checkpoint, survives executor loss; unset ⇒ local).
    var words = Checkpoints.root(wordFreqs(s, dir, minFreq)
      .select(split(col("word"), "").as("syms"), col("freq")))
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var round = 0
    while (round < nMerges) {
      // adjacent-pair counts, weighted by word frequency; the argmax
      // row is the ONLY thing that reaches the driver
      val best = words
        .select(posexplode(col("syms")).as(Seq("i", "sym")),
          col("syms"), col("freq"))
        .where(col("i") < size(col("syms")) - 1)
        .select(col("sym").as("l"),
          element_at(col("syms"), col("i") + 2).as("r"), col("freq"))
        .groupBy("l", "r").agg(sum("freq").as("c"))
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty) round = nMerges
      else {
        val (l, r) = (best(0).getString(0), best(0).getString(1))
        merges += Merge(merges.length, l, r)
        // map-side merge application over the word table: fuse every
        // non-overlapping (l, r) left-to-right — as a COLUMN fold
        // (see applyMergeCol), so each round's plan is a plain
        // Project over the checkpoint, with no
        // DeserializeToObject/SerializeFromObject encoder round-trip
        // per word (the previous typed `.map` spelling paid one)
        val mergedWords = words.select(
          applyMergeCol(col("syms"), l, r).as("syms"), col("freq"))
        val next = Checkpoints.root(mergedWords)
        Checkpoints.free(words)
        words = next
        round += 1
      }
    }
    Checkpoints.free(words)
    merges.toSeq
  }

  /** [[applyMerge]] as a column expression: a left fold (`aggregate`)
    * that appends each symbol, fusing it with the accumulator's last
    * element when that element is `l` and the symbol is `r`. This is
    * exactly the imperative left-to-right non-overlapping semantics:
    * a fused token equals `l + r`, which can never equal `l` (symbols
    * are non-empty), so a token fused this round can never fuse again
    * this round — the i += 2 skip, expressed as a fold invariant
    * (property-tested against [[applyMerge]] in BpeSpec, overlap
    * chains included). `try_element_at` keeps the empty-accumulator
    * probe null-safe under ANSI mode. Arrays stay ArrayData end to
    * end — no per-row encoder ser/de in the training loop. */
  private[text] def applyMergeCol(syms: org.apache.spark.sql.Column,
                                  l: String, r: String)
      : org.apache.spark.sql.Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) =>
        when(try_element_at(acc, lit(-1)) === lit(l) && x === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
          .otherwise(concat(acc, array(x))))

  /** Fuse every non-overlapping adjacent (l, r) in left-to-right
    * order — the standard BPE application step. */
  private[text] def applyMerge(syms: Seq[String], l: String,
                               r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Encode a document table with a learned merge list: per word,
    * apply every merge in rank order. Map-side only (the merge table
    * rides into the closure — KB-scale; it IS the tokenizer). Emits
    * per-doc BPE token counts alongside the char/word baselines, the
    * compression evidence a tokenizer choice is judged by. */
  def encode(s: SparkSession, dir: String, merges: Seq[Merge]): DataFrame = {
    import s.implicits._
    val ordered = merges.sortBy(_.rank).map(m => (m.left, m.right))
    graft.Tables.load(s, dir, "documents")
      .select(col("doc_id"), Tokens.whitespace(lower(col("text"))).as("w"))
      .as[(Long, Seq[String])]
      .map { case (id, ws) =>
        val words = ws.filter(_.nonEmpty)
        var nTokens = 0L
        var nChars = 0L
        words.foreach { word =>
          var syms: Seq[String] = word.split("").toSeq
          ordered.foreach { case (l, r) => syms = applyMerge(syms, l, r) }
          nTokens += syms.length
          // code points, not UTF-16 units — split("") yields one
          // symbol per code point, so this is the matching baseline
          nChars += word.codePointCount(0, word.length)
        }
        (id, words.length.toLong, nChars, nTokens)
      }
      .toDF("doc_id", "n_words", "n_chars", "n_bpe_tokens")
      .orderBy("doc_id")
  }
}
