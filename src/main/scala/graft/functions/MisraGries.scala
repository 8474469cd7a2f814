package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Weighted Misra–Gries heavy-hitter sketch as a typed Aggregator (the
  * [[ExactStats]] surface): k counters, one pass, mergeable partials.
  *
  * Contract (what q133's witness pins): NO FALSE NEGATIVES — every
  * item whose total weight exceeds W/(k+1) (W = total stream weight)
  * survives in the summary; false positives are allowed and expected.
  * Per the classic argument, each unit of undercount on any item is
  * matched by simultaneous decrements of k other counters, so total
  * undercount per item ≤ W/(k+1); merging partials preserves the bound
  * (Agarwal et al., "Mergeable Summaries", PODS 2012).
  *
  * Weighted updates make the sketch composable with pre-aggregation:
  * feeding the (item, exact-count) relation is a legal weighted stream
  * with the same guarantee, which is how q133 gets ONE corpus scan —
  * the exact relation it must compute anyway doubles as the sketch
  * input. Feeding raw tokens with weight 1 is the classic streaming
  * spelling; both ride Spark's partial aggregation (map-side shrink,
  * one small map per task merged at the final agg — never a
  * driver-side scan, unlike `DataFrame.stat.freqItems`, which eagerly
  * runs `rdd.aggregate` at CALL time).
  *
  * The candidate set depends on merge order (inherent to MG); only its
  * guaranteed property — membership of true heavy hitters — is
  * deterministic, so consumers must emit membership checks, not the
  * raw candidate list (q133's discipline). Output is sorted for
  * stable display only.
  */
final class MisraGries(k: Int)
    extends Aggregator[(String, Long), Map[String, Long], Array[String]] {
  require(k > 0, "need at least one counter")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long],
                      a: (String, Long)): Map[String, Long] = {
    val (t, w) = a
    if (w <= 0L) b else shrink(b.updated(t, b.getOrElse(t, 0L) + w))
  }

  override def merge(x: Map[String, Long],
                     y: Map[String, Long]): Map[String, Long] =
    shrink(y.foldLeft(x) { case (m, (t, w)) =>
      m.updated(t, m.getOrElse(t, 0L) + w)
    })

  /** Keep ≤ k counters: subtract the (k+1)-th largest count from all,
    * drop the non-positive — the MG decrement generalized to weights
    * and to merged buffers. */
  private def shrink(m: Map[String, Long]): Map[String, Long] =
    if (m.size <= k) m
    else {
      val c = m.valuesIterator.toArray.sorted(Ordering[Long].reverse)(k)
      m.collect { case (t, v) if v > c => t -> (v - c) }
    }

  override def finish(b: Map[String, Long]): Array[String] =
    b.keys.toArray.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[Array[String]]()
}
