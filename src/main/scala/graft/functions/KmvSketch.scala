package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** K-minimum-values distinct sketch as a typed Aggregator (the
  * [[MisraGries]] surface): keep the k smallest DISTINCT hash values
  * seen; one pass, mergeable partials (merge = union → k smallest),
  * constant state — the classic KMV/bottom-k estimator
  * (Bar-Yossef et al. 2002; Beyer et al., SIGMOD 2007).
  *
  * Determinism (what lets q178 hash-gate the output): unlike a
  * sampling sketch, the k minimum distinct values of a fixed hash
  * function are a PURE FUNCTION of the input SET — independent of
  * row order, partitioning, and merge shape — so the finished sketch
  * is bit-identical across cluster re-runs and replayable in DuckDB
  * as `ORDER BY h LIMIT k` over the distinct hashes.
  *
  * The buffer is a sorted array of ≤ k longs; reduce is a binary
  * search + bounded insert, merge is a sorted-merge keeping k. With
  * the 60-bit md5 prefix hash ([[Md5Prefix60]]) all values are
  * non-negative and uniform on [0, 2⁶⁰), giving the standard
  * estimate  D̂ = (k−1)·2⁶⁰ / h₍ₖ₎  with relative error ≈ 1/√(k−2).
  */
final class KmvSketch(k: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k > 1, "KMV needs at least two minima")

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(b: Array[Long], h: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(b, h)
    if (pos >= 0) b // already present
    else {
      val ins = -pos - 1
      if (b.length < k) {
        val out = new Array[Long](b.length + 1)
        System.arraycopy(b, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(b, ins, out, ins + 1, b.length - ins)
        out
      } else if (ins < k) {
        // h beats the current k-th minimum: shift the tail out
        val out = new Array[Long](k)
        System.arraycopy(b, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(b, ins, out, ins + 1, k - ins - 1)
        out
      } else b
    }
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    val out = new Array[Long](math.min(k, x.length + y.length))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < x.length || j < y.length)) {
      val take =
        if (i >= x.length) { val v = y(j); j += 1; v }
        else if (j >= y.length) { val v = x(i); i += 1; v }
        else if (x(i) < y(j)) { val v = x(i); i += 1; v }
        else if (x(i) > y(j)) { val v = y(j); j += 1; v }
        else { val v = x(i); i += 1; j += 1; v } // shared value once
      out(n) = take; n += 1
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[Array[Long]]()
}
