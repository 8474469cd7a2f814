package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering: the multi-dimensional data-
  * skipping layout for scans that filter on MORE than one column.
  *
  * Sorting a table on one column gives parquet row-group min/max
  * stats that prune scans filtering on THAT column — and destroys
  * locality on every other. Interleaving the bits of two normalized
  * sort keys orders rows along a space-filling curve instead: each
  * written file then covers a small RECTANGLE of the (x, y) space, so
  * its per-file/row-group min/max on BOTH original columns are tight
  * and a conjunctive box predicate (`x BETWEEN … AND y BETWEEN …`)
  * skips every file whose rectangle misses the box. Nothing at read
  * time changes — vanilla parquet filter pushdown does the pruning;
  * the entire win is bought at write time, which is what makes it an
  * organizational no-op to adopt at 100 TB (same reader, same query).
  *
  * The z-value is a pure column expression (fixed bit-interleave —
  * stays in whole-stage codegen) over min/max-normalized dimensions;
  * the only driver-side data is the 4 min/max scalars (one bounded
  * aggregate, same class of driver traffic as a broadcast threshold).
  */
object ZOrder {

  /** Bit-interleaved Morton code of two dimensions, each already
    * normalized to an integral [0, 2^bits) range: bit i of `a` lands
    * at position 2i, bit i of `b` at 2i+1. Inputs OUTSIDE the
    * normalized range have their high bits silently dropped (the curve
    * stops being monotone) — [[writeZOrdered]] always normalizes;
    * direct callers must too. bits ≤ 31 keeps every shifted term
    * positive in the long result. */
  def interleave(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).map { i =>
      shiftright(a, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(b, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** Min/max-normalize a numeric column to [0, 2^bits − 1]. Only
    * monotonicity matters for the curve, so double rounding is fine. */
  private def normalize(c: Column, lo: Double, hi: Double,
                        bits: Int): Column = {
    val span = if (hi > lo) hi - lo else 1.0
    floor((c.cast("double") - lit(lo)) / lit(span) * lit((1L << bits) - 1))
      .cast("long")
  }

  /** Rewrite `df` at `path` clustered along the z-curve of numeric
    * columns `c1`, `c2`, as `files` range-partitioned, internally
    * sorted files. One clustering shuffle at write time buys row-group
    * skipping for every later box scan. */
  def writeZOrdered(df: DataFrame, path: String, c1: String, c2: String,
                    files: Int, bits: Int = 16): Unit = {
    require(!df.columns.contains("__zv"),
      "input already has a __zv column — rename it before z-ordering")
    // bounded driver traffic: 4 scalars
    val r = df.agg(
      min(col(c1)).cast("double"), max(col(c1)).cast("double"),
      min(col(c2)).cast("double"), max(col(c2)).cast("double")).head()
    if (r.isNullAt(0) || r.isNullAt(2)) {
      // empty input or an all-null cluster column: nothing to cluster
      // on — write as-is rather than NPE on the missing min/max
      df.write.mode("overwrite").parquet(path)
      return
    }
    val zv = interleave(
      normalize(col(c1), r.getDouble(0), r.getDouble(1), bits),
      normalize(col(c2), r.getDouble(2), r.getDouble(3), bits), bits)
    df.withColumn("__zv", zv)
      .repartitionByRange(files, col("__zv"))
      .sortWithinPartitions("__zv")
      .drop("__zv")
      .write.mode("overwrite").parquet(path)
  }
}
