package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering: the multi-dimensional data-
  * skipping layout for scans that filter on MORE than one column.
  *
  * Sorting a table on one column gives parquet row-group min/max
  * stats that prune scans filtering on THAT column — and destroys
  * locality on every other. Interleaving the bits of N normalized
  * sort keys orders rows along a space-filling curve instead: each
  * written file then covers a small hyper-rectangle of the value
  * space, so its per-file/row-group min/max on EVERY clustered column
  * are tight and a conjunctive box predicate (`x BETWEEN … AND y
  * BETWEEN …`) skips every file whose rectangle misses the box.
  * Nothing at read time changes — vanilla parquet filter pushdown
  * does the pruning; the entire win is bought at write time, which is
  * what makes it an organizational no-op to adopt at 100 TB (same
  * reader, same query).
  *
  * The z-value is a pure column expression (fixed bit-interleave —
  * stays in whole-stage codegen) over min/max-normalized dimensions;
  * the only driver-side data is the 2N min/max scalars (one bounded
  * aggregate, same class of driver traffic as a broadcast threshold).
  * Per-dim resolution falls as dims grow (63 total bits): 2 dims get
  * 16 bits each by default, 4 dims 15, 8 dims 7 — the standard
  * z-order trade, and why clustering on more than ~4 columns stops
  * paying.
  */
object ZOrder {

  /** Bit-interleaved Morton code of N dimensions, each already
    * normalized to an integral [0, 2^bits) range: bit i of dimension d
    * lands at position i·N + d. Inputs OUTSIDE the normalized range
    * have their high bits silently dropped (the curve stops being
    * monotone) — [[writeZOrdered]] always normalizes; direct callers
    * must too. bits·N ≤ 63 keeps every shifted term positive in the
    * long result. */
  def interleave(cols: Seq[Column], bits: Int = 16): Column = {
    val n = cols.length
    require(n >= 1, "interleave needs at least one column")
    require(bits >= 1 && bits * n <= 63,
      s"bits * dims must be in [1, 63], got $bits * $n")
    (0 until bits).flatMap { i =>
      cols.zipWithIndex.map { case (c, d) =>
        shiftright(c, i).bitwiseAND(lit(1L)) * lit(1L << (i * n + d))
      }
    }.reduce(_ + _)
  }

  /** Two-dimension convenience (bit i of `a` at 2i, of `b` at 2i+1). */
  def interleave(a: Column, b: Column, bits: Int): Column =
    interleave(Seq(a, b), bits)

  /** Min/max-normalize a numeric column to [0, 2^bits − 1]. Only
    * monotonicity matters for the curve, so double rounding is fine. */
  private def normalize(c: Column, lo: Double, hi: Double,
                        bits: Int): Column = {
    val span = if (hi > lo) hi - lo else 1.0
    floor((c.cast("double") - lit(lo)) / lit(span) * lit((1L << bits) - 1))
      .cast("long")
  }

  /** Rewrite `df` at `path` clustered along the z-curve of the numeric
    * `clusterCols`, as `files` range-partitioned, internally sorted
    * files. One clustering shuffle at write time buys row-group
    * skipping for every later box scan. Default bit budget: as many
    * bits per dimension as fit in 63 (capped at 16). */
  def writeZOrdered(df: DataFrame, path: String, clusterCols: Seq[String],
                    files: Int, bits: Int = 0): Unit = {
    val n = clusterCols.length
    require(n >= 1, "need at least one cluster column")
    require(bits >= 0, s"bits must be 0 (auto) or positive, got $bits")
    val b = if (bits > 0) bits else math.min(16, 63 / n)
    require(!df.columns.contains("__zv"),
      "input already has a __zv column — rename it before z-ordering")
    // bounded driver traffic: 2N scalars — (min, max) per column
    val aggs = clusterCols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val bounds = clusterCols.indices.map { i =>
      (if (r.isNullAt(2 * i)) None else Some(r.getDouble(2 * i)),
        if (r.isNullAt(2 * i + 1)) None else Some(r.getDouble(2 * i + 1)))
    }
    if (bounds.exists(_._1.isEmpty)) {
      // empty input or an all-null cluster column: nothing to cluster
      // on — write as-is rather than NPE on the missing min/max
      df.write.mode("overwrite").parquet(path)
      return
    }
    val zv = interleave(
      clusterCols.zip(bounds).map { case (c, (lo, hi)) =>
        normalize(col(c), lo.get, hi.get, b)
      }, b)
    df.withColumn("__zv", zv)
      .repartitionByRange(files, col("__zv"))
      .sortWithinPartitions("__zv")
      .drop("__zv")
      .write.mode("overwrite").parquet(path)
  }

  /** Two-column convenience overload. */
  def writeZOrdered(df: DataFrame, path: String, c1: String, c2: String,
                    files: Int, bits: Int): Unit =
    writeZOrdered(df, path, Seq(c1, c2), files, bits)

  def writeZOrdered(df: DataFrame, path: String, c1: String, c2: String,
                    files: Int): Unit =
    writeZOrdered(df, path, Seq(c1, c2), files)
}
