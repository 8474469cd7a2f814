package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental maintenance of a grouped aggregate — the materialized
  * view refresh that does NOT rescan the base table.
  *
  * The maintained state is the classic mergeable triple per group:
  * `n` (count), plus any number of decimal-exact sums. Appending a
  * delta updates the view by aggregating ONLY the delta and merging
  * group-wise (`n + Δn`, `sum + Δsum`) — O(|delta| + |groups|) instead
  * of O(|base|). Averages and other ratios derive from the merged
  * sums at read time, which is why the state holds sums, never
  * averages (averages don't merge). Decimal sums make the merge
  * associative and the refreshed view BIT-IDENTICAL to a full
  * recompute — asserted in IncrementalAggSpec.
  *
  * Deletions: feed the removed rows as a delta with `negate = true`
  * (counts and sums are abelian-group state, so retraction is sign
  * flip). Non-subtractable aggregates (min/max, distinct) need
  * re-aggregation of the affected groups — out of scope here, noted
  * for honesty.
  */
object IncrementalAgg {

  private val D = org.apache.spark.sql.types.DecimalType(18, 2)

  /** Aggregate `rows` into view state: one row per group with `n` and
    * a decimal sum per value column. */
  def state(rows: DataFrame, groupCols: Seq[String],
            sumCols: Seq[String]): DataFrame =
    rows.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sumCols.map(c => sum(col(c).cast(D)).as(s"sum_$c")): _*)

  /** Merge a delta's state into the view state — group-wise adds, a
    * shuffle over |groups| + |delta groups| rows only. */
  def merge(view: DataFrame, delta: DataFrame, groupCols: Seq[String],
            sumCols: Seq[String], negate: Boolean = false): DataFrame = {
    val sign: Column = if (negate) lit(-1L) else lit(1L)
    val d = delta
      .withColumn("n", col("n") * sign)
      .select(groupCols.map(col) ++ (col("n") +:
        sumCols.map(c => (col(s"sum_$c") * sign).cast(D).as(s"sum_$c"))): _*)
    view.unionByName(d)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("n")).cast("long").as("n"),
        sumCols.map(c => sum(col(s"sum_$c")).cast(D).as(s"sum_$c")): _*)
      // groups whose count reaches zero vanish (full-retraction case)
      .where(col("n") > 0)
  }
}
