package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Deterministic-output helper for oracle-compared queries.
  *
  * Several testdata tables (lineitem) have no unique key, so ordering
  * by a key prefix is not total and row order would be nondeterministic
  * across engines/parallelism. Sorting by EVERY output column (the
  * DuckDB `ORDER BY ALL` idiom) makes any remaining ties fully
  * identical rows, which hash identically no matter how they permute.
  *
  * This final global sort exists for the correctness gate only; the
  * underlying operators are order-agnostic and at 100 TB one would drop
  * the sort (or keep it as a range-partitioned write, which is how
  * Spark executes a global orderBy — no single-node bottleneck).
  */
object Ordered {
  def byAll(df: DataFrame): DataFrame =
    df.orderBy(df.columns.map(col).toIndexedSeq: _*)
}
