package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Hash-stable aggregation helpers.
  *
  * Summing doubles is order-dependent, and Spark's partition-parallel
  * partial aggregation visits rows in a different order than a
  * single-threaded oracle (DuckDB) — so `sum(double)` can differ in the
  * last ulp and break hash comparison. Casting to decimal first makes
  * the sum exact and associative (all source numerics in the testdata
  * are exact at 2 decimal places), and the final cast back to double is
  * correctly rounded in both engines — bit-identical results, at any
  * parallelism. This is also the right 100 TB posture: decimal partial
  * aggregation is codegen'd and the result is deterministic across
  * cluster re-runs, retries, and AQE re-plans.
  */
object Exact {
  private val D = DecimalType(18, 2)

  /** Exact sum of a 2-decimal double column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(D)).cast("double")

  /** AVG with exact numerator: sum(decimal)::double / count(col).
    * Matches SQL AVG null semantics (count of non-null values). */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Exact sum of a 2dp × 2dp product (e.g. price × (1-discount)):
    * decimal multiply is exact at 4 dp, decimal sum is associative. */
  def dsumProd(a: Column, b: Column): Column =
    sum(a.cast(D) * b.cast(D)).cast("double")

  /** The DuckDB-side spelling of [[dsum]] for oracle SQL strings. */
  def sqlDsum(col: String): String =
    s"CAST(SUM(CAST($col AS DECIMAL(18,2))) AS DOUBLE)"

  def sqlDavg(col: String): String =
    s"${sqlDsum(col)} / COUNT($col)"

  def sqlDsumProd(a: String, b: String): String =
    s"CAST(SUM(CAST($a AS DECIMAL(18,2)) * CAST($b AS DECIMAL(18,2))) AS DOUBLE)"
}
