package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** long_dot contract: bit-identical to the composable
  * `aggregate(zip_with(a, b, multiply), 0L, sum)` spelling —
  * including the null semantics (null on length mismatch, null
  * propagation on null elements, null on null input arrays). The
  * q192 rep-pair scoring rides this expression. */
class LongDotSpec extends SparkSpec {
  import spark.implicits._

  private def ld(a: org.apache.spark.sql.Column,
                 b: org.apache.spark.sql.Column) =
    org.apache.spark.sql.GraftBridge.column(
      LongDot(org.apache.spark.sql.GraftBridge.expression(a),
        org.apache.spark.sql.GraftBridge.expression(b)))

  private val composable =
    "aggregate(zip_with(a, b, (x, y) -> x * y), " +
      "CAST(0 AS BIGINT), (acc, x) -> acc + x)"

  private def df = Seq(
    (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),
    (Seq(1000000L, -1000000L), Seq(1000000L, 1000000L)),
    (Seq.empty[Long], Seq.empty[Long])
  ).toDF("a", "b")

  test("equal to the composable spelling, extremes included") {
    val rows = df.select(ld(col("a"), col("b")).as("fast"),
      expr(composable).as("slow")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
    assert(rows(0).getLong(0) == 32L)
    assert(rows(1).getLong(0) == 0L)
    assert(rows(2).getLong(0) == 0L)
  }

  test("null semantics match zip_with") {
    val odd = Seq((Seq(1L, 2L), Seq(1L, 2L, 3L)))
      .toDF("a", "b")
    val r = odd.select(ld(col("a"), col("b")).as("fast"),
      expr(composable).as("slow")).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
    val withNull = Seq((Seq[java.lang.Long](1L, null),
      Seq[java.lang.Long](1L, 1L))).toDF("a", "b")
    val r2 = withNull.select(ld(col("a"), col("b")).as("fast"),
      expr(composable).as("slow")).head()
    assert(r2.isNullAt(0) && r2.isNullAt(1))
  }
}
