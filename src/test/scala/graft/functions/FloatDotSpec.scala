package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** float_dot contract: bit-identical to the composable
  * `aggregate(zip_with(a, b, multiply), 0d, sum)` spelling — including
  * its null semantics (null on length mismatch, null-propagation on
  * null elements, null on null input arrays). */
class FloatDotSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  private val composable =
    "aggregate(zip_with(a, b, (x, y) -> x * y), cast(0 as double), (acc, x) -> acc + x)"

  private def df = Seq(
    (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),   // plain
    (Array(0.1f, 0.2f), Array(0.3f, 0.7f)),               // inexact floats
    (Array.empty[Float], Array.empty[Float])              // empty → 0.0
  ).toDF("a", "b")

  test("bit-identical to the composable spelling on equal-length arrays") {
    val rows = df.select(
      expr("float_dot(a, b)").as("fast"),
      expr(composable).as("slow")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), r.toString)
    }
  }

  test("length mismatch and null elements return null, like zip_with") {
    val weird = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(Seq(1.0f, 2.0f), Seq(3.0f)),                    // mismatch
        Row(Seq(1.0f, null), Seq(3.0f, 4.0f)),              // null element
        Row(null, Seq(1.0f)),                               // null array
        Row(Seq(1.0f), Seq(2.0f))),                         // control
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("a",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType, containsNull = true)),
        org.apache.spark.sql.types.StructField("b",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType, containsNull = true)))))
    val rows = weird.select(
      expr("float_dot(a, b)").as("fast"),
      expr(composable).as("slow")).collect()
    rows.foreach { r => assert(r.isNullAt(0) == r.isNullAt(1), r.toString) }
    assert(rows(0).isNullAt(0) && rows(1).isNullAt(0) && rows(2).isNullAt(0))
    assert(rows(3).getDouble(0) == 2.0)
  }

  test("DotFusion rewrites the composable spelling to FloatDot") {
    DotFusion.install(spark)
    try {
      // a parquet-backed source: a purely local relation would be
      // constant-folded away before the fused expression is observable
      val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
        .select(col("vec_id"), col("embedding").as("a"))
        .limit(50)
      val comp =
        "aggregate(zip_with(a, a, (x, y) -> x * y), cast(0 as double), (acc, x) -> acc + x)"
      val df2 = emb.select(expr(comp).as("d"))
      val fused = df2.queryExecution.optimizedPlan.collectFirst {
        case p if p.expressions.exists(_.exists(_.isInstanceOf[FloatDot])) => p
      }.isDefined
      assert(fused, df2.queryExecution.optimizedPlan.toString)
      // fused results bit-match the direct expression
      val a = df2.collect().map(_.getDouble(0))
      val b = emb.select(expr("float_dot(a, a)")).collect().map(_.getDouble(0))
      assert(a.zip(b).forall { case (x, y) =>
        java.lang.Double.doubleToLongBits(x) ==
          java.lang.Double.doubleToLongBits(y)
      })
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == DotFusion)
    }
  }

  test("interpreted eval agrees with codegen") {
    // force the interpreted path through a non-codegen context: eval on
    // the expression directly
    val e = FloatDot(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1.0f, 2.0f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, false)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(3.0f, 4.0f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, false)))
    assert(e.eval(null) == 11.0)
    val mismatch = FloatDot(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1.0f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, false)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(3.0f, 4.0f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, false)))
    assert(mismatch.eval(null) == null)
  }
}
