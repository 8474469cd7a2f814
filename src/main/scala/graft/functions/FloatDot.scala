package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.SparkSession

/** Native dot product over two `array<float>` columns.
  *
  * The composable spelling — `aggregate(zip_with(a, b, multiply), …)` —
  * allocates an intermediate array per row and evaluates the lambda
  * through interpreted higher-order-function machinery. For an ANN
  * scoring loop that runs millions of times per task, a custom
  * `Expression` with `doGenCode` keeps the whole loop inside
  * whole-stage codegen: two `ArrayData` reads, one scalar accumulator,
  * zero allocation.
  *
  * Float multiply then double accumulate — bit-compatible with the
  * higher-order spelling it replaces (verified against numpy in the
  * similarity suite), INCLUDING its null semantics: `zip_with` pads the
  * shorter array with nulls and `x * null` is null, so a length
  * mismatch or any null element makes the whole sum null. This
  * expression returns null in exactly those cases rather than silently
  * truncating to the common prefix.
  */
case class FloatDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // null even on non-null inputs (length mismatch / null element)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"float_dot requires two array<float> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "float_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i) * y.getFloat(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |boolean $bad = $n != $b.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; !$bad && $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |  $acc += $a.getFloat($i) * $b.getFloat($i);
         |}
         |${ev.isNull} = $bad;
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Registration: `GraftFunctions.register(spark)` (idempotent), after
  * which `float_dot(a, b)` and `nfc_normalize(s)` are available to SQL
  * and `expr(...)`. Also usable via
  * `spark.sql.extensions=graft.functions.GraftExtensions`. */
object GraftFunctions {
  private val info = new ExpressionInfo(
    classOf[FloatDot].getName, "float_dot")
  private val nfcInfo = new ExpressionInfo(
    classOf[NfcNormalize].getName, "nfc_normalize")
  private val int8Info = new ExpressionInfo(
    classOf[Int8Dot].getName, "int8_dot")

  // arity-checked builders: without the match, extra SQL arguments
  // would be SILENTLY DROPPED (children.head) — wrong results with no
  // diagnostic — and zero arguments would throw a raw
  // NoSuchElementException instead of an analysis error
  private[functions] val buildFloatDot: Seq[Expression] => Expression = {
    case Seq(a, b) => FloatDot(a, b)
    case args => throw new IllegalArgumentException(
      s"float_dot requires exactly 2 arguments, got ${args.length}")
  }
  private[functions] val buildNfc: Seq[Expression] => Expression = {
    case Seq(c) => NfcNormalize(c)
    case args => throw new IllegalArgumentException(
      s"nfc_normalize requires exactly 1 argument, got ${args.length}")
  }
  private[functions] val buildInt8Dot: Seq[Expression] => Expression = {
    case Seq(a, b) => Int8Dot(a, b)
    case args => throw new IllegalArgumentException(
      s"int8_dot requires exactly 2 arguments, got ${args.length}")
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("float_dot"), info, buildFloatDot)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("nfc_normalize"), nfcInfo, buildNfc)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("int8_dot"), int8Info, buildInt8Dot)
  }
}

/** `SparkSessionExtensions` hook for config-based injection: the
  * float_dot / nfc_normalize functions plus the [[DotFusion]]
  * optimizer rule. */
class GraftExtensions
    extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatDot].getName, "float_dot"),
      GraftFunctions.buildFloatDot))
    ext.injectFunction((FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      GraftFunctions.buildNfc))
    ext.injectFunction((FunctionIdentifier("int8_dot"),
      new ExpressionInfo(classOf[Int8Dot].getName, "int8_dot"),
      GraftFunctions.buildInt8Dot))
    ext.injectOptimizerRule(_ => DotFusion)
  }
}
