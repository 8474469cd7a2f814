package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, LongType}

/** Native integer dot product over two `array<tinyint>` columns — the
  * int8-ANN counterpart of [[FloatDot]].
  *
  * The composable spelling — `aggregate(zip_with(a, b, (x, y) ->
  * CAST(x AS BIGINT) * CAST(y AS BIGINT)), 0L, +)` — allocates an
  * intermediate array per row and runs interpreted higher-order
  * machinery. A kNN GRAPH evaluates the dot once per candidate PAIR
  * (q155: corpus × corpus in gate mode), so the per-row constant
  * dominates the query; this expression keeps the loop in whole-stage
  * codegen: two `ArrayData` reads, one long accumulator, zero
  * allocation.
  *
  * Arithmetic is exact either way (|v| ≤ 127 ⇒ Σ products well inside
  * BIGINT for any realistic dimension), so the two spellings are
  * bit-identical — pinned in Int8DotSpec, INCLUDING the null
  * semantics: `zip_with` pads the shorter array with nulls and
  * null-in-multiply nulls the sum, so a length mismatch or any null
  * element makes the result null here too. */
case class Int8Dot(left: Expression, right: Expression)
    extends BinaryExpression {

  // null even on non-null inputs (length mismatch / null element)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(ByteType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"int8_dot requires two array<tinyint> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "int8_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getByte(i).toLong * y.getByte(i).toLong
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
         |long $acc = 0L;
         |for (int $i = 0; !$bad && $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |  $acc += (long) $a.getByte($i) * (long) $b.getByte($i);
         |}
         |${ev.isNull} = $bad;
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
