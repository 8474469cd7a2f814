package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen expression — the
  * canonicalization step every text-dedup pipeline needs before
  * hashing (the same document crawled twice can carry `é` either as
  * U+00E9 or as `e`+U+0301; their md5s differ, so exact dedup misses
  * the pair unless both are normalized first). Spark has no built-in
  * Unicode normalizer, and a Scala UDF here would drop the whole
  * canonicalize→hash pipeline out of whole-stage codegen; this is the
  * same gap-filling pattern as [[Md5Prefix60]].
  *
  * Cross-engine contract: byte-identical to DuckDB's
  * `nfc_normalize(s)` (both implement Unicode canonical composition;
  * gated by the q120 oracle). The ASCII fast path returns the input
  * UTF8String unchanged — NFC is the identity on ASCII, and corpus
  * text is overwhelmingly ASCII, so the common case allocates
  * nothing and never leaves compiled code.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string argument, got ${dt.simpleString}")
  }

  // preserve the input's exact string type (collation included)
  override def dataType: DataType = child.dataType

  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  /** NFC-normalize; identity (zero-copy) for all-ASCII input.
    * The ASCII scan reads bytes in place via `getByte` — `getBytes`
    * would COPY the backing array for every UnsafeRow-backed string
    * (non-zero offset into the row buffer), turning the "allocates
    * nothing" fast path into one heap allocation per row. */
  def nfc(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      if (s.getByte(i) < 0) { // high bit set → non-ASCII somewhere
        val str = s.toString
        // isNormalized is a cheap scan; most non-ASCII text is
        // already composed, so skip the allocating normalize() call
        return if (java.text.Normalizer.isNormalized(
            str, java.text.Normalizer.Form.NFC)) s
        else UTF8String.fromString(java.text.Normalizer.normalize(
          str, java.text.Normalizer.Form.NFC))
      }
      i += 1
    }
    s
  }
}
