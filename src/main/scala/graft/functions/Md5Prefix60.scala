package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native spelling of the cross-engine dedup hash
  * ([[graft.dedup.Md5Prefix]]): the first 15 hex characters of
  * `md5(s)` read as a base-16 BIGINT — i.e. the top 60 bits of the
  * raw digest. The composable spelling
  * `conv(substring(md5(s), 1, 15), 16, 10)` materializes a 32-char
  * hex string, slices it, and PARSES it back through a generic
  * radix-conversion loop — three string round-trips per value on
  * pipelines that hash every shingle/token-pair in the corpus
  * (MinHash signatures, CDC boundaries, split buckets). This
  * expression reads the 60 bits straight out of the digest bytes:
  * seven full bytes plus the high nibble of the eighth, one shift-or
  * chain, zero allocation beyond the digest itself.
  *
  * Bit-identity with the composed spelling (and therefore with
  * DuckDB's `('0x'||substr(md5(s),1,15))::BIGINT`) is asserted
  * property-style in Md5Prefix60Spec and by every oracle gate that
  * runs over it.
  */
case class Md5Prefix60(child: Expression) extends UnaryExpression {

  // any-collation strings and raw binary, matching what md5()'s
  // implicit cast accepted in the composed spelling this replaces
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"md5_prefix60 requires a string or binary argument, " +
        s"got ${dt.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "md5_prefix60"

  private def isBinary: Boolean = child.dataType == BinaryType

  override protected def nullSafeEval(input: Any): Any =
    if (isBinary) Md5Prefix60.hash(input.asInstanceOf[Array[Byte]])
    else Md5Prefix60.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Md5Prefix60.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Prefix60 {
  // MessageDigest instances are not thread-safe and not free to
  // construct: one per thread, reset per use.
  private val digests =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** Top 60 bits of md5(bytes of s), big-endian — exactly the value of
    * the first 15 hex characters parsed base-16 (always ≥ 0). */
  def hash(s: UTF8String): Long = hash(s.getBytes)

  def hash(bytes: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    // bytes 0..6 in full (56 bits) then the high nibble of byte 7
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >>> 4)
  }
}
