package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing the engine's 60-bit content hash —
  * the first 60 bits of MD5 as an unsigned long, definitionally identical to
  * `conv(substring(md5(x), 1, 15), 16, 10)::long` (and to DuckDB's
  * `('0x' || substr(md5(x),1,15))::BIGINT`, so oracle parity is unchanged).
  *
  * Why custom (SURVEY.md §2.9 preference order (b)): this sits in the
  * innermost loop of MinHash/SimHash/fingerprinting — shingles × 16 seeds at
  * corpus scale. The built-in chain materializes a 32-char hex string, slices
  * it, and runs radix conversion per value; this expression digests once and
  * assembles the long directly from the first 8 bytes, with `doGenCode` so it
  * stays inside whole-stage codegen.
  */
final case class Md5Prefix64(child: Expression)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_prefix64 requires BINARY input, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    Md5Prefix64.hash(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Prefix64.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix64 =
    copy(child = newChild)
}

object Md5Prefix64 {

  /** First 60 bits of MD5(bytes), big-endian, as a non-negative long
    * (= parsing the first 15 hex chars of the digest).
    */
  def hash(bytes: Array[Byte]): Long = {
    val d = MessageDigest.getInstance("MD5").digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4 // 64 bits assembled, keep the leading 60 (15 hex chars)
  }

  /** Convenience for string input (UTF-8 bytes, matching md5(cast(s as binary))). */
  def hash(s: UTF8String): Long = hash(s.getBytes)

  /** Column API: `Md5Prefix64(c)` ≡ `conv(substring(md5(c),1,15),16,10)::long`. */
  def apply(c: Column): Column =
    toColumn(Md5Prefix64(toExpression(c.cast(BinaryType))))
}
