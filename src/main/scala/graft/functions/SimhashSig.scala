package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native expression computing the 60-bit SimHash signature of a words array
  * in one fused loop: per word occurrence, vote ±1 on each of the 60 bits of
  * its [[Md5Prefix64]] content hash; bit j of the signature is set iff the
  * vote sum is positive (equivalently `2 * set_count(j) > n`).
  *
  * Why custom (SURVEY.md §2.9 preference order (b)): the declarative
  * equivalent — explode words, then a 60-column conditional-sum aggregate —
  * generates a multi-thousand-line whole-stage class whose one-time janino
  * compile dominated the query (~8s of a 9.8s cold run), and its exploded
  * rows pay hash-agg machinery for what is per-row arithmetic. This is one
  * primitive loop per document, inside whole-stage codegen, with no exchange
  * before the LSH candidate join. Oracle parity is unchanged: DuckDB computes
  * the same votes from per-word counts (`sum(±cnt)` ≡ per-occurrence ±1).
  */
final case class SimhashSig(child: Expression)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_sig requires ARRAY<STRING> input, got ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    SimhashSig.of(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimhashSig.of($c)")

  override protected def withNewChildInternal(newChild: Expression): SimhashSig =
    copy(child = newChild)
}

object SimhashSig {

  /** 60-bit SimHash of the word array (one ±1 vote per occurrence per bit).
    * Null elements cast no vote — SQL callers can pass arrays with nulls
    * (matching concat_ws/concat-style null-skipping, and DuckDB's unnest
    * dropping NULL votes from an aggregate).
    */
  def of(words: ArrayData): Long = {
    val n = words.numElements()
    val votes = new Array[Int](60)
    var voters = 0
    var i = 0
    while (i < n) {
      val w = words.getUTF8String(i)
      if (w != null) {
        voters += 1
        val h = Md5Prefix64.hash(w)
        var j = 0
        while (j < 60) { votes(j) += ((h >>> j) & 1L).toInt; j += 1 }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 60) { if (2 * votes(j) > voters) sig |= 1L << j; j += 1 }
    sig
  }

  /** Column API. */
  def apply(words: Column): Column = toColumn(SimhashSig(toExpression(words)))
}
