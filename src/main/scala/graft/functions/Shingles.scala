package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native expression producing the DISTINCT word-3-gram shingle array of a
  * words array — the unit set of MinHash/Jaccard dedup.
  *
  * Why custom (SURVEY.md §2.9 preference order (b)): the equivalent
  * `array_distinct(transform(sequence(1, size(w)-2), i -> concat_ws(' ',
  * element_at(w,i), element_at(w,i+1), element_at(w,i+2))))` chain evaluates
  * the lambda interpretively with three boxed element lookups per shingle and
  * materializes the pre-distinct array. This is one fused loop with a
  * first-occurrence-order hash set (identical semantics to array_distinct),
  * generated inside whole-stage codegen; the downstream `explode` is the
  * codegen'd builtin.
  */
final case class Shingles(child: Expression)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingles requires ARRAY<STRING> input, got ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Shingles.of(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Shingles.of($c)")

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

object Shingles {

  private val space = UTF8String.fromString(" ")

  /** Distinct 3-gram shingles in first-occurrence order (= array_distinct
    * over the in-order transform); empty for fewer than 3 words.
    */
  def of(words: ArrayData): ArrayData = {
    val n = words.numElements()
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](n * 2)
    var i = 0
    while (i < n - 2) {
      seen.add(UTF8String.concatWs(space,
        words.getUTF8String(i), words.getUTF8String(i + 1), words.getUTF8String(i + 2)))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  /** Column API. */
  def apply(words: Column): Column = toColumn(Shingles(toExpression(words)))
}
