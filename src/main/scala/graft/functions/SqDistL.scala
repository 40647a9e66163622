package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression for the exact integer squared L2 distance of
  * two `ARRAY<BIGINT>` columns — the inner loop of every k-means/IVF
  * assignment over quantized vectors.
  *
  * Why custom (SURVEY.md §2.9 preference order (b)): the higher-order
  * `aggregate(zip_with(a, b, (x, y) -> (x-y)*(x-y)), 0L, (acc, v) -> acc+v)`
  * chain is NOT codegen'd — Catalyst evaluates the lambdas interpretively
  * per element and materializes the zipped intermediate array per row,
  * k times per vector in an argmin fold. This expression is a single fused
  * loop over the two `ArrayData`, generated inside whole-stage codegen.
  *
  * Integer addition is associative, so the sum is order-independent and
  * replacing the higher-order chain is bit-identical; oracle parity is
  * unchanged. Elements are assumed non-null and lengths equal (quantized
  * embedding provenance); a length mismatch folds over the common prefix.
  */
final case class SqDistL(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sqdist_l requires ARRAY<BIGINT> inputs, got ${left.dataType.sql}, ${right.dataType.sql}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SqDistL.sqd(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.functions.SqDistL.sqd($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistL =
    copy(left = newLeft, right = newRight)
}

object SqDistL {

  /** Σ (x_i − y_i)² over the common prefix, in exact long arithmetic. */
  def sqd(x: ArrayData, y: ArrayData): Long = {
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { val d = x.getLong(i) - y.getLong(i); s += d * d; i += 1 }
    s
  }

  /** Column API: `SqDistL(x, y)` ≡
    * `aggregate(zip_with(x, y, (a,b) -> (a-b)*(a-b)), 0L, (acc,v) -> acc+v)`.
    */
  def apply(x: Column, y: Column): Column =
    toColumn(SqDistL(toExpression(x), toExpression(y)))
}
