package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the double-precision dot product of two
  * `ARRAY<DOUBLE>` columns — the inner loop of every cosine in the
  * similarity/dedup pipeline (brute/IVF/LSH ANN, embedding near-dup,
  * per-vector norms).
  *
  * Why custom (SURVEY.md §2.9 preference order (b)): the higher-order
  * `aggregate(zip_with(x, y, (a, b) -> a * b), 0d, (acc, v) -> acc + v)`
  * chain is NOT codegen'd — Catalyst evaluates the lambdas interpretively per
  * element and materializes the zipped intermediate array per row. This
  * expression is a single fused loop over the two `ArrayData`, generated
  * inside whole-stage codegen.
  *
  * Summation is the same sequential left-to-right fold as the higher-order
  * chain and DuckDB's `list_dot_product`, so replacing one with the other is
  * bit-identical and oracle parity is unchanged. Elements are assumed
  * non-null and lengths equal (embedding provenance — parquet float arrays);
  * a length mismatch folds over the common prefix.
  */
final case class DotProductD(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_d requires ARRAY<DOUBLE> inputs, got ${left.dataType.sql}, ${right.dataType.sql}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProductD.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.functions.DotProductD.dot($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductD =
    copy(left = newLeft, right = newRight)
}

object DotProductD {

  /** Sequential fold: ((0 + x0·y0) + x1·y1) + … — matches the evaluation
    * order of the higher-order chain and `list_dot_product`.
    */
  def dot(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  /** Column API: `DotProductD(x, y)` ≡
    * `aggregate(zip_with(x, y, (a,b) -> a*b), 0d, (acc,v) -> acc+v)`.
    */
  def apply(x: Column, y: Column): Column =
    toColumn(DotProductD(toExpression(x), toExpression(y)))
}
