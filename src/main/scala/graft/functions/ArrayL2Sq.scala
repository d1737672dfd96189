package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native squared-L2 distance of two long vectors — one fused loop
  * instead of the interpreted `aggregate(zip_with(a, b, (x,y) =>
  * (x-y)*(x-y)), 0, _+_)` chain. Higher-order array functions do NOT
  * whole-stage-codegen (the round-19 sf10 campaign caught executors
  * pinned in interpreted `ZipWith.eval`/`ArrayAggregate.eval`), and
  * this shape runs once per row × centroid in k-means assignment / PQ
  * encode / IVF routing, and once per candidate × subspace in ADC
  * scoring — the hottest loops of the index build and serve paths.
  *
  * Value-identical to the composed form for equal-length vectors;
  * pairs of different lengths are a data error and raise (zip_with
  * would silently null-pad). Null inputs yield null; null ELEMENTS
  * contribute 0, matching [[ArrayDotProduct]]'s partial-data rule.
  */
case class ArrayL2Sq(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"array_l2_sq requires two array<bigint>, got ${l.catalogString}, ${r.catalogString}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "array_l2_sq"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrayL2Sq.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ArrayL2Sq$$.MODULE$$.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ArrayL2Sq =
    copy(left = newLeft, right = newRight)
}

object ArrayL2Sq {
  def compute(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    require(n == b.numElements(),
      s"array_l2_sq: length mismatch ($n vs ${b.numElements()})")
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val d = a.getLong(i) - b.getLong(i)
        acc += d * d
      }
      i += 1
    }
    acc
  }

  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      ArrayL2Sq(
        org.apache.spark.sql.GraftBridge.expression(a),
        org.apache.spark.sql.GraftBridge.expression(b)))
}
