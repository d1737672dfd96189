package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native integer dot product of two long vectors — one fused loop
  * instead of the interpreted `aggregate(zip_with(a, b, _*_), 0, _+_)`
  * chain (which allocates the zipped array and walks it twice per pair;
  * this runs once per candidate×query pair in similarity search, the
  * hottest inner loop in the engine).
  *
  * Value-identical to the composed form for equal-length vectors; pairs
  * of different lengths are a data error and raise (zip_with would
  * silently null-pad — failing fast is safer for embeddings).
  * Null inputs yield null; null ELEMENTS are treated as 0 (zip_with's
  * null product would poison the whole sum to null — embeddings carry no
  * null elements, and 0 keeps partial data usable).
  */
case class ArrayDotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"array_dot_product requires two array<bigint>, got ${l.catalogString}, ${r.catalogString}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "array_dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrayDotProduct.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ArrayDotProduct$$.MODULE$$.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

object ArrayDotProduct {
  def compute(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    require(n == b.numElements(),
      s"array_dot_product: length mismatch ($n vs ${b.numElements()})")
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }

  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      ArrayDotProduct(
        org.apache.spark.sql.GraftBridge.expression(a),
        org.apache.spark.sql.GraftBridge.expression(b)))
}
