package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Binary search over an ascending-sorted long array: the number of
  * elements ≤ `probe` — equivalently the 1-based index of the GREATEST
  * element ≤ probe, or 0 when every element exceeds it. O(log n) per row
  * where the composed `size(filter(arr, x -> x <= probe))` is O(n) and
  * allocates the filtered array; this runs once per probe row in the
  * broadcast as-of join, whose whole point is that the probe side is the
  * 100 TB one.
  *
  * Contract: the array must be sorted ascending with no null elements
  * (the as-of builder constructs it with sort_array over null-filtered
  * timestamps); an unsorted array gives an unspecified index, exactly
  * like C++ lower_bound. Null array or null probe yields null.
  */
case class SortedCountLe(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_count_le requires (array<bigint>, bigint), got ${l.catalogString}, ${r.catalogString}")
    }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_count_le"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedCountLe.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SortedCountLe$$.MODULE$$.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SortedCountLe =
    copy(left = newLeft, right = newRight)
}

object SortedCountLe {
  def compute(arr: ArrayData, probe: Long): Int = {
    var lo = 0
    var hi = arr.numElements()
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (arr.getLong(mid) <= probe) lo = mid + 1 else hi = mid
    }
    lo
  }

  def apply(arr: Column, probe: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      SortedCountLe(
        org.apache.spark.sql.GraftBridge.expression(arr),
        org.apache.spark.sql.GraftBridge.expression(probe)))
}
