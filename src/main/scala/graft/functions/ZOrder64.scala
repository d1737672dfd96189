package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: the 62-bit Morton (z-order) interleave of
  * two keys' low 31 bits — `a`'s bits land on even positions, `b`'s on
  * odd. Sorting (or range-partitioning a write) by this single key
  * co-locates rows that are close in BOTH dimensions, so per-file min/max
  * statistics become tight on BOTH columns and a scan filtered on either
  * one skips most files — the standard lakehouse multi-column clustering
  * trick, impossible with a lexicographic (a, b) sort where the second
  * key's ranges stay global in every file.
  *
  * Inputs are masked to their low 31 bits (documented, mirrored by the
  * oracle) — callers with wider or negative domains must pre-normalize
  * (e.g. rank or bucket first), which a layout job does anyway. The
  * interleave itself is the classic O(log w) mask-spread bit trick, one
  * branch-free expression inside whole-stage codegen.
  */
case class ZOrder64(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"zorder64 requires (bigint, bigint), got ${l.catalogString}, ${r.catalogString}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder64"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrder64.compute(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ZOrder64$$.MODULE$$.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ZOrder64 =
    copy(left = newLeft, right = newRight)
}

object ZOrder64 {
  /** Spread the low 31 bits of `v` onto the even bit positions. */
  def spread(v: Long): Long = {
    var x = v & 0x7fffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  def compute(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)

  /** Column wrapper for DataFrame-API use. */
  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      ZOrder64(
        org.apache.spark.sql.GraftBridge.expression(a),
        org.apache.spark.sql.GraftBridge.expression(b)))
}
