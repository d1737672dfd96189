package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash-signature expression: one pass over the shingle-hash
  * array computing all `numSig` permutation minima, instead of `numSig`
  * separate interpreted `transform`+`array_min` evaluations (each of
  * which walks and re-allocates the array).
  *
  * Value-identical to
  * `array((0..n).map(j => array_min(transform(h, x => (x*A(j)+B(j)) % P))))`
  * with the seeds of [[graft.llm.Dedup]]: null elements are skipped (as
  * `array_min` does) and an element with no non-null inputs is null.
  * Codegen participates in whole-stage codegen via a static helper call.
  */
case class MinhashSig(child: Expression, numSig: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<bigint>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinhashSig.compute(input.asInstanceOf[ArrayData], numSig)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinhashSig$$.MODULE$$.compute($c, $numSig)")

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}

object MinhashSig {
  /** THE canonical permutation modulus/seeds (graft.llm.Dedup aliases
    * these; the DuckDB oracle SQL is generated from them).
    */
  val P: Long = 2147483647L
  def seedA(j: Int): Long = 131L + 2L * j * 1009L
  def seedB(j: Int): Long = 7L + 4409L * j

  def compute(arr: ArrayData, numSig: Int): ArrayData = {
    val n = arr.numElements()
    val mins = new Array[Long](numSig)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var seen = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        seen = true
        val h = arr.getLong(i)
        var j = 0
        while (j < numSig) {
          val v = (h * seedA(j) + seedB(j)) % P
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!seen) new GenericArrayData(new Array[Any](numSig)) // all nulls
    else new GenericArrayData(mins)
  }

  def apply(c: Column, numSig: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      MinhashSig(org.apache.spark.sql.GraftBridge.expression(c), numSig))
}
