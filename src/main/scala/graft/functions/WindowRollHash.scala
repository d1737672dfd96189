package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native sliding-window rolling-hash expression: one polynomial hash per
  * `w`-element window (stride 1) of a token-hash array — the windowed
  * chunk fingerprint [[graft.llm.TextAnalysis.rollingHash]]'s polynomial
  * structure promises (slide by subtracting `h_out · B^(w-1)` instead of
  * refolding), the standard primitive for cross-document chunk dedup.
  *
  * Input contract: `array<bigint>` of per-token hashes already reduced
  * mod P (`md5_prefix32(tok) % P`, as the whole-stream rollingHash
  * pre-reduces). Null elements hash as 0. Short inputs collapse like the
  * shingle operators: fewer than `w` elements → ONE whole-stream hash
  * (empty → [0], the init-0 fold of nothing).
  *
  * Value-identical (mod P) to the per-window refold
  * `aggregate(slice(hs, i+1, w), 0L, (a, h) -> (a*B + h) % P)` — the
  * DuckDB oracle runs exactly that refold via `list_slice`+`list_reduce`
  * — but O(n) instead of O(n·w): the slide is
  * `H_s = (H_(s-1) − h_(s-1)·B^(w-1))·B + h_(s+w-1)  (mod P)`.
  * All intermediates stay under 2^63: acc < P ≈ 2^31, B ≈ 2^20,
  * h·B^(w-1) mod-reduced before use. Codegen-participating.
  */
case class WindowRollHash(child: Expression, w: Int) extends UnaryExpression {
  require(w > 0, "window width must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"window_roll_hash requires array<bigint>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "window_roll_hash"

  override protected def nullSafeEval(input: Any): Any =
    WindowRollHash.compute(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WindowRollHash$$.MODULE$$.compute($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): WindowRollHash =
    copy(child = newChild)
}

object WindowRollHash {
  /** THE canonical rolling-hash base (TextAnalysis.RollB aliases it; the
    * DuckDB oracle SQL is generated from it). P is the shared signature
    * modulus ([[MinhashSig.P]]).
    */
  val B: Long = 1000003L
  val P: Long = MinhashSig.P

  def compute(arr: ArrayData, w: Int): ArrayData = {
    val n = arr.numElements()
    def at(i: Int): Long = if (arr.isNullAt(i)) 0L else arr.getLong(i)
    if (n < w) { // short input: one whole-stream fold (empty folds to 0)
      var acc = 0L
      var i = 0
      while (i < n) { acc = (acc * B + at(i)) % P; i += 1 }
      return new GenericArrayData(Array(acc))
    }
    val out = new Array[Long](n - w + 1)
    var bw = 1L // B^(w-1) mod P
    var k = 0
    while (k < w - 1) { bw = bw * B % P; k += 1 }
    var acc = 0L
    var i = 0
    while (i < w) { acc = (acc * B + at(i)) % P; i += 1 }
    out(0) = acc
    var s = 1
    while (s <= n - w) {
      acc = ((acc - at(s - 1) % P * bw % P) % P + P) % P
      acc = (acc * B + at(s + w - 1)) % P
      out(s) = acc
      s += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column, w: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      WindowRollHash(org.apache.spark.sql.GraftBridge.expression(c), w))
}
