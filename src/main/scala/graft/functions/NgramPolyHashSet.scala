package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the DISTINCT polynomial hashes of all
  * character n-grams of a string, in one pass over its bytes.
  *
  * Gram hash = fold `acc -> (acc * B + byte) mod P` over the gram's
  * bytes (B = 1000003, P = 2^31-1; equal to the init-less fold DuckDB's
  * `list_reduce` computes, since byte codes < P). Strings shorter than
  * `n` collapse to one whole-string hash, mirroring the shingle
  * operators' short-document rule.
  *
  * Why native: char n-grams produce ~one gram per character — a 1500-char
  * document yields ~1500 grams, and the built-in chain
  * (`transform(sequence(...), substr)` + md5 per gram) allocates a
  * gram string and runs a cryptographic digest for each. This expression
  * walks the byte array once with integer arithmetic — no per-gram
  * allocation, no digest — which is what makes character-level LSH
  * (q45) affordable at corpus scale. Codegen-participating via
  * [[doGenCode]].
  *
  * Byte-based by design: hashes consume UTF-8 bytes, so any engine
  * hashing the same byte sequence agrees (code points == bytes on the
  * ASCII corpora the oracle runs; a hash needs no linguistic meaning).
  */
case class NgramPolyHashSet(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, "n must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ngram_poly_hash_set requires a string input, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_poly_hash_set"

  override protected def nullSafeEval(input: Any): Any =
    NgramPolyHashSet.hashSet(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NgramPolyHashSet$$.MODULE$$.hashSet($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): NgramPolyHashSet =
    copy(child = newChild)
}

object NgramPolyHashSet {
  val B: Long = 1000003L
  val P: Long = 2147483647L // 2^31 - 1, prime (same modulus as MinhashSig)

  /** Distinct gram hashes in first-occurrence order (order never matters
    * downstream: consumers are min-per-permutation and set sizes).
    */
  def hashSet(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    if (len < n) {
      var h = 0L
      var j = 0
      while (j < len) { h = (h * B + (bytes(j) & 0xff)) % P; j += 1 }
      new GenericArrayData(Array(h))
    } else {
      val seen = new java.util.LinkedHashSet[java.lang.Long]()
      var i = 0
      while (i <= len - n) {
        var h = 0L
        var j = 0
        while (j < n) { h = (h * B + (bytes(i + j) & 0xff)) % P; j += 1 }
        seen.add(h)
        i += 1
      }
      val out = new Array[Long](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = it.next(); k += 1 }
      new GenericArrayData(out)
    }
  }

  /** Column wrapper for DataFrame-API use. */
  def apply(c: Column, n: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      NgramPolyHashSet(org.apache.spark.sql.GraftBridge.expression(c), n))
}
