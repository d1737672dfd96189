package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.types.LongType
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst predicate: membership probe of a long against a
  * pre-built [[org.apache.spark.util.sketch.BloomFilter]] shipped to every
  * task inside the expression (the serialized filter travels with the
  * plan, exactly like a broadcast literal).
  *
  * This is the big-corpus half of Bloom-prefiltered decontamination
  * (SURVEY §2.11): the eval-set fingerprints are folded into a few-MB
  * filter on the driver, and the 100 TB training side is probed row-by-row
  * INSIDE whole-stage codegen — only might-contain survivors (true matches
  * + the fpp sliver) ever reach the exact confirm join, so the corpus
  * never shuffles its non-matching fingerprints anywhere. Bloom filters
  * have no false negatives, so the downstream equi-join restores exact
  * results; false positives only cost a little extra join input.
  *
  * The filter bytes live in the expression as an opaque array; the
  * deserialized probe object is built lazily once per JVM (and installed
  * as a codegen reference object), never per row.
  */
case class BloomContainsLong(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression with Predicate {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_contains_long requires a bigint input, got ${child.dataType.catalogString}")

  override def prettyName: String = "bloom_contains_long"

  @transient private lazy val bloom: BloomFilter = BloomFilter.readFrom(bloomBytes)

  override protected def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomContainsLong =
    copy(child = newChild)
}

object BloomContainsLong {

  /** Column wrapper: serialize `bloom` once and wrap the probe column. */
  def apply(c: Column, bloom: BloomFilter): Column = {
    val out = new java.io.ByteArrayOutputStream()
    bloom.writeTo(out)
    org.apache.spark.sql.GraftBridge.column(
      BloomContainsLong(org.apache.spark.sql.GraftBridge.expression(c), out.toByteArray))
  }
}
