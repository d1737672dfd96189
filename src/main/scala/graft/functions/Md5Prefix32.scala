package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the first 32 bits of md5(input) as an
  * unsigned long — value-identical to
  * `conv(substring(md5(s), 1, 8), 16, 10) :: long` (the portable hash the
  * DuckDB oracles compute), but with no hex-string round trip: the
  * built-in chain allocates a 32-char hex string, substrings it, and
  * parses base-16 per call; this computes straight from the digest bytes
  * with a thread-local MessageDigest.
  *
  * This is the engine's (b)-tier extension point (SURVEY §7.3): a scalar
  * hot enough to justify bypassing built-ins — it runs once per shingle ×
  * corpus in MinHash dedup — while everything else in the engine stays on
  * built-in expressions. Codegen participates in whole-stage codegen via
  * [[doGenCode]].
  */
case class Md5Prefix32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_prefix32 requires a string input, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix32"

  override protected def nullSafeEval(input: Any): Any =
    Md5Prefix32.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Prefix32$$.MODULE$$.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix32 =
    copy(child = newChild)
}

object Md5Prefix32 {
  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 4 digest bytes, big-endian, as an unsigned 32-bit value in a
    * long — equal to parsing the first 8 hex characters of the md5 string.
    */
  def hash(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Column wrapper for DataFrame-API use. */
  def apply(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      Md5Prefix32(org.apache.spark.sql.GraftBridge.expression(c)))
}

/** SparkSessionExtensions entry point: register the engine's native
  * functions for SQL use (`--conf spark.sql.extensions=graft.functions.GraftExtensions`),
  * or install into an existing session with [[GraftExtensions.install]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach(ext.injectFunction)
}

object GraftExtensions {
  private[functions] val descriptors: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("md5_prefix32"),
      new ExpressionInfo(classOf[Md5Prefix32].getName, "md5_prefix32"),
      (children: Seq[Expression]) => Md5Prefix32(children.head)),
    (new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinhashSig].getName, "minhash_sig"),
      (children: Seq[Expression]) => MinhashSig(children.head,
        children(1).eval().asInstanceOf[Number].intValue())),
    (new FunctionIdentifier("array_dot_product"),
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "array_dot_product"),
      (children: Seq[Expression]) => ArrayDotProduct(children.head, children(1))),
    (new FunctionIdentifier("array_l2_sq"),
      new ExpressionInfo(classOf[ArrayL2Sq].getName, "array_l2_sq"),
      (children: Seq[Expression]) => ArrayL2Sq(children.head, children(1))),
    (new FunctionIdentifier("ngram_poly_hash_set"),
      new ExpressionInfo(classOf[NgramPolyHashSet].getName, "ngram_poly_hash_set"),
      (children: Seq[Expression]) => NgramPolyHashSet(children.head,
        children(1).eval().asInstanceOf[Number].intValue())),
    (new FunctionIdentifier("window_roll_hash"),
      new ExpressionInfo(classOf[WindowRollHash].getName, "window_roll_hash"),
      (children: Seq[Expression]) => WindowRollHash(children.head,
        children(1).eval().asInstanceOf[Number].intValue())),
    (new FunctionIdentifier("zorder64"),
      new ExpressionInfo(classOf[ZOrder64].getName, "zorder64"),
      (children: Seq[Expression]) => ZOrder64(children.head, children(1))),
    (new FunctionIdentifier("sorted_count_le"),
      new ExpressionInfo(classOf[SortedCountLe].getName, "sorted_count_le"),
      (children: Seq[Expression]) => SortedCountLe(children.head, children(1))),
    // aggregate: the analyzer wraps the bare AggregateFunction; args 2-3
    // (expectedItems, fpp) must be foldable literals. SQL decimal
    // literals (0.01) eval to Catalyst Decimal, not java.lang.Number.
    (new FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(classOf[BloomAgg].getName, "bloom_agg"),
      (children: Seq[Expression]) => BloomAgg(children.head,
        numArg(children(1)).longValue(), numArg(children(2)).doubleValue())),
    // the probe side: arg 2 is the serialized filter as a binary literal
    // (e.g. a bloom_agg result collected and re-inlined)
    (new FunctionIdentifier("bloom_contains_long"),
      new ExpressionInfo(classOf[BloomContainsLong].getName, "bloom_contains_long"),
      (children: Seq[Expression]) => BloomContainsLong(children.head,
        children(1).eval().asInstanceOf[Array[Byte]])))

  private def numArg(e: Expression): Number = e.eval() match {
    case d: org.apache.spark.sql.types.Decimal => d.toBigDecimal.bigDecimal
    case n: Number => n
    case other => throw new IllegalArgumentException(
      s"expected a foldable numeric literal, got $other")
  }

  /** Idempotent registration on a live session (for sessions not built
    * with the extensions conf).
    */
  def install(spark: SparkSession): Unit =
    descriptors.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
