package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Order-preserving 64-bit keys for text values — the C18i
  * SASI-PREFIX-mode analog. A string's key is its first 8 UTF-8
  * bytes big-endian (zero-padded), shifted into signed-long order,
  * so LEXICOGRAPHIC byte order of strings equals NUMERIC order of
  * keys on those bytes. A prefix `p` then covers exactly the closed
  * key range `[lowBound(p), highBound(p)]` (0x00- vs 0xFF-padding):
  * every string starting with `p` keys inside it, and the only
  * non-matching strings inside are those sharing p's first 8 bytes —
  * bounded false positives the base re-read's LIKE re-check drops
  * (Cassandra's own index-then-fetch-then-filter contract).
  *
  * This is why Cassandra's SASI serves `LIKE 'p%'` from its
  * PREFIX-mode index: the term dictionary is ORDER-PRESERVING, so a
  * prefix is one contiguous dictionary range. Here the key IS the
  * index table's long partition key with identity tokens, so the
  * range pushes as a Summary-pruned pk range over the index files —
  * the same plan shape as the C18e numeric SPARSE range.
  */
object PrefixCodec {
  private def bound(b: Array[Byte], pad: Long): Long = {
    var v = 0L
    var i = 0
    while (i < 8) {
      v = (v << 8) | (if (i < b.length) b(i) & 0xffL else pad)
      i += 1
    }
    // unsigned byte order -> signed long order (flip the sign bit)
    v ^ Long.MinValue
  }

  /** The string's order-preserving key == the smallest key any
    * string starting with these bytes can have.
    */
  def encode(s: UTF8String): Long = lowBound(s.getBytes)

  def lowBound(prefix: Array[Byte]): Long = bound(prefix, 0x00L)

  /** The largest key any string starting with these bytes can have. */
  def highBound(prefix: Array[Byte]): Long = bound(prefix, 0xffL)
}

/** `graft_prefix64(text)` — [[PrefixCodec.encode]] as a codegen'd
  * Catalyst expression: the C18i index build derives one entry key
  * per indexed cell with it (per-row on the delta, so whole-stage
  * codegen matters here, unlike graft_token's literal-only use).
  */
case class Prefix64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_prefix64 takes a string, got " +
        child.dataType.simpleString)

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    PrefixCodec.encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PrefixCodec.encode($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)

  override def prettyName: String = "graft_prefix64"
}
