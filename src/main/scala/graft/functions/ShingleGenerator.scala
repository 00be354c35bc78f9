package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst table function (SURVEY §7.6 tier (b), completing
  * N_UDTF1's deferred "full Generator later"): word n-gram shingles as
  * a true `Generator`, usable from SQL as
  * `SELECT graft_shingles(text, 3) FROM ...` or `LATERAL VIEW`.
  *
  * Versus the `explode(transform(sequence(...), ...))` composition the
  * HOF form uses, the Generator emits rows directly from one token
  * split — no intermediate shingle array materialized per row, which
  * at 100 TB removes an allocation of (doc length × n-gram) bytes per
  * document from the explode path. Tokenization matches
  * [[graft.text.TextOps.tokens]] (single-space split, empty tokens
  * kept) so both forms shingle identically.
  */
case class ShingleGenerator(text: Expression, n: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(text, n)

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType == StringType && n.dataType == IntegerType &&
        n.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_shingles expects (string, constant int)")

  override def elementSchema: StructType =
    StructType(StructField("shingle", StringType, nullable = false) :: Nil)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = text.eval(input)
    if (t == null) Iterator.empty
    else {
      val k = n.eval(input).asInstanceOf[Int]
      // -1 keeps trailing empty tokens — the split() contract
      // TextOps.tokens relies on (Spark SQL split has no-limit default)
      val toks = t.asInstanceOf[UTF8String].toString.split(" ", -1)
      if (toks.length < k) Iterator.empty
      else (0 to toks.length - k).iterator.map { i =>
        InternalRow(UTF8String.fromString(
          toks.slice(i, i + k).mkString(" ")))
      }
    }
  }

  override def prettyName: String = "graft_shingles"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(text = newChildren(0), n = newChildren(1))
}
