package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DecimalType, LongType}

import graft.sources.{KeyCodec, KeyPart, KeySpec, ValueCodec}

/** `graft_token(part, ...)` — the CQL `token(...)` function: the ring
  * position the cell connector assigns to a partition key with these
  * part values, computed with the connector's OWN codec
  * ([[KeyCodec.token]]), so SQL can address physical ring ranges:
  *
  * {{{
  * SELECT * FROM cells WHERE _token = graft_token('user-3')
  * SELECT * FROM cells
  * WHERE _token BETWEEN graft_token(...) AND graft_token(...)
  * }}}
  *
  * composing with the `_token` scan column's pushdown (C45) — the
  * predicate lands as the scan's literal token bounds. Single `bigint`
  * argument is the identity (the default layout's token IS the pk);
  * any other shape hashes, exactly as the write path does. Part types
  * are taken from the argument types, so the argument list must match
  * the table's partition-key layout part for part — TYPE-STRICT like
  * CQL's own `token()`: on a bigint-keyed table write
  * `graft_token(CAST(3 AS BIGINT))`, because a bare `3` is an INT
  * literal and an int part HASHES (int and bigint are distinct key
  * layouts; silently widening would mis-token genuinely int-keyed
  * tables).
  *
  * CodegenFallback: tokens are computed on key literals and small
  * probe sets in practice, never in a per-row hot loop (per-row ring
  * positions come from the `_token` column, which the reader decodes
  * for free).
  */
case class PartitionToken(children: Seq[Expression])
    extends Expression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.isEmpty)
      return TypeCheckResult.TypeCheckFailure(
        "graft_token needs at least one partition-key part")
    val bad = children.filter(c =>
      scala.util.Try(ValueCodec.tagFor(c.dataType)).isFailure)
    if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_token: unsupported key part type(s) " +
        bad.map(_.dataType.simpleString).mkString(", "))
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)

  private lazy val spec: KeySpec = KeySpec(
    children.zipWithIndex.map { case (c, i) =>
      val (p, s) = c.dataType match {
        case d: DecimalType => (d.precision, d.scale)
        case _ => (0, 0)
      }
      KeyPart(s"p$i", ValueCodec.tagFor(c.dataType), p, s)
    }.toList,
    Nil)

  override def eval(input: InternalRow): Any = {
    val vals = new Array[Any](children.length)
    var i = 0
    while (i < children.length) {
      val v = children(i).eval(input)
      if (v == null) return null
      vals(i) = v
      i += 1
    }
    KeyCodec.token(spec, vals)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}
