package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, DecimalType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.ValueCodec

/** C59 — frozen UDT surface, modeled the way Cassandra actually stores
  * user-defined types: a frozen UDT value is ONE serialized blob, the
  * cell layer treats it as `BytesType` (LWW ties break on the unsigned
  * byte compare — exactly what the connector's binary value tag
  * already does), and only the SCHEMA layer knows the field layout.
  * These expressions are that schema layer for Spark SQL:
  *
  * {{{
  * graft_udt_pack('q bigint,t string', qty, tag)       -> binary
  * graft_udt_unpack('q bigint,t string', blob)         -> struct
  * }}}
  *
  * Layout strings are `name type[, name type]*` over the cell value
  * types (bigint/int/double/boolean/string/binary/timestamp/
  * decimal(p,s)). The wire format mirrors Cassandra's UDT
  * serialization shape: fields in declared order, each
  * length(4, big-endian)-prefixed, null encoded as length −1 — so a
  * packed value with MORE trailing fields still unpacks under an older
  * layout (Cassandra's add-field-to-UDT evolution rule), and a blob
  * missing trailing fields unpacks them as null (reading new-schema
  * data written before the field existed).
  *
  * CodegenFallback: UDT pack/unpack brackets connector writes/reads
  * (once per cell), not tight numeric inner loops; the merge itself
  * runs on the blob and never unpacks.
  */
private[functions] object UdtLayout {
  /** Parse `name type,name type` into (name, tag, prec, scale). */
  def parse(layout: String): Seq[(String, Int, Int, Int)] =
    layout.split(',').toSeq.map(_.trim).filter(_.nonEmpty).map { f =>
      val sp = f.indexOf(' ')
      require(sp > 0, s"UDT field must be 'name type', got '$f'")
      val name = f.substring(0, sp).trim
      val dt = ValueCodec.parseType(f.substring(sp + 1).trim)
      val (p, s) = dt match {
        case d: DecimalType => (d.precision, d.scale)
        case _ => (0, 0)
      }
      (name, ValueCodec.tagFor(dt), p, s)
    }

  def structOf(layout: String): StructType =
    StructType(parse(layout).map { case (n, t, p, s) =>
      StructField(n, ValueCodec.dataTypeFor(t, p, s), nullable = true)
    })

  /** The layout argument must be a foldable string: the OUTPUT TYPE of
    * unpack depends on it, so it cannot vary per row.
    */
  def foldableLayout(e: Expression): Option[String] =
    if (e.foldable && e.dataType == StringType)
      Option(e.eval(null)).map(_.asInstanceOf[UTF8String].toString)
    else None
}

case class UdtPack(layoutExpr: Expression, fields: Seq[Expression])
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = layoutExpr +: fields
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  private lazy val layout =
    UdtLayout.foldableLayout(layoutExpr).getOrElse(
      throw new IllegalArgumentException(
        "graft_udt_pack: layout must be a string literal"))
  private lazy val parts = UdtLayout.parse(layout)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (UdtLayout.foldableLayout(layoutExpr).isEmpty)
      return TypeCheckResult.TypeCheckFailure(
        "graft_udt_pack: layout must be a string literal")
    if (parts.length != fields.length)
      return TypeCheckResult.TypeCheckFailure(
        s"graft_udt_pack: layout has ${parts.length} fields, " +
          s"got ${fields.length} arguments")
    val bad = parts.zip(fields).collect {
      case ((n, t, p, s), f)
          if f.dataType != ValueCodec.dataTypeFor(t, p, s) =>
        s"$n: expected ${ValueCodec.dataTypeFor(t, p, s).simpleString}," +
          s" got ${f.dataType.simpleString}"
    }
    if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_udt_pack: " + bad.mkString("; "))
  }

  override def eval(input: InternalRow): Any = {
    val out = new ByteArrayOutputStream()
    val ds = new DataOutputStream(out)
    var i = 0
    while (i < fields.length) {
      val v = fields(i).eval(input)
      if (v == null) ds.writeInt(-1)
      else {
        val fb = new ByteArrayOutputStream()
        ValueCodec.write(new DataOutputStream(fb), parts(i)._2, v)
        val b = fb.toByteArray
        ds.writeInt(b.length); ds.write(b)
      }
      i += 1
    }
    out.toByteArray
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(layoutExpr = newChildren.head, fields = newChildren.tail)
}

case class UdtUnpack(layoutExpr: Expression, blob: Expression)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(layoutExpr, blob)
  override def nullable: Boolean = blob.nullable

  private lazy val layout =
    UdtLayout.foldableLayout(layoutExpr).getOrElse(
      throw new IllegalArgumentException(
        "graft_udt_unpack: layout must be a string literal"))
  private lazy val parts = UdtLayout.parse(layout)
  override lazy val dataType: DataType = UdtLayout.structOf(layout)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (UdtLayout.foldableLayout(layoutExpr).isEmpty)
      return TypeCheckResult.TypeCheckFailure(
        "graft_udt_unpack: layout must be a string literal")
    if (blob.dataType != BinaryType)
      return TypeCheckResult.TypeCheckFailure(
        s"graft_udt_unpack: blob must be binary, got " +
          blob.dataType.simpleString)
    TypeCheckResult.TypeCheckSuccess
  }

  override def eval(input: InternalRow): Any = {
    val v = blob.eval(input)
    if (v == null) return null
    val buf = ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
    val out = new Array[Any](parts.length)
    var i = 0
    while (i < parts.length) {
      if (!buf.hasRemaining) out(i) = null // older blob: field added later
      else {
        val len = buf.getInt()
        if (len < 0) out(i) = null
        else {
          val fb = new Array[Byte](len); buf.get(fb)
          out(i) = ValueCodec.read(ByteBuffer.wrap(fb), parts(i)._2,
            parts(i)._3, parts(i)._4)
        }
      }
      i += 1
    }
    // trailing bytes (blob has MORE fields than this layout) are
    // ignored — reading evolved data with an older schema
    new GenericInternalRow(out)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(layoutExpr = newChildren(0), blob = newChildren(1))
}

/** The C59 wire format over PLAIN JVM values — the CQL front door's
  * half of the UDT schema layer (C59b). [[UdtPack]] packs Catalyst
  * internal rows inside a plan; the CQL grammar instead parses a UDT
  * literal (`{q: 10, t: 'a'}`) into external values (Long / String /
  * Double from the statement text) and packs them here, producing a
  * blob byte-identical to what [[UdtPack]] would emit — so CQL-written
  * cells and DataFrame-written cells LWW-merge and unpack uniformly.
  */
object UdtValues {
  /** Declared field names, in layout order. */
  def fields(layout: String): Seq[String] = UdtLayout.parse(layout).map(_._1)

  /** Pack external-typed field values; absent / null fields encode as
    * length −1 (Cassandra's unset-field null). Values must fit the
    * declared field type — a mismatch is a statement error, not a
    * coercion (CQL's own strictness), except the one widening CQL
    * itself performs: an integer literal into a double field.
    */
  def pack(layout: String, values: Map[String, Any]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val ds = new DataOutputStream(out)
    UdtLayout.parse(layout).foreach { case (n, tag, _, _) =>
      values.get(n).flatMap(Option(_)) match {
        case None => ds.writeInt(-1)
        case Some(v) =>
          val internal = (tag, v) match {
            case (ValueCodec.StringTag, s: String) =>
              UTF8String.fromString(s)
            case (ValueCodec.LongTag, l: Long) => l
            case (ValueCodec.IntTag, l: Long)
                if l >= Int.MinValue && l <= Int.MaxValue => l.toInt
            case (ValueCodec.DoubleTag, d: Double) => d
            case (ValueCodec.DoubleTag, l: Long) => l.toDouble
            case _ => throw new IllegalArgumentException(
              s"UDT field $n does not accept $v (declared type " +
                "mismatch)")
          }
          val fb = new ByteArrayOutputStream()
          ValueCodec.write(new DataOutputStream(fb), tag, internal)
          val b = fb.toByteArray
          ds.writeInt(b.length); ds.write(b)
      }
    }
    out.toByteArray
  }
}
