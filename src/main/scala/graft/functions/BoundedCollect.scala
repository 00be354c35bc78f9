package graft.functions

import scala.collection.mutable

import org.apache.spark.SparkException
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType}

/** Width-guarded replacements for `collect_list` / `collect_set`
  * (VERDICT r4 "What's wrong" §3): the per-group reassembly and
  * digest-leaf aggregates (C11/C12/C13 collection rebuild, C23 Merkle
  * leaves) are bounded by range/partition width only BY CONVENTION —
  * nothing in plain `collect_list` stops one pathological pk with
  * millions of cells from buffering an entire task's memory away.
  *
  * These aggregates enforce the bound where the memory lives: `update`
  * and `merge` fail fast with a clear error the moment a single
  * group's buffer would exceed `limit`, so the buffer NEVER holds more
  * than `limit` elements — an OOM becomes a diagnosable error naming
  * the knob. The limit flows in from the session conf
  * `graft.maxGroupWidth` (see [[BoundedCollect.maxGroupWidth]]); raise
  * it deliberately for genuinely wider groups rather than discovering
  * the width in an executor heap dump.
  *
  * Same partial/final aggregation shape as Spark's own Collect: per-
  * partition buffers, serialized through the shuffle as an unsafe
  * array, merged on the reduce side — map-side width violations die on
  * the map side.
  */
abstract class BoundedCollectBase[B <: mutable.Iterable[Any]]
    extends TypedImperativeAggregate[B] with UnaryLike[Expression] {
  def limit: Int

  override def dataType: DataType =
    ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false

  protected def overflow(): Nothing = throw new SparkException(
    s"$prettyName: a single group exceeded $limit elements; " +
      "widen graft.maxGroupWidth only if groups this wide are " +
      "intended (each element is buffered in executor memory)")

  protected def add(buffer: B, value: Any): B

  override def update(buffer: B, input: InternalRow): B = {
    val v = child.eval(input)
    if (v != null) add(buffer, InternalRow.copyValue(v))
    buffer
  }

  override def merge(buffer: B, other: B): B = {
    other.foreach(add(buffer, _))
    buffer
  }

  override def eval(buffer: B): Any =
    new GenericArrayData(buffer.toArray)

  // Shuffle format: one unsafe row holding one array of the element
  // type (the same scheme Spark's Collect uses).
  @transient private lazy val projection = UnsafeProjection.create(
    Array[DataType](ArrayType(child.dataType, containsNull = false)))
  @transient private lazy val row = new UnsafeRow(1)

  override def serialize(obj: B): Array[Byte] = {
    val array = new GenericArrayData(obj.toArray)
    projection.apply(InternalRow.apply(array)).getBytes
  }

  override def deserialize(bytes: Array[Byte]): B = {
    val buffer = createAggregationBuffer()
    row.pointTo(bytes, bytes.length)
    row.getArray(0).foreach(child.dataType, (_, x) => add(buffer, x))
    buffer
  }
}

/** `collect_list` that fails fast past `limit` elements per group. */
case class BoundedCollectList(
    child: Expression,
    limit: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends BoundedCollectBase[mutable.ArrayBuffer[Any]] {

  override def prettyName: String = "graft_collect_bounded"

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty

  override protected def add(buffer: mutable.ArrayBuffer[Any],
      value: Any): mutable.ArrayBuffer[Any] = {
    if (buffer.size >= limit) overflow()
    buffer += value
  }

  override def withNewMutableAggBufferOffset(
      newOffset: Int): BoundedCollectList =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(
      newOffset: Int): BoundedCollectList =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): BoundedCollectList = copy(child = newChild)
}

/** `collect_set` that fails fast past `limit` DISTINCT elements per
  * group (duplicates are absorbed by the set buffer, so a skewed
  * stream of repeats does not trip the guard — only true width does).
  */
case class BoundedCollectSet(
    child: Expression,
    limit: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends BoundedCollectBase[mutable.LinkedHashSet[Any]] {

  override def prettyName: String = "graft_collect_set_bounded"

  // Set membership relies on value equality of buffered elements;
  // nested types mix Unsafe/Generic representations whose equals is
  // not value-based, so only atomic elements are accepted (Spark's
  // own collect_set carries the same hazard for maps).
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.types._
    child.dataType match {
      case _: ArrayType | _: MapType | _: StructType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"$prettyName needs an atomic element type, got " +
              child.dataType.simpleString)
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
    }
  }

  override def createAggregationBuffer(): mutable.LinkedHashSet[Any] =
    mutable.LinkedHashSet.empty

  override protected def add(buffer: mutable.LinkedHashSet[Any],
      value: Any): mutable.LinkedHashSet[Any] = {
    if (!buffer.contains(value)) {
      if (buffer.size >= limit) overflow()
      buffer += value
    }
    buffer
  }

  override def withNewMutableAggBufferOffset(
      newOffset: Int): BoundedCollectSet =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(
      newOffset: Int): BoundedCollectSet =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): BoundedCollectSet = copy(child = newChild)
}

object BoundedCollect {
  /** Default per-group element cap: 2^21 elements ≈ tens of MB of
    * buffered smallish values — far below task memory, far above any
    * sane CQL collection / digest-leaf width.
    */
  val DefaultMaxGroupWidth: Int = 1 << 21

  /** The documented knob: session conf `graft.maxGroupWidth`. */
  def maxGroupWidth(s: org.apache.spark.sql.SparkSession): Int =
    s.conf.getOption("graft.maxGroupWidth").map(_.toInt)
      .getOrElse(DefaultMaxGroupWidth)
}
