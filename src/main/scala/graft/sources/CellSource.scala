package graft.sources

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.nio.file.{Files, Path, Paths}
import java.util.{Map => JMap}
import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A DataSource V2 source with the architecture of a Cassandra-SSTable
  * snapshot reader (SURVEY §2 rows C1/C2/C3/C8/C9), over a
  * self-contained binary cell format ("SSTable-lite") since no
  * Cassandra jars exist in this environment (SURVEY §7.2 phase 6):
  *
  * - a snapshot directory holds `data-NNNN.cells` files, each a
  *   pk-sorted run of cells with a header carrying (minPk, maxPk,
  *   count) — the `Data.db` + `Summary.db` pair;
  * - C2 split_gen: one InputPartition per data file, planned on the
  *   driver (the getSplits analogue);
  * - C8 pk_pushdown: pk range/equality filters prune whole files via
  *   the header min/max before any executor work — the
  *   bloom/Summary pruning path (`SupportsPushDownFilters`);
  * - C9 col_pruning: `SupportsPushDownRequiredColumns` projects the
  *   fixed cell schema down to the requested columns;
  * - C3 cell_deserialize: the PartitionReader decodes the binary
  *   framing into typed InternalRows on executors.
  *
  * Usage: `spark.read.format(classOf[CellSource].getName).load(dir)`.
  */
class CellSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CellSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new CellTable(properties.get("path"))

  override def supportsExternalMetadata(): Boolean = false
}

object CellSource {
  val Schema: StructType = StructType(Seq(
    StructField("pk", LongType, nullable = false),
    StructField("ck", IntegerType, nullable = false),
    StructField("col", StringType, nullable = false),
    StructField("value", LongType, nullable = false),
    StructField("wt", LongType, nullable = false)))

  val ColNames: Array[String] = Array("qty", "price")

  /** Snapshot writer (the `nodetool snapshot` stand-in): writes cells
    * into `files` pk-sorted data files with (minPk, maxPk, count)
    * headers. Driver-side test/fixture utility.
    */
  def writeSnapshot(dir: String, cells: Seq[(Long, Int, String, Long, Long)],
      files: Int): Unit = {
    val p = Paths.get(dir)
    Files.createDirectories(p)
    val sorted = cells.sortBy(c => (c._1, c._2, c._3))
    val chunks = if (sorted.isEmpty) Seq(Seq.empty)
      else sorted.grouped(math.max(1, (sorted.size + files - 1) / files)).toSeq
    chunks.zipWithIndex.foreach { case (chunk, i) =>
      val out = new DataOutputStream(Files.newOutputStream(
        p.resolve(f"data-$i%04d.cells")))
      try {
        out.writeLong(if (chunk.isEmpty) Long.MaxValue else chunk.head._1)
        out.writeLong(if (chunk.isEmpty) Long.MinValue else chunk.last._1)
        out.writeInt(chunk.size)
        chunk.foreach { case (pk, ck, col, value, wt) =>
          out.writeLong(pk); out.writeInt(ck)
          out.writeByte(ColNames.indexOf(col))
          out.writeLong(value); out.writeLong(wt)
        }
      } finally out.close()
    }
  }
}

class CellTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"cells($path)"
  override def schema(): StructType = CellSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CellScanBuilder(path)
}

class CellScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var pkLower = Long.MinValue
  private var pkUpper = Long.MaxValue
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = CellSource.Schema

  /** Accept pk range predicates (the Summary/bloom pruning set); leave
    * everything else to Spark's post-scan Filter.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo("pk", _: java.lang.Long) => true
      case GreaterThan("pk", _: java.lang.Long) => true
      case GreaterThanOrEqual("pk", _: java.lang.Long) => true
      case LessThan("pk", _: java.lang.Long) => true
      case LessThanOrEqual("pk", _: java.lang.Long) => true
      case _ => false
    }
    accepted.foreach {
      case EqualTo("pk", v: java.lang.Long) =>
        pkLower = math.max(pkLower, v); pkUpper = math.min(pkUpper, v)
      case GreaterThan("pk", v: java.lang.Long) =>
        pkLower = math.max(pkLower, v + 1)
      case GreaterThanOrEqual("pk", v: java.lang.Long) =>
        pkLower = math.max(pkLower, v)
      case LessThan("pk", v: java.lang.Long) =>
        pkUpper = math.min(pkUpper, v - 1)
      case LessThanOrEqual("pk", v: java.lang.Long) =>
        pkUpper = math.min(pkUpper, v)
      case _ =>
    }
    pushed = accepted
    // Hand accepted filters back as residual too: file pruning is
    // range-granular, rows inside a kept file still need the filter.
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new CellScan(path, pkLower, pkUpper, required)
}

class CellScan(path: String, pkLower: Long, pkUpper: Long,
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"CellScan path=$path pkRange=[$pkLower,$pkUpper] " +
      s"cols=${required.fieldNames.mkString(",")}"

  /** C2 split_gen + C8 file pruning: one partition per data file whose
    * header range intersects the pushed pk range (driver-side).
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val dir = Paths.get(path)
    val files = Files.list(dir).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".cells")).toSeq.sortBy(_.toString)
    files.flatMap { f =>
      val in = new DataInputStream(Files.newInputStream(f))
      val (lo, hi) = try (in.readLong(), in.readLong()) finally in.close()
      if (hi < pkLower || lo > pkUpper) None // pruned split
      else Some(CellInputPartition(f.toString): InputPartition)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new CellReaderFactory(pkLower, pkUpper, required.fieldNames)
}

case class CellInputPartition(file: String) extends InputPartition

class CellReaderFactory(pkLower: Long, pkUpper: Long,
    cols: Array[String]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new CellReader(p.asInstanceOf[CellInputPartition].file,
      pkLower, pkUpper, cols)
}

/** C3 — executor-side deserialization of the binary cell framing. */
class CellReader(file: String, pkLower: Long, pkUpper: Long,
    cols: Array[String]) extends PartitionReader[InternalRow] {
  private val in = new DataInputStream(Files.newInputStream(Paths.get(file)))
  in.readLong(); in.readLong() // header min/max
  private var remaining = in.readInt()
  private var row: InternalRow = _

  override def next(): Boolean = {
    while (remaining > 0) {
      remaining -= 1
      val pk = in.readLong(); val ck = in.readInt()
      val colId = in.readByte(); val value = in.readLong()
      val wt = in.readLong()
      if (pk >= pkLower && pk <= pkUpper) {
        val full = Map[String, Any](
          "pk" -> pk, "ck" -> ck,
          "col" -> UTF8String.fromString(CellSource.ColNames(colId)),
          "value" -> value, "wt" -> wt)
        row = InternalRow.fromSeq(cols.toSeq.map(full))
        return true
      }
    }
    false
  }

  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}
