package graft.sources

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.file.{Files, Paths}
import java.util.{Map => JMap}
import scala.util.Using

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
  * self-contained binary cell format ("SSTable-lite", v2) since no
  * Cassandra jars exist in this environment (SURVEY §7.2 phase 6).
  * Component map onto a real SSTable:
  *
  * - `data-NNNN.cells`: pk-sorted fixed-width cell records — `Data.db`;
  * - header (minPk, maxPk, count) — `Summary.db` (partition range);
  * - header bloom filter over distinct pks (double-hashed, k=7,
  *   ~10 bits/key) — `Filter.db`: point lookups skip whole files the
  *   range check alone can't, BEFORE any executor work;
  * - header sparse index, one (pk, recordIdx) every `indexEvery`
  *   records — `Index.db`: pk-range scans seek to the first candidate
  *   record instead of scanning from byte 0, and split generation can
  *   cut one large file into several InputPartitions (sub-splits) so a
  *   single hot SSTable still parallelizes across executors;
  * - C2 split_gen: file × sub-split range → InputPartition, planned
  *   driver-side (the getSplits analogue);
  * - C8 pk_pushdown: range/equality filters prune files (range +
  *   bloom) and narrow record ranges (index) at planning time
  *   (`SupportsPushDownFilters`);
  * - C9 col_pruning: `SupportsPushDownRequiredColumns` projects the
  *   cell schema down to requested columns;
  * - C3 cell_deserialize: the PartitionReader decodes binary framing
  *   into typed InternalRows on executors.
  *
  * Usage: `spark.read.format("graft.sources.CellSource").load(dir)`,
  * optional `.option("subsplitRecords", n)` to bound records per
  * InputPartition (default 65536).
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

  val Magic = 0x43454c32 // "CEL2"
  val RecordBytes = 29 // pk(8) ck(4) colId(1) value(8) wt(8)
  val BloomHashes = 7
  val DefaultIndexEvery = 4096
  val DefaultSubsplitRecords = 65536

  /** 64-bit finalizer (splitmix64) for bloom double-hashing. */
  private[sources] def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 33)) * 0xff51afd7ed558ccdL
    z = (z ^ (z >>> 33)) * 0xc4ceb9fe1a85ec53L
    z ^ (z >>> 33)
  }

  private[sources] def bloomContains(words: Array[Long], pk: Long): Boolean = {
    val mBits = words.length.toLong * 64
    val h1 = mix64(pk)
    val h2 = mix64(pk ^ 0x9e3779b97f4a7c15L) | 1L
    var i = 0
    while (i < BloomHashes) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i * h2, mBits)
      if ((words((bit >>> 6).toInt) & (1L << (bit & 63))) == 0) return false
      i += 1
    }
    true
  }

  private def bloomBuild(pks: Iterable[Long]): Array[Long] = {
    val distinct = pks.toSet
    val nWords = math.max(1, (distinct.size * 10 + 63) / 64)
    val words = new Array[Long](nWords)
    val mBits = nWords.toLong * 64
    distinct.foreach { pk =>
      val h1 = mix64(pk)
      val h2 = mix64(pk ^ 0x9e3779b97f4a7c15L) | 1L
      var i = 0
      while (i < BloomHashes) {
        val bit = java.lang.Long.remainderUnsigned(h1 + i * h2, mBits)
        words((bit >>> 6).toInt) |= (1L << (bit & 63))
        i += 1
      }
    }
    words
  }

  /** Per-file metadata block: Summary (range+count) + Filter (bloom) +
    * sparse Index.
    */
  private[sources] case class Header(minPk: Long, maxPk: Long, count: Int,
      bloom: Array[Long], indexPks: Array[Long], indexIdx: Array[Int],
      dataStart: Long)

  private[sources] def readHeader(file: String): Header = {
    Using.resource(new DataInputStream(
        Files.newInputStream(Paths.get(file)))) { in =>
      val magic = in.readInt()
      require(magic == Magic, s"bad cell file magic in $file")
      val headerLen = in.readInt()
      val lo = in.readLong(); val hi = in.readLong(); val n = in.readInt()
      val nWords = in.readInt()
      val bloom = Array.fill(nWords)(in.readLong())
      val nIdx = in.readInt()
      val ipks = new Array[Long](nIdx); val iidx = new Array[Int](nIdx)
      var i = 0
      while (i < nIdx) { ipks(i) = in.readLong(); iidx(i) = in.readInt(); i += 1 }
      Header(lo, hi, n, bloom, ipks, iidx, 8L + headerLen)
    }
  }

  /** Snapshot writer (the `nodetool snapshot` stand-in): writes cells
    * into `files` pk-sorted data files, each with Summary/Filter/Index
    * metadata. Driver-side test/fixture utility.
    */
  def writeSnapshot(dir: String, cells: Seq[(Long, Int, String, Long, Long)],
      files: Int, indexEvery: Int = DefaultIndexEvery): Unit = {
    cells.iterator.map(_._3).distinct.foreach { c =>
      require(ColNames.contains(c), s"unknown cell column '$c'")
    }
    val p = Paths.get(dir)
    Files.createDirectories(p)
    val sorted = cells.sortBy(c => (c._1, c._2, c._3, c._5, c._4))
    val chunks = if (sorted.isEmpty) Seq(Seq.empty)
      else sorted.grouped(math.max(1, (sorted.size + files - 1) / files)).toSeq
    chunks.zipWithIndex.foreach { case (chunk, i) =>
      val header = new ByteArrayOutputStream()
      val h = new DataOutputStream(header)
      h.writeLong(if (chunk.isEmpty) Long.MaxValue else chunk.head._1)
      h.writeLong(if (chunk.isEmpty) Long.MinValue else chunk.last._1)
      h.writeInt(chunk.size)
      val bloom = bloomBuild(chunk.map(_._1))
      h.writeInt(bloom.length)
      bloom.foreach(h.writeLong)
      val idx = chunk.zipWithIndex.collect {
        case (c, j) if j % indexEvery == 0 => (c._1, j)
      }
      h.writeInt(idx.size)
      idx.foreach { case (pk, j) => h.writeLong(pk); h.writeInt(j) }
      Using.resource(new DataOutputStream(Files.newOutputStream(
          p.resolve(f"data-$i%04d.cells")))) { out =>
        out.writeInt(Magic)
        out.writeInt(header.size)
        out.write(header.toByteArray)
        chunk.foreach { case (pk, ck, col, value, wt) =>
          out.writeLong(pk); out.writeInt(ck)
          out.writeByte(ColNames.indexOf(col))
          out.writeLong(value); out.writeLong(wt)
        }
      }
    }
  }
}

class CellTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"cells($path)"
  override def schema(): StructType = CellSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CellScanBuilder(path,
      options.getInt("subsplitRecords", CellSource.DefaultSubsplitRecords))
}

class CellScanBuilder(path: String, subsplitRecords: Int) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var pkLower = Long.MinValue
  private var pkUpper = Long.MaxValue
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = CellSource.Schema

  /** Accept pk range predicates (the Summary/Filter/Index pruning
    * set); leave everything else to Spark's post-scan Filter.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val accepted = filters.filter {
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
    new CellScan(path, pkLower, pkUpper, required, subsplitRecords)
}

class CellScan(path: String, pkLower: Long, pkUpper: Long,
    required: StructType, subsplitRecords: Int) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"CellScan path=$path pkRange=[$pkLower,$pkUpper] " +
      s"cols=${required.fieldNames.mkString(",")}"

  /** C2 split_gen + C8 pruning, all driver-side from file headers:
    * 1. Summary range check — skip files whose [minPk,maxPk] misses
    *    the pushed pk range;
    * 2. Filter bloom check — for point lookups, skip files whose bloom
    *    filter proves the pk absent (catches pks inside the range but
    *    not present, which min/max can't);
    * 3. Index seek — binary-narrow the record range to the first/last
    *    candidate via the sparse index (pk-sorted data);
    * 4. sub-splits — cut the surviving record range into ≤
    *    `subsplitRecords` chunks so one large file parallelizes.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val dir = Paths.get(path)
    val files = Using.resource(Files.list(dir)) { s =>
      val it = s.iterator()
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      while (it.hasNext) {
        val f = it.next()
        if (f.getFileName.toString.endsWith(".cells")) buf += f.toString
      }
      buf.sorted.toSeq
    }
    val pointPk = if (pkLower == pkUpper) Some(pkLower) else None
    files.flatMap { f =>
      val h = CellSource.readHeader(f)
      if (h.count == 0 || h.maxPk < pkLower || h.minPk > pkUpper) Nil
      else if (pointPk.exists(pk => !CellSource.bloomContains(h.bloom, pk)))
        Nil // bloom-pruned: pk in range but provably absent
      else {
        // Sparse-index narrowing: records before the last entry with
        // pk < pkLower are all < pkLower; records from the first entry
        // with pk > pkUpper on are all > pkUpper.
        var start = 0
        var end = h.count
        var i = 0
        while (i < h.indexPks.length && h.indexPks(i) < pkLower) {
          start = h.indexIdx(i); i += 1
        }
        i = 0
        while (i < h.indexPks.length) {
          if (h.indexPks(i) > pkUpper) { end = math.min(end, h.indexIdx(i)); i = h.indexPks.length }
          else i += 1
        }
        Iterator.range(start.toLong, end.toLong, subsplitRecords.toLong)
          .map { s0 =>
            val n = math.min(subsplitRecords.toLong, end - s0).toInt
            CellInputPartition(f, h.dataStart, s0, n): InputPartition
          }.toSeq
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new CellReaderFactory(pkLower, pkUpper, required.fieldNames)
}

/** One sub-split: `nRecords` fixed-width records starting at record
  * `startRecord` of `file` (data section begins at byte `dataStart`).
  */
case class CellInputPartition(file: String, dataStart: Long,
    startRecord: Long, nRecords: Int) extends InputPartition

class CellReaderFactory(pkLower: Long, pkUpper: Long,
    cols: Array[String]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new CellReader(p.asInstanceOf[CellInputPartition], pkLower, pkUpper, cols)
}

/** C3 — executor-side deserialization of the binary cell framing,
  * seeking straight to the sub-split's record range.
  */
class CellReader(part: CellInputPartition, pkLower: Long, pkUpper: Long,
    cols: Array[String]) extends PartitionReader[InternalRow] {
  private val in = new DataInputStream(
    Files.newInputStream(Paths.get(part.file)))
  locally {
    var toSkip = part.dataStart + part.startRecord * CellSource.RecordBytes
    while (toSkip > 0) toSkip -= in.skip(toSkip)
  }
  private var remaining = part.nRecords
  private var row: InternalRow = _
  // Column projection is precomputed once: projIdx(i) = field of the
  // full record to emit at output position i (C9).
  private val projIdx: Array[Int] =
    cols.map(c => CellSource.Schema.fieldIndex(c))

  override def next(): Boolean = {
    while (remaining > 0) {
      remaining -= 1
      val pk = in.readLong(); val ck = in.readInt()
      val colId = in.readByte(); val value = in.readLong()
      val wt = in.readLong()
      if (pk >= pkLower && pk <= pkUpper) {
        val full = Array[Any](pk, ck,
          UTF8String.fromString(CellSource.ColNames(colId)), value, wt)
        row = InternalRow.fromSeq(projIdx.map(full).toSeq)
        return true
      }
    }
    false
  }

  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}
