package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Executor-side readers for the CEL6 typed-key format (SURVEY §1.1
  * "PRIMARY KEY ((p1, p2), c1)"; VERDICT r6 "Next round" §1): records
  * carry a precomputed partition TOKEN followed by typed key-part
  * values, so all file/chunk pruning stays on the long token while
  * rows surface the real key columns. The merge cursor mirrors
  * [[CellMergeCursor]] — same LWW/counter combine, same marker state
  * machine — with typed lexicographic key comparison in place of the
  * fixed `(pk: Long, ck: Int)` order.
  *
  * Row-at-a-time for now: typed keys are variable-width, and the
  * declared typed queries are point/merge shapes where decode is not
  * the bottleneck; a vectorized twin can follow the CEL5 pattern if a
  * wide typed scan ever becomes hot.
  */

/** Per-file decoded record stream of one CEL6 sub-split: token, typed
  * pk parts, marker rank, typed ck parts, column name, typed value,
  * writetime.
  */
private[sources] final class CellKeyedStream(p: CellInputPartition) {
  private val spec = p.keySpec
  private val cursor = new ChunkCursor(p)
  private var remaining = 0
  var token = 0L
  var pkVals: Array[Any] = _
  var rank: Byte = 1
  var ckVals: Array[Any] = _
  var colName: String = _
  var value: Any = _
  var wt = 0L
  var expiry = Long.MaxValue // CEL11 per-record expiry

  /** Next record with token in [lo, hi]; false (and closed) when the
    * sub-split is exhausted.
    */
  def advance(lo: Long, hi: Long): Boolean = {
    while (true) {
      while (remaining > 0) {
        remaining -= 1
        val b = cursor.buf
        token = b.getLong()
        val pk = new Array[Any](spec.pkParts.length)
        var i = 0
        spec.pkParts.foreach { part =>
          pk(i) = ValueCodec.read(b, part.tag, part.prec, part.scale)
          i += 1
        }
        rank = b.get()
        val ck = new Array[Any](spec.ckParts.length)
        var j = 0
        spec.ckParts.foreach { part =>
          ck(j) = ValueCodec.read(b, part.tag, part.prec, part.scale)
          j += 1
        }
        // colId is an UNSIGNED byte (up to 255 columns)
        colName = p.colNames(b.get() & 0xff)
        value = ValueCodec.read(b, p.valueTag, p.decPrec, p.decScale)
        wt = b.getLong()
        expiry = if (p.hasExpiry) b.getLong() else Long.MaxValue
        pkVals = pk; ckVals = ck
        if (token >= lo && token <= hi) return true
      }
      if (!cursor.nextChunk()) { cursor.close(); return false }
      remaining = cursor.chunkRecs
    }
    false
  }

  def close(): Unit = cursor.close()
}

/** Output projection shared by the keyed readers: required column
  * names → slots of the full `key parts ++ (col, value, wt)` row.
  */
private[sources] final class KeyedProjection(spec: KeySpec,
    valueType: DataType, cols: Array[String]) {
  private val fullSchema: StructType = CellSource.schemaFor(spec, valueType)
  // -1 = the pseudo-column `_token` (withToken scans); -2 = the
  // CEL11 pseudo-column `_expiry` (withTtl scans)
  private val projIdx: Array[Int] = cols.map(c =>
    if (c == "_token") -1
    else if (c == "_expiry") -2
    else fullSchema.fieldIndex(c))
  private val nPk = spec.pkParts.length
  private val nCk = spec.ckParts.length

  def row(token: Long, pkVals: Array[Any], ckVals: Array[Any],
      colName: String, value: Any, wt: Long,
      expiry: Long = Long.MaxValue): InternalRow = {
    val out = new Array[Any](projIdx.length)
    var i = 0
    while (i < projIdx.length) {
      val f = projIdx(i)
      out(i) =
        if (f == -1) token
        else if (f == -2) expiry
        else if (f < nPk) pkVals(f)
        else if (f < nPk + nCk) ckVals(f - nPk)
        else if (f == nPk + nCk) UTF8String.fromString(colName)
        else if (f == nPk + nCk + 1) value
        else wt
      i += 1
    }
    new GenericInternalRow(out)
  }
}

/** Plain (non-reconciling) reader over one CEL6 sub-split — the typed
  * twin of [[CellReader]]. `tokenLower`/`tokenUpper` are the pushed
  * token bounds (identity for single-long keys, point/IN hashes
  * otherwise); exactness comes from Spark's residual filter, so token
  * collisions only cost a row, never correctness.
  */
class CellKeyedReader(part: CellInputPartition, tokenLower: Long,
    tokenUpper: Long, cols: Array[String])
    extends PartitionReader[InternalRow] {
  private val stream = new CellKeyedStream(part)
  // the projection serves the table-level (declared, C51e-renamed)
  // names; the header spec keeps storage names
  private val proj = new KeyedProjection(
    CellPlanning.declaredSpecFor(part.file, part.keySpec),
    ValueCodec.dataTypeFor(part.valueTag, part.decPrec, part.decScale),
    cols)
  private var row: InternalRow = _
  private var cellsRead = 0L
  override def currentMetricsValues()
      : Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    Array(CellTaskMetric("cells_read", cellsRead))

  override def next(): Boolean = {
    if (!stream.advance(tokenLower, tokenUpper)) return false
    cellsRead += 1
    row = proj.row(stream.token, stream.pkVals, stream.ckVals,
      stream.colName, stream.value, stream.wt, stream.expiry)
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = stream.close()
}

/** Vectorized reader over one CEL6/8 sub-split — the typed twin of
  * [[CellColumnarReader]]: one ColumnarBatch per compression chunk,
  * key parts decoded straight into per-part column vectors, so wide
  * typed scans feed whole-stage codegen batches instead of
  * row-at-a-time GenericInternalRows (at 100 TB the raw typed scan —
  * CDC streams included — is decode-bound exactly like the untyped
  * one was before CEL5 vectorization).
  */
private[sources] object KeyedVec {
  import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector

  /** Typed key-part / value → column vector slot. */
  def put(vec: OnHeapColumnVector, n: Int, tag: Int, prec: Int,
      v: Any): Unit = tag match {
    case ValueCodec.LongTag | ValueCodec.TimestampTag =>
      vec.putLong(n, v.asInstanceOf[Long])
    case ValueCodec.IntTag => vec.putInt(n, v.asInstanceOf[Int])
    case ValueCodec.DoubleTag => vec.putDouble(n, v.asInstanceOf[Double])
    case ValueCodec.BoolTag => vec.putBoolean(n, v.asInstanceOf[Boolean])
    case ValueCodec.StringTag =>
      val b = v.asInstanceOf[UTF8String].getBytes
      vec.putByteArray(n, b, 0, b.length)
    case ValueCodec.BinaryTag =>
      val b = v.asInstanceOf[Array[Byte]]
      vec.putByteArray(n, b, 0, b.length)
    case ValueCodec.DecimalTag =>
      vec.putDecimal(n,
        v.asInstanceOf[org.apache.spark.sql.types.Decimal], prec)
  }
}

class CellKeyedColumnarReader(part: CellInputPartition,
    tokenLower: Long, tokenUpper: Long, cols: Array[String])
    extends PartitionReader[
      org.apache.spark.sql.vectorized.ColumnarBatch] {
  import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
  import org.apache.spark.sql.vectorized.ColumnarBatch
  private val spec =
    CellPlanning.declaredSpecFor(part.file, part.keySpec)
  private val cursor = new ChunkCursor(part)
  private val valueType: DataType =
    ValueCodec.dataTypeFor(part.valueTag, part.decPrec, part.decScale)
  private val fullSchema: StructType =
    CellSource.schemaFor(spec, valueType)
  // -1 = `_token` (withToken scans); -2 = `_expiry` (withTtl scans)
  private val projIdx: Array[Int] = cols.map(c =>
    if (c == "_token") -1
    else if (c == "_expiry") -2
    else fullSchema.fieldIndex(c))
  private val outSchema = StructType(projIdx.map {
    case -1 => org.apache.spark.sql.types.StructField("_token",
      org.apache.spark.sql.types.LongType, nullable = false)
    case -2 => org.apache.spark.sql.types.StructField("_expiry",
      org.apache.spark.sql.types.LongType, nullable = false)
    case f => fullSchema(f)
  })
  private val colNameBytes: Array[Array[Byte]] =
    part.colNames.map(_.getBytes("UTF-8"))
  private val nPk = spec.pkParts.length
  private val nCk = spec.ckParts.length
  private val partTags: Array[Int] =
    (spec.pkParts ++ spec.ckParts).map(_.tag).toArray
  private val partPrec: Array[Int] =
    (spec.pkParts ++ spec.ckParts).map(_.prec).toArray
  private val partScale: Array[Int] =
    (spec.pkParts ++ spec.ckParts).map(_.scale).toArray
  private var batch: ColumnarBatch = _

  private def put(vec: OnHeapColumnVector, n: Int, tag: Int, prec: Int,
      v: Any): Unit = KeyedVec.put(vec, n, tag, prec, v)

  private var cellsRead = 0L
  override def currentMetricsValues()
      : Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    Array(CellTaskMetric("cells_read", cellsRead))

  override def next(): Boolean = {
    if (batch != null) { batch.close(); batch = null }
    var n = 0
    var vectors: Array[OnHeapColumnVector] = null
    val rec = new Array[Any](nPk + nCk)
    while (n == 0) {
      if (!cursor.nextChunk()) return false
      val nRecs = cursor.chunkRecs
      vectors = OnHeapColumnVector.allocateColumns(nRecs, outSchema)
      val buf = cursor.buf
      var r = 0
      while (r < nRecs) {
        val token = buf.getLong()
        var k = 0
        while (k < nPk) {
          rec(k) = ValueCodec.read(buf, partTags(k), partPrec(k),
            partScale(k))
          k += 1
        }
        buf.get() // rank — marker ordering only
        while (k < nPk + nCk) {
          rec(k) = ValueCodec.read(buf, partTags(k), partPrec(k),
            partScale(k))
          k += 1
        }
        val colId = buf.get() & 0xff
        val value = ValueCodec.read(buf, part.valueTag, part.decPrec,
          part.decScale)
        val wt = buf.getLong()
        val exp = if (part.hasExpiry) buf.getLong() else Long.MaxValue
        cellsRead += 1 // decoded, whether or not the token filter keeps it
        if (token >= tokenLower && token <= tokenUpper) {
          var i = 0
          while (i < projIdx.length) {
            val f = projIdx(i)
            if (f == -1) vectors(i).putLong(n, token)
            else if (f == -2) vectors(i).putLong(n, exp)
            else if (f < nPk + nCk) put(vectors(i), n, partTags(f),
              partPrec(f), rec(f))
            else if (f == nPk + nCk) {
              val b = colNameBytes(colId)
              vectors(i).putByteArray(n, b, 0, b.length)
            } else if (f == nPk + nCk + 1)
              put(vectors(i), n, part.valueTag, part.decPrec, value)
            else vectors(i).putLong(n, wt)
            i += 1
          }
          n += 1
        }
        r += 1
      }
    }
    batch = new ColumnarBatch(
      vectors.map(v => v: org.apache.spark.sql.vectorized.ColumnVector))
    batch.setNumRows(n)
    true
  }

  override def get(): ColumnarBatch = batch
  override def close(): Unit = {
    if (batch != null) batch.close()
    cursor.close()
  }
}

/** K-way merge over typed keys — [[CellMergeCursor]]'s semantics
  * (LWW / counter shard-SUM winners, tombstone + TTL marker state)
  * with the CEL6 record order: (token, pk parts, rank, ck parts,
  * col). Clustering-RANGE tombstones (`!delr:<lo>:<hi>`) apply only
  * to single-`int`-clustering-key tables, where the marker's textual
  * bounds are unambiguous; other layouts consume the marker without
  * effect (writing one there is a modeling error, not data loss —
  * the marker survives compaction via keepMarkers either way).
  * Clustering-PREFIX tombstones (`!delpfx:<j>`, multi-part ck
  * layouts) shadow every row whose first j clustering parts equal
  * the marker row's — Cassandra's prefix-bounded RangeTombstone.
  */
/** What the keyed reconcile reader needs from a winner stream —
  * implemented by the forward merge cursor and its reversing wrapper
  * (the typed twin of [[ReconcileCursor]]).
  */
private[sources] trait KeyedCursor {
  def nextWinner(): Boolean
  def close(): Unit
  def pkVals: Array[Any]
  def ckVals: Array[Any]
  def colName: String
  def value: Any
  def wt: Long
  /** The winning version's CEL11 per-cell expiry (absolute ms;
    * Long.MaxValue = never).
    */
  def expiry: Long
  def valueTag: Int
  def decPrec: Int
  def decScale: Int
}

private[sources] object KeyedCursor {
  def of(part: CellReconcilePartition,
      opts: ReconcileOptions): KeyedCursor = {
    val base: KeyedCursor =
      if (opts.reverse) new CellKeyedReverseCursor(part, opts)
      else new CellKeyedMergeCursor(part, opts)
    opts.pageAfterTyped.fold(base)(pa =>
      new CellKeyedPagedCursor(base, part, pa))
  }
}

/** C52b — typed paging wrapper (the typed twin of
  * [[CellPagedCursor]]): drops winners at or before the cursor
  * position in the stream's OWN order — (token, pk parts, ck parts,
  * col) — so pages compose with tombstones, rewrites, and TTL exactly
  * like the default layout's. The cursor's token already seeded the
  * scan's lower bound, so only the cursor partition's (and token
  * collisions') already-served winners reach this skip.
  */
private[sources] final class CellKeyedPagedCursor(inner: KeyedCursor,
    part: CellReconcilePartition,
    pa: (Array[Any], Array[Any], String)) extends KeyedCursor {
  private val spec: KeySpec =
    if (part.fileParts.isEmpty) KeySpec.Default
    else part.fileParts(0).keySpec
  private val paToken = KeyCodec.token(spec, pa._1)

  private def beforeOrAtCursor: Boolean = {
    val t = KeyCodec.token(spec, inner.pkVals)
    var c = java.lang.Long.compare(t, paToken)
    if (c == 0)
      c = KeyCodec.compareParts(spec.pkParts, inner.pkVals, pa._1)
    if (c == 0)
      c = KeyCodec.compareParts(spec.ckParts, inner.ckVals, pa._2)
    if (c == 0) c = inner.colName.compareTo(pa._3)
    c <= 0
  }

  // winner positions are MONOTONE in stream order: once one winner
  // passes the cursor, no later winner can precede it — the per-row
  // token/compare work stops after the first kept row
  private var passed = false

  def nextWinner(): Boolean = {
    var v = inner.nextWinner()
    if (!passed) {
      while (v && beforeOrAtCursor) v = inner.nextWinner()
      if (v) passed = true
    }
    v
  }
  def close(): Unit = inner.close()
  def pkVals: Array[Any] = inner.pkVals
  def ckVals: Array[Any] = inner.ckVals
  def colName: String = inner.colName
  def value: Any = inner.value
  def wt: Long = inner.wt
  def expiry: Long = inner.expiry
  def valueTag: Int = inner.valueTag
  def decPrec: Int = inner.decPrec
  def decScale: Int = inner.decScale
}

/** Reversed clustering order over a typed (CEL6) table — the typed
  * twin of [[CellReverseCursor]]: forward merge (markers must fold
  * before the data they shadow), per-ck tail deque per partition, a
  * ring of the LAST `perPartitionLimit` clustering rows when a limit
  * is set, `reverseMaxRows` fail-fast otherwise.
  */
private[sources] final class CellKeyedReverseCursor(
    part: CellReconcilePartition, opts: ReconcileOptions)
    extends KeyedCursor {
  require(!opts.keepMarkers,
    "reverse reads cannot keepMarkers (compaction is forward-only)")
  private val spec: KeySpec =
    if (part.fileParts.isEmpty) KeySpec.Default
    else part.fileParts(0).keySpec
  private val inner = new CellKeyedMergeCursor(part,
    opts.copy(perPartitionLimit = Int.MaxValue))
  private val ppl = opts.perPartitionLimit
  private val maxRows = opts.reverseMaxRows
  def valueTag: Int = inner.valueTag
  def decPrec: Int = inner.decPrec
  def decScale: Int = inner.decScale

  var pkVals: Array[Any] = _
  var ckVals: Array[Any] = _
  var colName: String = _
  var value: Any = _
  var wt = 0L
  var expiry = Long.MaxValue

  private var innerValid = inner.nextWinner()
  private val groups = new java.util.ArrayDeque[
    (Array[Any], scala.collection.mutable.ArrayBuffer[
      (String, Any, Long, Long)])]()
  private var bufferedRows = 0
  private var outPk: Array[Any] = _
  private var emit: Iterator[(Array[Any], String, Any, Long, Long)] =
    Iterator.empty

  private def fillNextPk(): Boolean = {
    if (!innerValid) return false
    val cur = inner.pkVals
    groups.clear(); bufferedRows = 0
    while (innerValid &&
        KeyCodec.compareParts(spec.pkParts, inner.pkVals, cur) == 0) {
      if (groups.isEmpty || KeyCodec.compareParts(spec.ckParts,
          groups.peekLast()._1, inner.ckVals) != 0) {
        groups.addLast((inner.ckVals, scala.collection.mutable
          .ArrayBuffer.empty[(String, Any, Long, Long)]))
        if (ppl != Int.MaxValue && groups.size > ppl)
          bufferedRows -= groups.removeFirst()._2.size
      }
      groups.peekLast()._2 += ((inner.colName, inner.value, inner.wt,
        inner.expiry))
      bufferedRows += 1
      if (bufferedRows > maxRows)
        throw new IllegalStateException(
          s"reverse read buffered > $maxRows rows of one partition; " +
            "add perPartitionLimit, a ck slice, or raise " +
            "reverseMaxRows")
      innerValid = inner.nextWinner()
    }
    outPk = cur
    emit = new Iterator[(Array[Any], String, Any, Long, Long)] {
      private val it = groups.descendingIterator()
      private var row: Iterator[(Array[Any], String, Any, Long, Long)] =
        Iterator.empty
      def hasNext: Boolean = {
        while (!row.hasNext && it.hasNext) {
          val (c, cells) = it.next()
          row = cells.iterator.map(x => (c, x._1, x._2, x._3, x._4))
        }
        row.hasNext
      }
      def next(): (Array[Any], String, Any, Long, Long) = {
        hasNext; row.next()
      }
    }
    true
  }

  def nextWinner(): Boolean = {
    while (!emit.hasNext) if (!fillNextPk()) return false
    val (c, n, v, w, e) = emit.next()
    pkVals = outPk; ckVals = c; colName = n; value = v; wt = w
    expiry = e
    true
  }

  def close(): Unit = inner.close()
}

private[sources] final class CellKeyedMergeCursor(
    part: CellReconcilePartition,
    opts: ReconcileOptions = ReconcileOptions()) extends KeyedCursor {
  private val spec: KeySpec =
    if (part.fileParts.isEmpty) KeySpec.Default
    else part.fileParts(0).keySpec
  private val queryTime = opts.queryTime
  private val keepMarkers = opts.keepMarkers
  private val gcGraceMs = opts.gcGraceMs
  private val gcNowMs = opts.gcNowMs
  val valueTag: Int =
    if (part.fileParts.isEmpty) ValueCodec.LongTag
    else part.fileParts(0).valueTag
  val decPrec: Int =
    if (part.fileParts.isEmpty) 0 else part.fileParts(0).decPrec
  val decScale: Int =
    if (part.fileParts.isEmpty) 0 else part.fileParts(0).decScale
  /** Single-int clustering key → range tombstones interpretable. */
  private val intCk = spec.ckParts match {
    case KeyPart(_, ValueCodec.IntTag, _, _) :: Nil => true
    case _ => false
  }

  private val heap = new java.util.PriorityQueue[CellKeyedStream](
    math.max(1, part.fileParts.length),
    (a: CellKeyedStream, b: CellKeyedStream) => {
      var c = java.lang.Long.compare(a.token, b.token)
      if (c == 0)
        c = KeyCodec.compareParts(spec.pkParts, a.pkVals, b.pkVals)
      if (c == 0) c = java.lang.Byte.compare(a.rank, b.rank)
      if (c == 0)
        c = KeyCodec.compareParts(spec.ckParts, a.ckVals, b.ckVals)
      if (c == 0) c = a.colName.compareTo(b.colName)
      c
    })
  part.fileParts.foreach { fp =>
    val st = new CellKeyedStream(fp)
    if (st.advance(part.pkLo, part.pkHi)) heap.add(st)
  }

  // The current winner, valid after nextWinner() returns true.
  var pkVals: Array[Any] = _
  var ckVals: Array[Any] = _
  var colName: String = _
  var value: Any = _
  var wt = 0L
  var expiry = Long.MaxValue // the WINNING version's per-cell expiry
  private var token = 0L
  private var rank: Byte = 1

  private def samePk(t: CellKeyedStream): Boolean =
    t.token == token &&
      KeyCodec.compareParts(spec.pkParts, t.pkVals, pkVals) == 0
  private def sameKey(t: CellKeyedStream): Boolean =
    samePk(t) && t.rank == rank &&
      KeyCodec.compareParts(spec.ckParts, t.ckVals, ckVals) == 0 &&
      t.colName == colName

  /** Raw key-winner step — LWW, or shard-SUM for counter DATA cells. */
  private def nextKeyWinner(): Boolean = {
    val s = heap.poll()
    if (s == null) return false
    token = s.token; pkVals = s.pkVals; rank = s.rank
    ckVals = s.ckVals; colName = s.colName
    val sumShards = opts.counter &&
      !(colName.length > 0 && colName.charAt(0) == '!')
    var bwt = s.wt; var bval = s.value; var bexp = s.expiry
    if (s.advance(part.pkLo, part.pkHi)) heap.add(s)
    var top = heap.peek()
    while (top != null && sameKey(top)) {
      val t = heap.poll()
      if (sumShards) {
        bval = ValueCodec.add(valueTag, bval, t.value)
        if (t.wt > bwt) { bwt = t.wt; bexp = t.expiry }
      } else if (t.wt > bwt || (t.wt == bwt &&
          ValueCodec.compare(valueTag, t.value, bval) > 0)) {
        bwt = t.wt; bval = t.value; bexp = t.expiry
      }
      if (t.advance(part.pkLo, part.pkHi)) heap.add(t)
      top = heap.peek()
    }
    wt = bwt; value = bval; expiry = bexp
    true
  }

  // Tombstone/TTL state of the current pk / (pk, ck) — see
  // [[CellMergeCursor.nextWinner]] for the protocol; identical here,
  // with typed group-change detection.
  private var havePos = false
  private var curToken = 0L
  private var curPk: Array[Any] = _
  private var curCk: Array[Any] = _
  private var pdts = Long.MinValue
  private var ttlMs = Long.MinValue
  private var cellDel = Map.empty[String, Long]
  private var rangeDel: List[(Int, Int, Long)] = Nil
  // active clustering-PREFIX tombstones of the current pk — (prefix
  // ck values, bound part count, ts); rank 0 completes the set before
  // any data row of the pk
  private var prefixDel: List[(Array[Any], Int, Long)] = Nil
  private var rowDelTs = Long.MinValue
  // PER PARTITION LIMIT — see [[CellMergeCursor]]; typed ck equality.
  private val ppLimit = opts.perPartitionLimit
  private var cksEmitted = 0
  private var lastEmitCk: Array[Any] = _

  def nextWinner(): Boolean = {
    while (nextKeyWinner()) {
      val pkChanged = !havePos || curToken != token ||
        KeyCodec.compareParts(spec.pkParts, curPk, pkVals) != 0
      if (pkChanged) {
        havePos = true; curToken = token; curPk = pkVals; curCk = ckVals
        pdts = Long.MinValue; ttlMs = Long.MinValue; cellDel = Map.empty
        rangeDel = Nil; prefixDel = Nil; rowDelTs = Long.MinValue
        cksEmitted = 0; lastEmitCk = null
      } else if (
          KeyCodec.compareParts(spec.ckParts, curCk, ckVals) != 0) {
        curCk = ckVals
        cellDel = Map.empty
        rowDelTs = Long.MinValue
      }
      if (colName.length > 0 && colName.charAt(0) == '!') {
        if (colName == CellSource.PartitionTombstone)
          pdts = math.max(pdts, wt)
        else if (colName == CellSource.PartitionTtl)
          ttlMs = value match {
            case l: java.lang.Long => l.longValue()
            case i: java.lang.Integer => i.longValue()
            case _ => ttlMs
          }
        else if (colName == CellSource.RowTombstone)
          rowDelTs = math.max(rowDelTs, wt)
        else if (colName.startsWith(CellSource.RangeTombstonePrefix)) {
          if (intCk) {
            val body = colName.substring(
              CellSource.RangeTombstonePrefix.length)
            val sep = body.indexOf(':')
            if (sep > 0) {
              val lo = body.substring(0, sep).toInt
              val hi = body.substring(sep + 1).toInt
              rangeDel = (lo, hi, wt) :: rangeDel
            }
          }
        }
        else if (colName.startsWith(CellSource.PrefixTombstonePrefix)) {
          // `!delpfx:<j>` — the first j clustering parts of THIS
          // marker row are the bound prefix; j must be a proper
          // prefix (a full binding would be a row tombstone)
          val j = try colName.substring(
            CellSource.PrefixTombstonePrefix.length).toInt
          catch { case _: NumberFormatException => 0 }
          if (j >= 1 && j < spec.ckParts.length)
            // copy the bound prefix rather than hold the row array:
            // streams currently allocate per record, but this state
            // outlives the row and must not depend on that detail
            // (r12 buffered flushes put marker and data rows in ONE
            // file, so same-file shadowing is now the common case)
            prefixDel = (ckVals.take(j), j, wt) :: prefixDel
        }
        else if (colName.startsWith(CellSource.CellTombstonePrefix)) {
          val target = colName.substring(
            CellSource.CellTombstonePrefix.length)
          cellDel = cellDel.updated(target,
            math.max(wt, cellDel.getOrElse(target, Long.MinValue)))
        }
        if (keepMarkers) {
          val isTtl = colName == CellSource.PartitionTtl
          val inGrace = gcGraceMs == Long.MaxValue ||
            wt >= gcNowMs - gcGraceMs
          if (isTtl || inGrace) return true
        }
      } else if (opts.ckSlice.exists(s => !s.contains(ckVals(0)))) {
        // pushed TYPED clustering slice (C37 on CEL8): out-of-slice
        // data rows drop pre-materialization and never count toward
        // the per-partition limit (CQL clause order); marker rows
        // took the branch above, so shadowing state stays complete
      } else {
        val coveredByPk = pdts != Long.MinValue && wt <= pdts
        val coveredByRow = rowDelTs != Long.MinValue && wt <= rowDelTs
        val coveredByCell = cellDel.get(colName).exists(wt <= _)
        val coveredByRange = rangeDel.nonEmpty && intCk && {
          val ck = ckVals(0).asInstanceOf[Int]
          rangeDel.exists { case (lo, hi, ts) =>
            ck >= lo && ck <= hi && wt <= ts
          }
        }
        val coveredByPrefix = prefixDel.nonEmpty && prefixDel.exists {
          case (pfx, j, ts) => wt <= ts &&
            KeyCodec.compareParts(spec.ckParts.take(j), ckVals, pfx) == 0
        }
        // Effective expiry: a per-cell expiry (CEL11, `USING TTL`)
        // OVERRIDES the `!ttl*` table default — Cassandra's own
        // precedence — and the table default applies only to cells
        // without one.
        val effExp =
          if (expiry != Long.MaxValue) expiry
          else if (ttlMs != Long.MinValue) wt + ttlMs
          else Long.MaxValue
        val expired = effExp != Long.MaxValue &&
          queryTime != Long.MaxValue && effExp < queryTime
        // C58: dropped_columns hide pre-drop cells (see the default
        // cursor); before PER PARTITION LIMIT counting
        val droppedHide =
          opts.droppedColumns.nonEmpty &&
            opts.droppedColumns.get(colName).exists(wt <= _)
        if (!coveredByPk && !coveredByRow && !coveredByCell &&
            !coveredByRange && !coveredByPrefix && !expired &&
            !droppedHide) {
          if (ppLimit == Int.MaxValue) return true
          if (lastEmitCk != null &&
              KeyCodec.compareParts(spec.ckParts, ckVals,
                lastEmitCk) == 0) return true
          if (cksEmitted < ppLimit) {
            cksEmitted += 1; lastEmitCk = ckVals
            return true
          } // else: row past the partition's limit — keep draining
        }
      }
    }
    false
  }

  def close(): Unit = {
    val it = heap.iterator()
    while (it.hasNext) it.next().close()
    heap.clear()
  }
}

/** Reconciling reader over one token range of a CEL6 table — the
  * typed twin of [[CellReconcileReader]].
  */
class CellKeyedReconcileReader(part: CellReconcilePartition,
    cols: Array[String], opts: ReconcileOptions = ReconcileOptions())
    extends PartitionReader[InternalRow] {
  private val cursor = KeyedCursor.of(part, opts)
  private val spec =
    if (part.fileParts.isEmpty) KeySpec.Default
    else if (part.tablePath.nonEmpty)
      CellPlanning.applyKeyRenames(part.tablePath,
        part.fileParts(0).keySpec)
    else CellPlanning.declaredSpecFor(part.fileParts(0).file,
      part.fileParts(0).keySpec)
  private val proj = new KeyedProjection(spec,
    ValueCodec.dataTypeFor(cursor.valueTag, cursor.decPrec,
      cursor.decScale), cols)
  private var row: InternalRow = _

  private var winners = 0L
  override def currentMetricsValues()
      : Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    Array(CellTaskMetric("winners_emitted", winners),
      CellTaskMetric("merge_fan_in", part.fileParts.length.toLong))

  override def next(): Boolean = {
    if (!cursor.nextWinner()) return false
    winners += 1
    // token arg unused: reconcile scans refuse `_token` (no single
    // source record for a merged winner)
    row = proj.row(0L, cursor.pkVals, cursor.ckVals, cursor.colName,
      cursor.value, cursor.wt, cursor.expiry)
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = cursor.close()
}

/** Batched output over the typed winner stream — the typed twin of
  * [[CellReconcileColumnarReader]]: the merge is rows by nature, but
  * batching the OUTPUT keeps downstream operators on ColumnarToRow +
  * whole-stage codegen, same as the plain scans.
  */
class CellKeyedReconcileColumnarReader(part: CellReconcilePartition,
    cols: Array[String], opts: ReconcileOptions = ReconcileOptions())
    extends PartitionReader[
      org.apache.spark.sql.vectorized.ColumnarBatch] {
  import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
  import org.apache.spark.sql.vectorized.ColumnarBatch
  private val BatchRows = 4096
  private val cursor = KeyedCursor.of(part, opts)
  private val spec =
    if (part.fileParts.isEmpty) KeySpec.Default
    else if (part.tablePath.nonEmpty)
      CellPlanning.applyKeyRenames(part.tablePath,
        part.fileParts(0).keySpec)
    else CellPlanning.declaredSpecFor(part.fileParts(0).file,
      part.fileParts(0).keySpec)
  private val valueType: DataType =
    ValueCodec.dataTypeFor(cursor.valueTag, cursor.decPrec,
      cursor.decScale)
  private val fullSchema: StructType =
    CellSource.schemaFor(spec, valueType)
  // -2 = the CEL11 pseudo-column `_expiry` (withTtl reconcile scans)
  private val projIdx: Array[Int] = cols.map(c =>
    if (c == "_expiry") -2 else fullSchema.fieldIndex(c))
  private val outSchema = StructType(projIdx.map {
    case -2 => org.apache.spark.sql.types.StructField("_expiry",
      org.apache.spark.sql.types.LongType, nullable = false)
    case f => fullSchema(f)
  })
  private val nPk = spec.pkParts.length
  private val nCk = spec.ckParts.length
  private val partTags: Array[Int] =
    (spec.pkParts ++ spec.ckParts).map(_.tag).toArray
  private val partPrec: Array[Int] =
    (spec.pkParts ++ spec.ckParts).map(_.prec).toArray
  private var batch: ColumnarBatch = _
  private var winners = 0L
  override def currentMetricsValues()
      : Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    Array(CellTaskMetric("winners_emitted", winners),
      CellTaskMetric("merge_fan_in", part.fileParts.length.toLong))

  override def next(): Boolean = {
    if (batch != null) { batch.close(); batch = null }
    val vectors = OnHeapColumnVector.allocateColumns(BatchRows, outSchema)
    var n = 0
    while (n < BatchRows && cursor.nextWinner()) {
      winners += 1
      var i = 0
      while (i < projIdx.length) {
        val f = projIdx(i)
        if (f == -2) vectors(i).putLong(n, cursor.expiry)
        else if (f < nPk)
          KeyedVec.put(vectors(i), n, partTags(f), partPrec(f),
            cursor.pkVals(f))
        else if (f < nPk + nCk)
          KeyedVec.put(vectors(i), n, partTags(f), partPrec(f),
            cursor.ckVals(f - nPk))
        else if (f == nPk + nCk) {
          val b = cursor.colName.getBytes("UTF-8")
          vectors(i).putByteArray(n, b, 0, b.length)
        } else if (f == nPk + nCk + 1)
          KeyedVec.put(vectors(i), n, cursor.valueTag, cursor.decPrec,
            cursor.value)
        else vectors(i).putLong(n, cursor.wt)
        i += 1
      }
      n += 1
    }
    if (n == 0) { vectors.foreach(_.close()); return false }
    batch = new ColumnarBatch(
      vectors.map(v => v: org.apache.spark.sql.vectorized.ColumnVector))
    batch.setNumRows(n)
    true
  }

  override def get(): ColumnarBatch = batch
  override def close(): Unit = {
    if (batch != null) batch.close()
    cursor.close()
  }
}
