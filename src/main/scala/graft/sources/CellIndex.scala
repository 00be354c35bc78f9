package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import scala.util.Using

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.LongType

import graft.functions.{UdtPack, UdtUnpack}

/** Connector-side secondary index (C18b — the Cassandra 2i story):
  * the inverted (value → primary pk) mapping of one column,
  * materialized as ITS OWN cell table whose PARTITION KEY IS THE
  * INDEXED VALUE — so an equality lookup on the value gets the whole
  * point-read machinery the primary table has (Summary range check,
  * bloom filter, sparse-index narrowing, manifest pre-filter) for
  * free, reading O(hit partitions) instead of scanning the base
  * relation.
  *
  * Index row layout: `(pk = indexed value, ck = dense per-value
  * sequence, col = "ref", value = primary pk, wt = source cell wt)`.
  * The dense ck keeps entries of one indexed value distinct under the
  * index table's own LWW (two primary rows holding the same value
  * must not collapse); it is assigned by a window over the indexed
  * value — the build IS one shuffle keyed on the value, exactly a
  * Cassandra index rebuild, and the only shuffle in the lifecycle.
  *
  * The index is built from the RECONCILED base table, so shadowed and
  * rewritten versions never enter it (Cassandra's read-repair-on-
  * rebuild equivalence). Index-granularity is the primary pk: a
  * lookup semi-joins the (tiny, auto-broadcast) hit set back to the
  * reconciled wide view and re-applies the predicate — Cassandra
  * likewise re-reads and filters the base row. At 100 TB the index
  * bounds the probe side of that join to the hit partitions; the
  * Spark-idiomatic equivalent of per-pk point reads.
  *
  * Indexed-value types (round 7): `long` values keep the classic
  * layout; any other cell value type (text first among them) becomes
  * a TYPED partition key via CEL6 — the index table is declared
  * `primaryKey ((pk),ck)` with the value's type, and the lookup
  * hashes the probe to its token like any typed point read. The BASE
  * may be default-keyed OR typed (round 9) — a SINGLE-part partition
  * key rides in the entry's `value` slot directly (typed CEL5
  * value); a MULTI-part key (round 10, the C36c `((tenant, day),
  * seq)` shape) is C59-UDT-packed into one binary value and unpacked
  * back into the named parts at lookup, so both layouts share the
  * whole index lifecycle.
  *
  * Staleness (round 7, C18c): `build` records the base table's
  * committed GENERATION — its flush-file listing, immutable per file
  * — in the index's `_base` metadata, and `lookupPks` compares it to
  * the live listing on every probe (one directory listing, the same
  * I/O planning already does). A lookup against a base that has
  * flushed since the build either heals in place — `onStale =
  * "refresh"` (the default, C18d): index ONLY the delta flushes and
  * append, falling back to a full rebuild when the old generation was
  * compacted away; `"rebuild"` forces the full rebuild — or fails
  * fast (`onStale = "fail"`); `"ignore"` serves the stale generation
  * knowingly.
  *
  * Incremental refresh semantics are exactly Cassandra's
  * write-path 2i maintenance: new entries are APPENDED for the
  * delta's winners; entries for values a rewrite or deletion
  * replaced are NOT removed — they surface as index false positives
  * that the base re-read filters out ([[lookupBase]] re-applies the
  * predicate, as Cassandra re-reads the base row). Delta entries get
  * their dense ck in a fresh EPOCH band (epoch · 2^20 + seq) so they
  * can never LWW-collapse with an earlier build's entries for the
  * same indexed value.
  *
  * Write-through maintenance (round 9, C18f): `build(...,
  * writeThrough = true)` registers the index in the BASE table's
  * `_indexes` file, and every committed base write then drives the
  * SAME delta-epoch refresh from the write path
  * ([[maintainAfterWrite]], called by the DSv2 batch commit) — real
  * Cassandra updates 2i at write time. Registration is OPT-IN:
  * lazy-heal-on-read stays the default (a bulk-load pipeline at
  * 100 TB usually wants one post-load build, not per-flush index
  * work), and an unregistered index behaves exactly as before.
  */
object CellIndex {
  private val Fmt = "graft.sources.CellSource"
  private val BaseFile = "_base"

  /** The base table's committed generation: its flush-file names.
    * Files are immutable once committed and indices never reused, so
    * the name list identifies the generation exactly.
    */
  private def generation(dir: String): String =
    CellPlanning.listFiles(dir)
      .map(f => Paths.get(f).getFileName.toString)
      .mkString(",")

  private case class BaseMeta(column: String, baseDir: String,
      gen: String, epoch: Int,
      opts: Map[String, String] = Map.empty)

  /** Options line form: `k=v;k=v` (sorted) — line 5 of `_base`,
    * absent on pre-option indexes.
    */
  private def renderOpts(opts: Map[String, String]): String =
    opts.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(";")

  private def parseOpts(line: String): Map[String, String] =
    line.split(';').iterator.map(_.trim).filter(_.nonEmpty).map { kv =>
      val i = kv.indexOf('=')
      kv.substring(0, i) -> kv.substring(i + 1)
    }.toMap

  private def readMeta(idxDir: String): Option[BaseMeta] = {
    val p = Paths.get(CellPlanning.normalize(idxDir)).resolve(BaseFile)
    if (!Files.exists(p)) return None
    try {
      val lines = Files.readAllLines(p, StandardCharsets.UTF_8)
      // the 4/5-line index format (…, epoch band[, options]): a
      // MATERIALIZED VIEW writes a 3-line `_base` — without this
      // check the two kinds alias and DROP INDEX would accept a view
      if (lines.size < 4) None
      else Some(BaseMeta(lines.get(0), lines.get(1), lines.get(2),
        lines.get(3).trim.toInt,
        if (lines.size >= 5) parseOpts(lines.get(4)) else Map.empty))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** The index's persisted per-index options (`planes`/`probes` on
    * an ann index) — what the probe side must read so the query
    * derives the SAME buckets the build wrote.
    */
  def optionsOf(idxDir: String): Map[String, String] =
    readMeta(idxDir).map(_.opts).getOrElse(Map.empty)

  /** Epoch band width: one build/refresh may index up to 2^20 rows
    * of ONE indexed value; the next epoch's cks start a band up.
    */
  private val EpochBand = 1 << 20

  /** Build (or rebuild) the inverted index of `column` over the table
    * at `dir` into the cell table at `idxDir`. Overwrites: a rebuild
    * replaces the index generation wholesale (truncate write), and
    * the commit publishes its `_manifest` like any other cell table.
    * The base generation is captured BEFORE the read, so a flush that
    * races the build leaves the index looking stale — never silently
    * fresh-but-incomplete.
    */
  /** The base's key layout, for index entry derivation. A SINGLE-part
    * partition key (default `pk: long`, or typed — round 9) stores
    * that part in the entry's `value` slot directly, as a typed CEL5
    * value. A MULTI-part partition key (round 10 — the C36c
    * `((tenant, day), seq)` shape) packs the parts into ONE binary
    * value with the C59 UDT wire format (fields in declared order,
    * each length-prefixed) — the lookup unpacks the blob back into
    * the NAMED parts to address the base, so the index machinery
    * (typed value probe, staleness, delta epochs) is identical in
    * both layouts.
    */
  private case class BaseKey(spec: KeySpec) {
    val pkParts: List[KeyPart] = spec.pkParts
    def single: Boolean = pkParts.lengthCompare(1) == 0
    def orderCols: Seq[String] =
      (spec.pkParts ++ spec.ckParts).map(_.name)
    /** C59 layout string of the pk parts (multi-part packing). */
    def layout: String =
      pkParts.map(p => s"${p.name} ${p.dataType.simpleString}")
        .mkString(",")
    /** The entry's `value` column: the single part verbatim, or the
      * C59-packed tuple. Built as a direct Catalyst expression (via
      * the bridge) so the connector never depends on the session
      * carrying the SQL function registration.
      */
    def valueCol: Column =
      if (single) col(pkParts.head.name)
      else Bridge.column(UdtPack(Literal(layout),
        pkParts.map(p => Bridge.expression(col(p.name)))))
    /** Declared valueType so an empty index dir agrees on schema. */
    def valueType: Option[String] =
      if (!single) Some("binary")
      else if (pkParts.head.dataType != LongType)
        Some(pkParts.head.dataType.simpleString)
      else None
  }

  private def baseKey(dir: String): BaseKey =
    BaseKey(CellSource.keySpec(dir))

  def build(spark: SparkSession, dir: String, idxDir: String,
      column: String, files: Int = 8,
      writeThrough: Boolean = false,
      opts: Map[String, String] = Map.empty): Unit = {
    // same refusal as the CQL CREATE INDEX front door: the build (and
    // every delta refresh) reads the base reconcile-only (LWW), which
    // merges counter shards wrongly. Cassandra refuses 2i on counter
    // tables too.
    require(!CellPlanning.isCounterTable(dir),
      s"secondary indexes are not supported on counter table $dir")
    val gen = generation(dir)
    val base = spark.read.format(Fmt)
      .option("reconcile", "true").load(dir)
    val valueIsLong = base.schema("value").dataType == LongType
    writeEntries(base, column, valueIsLong, files, idxDir,
      epoch = 0, overwrite = true, baseKey(dir), opts)
    // a build over a column with ZERO matching cells writes no data
    // files — the metadata must still land (the empty index is valid
    // and serves empty hit sets)
    Files.createDirectories(Paths.get(CellPlanning.normalize(idxDir)))
    Files.writeString(
      Paths.get(CellPlanning.normalize(idxDir)).resolve(BaseFile),
      s"$column\n${CellPlanning.normalize(dir)}\n$gen\n0\n" +
        (if (opts.nonEmpty) renderOpts(opts) + "\n" else ""))
    if (writeThrough) register(dir, idxDir)
  }

  // ---- write-through registry (C18f) ----

  private val RegistryFile = "_indexes"

  /** Register `idxDir` for write-through maintenance: every committed
    * write to `baseDir` will refresh it (delta epoch append). The
    * registry is one normalized index dir per line in the base
    * table's `_indexes` file. Idempotent.
    */
  def register(baseDir: String, idxDir: String): Unit = {
    val f = Paths.get(CellPlanning.normalize(baseDir))
      .resolve(RegistryFile)
    val norm = CellPlanning.normalize(idxDir)
    val existing =
      if (Files.exists(f))
        Files.readAllLines(f, StandardCharsets.UTF_8).asScala.toList
          .map(_.trim).filter(_.nonEmpty)
      else Nil
    if (!existing.contains(norm))
      Files.writeString(f, (existing :+ norm).mkString("", "\n", "\n"))
  }

  /** Remove `idxDir` from the base's write-through registry. */
  def unregister(baseDir: String, idxDir: String): Unit = {
    val f = Paths.get(CellPlanning.normalize(baseDir))
      .resolve(RegistryFile)
    if (!Files.exists(f)) return
    val norm = CellPlanning.normalize(idxDir)
    val kept = Files.readAllLines(f, StandardCharsets.UTF_8).asScala
      .toList.map(_.trim).filter(l => l.nonEmpty && l != norm)
    if (kept.isEmpty) Files.deleteIfExists(f)
    else Files.writeString(f, kept.mkString("", "\n", "\n"))
  }

  /** The base table's registered (still-valid) write-through indexes:
    * registry entries whose `_base` metadata still points at this
    * base. A dropped/retargeted index simply stops matching.
    */
  def registered(baseDir: String): Seq[String] = {
    val norm = CellPlanning.normalize(baseDir)
    val f = Paths.get(norm).resolve(RegistryFile)
    if (!Files.exists(f)) return Seq.empty
    Files.readAllLines(f, StandardCharsets.UTF_8).asScala.toSeq
      .map(_.trim).filter(_.nonEmpty)
      .filter(idx => readMeta(idx).exists(_.baseDir == norm))
  }

  /** The index's recorded base table dir (from `_base` metadata). */
  def baseOf(idxDir: String): Option[String] =
    readMeta(idxDir).map(_.baseDir)

  /** The index's recorded indexed column (from `_base` metadata). */
  def columnOf(idxDir: String): Option[String] =
    readMeta(idxDir).map(_.column)

  /** True when the index table's layout serves RANGE lookups: the
    * default (long pk, IDENTITY token) layout, where adjacent values
    * are adjacent on the ring — C18e / Cassandra SASI's
    * sparse-numeric-mode rule. Typed (hashed) index layouts scatter
    * adjacent values and refuse ranges.
    */
  def servesRanges(idxDir: String): Boolean = {
    val norm = CellPlanning.normalize(idxDir)
    CellPlanning.keySpecOf(norm, CellPlanning.listFiles(norm)).isDefault
  }

  /** True iff `idxDir` IS a secondary index of exactly (base, column)
    * — the CREATE INDEX IF NOT EXISTS identity test. An unrelated
    * table (or an index on a different base/column) squatting on the
    * name is NOT "the index already existing".
    */
  def isIndexOf(idxDir: String, baseDir: String,
      column: String): Boolean =
    baseOf(idxDir).contains(CellPlanning.normalize(baseDir)) &&
      columnOf(idxDir).contains(column)

  /** Drop an index: unregister it from its base and delete its dir. */
  def drop(idxDir: String): Unit = {
    readMeta(idxDir).foreach(m => unregister(m.baseDir, idxDir))
    val root = Paths.get(CellPlanning.normalize(idxDir))
    if (!Files.isDirectory(root)) return
    def deleteTree(p: java.nio.file.Path): Unit = {
      if (Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS))
        Using.resource(Files.list(p)) {
          _.iterator().asScala.toList.foreach(deleteTree)
        }
      Files.delete(p)
    }
    deleteTree(root)
  }

  /** Write-path 2i maintenance (called by the DSv2 batch commit
    * AFTER the new generation is published): refresh every registered
    * index — exactly the C18d delta-epoch protocol, so a single
    * flush costs one delta-sized pass per index, never a rebuild.
    * Best-effort by design: the DATA commit above is already durable,
    * so throwing here would report a false write failure; a skipped
    * refresh just leaves the index detectably stale (generation
    * mismatch), which the next lookup heals — the same lazy path
    * unregistered indexes always take.
    */
  def maintainAfterWrite(baseDir: String): Unit = {
    val idxs = registered(baseDir)
    if (idxs.isEmpty) return
    SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
      .foreach { spark =>
        idxs.foreach { idx =>
          try refresh(spark, idx)
          catch {
            case scala.util.control.NonFatal(e) =>
              // best-effort contract kept, but NEVER silently: a
              // persistently failing refresh (bad registry entry,
              // schema drift) otherwise degrades every read to the
              // heal path with no trace of the root cause.
              org.slf4j.LoggerFactory.getLogger(getClass).warn(
                s"write-through index refresh failed for $idx " +
                  s"(base $baseDir); lookups will heal lazily", e)
          }
        }
      }
  }

  /** Shared entry derivation + write: dense per-value ck in the
    * epoch's band, value-typed partition key for non-long columns.
    * `key` carries the BASE's key layout — the entry's `value` slot
    * holds the single pk part verbatim (typed CEL5 value), or the
    * C59-packed tuple of a multi-part key as one binary value.
    */
  /** A `keys(<map>)` index target (C64c): entries are keyed by the
    * cell's COL NAME — map-entry keys ARE col names in the C12
    * row-is-the-map encoding — so `CONTAINS KEY` probes it exactly
    * like `CONTAINS` probes a values index.
    */
  private val KeysIdxRe = """^keys\((\w+)\)$""".r

  /** An `entries(<map>)` index target (C64d, Cassandra's map-entry
    * 2i): one entry per map ENTRY, keyed by the C59-packed (key,
    * value) PAIR — map-entry keys ARE col names in the C12
    * row-is-the-map encoding, so the pair is (col, value) packed as
    * one binary typed partition key, and `m['k'] = v` probes it as
    * ONE typed point read (hash-routed, Summary/bloom pruned), the
    * exact machinery a values/keys probe uses. The base re-read
    * re-applies the (col, value) predicate, dropping refresh-epoch
    * false positives — index-then-fetch-then-filter, Cassandra's own.
    */
  private val EntriesIdxRe = """^entries\((\w+)\)$""".r

  /** A `prefix(<col>)` index target (C18i, SASI PREFIX mode): the
    * entry key is the cell value's ORDER-PRESERVING 64-bit code
    * ([[graft.functions.PrefixCodec]]) — a long, so the index table
    * takes the default identity-token layout and a text prefix
    * serves as one Summary-pruned pk RANGE over it, the same plan
    * shape as the C18e numeric sparse range. Strings sharing their
    * first 8 bytes collide into one key — bounded false positives
    * the base re-read's LIKE re-check drops.
    */
  private val PrefixIdxRe = """^prefix\((\w+)\)$""".r

  /** An `ann(<col>)` index target (C70, the vector-search analog of
    * Cassandra 5's SAI vector index): the entry key is the vector
    * cell's deterministic LSH BUCKET
    * ([[graft.functions.VectorCodec.bucket]]) — a long in
    * [0, 2^planes), so the index table keeps the default
    * identity-token layout and an ANN probe of `nprobe` buckets plans
    * as nprobe Summary-pruned pk point reads over the index, bounding
    * the candidate fetch to nprobe/2^planes of the corpus. The base
    * re-read reranks candidates by EXACT cosine (index false
    * positives and refresh epochs drop there) — Cassandra's own
    * index-then-fetch-then-filter contract, lifted to vectors.
    */
  private val AnnIdxRe = """^ann\((\w+)\)$""".r

  /** A `contains(<col>)` index target (C18j, SASI CONTAINS mode):
    * one entry per SUFFIX of each text value, keyed by the suffix's
    * order-preserving 64-bit code — `LIKE '%sub%'` then serves as ONE
    * closed code range over the index (`sub` is a substring of a
    * value iff it is a PREFIX of one of its suffixes), the exact
    * C18i/C18e pruned-range plan shape. Storage is Σ len(value)
    * entries — SASI CONTAINS mode's own suffix-indexing cost, which
    * is why Cassandra gates the mode per index. 8-byte collisions and
    * refresh epochs drop on the base re-read's LIKE re-check.
    */
  private val ContainsIdxRe = """^contains\((\w+)\)$""".r

  /** Case-insensitive analyzer variants (C18k, SASI's
    * `case_sensitive: false` option on the LIKE modes): entries key
    * the LOWERCASED value's order-preserving code — the probe side
    * lowercases the needle, and the base re-read re-checks on
    * lower(value), so mixed-case rows serve mixed-case patterns.
    */
  private val PrefixCiIdxRe = """^prefix_ci\((\w+)\)$""".r
  private val ContainsCiIdxRe = """^contains_ci\((\w+)\)$""".r

  /** The C59 layout spelling of an entries-index value slot — the
    * pack layer's subset; other storages (decimal/boolean/timestamp/
    * binary) refuse by name at build time.
    */
  def entriesLayoutType(
      dt: org.apache.spark.sql.types.DataType): String = dt match {
    case org.apache.spark.sql.types.StringType => "string"
    case org.apache.spark.sql.types.LongType => "bigint"
    case org.apache.spark.sql.types.IntegerType => "int"
    case org.apache.spark.sql.types.DoubleType => "double"
    case o => throw new IllegalArgumentException(
      s"entries(...) indexes text/bigint/int/double-storage " +
        s"tables; this base stores ${o.simpleString}")
  }

  private def writeEntries(base: DataFrame, column: String,
      valueIsLong: Boolean, files: Int, idxDir: String, epoch: Int,
      overwrite: Boolean, key: BaseKey,
      opts: Map[String, String] = Map.empty): Unit = {
    // the indexed EXPRESSION: the cell value (plain/values index), or
    // the col name (keys index — marker cells are not map entries)
    val (hits, entryKey, entryKeyType) = column match {
      case KeysIdxRe(_) =>
        (base.filter(!col("col").startsWith("!")), col("col"),
          org.apache.spark.sql.types.StringType:
            org.apache.spark.sql.types.DataType)
      case EntriesIdxRe(_) =>
        // map entries = ALL non-marker cells of the base (the row IS
        // the map); the pair packs with the C59 wire format so the
        // CQL probe can pack the same bytes driver-side
        val lt = entriesLayoutType(base.schema("value").dataType)
        graft.GraftExtensions.register(base.sparkSession)
        (base.filter(!col("col").startsWith("!")),
          org.apache.spark.sql.functions.expr(
            s"graft_udt_pack('k string,v $lt', col, value)"),
          org.apache.spark.sql.types.BinaryType:
            org.apache.spark.sql.types.DataType)
      case PrefixIdxRe(c) =>
        require(base.schema("value").dataType ==
          org.apache.spark.sql.types.StringType,
          s"prefix($c) indexes a TEXT-valued table (SASI PREFIX " +
            "mode); this base stores " +
            base.schema("value").dataType.simpleString)
        graft.GraftExtensions.register(base.sparkSession)
        (base.filter(col("col") === c),
          org.apache.spark.sql.functions.expr("graft_prefix64(value)"),
          LongType: org.apache.spark.sql.types.DataType)
      case PrefixCiIdxRe(c) =>
        require(base.schema("value").dataType ==
          org.apache.spark.sql.types.StringType,
          s"prefix_ci($c) indexes a TEXT-valued table (SASI PREFIX " +
            "mode); this base stores " +
            base.schema("value").dataType.simpleString)
        graft.GraftExtensions.register(base.sparkSession)
        (base.filter(col("col") === c),
          org.apache.spark.sql.functions.expr(
            "graft_prefix64(lower(value))"),
          LongType: org.apache.spark.sql.types.DataType)
      case AnnIdxRe(c) =>
        require(base.schema("value").dataType ==
          org.apache.spark.sql.types.BinaryType,
          s"ann($c) indexes a VECTOR-valued (binary wire form) " +
            "table; this base stores " +
            base.schema("value").dataType.simpleString)
        graft.GraftExtensions.register(base.sparkSession)
        // the DECLARED plane count (persisted in `_base` options) —
        // build, write-through refresh and the query-side probe must
        // all derive buckets over the same planes
        val planes = opts.getOrElse("planes",
          graft.functions.VectorCodec.Planes.toString).toInt
        (base.filter(col("col") === c),
          org.apache.spark.sql.functions.expr(
            s"graft_vec_bucket(value, $planes)"),
          LongType: org.apache.spark.sql.types.DataType)
      case ContainsIdxRe(c) =>
        require(base.schema("value").dataType ==
          org.apache.spark.sql.types.StringType,
          s"contains($c) indexes a TEXT-valued table (SASI CONTAINS " +
            "mode); this base stores " +
            base.schema("value").dataType.simpleString)
        graft.GraftExtensions.register(base.sparkSession)
        // one entry per suffix (empty values index nothing)
        val exploded = base
          .filter(col("col") === c &&
            org.apache.spark.sql.functions.length(col("value")) > 0)
          .withColumn("__k", org.apache.spark.sql.functions.explode(
            org.apache.spark.sql.functions.expr(
              "transform(sequence(1, length(value)), " +
                "i -> graft_prefix64(substring(value, i)))")))
        (exploded, col("__k"),
          LongType: org.apache.spark.sql.types.DataType)
      case ContainsCiIdxRe(c) =>
        require(base.schema("value").dataType ==
          org.apache.spark.sql.types.StringType,
          s"contains_ci($c) indexes a TEXT-valued table (SASI " +
            "CONTAINS mode); this base stores " +
            base.schema("value").dataType.simpleString)
        graft.GraftExtensions.register(base.sparkSession)
        // suffixes of the LOWERCASED value — probes lowercase too
        val exploded = base
          .filter(col("col") === c &&
            org.apache.spark.sql.functions.length(col("value")) > 0)
          .withColumn("__k", org.apache.spark.sql.functions.explode(
            org.apache.spark.sql.functions.expr(
              "transform(sequence(1, length(value)), " +
                "i -> graft_prefix64(substring(lower(value), i)))")))
        (exploded, col("__k"),
          LongType: org.apache.spark.sql.types.DataType)
      case _ =>
        (base.filter(col("col") === column), col("value"),
          base.schema("value").dataType)
    }
    val entries = hits
      .select(
        entryKey.as("pk"),
        (row_number().over(
          Window.partitionBy(entryKey)
            .orderBy(key.orderCols.map(col).toIndexedSeq: _*)) +
          lit(epoch * EpochBand)).as("ck"),
        lit("ref").as("col"),
        key.valueCol.as("value"),
        col("wt"))
      .repartitionByRange(files, col("pk"), col("ck"))
    var writer = entries.write.format(Fmt)
      .mode(if (overwrite) "overwrite" else "append")
    // non-long indexed values become a typed (CEL6) partition key;
    // keyType hints let schema inference agree on a still-empty dir
    if (entryKeyType != LongType)
      writer = writer.option("primaryKey", "((pk),ck)")
        .option("keyType.pk", entryKeyType.simpleString)
        .option("keyType.ck", "int")
    // a non-long (or packed multi-part) base key makes the entry's
    // value a typed CEL5 value column — declare it so a still-empty
    // index dir agrees on the schema
    key.valueType.foreach(t => writer = writer.option("valueType", t))
    writer.save(idxDir)
  }

  /** Incremental refresh (C18d): index ONLY the flushes the base
    * gained since the recorded generation and APPEND their entries in
    * a fresh epoch band — one delta-sized pass instead of a table
    * rebuild. Falls back to [[build]] when the recorded files are no
    * longer all present (compaction/truncation replaced the
    * generation wholesale). The delta is reconciled WITHIN itself:
    * winners of the new flushes enter the index; entries an overwrite
    * or deletion obsoleted remain as false positives for the base
    * re-read to drop — Cassandra's own 2i contract.
    */
  def refresh(spark: SparkSession, idxDir: String): Unit = {
    val m = readMeta(idxDir).getOrElse(throw new IllegalStateException(
      s"$idxDir carries no _base metadata; use CellIndex.build"))
    val liveFiles = CellPlanning.listFiles(m.baseDir)
    val liveNames = liveFiles.map(f => Paths.get(f).getFileName.toString)
    val oldNames = m.gen.split(',').filter(_.nonEmpty).toSet
    if (liveNames.toSet == oldNames) return // not stale
    if (!oldNames.subsetOf(liveNames.toSet)) {
      // generation replaced (compaction/truncate): delta undefined;
      // the rebuild keeps the index's declared options (plane count)
      build(spark, m.baseDir, idxDir, m.column, opts = m.opts)
      return
    }
    val gen = liveNames.mkString(",")
    val deltaFiles = liveFiles.filter(f =>
      !oldNames.contains(Paths.get(f).getFileName.toString))
    // same-filesystem scratch view of the delta (links, no copies)
    val baseDir = Paths.get(CellPlanning.normalize(m.baseDir))
    val scratch = Files.createTempDirectory(baseDir, ".idx-delta-")
    try {
      deltaFiles.foreach { f =>
        val p = Paths.get(f)
        Files.createLink(scratch.resolve(p.getFileName), p)
      }
      val delta = spark.read.format(Fmt)
        .option("reconcile", "true").load(scratch.toString)
      writeEntries(delta, m.column,
        delta.schema("value").dataType == LongType, files = 8, idxDir,
        epoch = m.epoch + 1, overwrite = false, baseKey(m.baseDir),
        m.opts)
    } finally {
      Using.resource(Files.list(scratch)) { st =>
        st.iterator().asScala.toList.foreach(Files.deleteIfExists(_))
      }
      Files.deleteIfExists(scratch)
    }
    Files.writeString(
      Paths.get(CellPlanning.normalize(idxDir)).resolve(BaseFile),
      s"${m.column}\n${CellPlanning.normalize(m.baseDir)}\n$gen\n" +
        s"${m.epoch + 1}\n" +
        (if (m.opts.nonEmpty) renderOpts(m.opts) + "\n" else ""))
  }

  /** True when the base table has flushed files since the recorded
    * build (or the metadata is unreadable on a metadata-bearing
    * index).
    */
  def isStale(idxDir: String): Boolean =
    readMeta(idxDir).exists(m => generation(m.baseDir) != m.gen)

  /** Distinct primary pks whose `column` equals `v` — served by the
    * index table's PRUNED point scan (pk pushdown on the index = the
    * value lookup; typed probes hash to their token). `onStale`:
    * "rebuild" (default) re-indexes the base in place first, "fail"
    * raises, "ignore" serves the recorded generation.
    */
  def lookupPks(spark: SparkSession, idxDir: String, v: Any,
      onStale: String = "refresh"): DataFrame = {
    readMeta(idxDir).foreach { m =>
      if (generation(m.baseDir) != m.gen) onStale match {
        case "refresh" => refresh(spark, idxDir)
        case "rebuild" =>
          build(spark, m.baseDir, idxDir, m.column, opts = m.opts)
        case "fail" => throw new IllegalStateException(
          s"secondary index at $idxDir is STALE: base table " +
            s"${m.baseDir} has flushed since the index build " +
            s"(rebuild with CellIndex.build, or pass " +
            s"onStale=refresh/rebuild/ignore)")
        case _ => // "ignore": serve the recorded generation
      }
    }
    spark.read.format(Fmt).load(idxDir)
      .filter(col("pk") === lit(v))
      .select(col("value").as("pk")).distinct()
  }

  /** C18e — SASI-style RANGE lookup: base pks whose indexed value
    * lies in `[lo, hi]`. On a long-valued index the value IS the
    * index table's partition key with IDENTITY tokens, so the range
    * predicate pushes as a Summary-pruned pk range — the probe opens
    * only the index files overlapping the value range, never scans
    * the index, and never touches the base until the hit set exists.
    * This is exactly why Cassandra's SASI serves range queries only
    * in SPARSE (numeric) mode: a hashed layout scatters adjacent
    * values across the ring, so ranges on typed (text-keyed) index
    * tables are refused here the same way.
    */
  def lookupPksRange(spark: SparkSession, idxDir: String, lo: Long,
      hi: Long, onStale: String = "refresh"): DataFrame = {
    val norm = CellPlanning.normalize(idxDir)
    require(CellPlanning.keySpecOf(norm,
      CellPlanning.listFiles(norm)).isDefault,
      "range lookup needs a long-valued (identity-token) index — " +
        "a typed index hashes values across the ring (Cassandra " +
        "SASI's SPARSE-mode-only range rule)")
    readMeta(idxDir).foreach { m =>
      if (generation(m.baseDir) != m.gen) onStale match {
        case "refresh" => refresh(spark, idxDir)
        case "rebuild" =>
          build(spark, m.baseDir, idxDir, m.column, opts = m.opts)
        case "fail" => throw new IllegalStateException(
          s"secondary index at $idxDir is STALE (see lookupPks)")
        case _ =>
      }
    }
    spark.read.format(Fmt).load(idxDir)
      .filter(col("pk") >= lo && col("pk") <= hi)
      .select(col("value").as("pk")).distinct()
  }

  /** Range probe COMPOSED into the base read — [[lookupBase]]'s
    * multiget-or-semi-join composition over [[lookupPksRange]]'s hit
    * set. The caller re-applies the value predicate on the base rows
    * (index false positives from refresh epochs drop there).
    */
  def lookupBaseRange(spark: SparkSession, dir: String, idxDir: String,
      lo: Long, hi: Long, multigetMax: Int = 128,
      onStale: String = "refresh"): DataFrame = {
    val hits = lookupPksRange(spark, idxDir, lo, hi, onStale)
    composeBase(spark, dir, hits, multigetMax)
  }

  /** C18i — SASI-PREFIX probe composed into the base read: base rows
    * whose indexed TEXT value starts with `prefix`, served as ONE
    * closed pk range over the order-preserving prefix index (the
    * prefix's [[graft.functions.PrefixCodec]] bounds) — the exact
    * [[lookupBaseRange]] machinery, Summary-pruned the same way. The
    * caller re-applies the LIKE predicate on the base rows (8-byte
    * key collisions and refresh-epoch entries drop there).
    */
  def lookupBasePrefix(spark: SparkSession, dir: String,
      idxDir: String, prefix: String, multigetMax: Int = 128,
      onStale: String = "refresh"): DataFrame = {
    val b = org.apache.spark.unsafe.types.UTF8String
      .fromString(prefix).getBytes
    lookupBaseRange(spark, dir, idxDir,
      graft.functions.PrefixCodec.lowBound(b),
      graft.functions.PrefixCodec.highBound(b), multigetMax, onStale)
  }

  /** Hit-set → base-read composition shared by the equality and range
    * probes: small hit sets push `key IN (...)` into the base scan (k
    * point reads, C8b); large ones fall back to the broadcast semi
    * join. The base's single pk part is addressed BY NAME, so typed
    * (CEL6) bases compose the same way as the default layout. A
    * MULTI-part base key arrives as C59-packed blobs — unpacked back
    * into the named parts, the small-hit path becomes a bounded OR of
    * per-tuple part conjunctions (each conjunction a full-equality
    * point predicate) and the large path a semi join on all parts.
    */
  private def composeBase(spark: SparkSession, dir: String,
      hits: DataFrame, multigetMax: Int): DataFrame = {
    val key = baseKey(dir)
    val base = spark.read.format(Fmt)
      .option("reconcile", "true").load(dir)
    if (key.single) {
      val keyCol = key.pkParts.head.name
      val sample = hits.limit(multigetMax + 1).collect().map(_.get(0))
      if (sample.isEmpty) base.filter(lit(false))
      else if (sample.length <= multigetMax)
        base.filter(col(keyCol).isin(sample.toIndexedSeq: _*))
      else base.join(hits.withColumnRenamed("pk", keyCol),
        Seq(keyCol), "left_semi")
    } else {
      val names = key.pkParts.map(_.name)
      val unpacked = hits.select(
        Bridge.column(UdtUnpack(Literal(key.layout),
          Bridge.expression(col("pk")))).as("k"))
        .select(names.map(n => col(s"k.$n").as(n)).toIndexedSeq: _*)
      // bounded driver-side collect: ≤ multigetMax+1 decoded tuples
      // of an already index-pruned hit set, same bound as the
      // single-part multiget
      val sample = unpacked.limit(multigetMax + 1).collect()
      if (sample.isEmpty) base.filter(lit(false))
      else if (sample.length <= multigetMax)
        base.filter(sample.toIndexedSeq.map { r =>
          names.zipWithIndex.map { case (n, i) =>
            col(n) === lit(r.get(i)) }.reduce(_ && _)
        }.reduce(_ || _))
      else base.join(unpacked, names, "left_semi")
    }
  }

  /** Index probe COMPOSED into the base read (round 7): when the hit
    * set is small — the normal case for a selective index — collect
    * it and push `pk IN (...)` into the base scan, so the probe plans
    * as k POINT READS of the base table (C8b's multiget machinery:
    * per-value Summary + bloom file pruning) with NO join at all.
    * Past `multigetMax` hits it falls back to the broadcast semi
    * join. The driver-side collect is bounded by multigetMax+1 rows
    * of (already index-pruned) longs — the Cassandra coordinator's
    * index-then-fetch, not a table collect.
    */
  def lookupBase(spark: SparkSession, dir: String, idxDir: String,
      v: Any, multigetMax: Int = 128,
      onStale: String = "refresh"): DataFrame =
    composeBase(spark, dir, lookupPks(spark, idxDir, v, onStale),
      multigetMax)

  /** C70 — ANN candidate fetch: base rows whose vector landed in one
    * of the `buckets` (the query's multi-probe set), served as
    * |buckets| pruned point reads of the index composed into the base
    * multiget. The CALLER reranks by exact cosine and applies LIMIT k
    * — this returns the candidate superset only.
    */
  def lookupBaseAnn(spark: SparkSession, dir: String, idxDir: String,
      buckets: Seq[Long], multigetMax: Int = 128,
      onStale: String = "refresh"): DataFrame = {
    readMeta(idxDir).foreach { m =>
      if (generation(m.baseDir) != m.gen) onStale match {
        case "refresh" => refresh(spark, idxDir)
        case "rebuild" =>
          build(spark, m.baseDir, idxDir, m.column, opts = m.opts)
        case "fail" => throw new IllegalStateException(
          s"secondary index at $idxDir is STALE (see lookupPks)")
        case _ =>
      }
    }
    val hits = spark.read.format(Fmt).load(idxDir)
      .filter(col("pk").isin(buckets.toIndexedSeq: _*))
      .select(col("value").as("pk")).distinct()
    composeBase(spark, dir, hits, multigetMax)
  }
}
