package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._
import scala.util.Using

import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** V2 `TableCatalog` over a directory of cell tables (VERDICT r4
  * "What's missing" §4): each subdirectory of `root` holding `.cells`
  * flush files is one table, so the connector participates in the
  * catalog surface — `SHOW TABLES IN cells`, `SELECT ... FROM
  * cells.default.t`, `CREATE/DROP/ALTER RENAME TABLE`, `INSERT INTO`
  * — instead of only path-based `load()`/DDL-registered externals.
  *
  * Boot: `--conf spark.sql.catalog.cells=graft.sources.CellCatalog
  * --conf spark.sql.catalog.cells.root=/data/cells`. One flat
  * `default` namespace (the keyspace analogue); table schemas are
  * self-describing from file headers (CEL5 typed values), with a
  * `_type` marker carrying the value type of a created-but-still-empty
  * table so `CREATE TABLE (… value string …)` survives until the
  * first flush lands.
  */
class CellCatalog extends TableCatalog with SupportsNamespaces {
  private var catalogName: String = _
  private var root: Path = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val r = options.get("root")
    require(r != null,
      s"spark.sql.catalog.$name.root must point at the table directory")
    root = Paths.get(r)
    Files.createDirectories(root)
  }

  override def name(): String = catalogName

  private val Default = Array("default")

  private def checkNamespace(ns: Array[String]): Unit =
    if (!(ns.isEmpty || ns.sameElements(Default)))
      throw new NoSuchNamespaceException(catalogName +: ns)

  private def dirFor(ident: Identifier): Path = {
    checkNamespace(ident.namespace())
    require(!ident.name().contains("/") && !ident.name().startsWith("."),
      s"illegal table name '${ident.name()}'")
    root.resolve(ident.name())
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    checkNamespace(namespace)
    Using.resource(Files.list(root)) { st =>
      st.iterator().asScala
        .filter(p => Files.isDirectory(p) &&
          !p.getFileName.toString.startsWith("."))
        .map(p => Identifier.of(Default, p.getFileName.toString))
        .toArray
    }
  }

  override def tableExists(ident: Identifier): Boolean =
    Files.isDirectory(dirFor(ident))

  /** Schema: file headers win (self-describing); a `_type` marker
    * covers the created-but-empty window; long default otherwise.
    */
  private def schemaOf(dir: Path): StructType =
    CellPlanning.listFiles(dir.toString).headOption match {
      case Some(f) =>
        val h = CellSource.readHeader(f)
        CellSource.schemaFor(
          ValueCodec.dataTypeFor(h.valueTag, h.decPrec, h.decScale))
      case None =>
        val marker = dir.resolve("_type")
        if (Files.exists(marker))
          CellSource.schemaFor(
            ValueCodec.parseType(Files.readString(marker).trim))
        else CellSource.Schema
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
    val dir = dirFor(ident)
    if (!Files.isDirectory(dir)) throw new NoSuchTableException(ident)
    new CellTable(dir.toString, schemaOf(dir), propsOf(dir))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String])
      : Table = {
    val dir = dirFor(ident)
    if (Files.isDirectory(dir)) throw new TableAlreadyExistsException(ident)
    require(partitions.isEmpty,
      "cell tables are pk-range organized; partitioning transforms " +
        "are not supported")
    val resolved =
      if (schema.isEmpty) CellSource.Schema // CREATE TABLE t (no cols)
      else {
        require(
          schema.fieldNames.sameElements(CellSource.Schema.fieldNames),
          "cell tables need columns " +
            s"${CellSource.Schema.fieldNames.mkString(",")}, got " +
            schema.fieldNames.mkString(","))
        ValueCodec.tagFor(schema("value").dataType) // validates support
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

  override def dropTable(ident: Identifier): Boolean = {
    val dir = dirFor(ident)
    if (!Files.isDirectory(dir)) false
    else {
      Using.resource(Files.list(dir)) {
        _.iterator().asScala.toList.foreach(Files.delete)
      }
      Files.delete(dir)
      true
    }
  }

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit = {
    val from = dirFor(oldIdent)
    if (!Files.isDirectory(from)) throw new NoSuchTableException(oldIdent)
    val to = dirFor(newIdent)
    if (Files.isDirectory(to)) throw new TableAlreadyExistsException(newIdent)
    Files.move(from, to)
  }

  // --- SupportsNamespaces: one flat "default" namespace ---

  override def listNamespaces(): Array[Array[String]] = Array(Default)

  override def listNamespaces(
      namespace: Array[String]): Array[Array[String]] = {
    checkNamespace(namespace)
    Array.empty
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || namespace.sameElements(Default)

  override def loadNamespaceMetadata(
      namespace: Array[String]): JMap[String, String] = {
    checkNamespace(namespace)
    java.util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
      metadata: JMap[String, String]): Unit =
    throw new UnsupportedOperationException(
      "cell catalogs have a single fixed 'default' namespace")

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "cell catalogs have a single fixed 'default' namespace")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean =
    throw new UnsupportedOperationException(
      "cell catalogs have a single fixed 'default' namespace")
}
