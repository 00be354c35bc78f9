package graft.cql

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** C67 — the cqlsh/driver METADATA surface: `DESCRIBE` statements and
  * the `system_schema` virtual tables, served from CATALOG metadata
  * (`_props` + self-describing flush headers) — never from data files.
  *
  * Every real client session performs this round at connect time
  * (drivers build their token/metadata maps from `system_schema`;
  * cqlsh renders `DESCRIBE`), so the front door must answer it.
  *
  * Scale: deliberately driver-side — the relations are bounded by
  * TABLE COUNT, not data size (a schema registry, not a data scan),
  * and every row is built from the same `_props`/header reads the
  * catalog itself serves. No Spark job runs for a metadata query.
  */
private[cql] object SystemSchema {

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"CQL: $msg")

  /** Spark → CQL type names (the inverse of the CREATE TABLE column
    * grammar; unknown types render their Spark simpleString).
    */
  def cqlTypeName(dt: DataType): String = dt match {
    case LongType => "bigint"
    case IntegerType => "int"
    case StringType => "text"
    case DoubleType => "double"
    case BooleanType => "boolean"
    case BinaryType => "blob"
    case TimestampType | TimestampNTZType => "timestamp"
    case _: DecimalType => "decimal"
    case o => o.simpleString
  }

  private def root(spark: SparkSession, catalog: String): String =
    spark.conf.getOption(s"spark.sql.catalog.$catalog.root")
      .getOrElse(fail(s"spark.sql.catalog.$catalog.root is not set"))

  private def props(dir: String): Map[String, String] = {
    val f = java.nio.file.Paths.get(dir).resolve("_props")
    if (!java.nio.file.Files.exists(f)) return Map.empty
    val p = new java.util.Properties()
    val r = java.nio.file.Files.newBufferedReader(f)
    try p.load(r) finally r.close()
    scala.jdk.CollectionConverters.PropertiesHasAsScala(p).asScala.toMap
  }

  private def ksNames(spark: SparkSession, catalog: String): Seq[String] =
    spark.sql(s"SHOW NAMESPACES IN $catalog").collect()
      .map(_.getString(0)).toSeq.sorted
      // USER keyspaces only: drop the catalog's synthetic namespaces
      // — Spark session init materializes a `default` namespace and
      // the connector synthesizes `system`; neither is a CQL keyspace
      .filter(ks => ks != "default" && ks != "system" &&
        java.nio.file.Files.isDirectory(
          java.nio.file.Paths.get(s"${root(spark, catalog)}/$ks")))

  private def tblNames(spark: SparkSession, catalog: String,
      ks: String): Seq[String] =
    spark.sql(s"SHOW TABLES IN $catalog.$ks").collect()
      .map(_.getString(1)).toSeq.sorted

  /** (keyspace, table, dir) triples, classified. An index or MV
    * directory is excluded from `tables` and surfaced through its own
    * relation — Cassandra's own split.
    */
  private def walk(spark: SparkSession, catalog: String)
      : Seq[(String, String, String)] =
    for {
      ks <- ksNames(spark, catalog)
      t <- tblNames(spark, catalog, ks)
    } yield (ks, t, s"${root(spark, catalog)}/$ks/$t")

  private def isIndex(dir: String): Boolean =
    graft.sources.CellIndex.baseOf(dir).isDefined
  private def isView(dir: String): Boolean =
    graft.sources.CellView.baseOf(dir).isDefined

  // ---- the five relations ------------------------------------------

  def keyspaces(spark: SparkSession, catalog: String): DataFrame =
    mk(spark, StructType(Seq(
        StructField("keyspace_name", StringType, nullable = false))),
      ksNames(spark, catalog).map(Row(_)))

  def tables(spark: SparkSession, catalog: String): DataFrame =
    mk(spark, StructType(Seq(
        StructField("keyspace_name", StringType, nullable = false),
        StructField("table_name", StringType, nullable = false),
        StructField("default_time_to_live", LongType, nullable = false),
        StructField("gc_grace_seconds", LongType, nullable = true))),
      walk(spark, catalog)
        .filter { case (_, _, d) => !isIndex(d) && !isView(d) }
        .map { case (ks, t, d) =>
          val p = props(d)
          Row(ks, t,
            p.get("defaultTtl").map(_.toLong).getOrElse(0L),
            p.get("gcGraceMs").map(ms => Long.box(ms.toLong / 1000L))
              .orNull)
        })

  def columns(spark: SparkSession, catalog: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("keyspace_name", StringType, nullable = false),
      StructField("table_name", StringType, nullable = false),
      StructField("column_name", StringType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("position", IntegerType, nullable = false),
      StructField("type", StringType, nullable = false)))
    val rows = walk(spark, catalog)
      .filter { case (_, _, d) => !isIndex(d) && !isView(d) }
      .flatMap { case (ks, t, d) => columnRows(spark, ks, t, d) }
    mk(spark, schema, rows)
  }

  private def columnRows(spark: SparkSession, ks: String, t: String,
      dir: String): Seq[Row] = {
    val spec = graft.sources.CellSource.keySpec(dir)
    val pr = props(dir)
    val counter = pr.get("counter").contains("true")
    // mapped key parts (C36d) render their DECLARED CQL name (uuid,
    // date, ...) rather than the storage layout's
    def keyType(p: graft.sources.KeyPart): String =
      pr.getOrElse(s"cqlKeyType.${p.name}", cqlTypeName(p.dataType))
    val pk = spec.pkParts.zipWithIndex.map { case (p, i) =>
      Row(ks, t, p.name, "partition_key", i, keyType(p)) }
    val ck = spec.ckParts.zipWithIndex.map { case (p, i) =>
      Row(ks, t, p.name, "clustering", i, keyType(p)) }
    // the cell model's fixed data tail; `value` renders its declared
    // type (counter tables: `counter`, Cassandra's own rendering)
    val vt =
      if (counter) "counter"
      else pr.get("udtName") // C59b: frozen<type> spelling
        .map(n => s"frozen<$n>")
        .getOrElse(valueTypeName(spark, dir))
    val reg = Seq(
      Row(ks, t, "col", "regular", -1, "text"),
      Row(ks, t, "value", "regular", -1, vt),
      Row(ks, t, "wt", "regular", -1, "bigint"))
    // STATIC columns (C15b): Cassandra's own kind rendering
    val st = graft.sources.CellSource.staticCols(dir).toSeq.sorted
      .map(n => Row(ks, t, n, "static", -1, vt))
    pk ++ ck ++ reg ++ st
  }

  private def valueTypeName(spark: SparkSession, dir: String): String =
    // the declared COLLECTION spelling (C65z) outranks the mapped
    // element type, which outranks the storage layout — DESCRIBE
    // must print the statement that recreates the table
    props(dir).get("cqlCollection")
      .orElse(props(dir).get("cqlValueType")).getOrElse {
      // the connector's self-described read schema (headers win,
      // _props before the first flush) — the same authority every
      // scan uses
      val sch = spark.read.format("graft.sources.CellSource").load(dir)
        .schema
      sch.fields.find(_.name == "value")
        .map(f => cqlTypeName(f.dataType))
        .getOrElse("bigint")
    }

  def views(spark: SparkSession, catalog: String): DataFrame =
    mk(spark, StructType(Seq(
        StructField("keyspace_name", StringType, nullable = false),
        StructField("view_name", StringType, nullable = false),
        StructField("base_table_name", StringType, nullable = false))),
      walk(spark, catalog).filter { case (_, _, d) => isView(d) }
        .map { case (ks, v, d) =>
          val base = graft.sources.CellView.baseOf(d).get
          Row(ks, v, baseName(base)) })

  /** `system_schema.types` — the UDT metadata relation a driver
    * reads to decode frozen blobs (C67d): field names/types in
    * declared order, from each keyspace's `_types` registry.
    */
  def types(spark: SparkSession, catalog: String): DataFrame =
    mk(spark, StructType(Seq(
        StructField("keyspace_name", StringType, nullable = false),
        StructField("type_name", StringType, nullable = false),
        StructField("field_names",
          ArrayType(StringType, containsNull = false), nullable = false),
        StructField("field_types",
          ArrayType(StringType, containsNull = false), nullable = false))),
      ksNames(spark, catalog).flatMap { ks =>
        udtsOf(root(spark, catalog), ks).map { case (n, layout) =>
          val fields = layout.split(',').toSeq.map(_.trim)
            .filter(_.nonEmpty).map { f =>
              val sp = f.indexOf(' ')
              (f.substring(0, sp), cqlOf(f.substring(sp + 1).trim))
            }
          Row(ks, n, fields.map(_._1), fields.map(_._2))
        }
      })

  /** Layout-form type → CQL spelling (the registry stores the
    * UdtLayout form; drivers expect CQL names).
    */
  private def cqlOf(t: String): String = t match {
    case "string" => "text"
    case o => o
  }

  private def udtsOf(root: String, ks: String): Seq[(String, String)] = {
    val f = java.nio.file.Paths.get(root, ks, "_types")
    if (!java.nio.file.Files.exists(f)) return Seq.empty
    val p = new java.util.Properties()
    val r = java.nio.file.Files.newBufferedReader(f)
    try p.load(r) finally r.close()
    scala.jdk.CollectionConverters.PropertiesHasAsScala(p)
      .asScala.toSeq.sortBy(_._1)
  }

  def describeType(spark: SparkSession, catalog: String, ks: String,
      name: String): DataFrame = {
    val layout = udtsOf(root(spark, catalog), ks).toMap
      .getOrElse(name.toLowerCase, fail(s"type $ks.$name does not exist"))
    val fields = layout.split(',').toSeq.map(_.trim).filter(_.nonEmpty)
      .map { f =>
        val sp = f.indexOf(' ')
        s"${f.substring(0, sp)} ${cqlOf(f.substring(sp + 1).trim)}"
      }
    mk(spark, StructType(Seq(
        StructField("create_statement", StringType, nullable = false))),
      Seq(Row(s"CREATE TYPE $ks.$name (${fields.mkString(", ")})")))
  }

  def indexes(spark: SparkSession, catalog: String): DataFrame =
    mk(spark, StructType(Seq(
        StructField("keyspace_name", StringType, nullable = false),
        StructField("table_name", StringType, nullable = false),
        StructField("index_name", StringType, nullable = false),
        StructField("target", StringType, nullable = true))),
      walk(spark, catalog).filter { case (_, _, d) => isIndex(d) }
        .map { case (ks, idx, d) =>
          val base = graft.sources.CellIndex.baseOf(d).get
          Row(ks, baseName(base), idx,
            graft.sources.CellIndex.columnOf(d).orNull) })

  private def baseName(baseDir: String): String =
    baseDir.replace('\\', '/').split('/').last

  // ---- system.local / system.peers (the connect round, C67b) -------

  /** 16 evenly spaced vnode tokens over the signed-64 ring — the
    * single node owns the whole ring, so any deterministic spacing is
    * a faithful token map; 2^64/16 = 2^60 per step.
    */
  private def ringTokens: Seq[String] =
    (0 until 16).map(i => (Long.MinValue + i * (1L << 60)).toString)

  private def nameUuid(s: String): String =
    java.util.UUID.nameUUIDFromBytes(
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toString

  /** The cluster-wide schema fingerprint drivers use for schema
    * agreement: a name-UUID over every table's canonical CREATE
    * statement (so any DDL — new table, option change, index, view —
    * moves the version). Bounded by table count.
    */
  private def schemaVersion(spark: SparkSession,
      catalog: String): String =
    nameUuid(walk(spark, catalog).map { case (ks, t, d) =>
      if (isIndex(d) || isView(d)) s"$ks.$t" // membership still counts
      else describeTable(spark, catalog, ks, t)
        .collect().head.getString(0)
    }.mkString("\n"))

  private val localSchema = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("bootstrapped", StringType, nullable = false),
    StructField("cluster_name", StringType, nullable = false),
    StructField("cql_version", StringType, nullable = false),
    StructField("data_center", StringType, nullable = false),
    StructField("host_id", StringType, nullable = false),
    StructField("listen_address", StringType, nullable = false),
    StructField("native_protocol_version", StringType, nullable = false),
    StructField("partitioner", StringType, nullable = false),
    StructField("rack", StringType, nullable = false),
    StructField("release_version", StringType, nullable = false),
    StructField("rpc_address", StringType, nullable = false),
    StructField("schema_version", StringType, nullable = false),
    StructField("tokens", ArrayType(StringType, containsNull = false),
      nullable = false)))

  /** `system.local` — the ONE row every driver reads first at connect
    * (cluster name, partitioner, token map, schema version). All
    * values deterministic: host_id names the catalog root, the token
    * map is the whole ring, schema_version fingerprints the DDL.
    */
  def local(spark: SparkSession, catalog: String): DataFrame =
    mk(spark, localSchema, Seq(Row(
      "local", "COMPLETED",
      spark.conf.getOption(s"spark.sql.catalog.$catalog.cluster_name")
        .getOrElse("graft"),
      "3.4.7", "datacenter1",
      nameUuid(root(spark, catalog)),
      "127.0.0.1", "5",
      "graft.sources.Mix64Partitioner", "rack1",
      "5.0-graft", "127.0.0.1",
      schemaVersion(spark, catalog),
      ringTokens)))

  /** `system.peers` — empty on a single-node topology (the honest
    * answer; drivers handle it as "no other nodes").
    */
  def peers(spark: SparkSession, catalog: String): DataFrame =
    mk(spark, StructType(Seq(
      StructField("peer", StringType, nullable = false),
      StructField("data_center", StringType, nullable = false),
      StructField("host_id", StringType, nullable = false),
      StructField("rack", StringType, nullable = false),
      StructField("release_version", StringType, nullable = false),
      StructField("rpc_address", StringType, nullable = false),
      StructField("schema_version", StringType, nullable = false),
      StructField("tokens", ArrayType(StringType, containsNull = false),
        nullable = false))), Seq.empty)

  // ---- system.size_estimates (the split-planning round, C67c) ------

  private val sizeEstSchema = StructType(Seq(
    StructField("keyspace_name", StringType, nullable = false),
    StructField("table_name", StringType, nullable = false),
    StructField("range_start", StringType, nullable = false),
    StructField("range_end", StringType, nullable = false),
    StructField("mean_partition_size", LongType, nullable = false),
    StructField("partitions_count", LongType, nullable = false)))

  /** Fraction of the file's token span [mn, mx] inside the vnode
    * range (lo, hi] — hi <= lo is the wrapping range. Doubles: spans
    * can cover most of the signed-64 ring, so long arithmetic would
    * overflow; estimates don't need exactness.
    */
  private def overlapFrac(mn: Long, mx: Long, lo: Long,
      hi: Long): Double = {
    def seg(a: Long, b: Long): Double = {
      val l = math.max(mn, a); val r = math.min(mx, b)
      if (l > r) 0.0 else r.toDouble - l.toDouble + 1
    }
    val ov =
      if (lo < hi) seg(lo + 1, hi)
      else seg(lo + 1, Long.MaxValue) + seg(Long.MinValue, hi)
    ov / (mx.toDouble - mn.toDouble + 1)
  }

  /** `system.size_estimates` — the SPLIT-PLANNING round: per (table,
    * vnode range) estimated partition count and mean partition size,
    * which is what every Spark/Hadoop Cassandra connector reads to
    * size its input splits. Served header-only (Summary bounds +
    * sparse-index samples + on-disk file size — no data read): each
    * file's estimate is attributed to the 16 primary ranges of the
    * node's token map proportionally to token-span overlap. The
    * product partitions_count × mean_partition_size reproduces the
    * attributed on-disk bytes exactly — the number split planners
    * actually consume; the count itself is the sparse-index
    * boundary estimator (upper bound on wide-partition tables).
    */
  def sizeEstimates(spark: SparkSession, catalog: String): DataFrame = {
    val toks = ringTokens.map(_.toLong)
    val ranges = toks.zip(toks.tail :+ toks.head) // (start, end], wraps
    val rows = walk(spark, catalog)
      .filterNot { case (_, _, d) => isIndex(d) || isView(d) }
      .flatMap { case (ks, t, d) =>
        val stats = graft.sources.CellSource.dirEstimates(d)
          .filter(_._5 > 0)
        ranges.flatMap { case (lo, hi) =>
          var parts = 0.0; var bytes = 0.0
          stats.foreach { case (mn, mx, p, b, _) =>
            val frac = overlapFrac(mn, mx, lo, hi)
            parts += p * frac; bytes += b * frac
          }
          val pc = math.round(parts)
          if (pc <= 0L) None
          else Some(Row(ks, t, lo.toString, hi.toString,
            math.round(bytes / pc), pc))
        }
      }
    mk(spark, sizeEstSchema, rows)
  }

  /** `SELECT cols FROM system.<local|peers|size_estimates> [WHERE
    * ...]` — same equality-and-projection subset as the system_schema
    * facade.
    */
  def selectSystem(spark: SparkSession, catalog: String, rel: String,
      cols: String, where: Option[String]): DataFrame = {
    var df = rel.toLowerCase match {
      case "local" => local(spark, catalog)
      case "peers" => peers(spark, catalog)
      case "size_estimates" => sizeEstimates(spark, catalog)
      // the C53 operational relations the catalog already serves as
      // `<catalog>.system.*` — same front door, same WHERE subset
      case s @ ("tables" | "snapshots" | "ring") =>
        spark.table(s"$catalog.system.$s")
      case o => fail(s"unknown system relation: $o")
    }
    val names = df.schema.fieldNames.toSet
    where.foreach {
      _.split("(?i)\\s+AND\\s+").foreach {
        case EqRe(c, v) if names.contains(c.toLowerCase) =>
          df = df.filter(col(c.toLowerCase) === v)
        case o => fail("system WHERE takes column = 'value' " +
          s"equalities, got: $o")
      }
    }
    if (cols.trim != "*") {
      val items = cols.split(',').map(_.trim.toLowerCase)
      items.find(!names.contains(_)).foreach(c =>
        fail(s"unknown system.$rel column: $c"))
      df = df.select(items.map(col).toIndexedSeq: _*)
    }
    df
  }

  private def mk(spark: SparkSession, schema: StructType,
      rows: Seq[Row]): DataFrame =
    spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava, schema)

  // ---- C71: UDF/UDA metadata (system_schema.functions/aggregates,
  // DESCRIBE FUNCTION/AGGREGATE) — served from the per-keyspace
  // `_functions`/`_aggregates` registries, the `_types` residency
  // class (bounded by function count, no Spark job).

  private def ksPath(spark: SparkSession, catalog: String,
      ks: String): java.nio.file.Path =
    java.nio.file.Paths.get(root(spark, catalog), ks)

  def functions(spark: SparkSession, catalog: String): DataFrame =
    mk(spark, StructType(Seq(
        StructField("keyspace_name", StringType, nullable = false),
        StructField("function_name", StringType, nullable = false),
        StructField("argument_names", StringType, nullable = false),
        StructField("argument_types", StringType, nullable = false),
        StructField("return_type", StringType, nullable = false),
        StructField("language", StringType, nullable = false),
        StructField("called_on_null_input", BooleanType,
          nullable = false),
        StructField("body", StringType, nullable = false))),
      for {
        ks <- ksNames(spark, catalog)
        (n, f) <- Cql.fnsOf(ksPath(spark, catalog, ks)).toSeq
          .sortBy(_._1)
      } yield Row(ks, n, f.args.map(_._1).mkString(", "),
        f.args.map(_._2).mkString(", "), f.returns, "sql",
        f.calledOnNull, f.body))

  def aggregates(spark: SparkSession, catalog: String): DataFrame =
    mk(spark, StructType(Seq(
        StructField("keyspace_name", StringType, nullable = false),
        StructField("aggregate_name", StringType, nullable = false),
        StructField("argument_types", StringType, nullable = false),
        StructField("state_func", StringType, nullable = false),
        StructField("state_type", StringType, nullable = false),
        StructField("final_func", StringType, nullable = true),
        StructField("initcond", StringType, nullable = false))),
      for {
        ks <- ksNames(spark, catalog)
        (n, a) <- Cql.aggsOf(ksPath(spark, catalog, ks)).toSeq
          .sortBy(_._1)
      } yield Row(ks, n, a.argType, a.sfunc, a.stype,
        a.finalFunc.orNull, a.initcond))

  private def fnCreateStmt(ks: String, n: String,
      f: Cql.CqlFn): String =
    s"CREATE FUNCTION $ks.$n (" +
      f.args.map { case (an, at) => s"$an $at" }.mkString(", ") +
      ") " +
      (if (f.calledOnNull) "CALLED ON NULL INPUT"
       else "RETURNS NULL ON NULL INPUT") +
      s" RETURNS ${f.returns} LANGUAGE sql AS '" +
      f.body.replace("'", "''") + "'"

  private def aggCreateStmt(ks: String, n: String,
      a: Cql.CqlAgg): String =
    s"CREATE AGGREGATE $ks.$n (${a.argType}) SFUNC ${a.sfunc} " +
      s"STYPE ${a.stype}" +
      a.finalFunc.map(f => s" FINALFUNC $f").getOrElse("") +
      s" INITCOND ${a.initcond}"

  private val OneStmt = StructType(Seq(
    StructField("create_statement", StringType, nullable = false)))

  def describeFunctions(spark: SparkSession,
      catalog: String): DataFrame =
    mk(spark, StructType(Seq(
        StructField("function", StringType, nullable = false))),
      for {
        ks <- ksNames(spark, catalog)
        n <- Cql.fnsOf(ksPath(spark, catalog, ks)).keys.toSeq.sorted
      } yield Row(s"$ks.$n"))

  def describeFunction(spark: SparkSession, catalog: String,
      ks: String, n: String): DataFrame = {
    val f = Cql.fnsOf(ksPath(spark, catalog, ks)).getOrElse(n,
      fail(s"function $ks.$n does not exist"))
    mk(spark, OneStmt, Seq(Row(fnCreateStmt(ks, n, f))))
  }

  def describeAggregates(spark: SparkSession,
      catalog: String): DataFrame =
    mk(spark, StructType(Seq(
        StructField("aggregate", StringType, nullable = false))),
      for {
        ks <- ksNames(spark, catalog)
        n <- Cql.aggsOf(ksPath(spark, catalog, ks)).keys.toSeq.sorted
      } yield Row(s"$ks.$n"))

  def describeAggregate(spark: SparkSession, catalog: String,
      ks: String, n: String): DataFrame = {
    val a = Cql.aggsOf(ksPath(spark, catalog, ks)).getOrElse(n,
      fail(s"aggregate $ks.$n does not exist"))
    mk(spark, OneStmt, Seq(Row(aggCreateStmt(ks, n, a))))
  }

  // ---- the SELECT facade -------------------------------------------

  private val EqRe = """(?is)^\s*(\w+)\s*=\s*'([^']*)'\s*$""".r

  /** `SELECT cols FROM system_schema.<rel> [WHERE name = 'v' AND …]`:
    * equality on the relation's own string columns, plain-column (or
    * `*`) projection — the driver metadata-round subset; anything else
    * refuses loudly.
    */
  def select(spark: SparkSession, catalog: String, rel: String,
      cols: String, where: Option[String]): DataFrame = {
    var df = rel.toLowerCase match {
      case "keyspaces" => keyspaces(spark, catalog)
      case "tables" => tables(spark, catalog)
      case "columns" => columns(spark, catalog)
      case "views" => views(spark, catalog)
      case "indexes" => indexes(spark, catalog)
      case "types" => types(spark, catalog)
      case "functions" => functions(spark, catalog)
      case "aggregates" => aggregates(spark, catalog)
      case o => fail(s"unknown system_schema relation: $o")
    }
    val names = df.schema.fieldNames.toSet
    where.foreach {
      _.split("(?i)\\s+AND\\s+").foreach {
        case EqRe(c, v) if names.contains(c.toLowerCase) =>
          df = df.filter(col(c.toLowerCase) === v)
        case o => fail("system_schema WHERE takes column = 'value' " +
          s"equalities, got: $o")
      }
    }
    if (cols.trim != "*") {
      val items = cols.split(',').map(_.trim.toLowerCase)
      items.find(!names.contains(_)).foreach(c =>
        fail(s"unknown system_schema.$rel column: $c"))
      df = df.select(items.map(col).toIndexedSeq: _*)
    }
    df
  }

  // ---- DESCRIBE ----------------------------------------------------

  /** The canonical CREATE TABLE statement of a table — round-trips
    * through `catalogExecute` (the statement DESCRIBE prints is the
    * statement that recreates the table).
    */
  def describeTable(spark: SparkSession, catalog: String, ks: String,
      t: String): DataFrame = {
    val dir = s"${root(spark, catalog)}/$ks/$t"
    if (!java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir)))
      fail(s"table $ks.$t does not exist")
    val spec = graft.sources.CellSource.keySpec(dir)
    val p = props(dir)
    val counter = p.get("counter").contains("true")
    val keyCols = (spec.pkParts ++ spec.ckParts)
      .map(x => s"${x.name} " +
        p.getOrElse(s"cqlKeyType.${x.name}", cqlTypeName(x.dataType)))
    val vt =
      if (counter) "counter"
      else p.get("udtName") // C59b: the declared frozen<type> spelling
        .map(n => s"frozen<$n>")
        .getOrElse(valueTypeName(spark, dir))
    val pkSyn = "PRIMARY KEY ((" +
      spec.pkParts.map(_.name).mkString(", ") + ")" +
      (if (spec.ckParts.isEmpty) ""
       else spec.ckParts.map(_.name).mkString(", ", ", ", "")) + ")"
    // accepted-and-recorded physical tuning knobs (C51c) render back
    // verbatim, in option-name order; the comment re-quotes with ''
    // escaping — both make DESC output replayable through the parser
    val inert = p.toSeq
      .collect { case (k, v) if k.startsWith("tblopt.") =>
        s"${k.stripPrefix("tblopt.")} = $v" }
      .sorted.map(Some(_))
    val opts = Seq(
      p.get("clusteringOrder").filter(_ == "desc").map { _ =>
        "CLUSTERING ORDER BY (" +
          spec.ckParts.map(c => s"${c.name} DESC").mkString(", ") + ")"
      },
      p.get("comment").map(c =>
        "comment = '" + c.replace("'", "''") + "'"),
      p.get("defaultTtl").map(v => s"default_time_to_live = $v"),
      p.get("gcGraceMs").map(ms => s"gc_grace_seconds = ${ms.toLong / 1000L}"),
      p.get("compaction").map { pol =>
        val cls = pol match {
          case "stcs" => "SizeTieredCompactionStrategy"
          case "lcs" => "LeveledCompactionStrategy"
          case "twcs" => "TimeWindowCompactionStrategy"
          case o => o
        }
        val win = p.get("compactionWindowMs").map(_.toLong).map { ms =>
          val (u, n) =
            if (ms % 86400000L == 0) ("DAYS", ms / 86400000L)
            else if (ms % 3600000L == 0) ("HOURS", ms / 3600000L)
            else ("MINUTES", ms / 60000L)
          s", 'compaction_window_unit': '$u', " +
            s"'compaction_window_size': '$n'"
        }.getOrElse("")
        s"compaction = {'class': '$cls'$win}"
      }
    ).++(inert).flatten
    val withClause =
      if (opts.isEmpty) "" else opts.mkString(" WITH ", " AND ", "")
    val statics = graft.sources.CellSource.staticCols(dir)
      .toSeq.sorted.map(n => s"$n $vt static")
    val stmt = s"CREATE TABLE $ks.$t (" +
      (keyCols ++ Seq("col text", s"value $vt", "wt bigint") ++
        statics).mkString(", ") + s", $pkSyn)$withClause"
    mk(spark, StructType(Seq(
        StructField("create_statement", StringType, nullable = false))),
      Seq(Row(stmt)))
  }

  /** DESCRIBE INDEX (C67f): render the index's CREATE statement in
    * this subset's own grammar — round-trippable, the C71/C67d
    * DESCRIBE philosophy. The `_ci` analyzer targets (C18k) render
    * back as their `WITH OPTIONS = {'case_sensitive': 'false'}`
    * spelling.
    */
  private val CiTargetRe = """^(prefix|contains)_ci\((\w+)\)$""".r

  def describeIndex(spark: SparkSession, catalog: String, ks: String,
      name: String): DataFrame = {
    val dir = s"${root(spark, catalog)}/$ks/$name"
    if (!java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get(dir)) || !isIndex(dir))
      fail(s"index $ks.$name does not exist")
    val base = baseName(graft.sources.CellIndex.baseOf(dir).get)
    val target = graft.sources.CellIndex.columnOf(dir).getOrElse(
      fail(s"index $ks.$name carries no target metadata"))
    val (tgt, opts) = target match {
      case CiTargetRe(mode, c) =>
        (s"$mode($c)", " WITH OPTIONS = {'case_sensitive': 'false'}")
      case o =>
        // ann geometry options (planes/probes) persisted at CREATE
        // INDEX render back so the dump replays with the same buckets
        val persisted = graft.sources.CellIndex.optionsOf(dir)
        if (persisted.isEmpty) (o, "")
        else (o, persisted.toSeq.sorted
          .map { case (k, v) => s"'$k': '$v'" }
          .mkString(" WITH OPTIONS = {", ", ", "}"))
    }
    val stmt = s"CREATE INDEX $name ON $ks.$base ($tgt)$opts"
    mk(spark, StructType(Seq(
        StructField("create_statement", StringType, nullable = false))),
      Seq(Row(stmt)))
  }

  /** The view's round-trippable CREATE statement — the exact
    * CreateMvRe grammar, so a DESC KEYSPACE dump replays.
    */
  private def mvCreateStmt(ks: String, v: String,
      viewDir: String): String = {
    val base = baseName(graft.sources.CellView.baseOf(viewDir).get)
    val c = graft.sources.CellView.columnOf(viewDir).getOrElse(
      fail(s"view $ks.$v carries no column metadata"))
    val bspec = graft.sources.CellSource.keySpec(
      graft.sources.CellView.baseOf(viewDir).get)
    val tail = (bspec.pkParts ++ bspec.ckParts).map(_.name)
      .mkString(", ")
    s"CREATE MATERIALIZED VIEW $ks.$v AS SELECT * FROM $ks.$base " +
      s"WHERE $c IS NOT NULL PRIMARY KEY (($c), $tail)"
  }

  /** DESCRIBE KEYSPACE (C67g) — cqlsh's schema-export command: ONE
    * row per CREATE statement, in dependency order (keyspace, types,
    * tables, indexes, views, functions, aggregates), every statement
    * in this subset's own round-trippable grammar so the dump replays
    * through `executeScript`. The keyspace line renders the
    * single-node replication this engine presents in system.local.
    */
  def describeKeyspace(spark: SparkSession, catalog: String,
      ks: String): DataFrame = {
    val r = root(spark, catalog)
    if (!java.nio.file.Files.isDirectory(java.nio.file.Paths.get(r, ks)))
      fail(s"keyspace $ks does not exist")
    def one(df: DataFrame): String = df.collect()(0).getString(0)
    val entries = walk(spark, catalog).filter(_._1 == ks)
    val tableNames = entries
      .filter { case (_, _, d) => !isIndex(d) && !isView(d) }
      .map(_._2).sorted
    val idxNames = entries.filter { case (_, _, d) => isIndex(d) }
      .map(_._2).sorted
    val viewEntries = entries.filter { case (_, _, d) => isView(d) }
      .sortBy(_._2)
    val fns = Cql.fnsOf(ksPath(spark, catalog, ks))
    val aggs = Cql.aggsOf(ksPath(spark, catalog, ks))
    val stmts =
      Seq(s"CREATE KEYSPACE $ks WITH replication = {'class': " +
        "'SimpleStrategy', 'replication_factor': '1'}") ++
      udtsOf(r, ks).map(_._1).sorted
        .map(n => one(describeType(spark, catalog, ks, n))) ++
      tableNames.map(t => one(describeTable(spark, catalog, ks, t))) ++
      idxNames.map(i => one(describeIndex(spark, catalog, ks, i))) ++
      viewEntries.map { case (_, v, d) => mvCreateStmt(ks, v, d) } ++
      fns.keys.toSeq.sorted
        .map(n => one(describeFunction(spark, catalog, ks, n))) ++
      aggs.keys.toSeq.sorted
        .map(n => one(describeAggregate(spark, catalog, ks, n)))
    mk(spark, OneStmt, stmts.map(Row(_)))
  }

  def describeKeyspaces(spark: SparkSession, catalog: String): DataFrame =
    keyspaces(spark, catalog)

  def describeTables(spark: SparkSession, catalog: String): DataFrame =
    tables(spark, catalog).select("keyspace_name", "table_name")
}
