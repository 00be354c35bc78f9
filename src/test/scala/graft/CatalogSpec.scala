package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.cassandra.CellModel

/** The V2 `TableCatalog` surface ([[graft.sources.CellCatalog]]):
  * connector tables visible to SHOW TABLES, DDL lifecycle, INSERT
  * INTO, typed value columns via the `_type` marker, and pushdown
  * through catalog-resolved scans.
  */
class CatalogSpec extends GraftSpec {

  private lazy val root: String =
    Files.createTempDirectory("cell-catalog").toString

  private lazy val cat: String = {
    spark.conf.set("spark.sql.catalog.gcells",
      "graft.sources.CellCatalog")
    spark.conf.set("spark.sql.catalog.gcells.root", root)
    "gcells"
  }

  test("create / show / insert / select / rename / drop lifecycle") {
    spark.sql(s"CREATE TABLE $cat.default.t1 " +
      "(pk bigint, ck int, col string, value bigint, wt bigint)")
    val shown = spark.sql(s"SHOW TABLES IN $cat.default").collect()
      .map(_.getString(1)).toSet
    assert(shown.contains("t1"))

    val cells = CellModel.cells(spark, sf()).limit(1000)
    cells.writeTo(s"$cat.default.t1").append()
    spark.sql(s"INSERT INTO $cat.default.t1 " +
      "VALUES (9999999999, 1, 'qty', 42, 12345)")
    assert(spark.table(s"$cat.default.t1").count() === 1001)
    val back = spark.sql(
      s"SELECT value FROM $cat.default.t1 WHERE pk = 9999999999")
    assert(back.collect().map(_.getLong(0)).toSeq === Seq(42L))
    // the pk predicate reached the connector (file pruning planned)
    assert(back.rdd.getNumPartitions <= 2)

    spark.sql(s"ALTER TABLE $cat.default.t1 RENAME TO t1_renamed")
    val afterRename = spark.sql(s"SHOW TABLES IN $cat.default").collect()
      .map(_.getString(1)).toSet
    assert(afterRename.contains("t1_renamed") && !afterRename.contains("t1"))
    assert(spark.table(s"$cat.default.t1_renamed").count() === 1001)

    spark.sql(s"DROP TABLE $cat.default.t1_renamed")
    assert(!spark.sql(s"SHOW TABLES IN $cat.default").collect()
      .map(_.getString(1)).contains("t1_renamed"))
  }

  test("typed value column persists through the created-empty window") {
    spark.sql(s"CREATE TABLE $cat.default.flags " +
      "(pk bigint, ck int, col string, value string, wt bigint)")
    // schema honored BEFORE any data lands (the _type marker)
    assert(spark.table(s"$cat.default.flags")
      .schema("value").dataType.typeName === "string")
    spark.sql(s"INSERT INTO $cat.default.flags " +
      "VALUES (1, 1, 'flag', 'R', 100), (1, 1, 'flag', 'XR', 200)")
    // and still honored after (now from the CEL5 header)
    val vals = spark.table(s"$cat.default.flags")
      .orderBy(col("wt")).collect().map(_.getString(3)).toSeq
    assert(vals === Seq("R", "XR"))
    spark.sql(s"DROP TABLE $cat.default.flags")
  }

  test("TBLPROPERTIES('reconcile'='true') defines a reconciled table") {
    spark.sql(s"CREATE TABLE $cat.default.merged_view " +
      "(pk bigint, ck int, col string, value bigint, wt bigint) " +
      "TBLPROPERTIES ('reconcile'='true')")
    // two versions of the same cell, inserted as separate flushes
    spark.sql(s"INSERT INTO $cat.default.merged_view " +
      "VALUES (1, 1, 'qty', 10, 100)")
    spark.sql(s"INSERT INTO $cat.default.merged_view " +
      "VALUES (1, 1, 'qty', 99, 200)")
    // every reader of the catalog table sees ONE reconciled cell —
    // the LWW winner — without passing any read option
    val rows = spark.table(s"$cat.default.merged_view").collect()
    assert(rows.length === 1)
    assert(rows.head.getLong(3) === 99L && rows.head.getLong(4) === 200L)
    // the property survives a catalog reload (persisted in _props)
    spark.sql(s"ALTER TABLE $cat.default.merged_view RENAME TO mv2")
    assert(spark.table(s"$cat.default.mv2").count() === 1)
    spark.sql(s"DROP TABLE $cat.default.mv2")
  }

  test("ALTER TABLE SET/UNSET TBLPROPERTIES flips scan defaults") {
    spark.sql(s"CREATE TABLE $cat.default.alterable " +
      "(pk bigint, ck int, col string, value bigint, wt bigint)")
    spark.sql(s"INSERT INTO $cat.default.alterable " +
      "VALUES (1, 1, 'qty', 10, 100), (1, 1, 'qty', 99, 200)")
    assert(spark.table(s"$cat.default.alterable").count() === 2) // raw
    spark.sql(s"ALTER TABLE $cat.default.alterable " +
      "SET TBLPROPERTIES ('reconcile'='true')")
    assert(spark.table(s"$cat.default.alterable").count() === 1) // LWW
    spark.sql(s"ALTER TABLE $cat.default.alterable " +
      "UNSET TBLPROPERTIES ('reconcile')")
    assert(spark.table(s"$cat.default.alterable").count() === 2)
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.default.alterable ADD COLUMN x int")
    }
    spark.sql(s"DROP TABLE $cat.default.alterable")
  }

  test("namespace (keyspace) lifecycle across two namespaces") {
    spark.sql(s"CREATE NAMESPACE $cat.ks1")
    spark.sql(s"CREATE NAMESPACE $cat.ks2")
    val namespaces = spark.sql(s"SHOW NAMESPACES IN $cat").collect()
      .map(_.getString(0)).toSet
    assert(Set("default", "ks1", "ks2").subsetOf(namespaces))
    // same table NAME in two namespaces = two independent tables
    spark.sql(s"CREATE TABLE $cat.ks1.t " +
      "(pk bigint, ck int, col string, value bigint, wt bigint)")
    spark.sql(s"CREATE TABLE $cat.ks2.t " +
      "(pk bigint, ck int, col string, value string, wt bigint)")
    spark.sql(s"INSERT INTO $cat.ks1.t VALUES (1, 1, 'qty', 10, 100)")
    spark.sql(s"INSERT INTO $cat.ks2.t VALUES (1, 1, 'flag', 'R', 100)")
    assert(spark.table(s"$cat.ks1.t").head().getLong(3) === 10L)
    assert(spark.table(s"$cat.ks2.t").head().getString(3) === "R")
    assert(spark.sql(s"SHOW TABLES IN $cat.ks1").collect()
      .map(_.getString(1)).toSet === Set("t"))
    // rename MOVES a table across namespaces
    spark.sql(s"ALTER TABLE $cat.ks1.t RENAME TO ks2.t_moved")
    assert(spark.sql(s"SHOW TABLES IN $cat.ks1").collect().isEmpty)
    assert(spark.table(s"$cat.ks2.t_moved").count() === 1)
    // a missing namespace is an error, not an empty listing
    intercept[Exception] {
      spark.sql(s"SHOW TABLES IN $cat.nope").collect()
    }
    // non-cascade drop refuses a non-empty namespace
    intercept[Exception] { spark.sql(s"DROP NAMESPACE $cat.ks2") }
    spark.sql(s"DROP NAMESPACE $cat.ks2 CASCADE")
    spark.sql(s"DROP NAMESPACE $cat.ks1")
    val after = spark.sql(s"SHOW NAMESPACES IN $cat").collect()
      .map(_.getString(0)).toSet
    assert(!after.contains("ks1") && !after.contains("ks2"))
  }

  test("catalog rejects what the format cannot hold") {
    intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.default.bad (a int, b string)")
    }
    intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.default.bad2 " +
        "(pk bigint, ck int, col string, value array<int>, wt bigint)")
    }
    assert(spark.sql(s"SHOW TABLES IN $cat.default").collect()
      .map(_.getString(1)).toSet.intersect(Set("bad", "bad2")).isEmpty)
  }

  test("drops survive nested residual directories") {
    import java.nio.file.{Files, Paths}
    spark.sql(s"CREATE NAMESPACE $cat.ksres")
    spark.sql(s"CREATE TABLE $cat.ksres.t " +
      "(pk bigint, ck int, col string, value bigint, wt bigint)")
    spark.sql(s"INSERT INTO $cat.ksres.t VALUES (1, 1, 'qty', 10, 100)")
    // residue a real pipeline leaves behind: a nested streaming
    // checkpoint dir inside the table, and a '_'-prefixed working dir
    // in the namespace that listTables skips — a flat delete dies
    // half-way on either
    val nsDir = Paths.get(root, "ksres")
    Files.createDirectories(nsDir.resolve("t").resolve("_checkpoint"))
    Files.writeString(
      nsDir.resolve("t").resolve("_checkpoint").resolve("state"), "x")
    Files.createDirectories(nsDir.resolve("_staging").resolve("job1"))
    Files.writeString(
      nsDir.resolve("_staging").resolve("job1").resolve("tmp"), "y")
    spark.sql(s"DROP NAMESPACE $cat.ksres CASCADE")
    assert(!Files.exists(nsDir))
  }

  test("SQL DELETE writes tombstones, never rewrites data (C38)") {
    import java.nio.file.{Files, Paths}
    spark.sql(s"CREATE TABLE $cat.default.del " +
      "(pk bigint, ck int, col string, value bigint, wt bigint) " +
      "TBLPROPERTIES ('reconcile'='true')")
    spark.sql(s"INSERT INTO $cat.default.del VALUES " +
      "(1, 1, 'qty', 10, 100), (1, 2, 'qty', 11, 100), " +
      "(1, 3, 'qty', 12, 100), (2, 1, 'qty', 20, 100), " +
      "(3, 1, 'qty', 30, 100), (3, 2, 'qty', 31, 100)")
    val before = spark.table(s"$cat.default.del").count()
    assert(before === 6)
    def rows() = spark.table(s"$cat.default.del")
      .select("pk", "ck", "value").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // partition delete
    spark.sql(s"DELETE FROM $cat.default.del WHERE pk = 2")
    assert(!rows().exists(_._1 == 2L))
    // row delete
    spark.sql(s"DELETE FROM $cat.default.del WHERE pk = 1 AND ck = 2")
    assert(rows().filter(_._1 == 1L).map(_._2) === Set(1, 3))
    // range delete
    spark.sql(
      s"DELETE FROM $cat.default.del WHERE pk = 3 AND ck >= 1 AND ck <= 1")
    assert(rows().filter(_._1 == 3L).map(_._2) === Set(2))
    // a LATER write past the deletion survives it (Cassandra LWW)
    spark.sql(s"INSERT INTO $cat.default.del " +
      "VALUES (2, 7, 'qty', 99, 200)")
    assert(rows().filter(_._1 == 2L) === Set((2L, 7, 99L)))
    // deletes APPENDED flushes; the original data file was never
    // rewritten (its flush index is still present)
    val names = Files.list(Paths.get(root, "default", "del"))
      .iterator()
    val cells = {
      val it = names
      val b = Seq.newBuilder[String]
      while (it.hasNext) {
        val n = it.next().getFileName.toString
        if (n.endsWith(".cells")) b += n
      }
      b.result()
    }
    assert(cells.size >= 5, cells.mkString(","))
    // unsupported shapes refuse loudly instead of deleting wrong rows
    val e = intercept[Exception] {
      spark.sql(s"DELETE FROM $cat.default.del WHERE value = 99")
    }
    assert(e.getMessage.toLowerCase.contains("delete"))
  }

  test("SQL TRUNCATE keeps flush numbering monotonic (C38)") {
    import java.nio.file.{Files, Paths}
    spark.sql(s"CREATE TABLE $cat.default.trunc " +
      "(pk bigint, ck int, col string, value bigint, wt bigint)")
    spark.sql(s"INSERT INTO $cat.default.trunc VALUES " +
      "(1, 1, 'qty', 10, 100)")
    spark.sql(s"INSERT INTO $cat.default.trunc VALUES " +
      "(2, 1, 'qty', 20, 100)")
    spark.sql(s"TRUNCATE TABLE $cat.default.trunc")
    assert(spark.table(s"$cat.default.trunc").count() === 0)
    spark.sql(s"INSERT INTO $cat.default.trunc VALUES " +
      "(3, 1, 'qty', 30, 300)")
    assert(spark.table(s"$cat.default.trunc").count() === 1)
    // indices were never reused: the post-truncate flushes sit ABOVE
    // the pre-truncate generation (CDC stream offset invariant)
    val it = Files.list(Paths.get(root, "default", "trunc")).iterator()
    val idx = Seq.newBuilder[Int]
    while (it.hasNext) {
      val n = it.next().getFileName.toString
      if (n.endsWith(".cells"))
        idx += n.stripPrefix("data-").stripSuffix(".cells").toInt
    }
    assert(idx.result().max >= 3, idx.result().sorted.mkString(","))
  }

  test("system virtual tables expose per-table stats (C53)") {
    spark.sql(s"CREATE TABLE $cat.default.sysdemo " +
      "(pk bigint, ck int, col string, value bigint, wt bigint)")
    spark.sql(s"INSERT INTO $cat.default.sysdemo VALUES " +
      "(1, 0, 'qty', 10, 100), (2, 0, 'qty', 20, 100)")
    // the namespace and its two tables are visible to SHOW
    val nss = spark.sql(s"SHOW NAMESPACES IN $cat").collect()
      .map(_.getString(0)).toSet
    assert(nss.contains("system"), nss)
    val tabs = spark.sql(s"SHOW TABLES IN $cat.system").collect()
      .map(_.getString(1)).toSet
    assert(tabs == Set("tables", "snapshots", "ring"), tabs)
    // per-table stats row from manifest metadata
    val r = spark.table(s"$cat.system.tables")
      .filter(col("table") === "sysdemo").collect()
    assert(r.length == 1, r.mkString)
    assert(r(0).getAs[String]("namespace") == "default")
    val nf = r(0).getAs[Long]("n_files")
    assert(nf >= 1L)
    assert(r(0).getAs[Long]("n_records") == 2L)
    assert(r(0).getAs[Long]("n_bytes") > 0L)
    assert(r(0).getAs[String]("value_type") == "bigint")
    assert(r(0).getAs[String]("key_layout") == "((pk bigint), ck int)")
    assert(r(0).getAs[Long]("max_flush") == nf - 1)
    // system.ring: one row per flush file with its physical token
    // range and record count (nodetool describering from SQL)
    val ring = spark.table(s"$cat.system.ring")
      .filter(col("table") === "sysdemo").collect()
    assert(ring.length == nf.toInt, ring.mkString)
    assert(ring.forall(x => x.getAs[Long]("min_token") <=
      x.getAs[Long]("max_token")))
    assert(ring.map(_.getAs[Long]("n_records")).sum == 2L)
    // a snapshot surfaces in system.snapshots with its file count
    graft.sources.CellMaintenance.snapshot(
      java.nio.file.Paths.get(root, "default", "sysdemo").toString, "t0")
    val snaps = spark.table(s"$cat.system.snapshots")
      .filter(col("table") === "sysdemo").collect()
      .map(x => (x.getAs[String]("tag"), x.getAs[Long]("n_files"))).toSeq
    assert(snaps == Seq(("t0", nf)), snaps)
    // virtual and read-only: no DDL in, no dropping the namespace
    intercept[Exception](spark.sql(s"CREATE TABLE $cat.system.x " +
      "(pk bigint, ck int, col string, value bigint, wt bigint)"))
    intercept[Exception](spark.sql(s"DROP NAMESPACE $cat.system"))
    assert(spark.table(s"$cat.system.tables").count() >= 1)
  }
}
