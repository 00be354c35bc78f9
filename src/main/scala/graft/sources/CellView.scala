package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import scala.util.Using

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connector-side MATERIALIZED VIEW (C40 — Cassandra's MV): the base
  * table RE-KEYED by the value of one column, holding the FULL row —
  * unlike the 2i ([[CellIndex]]), a view lookup answers WITHOUT
  * touching the base table. This is Cassandra's
  * `CREATE MATERIALIZED VIEW ... PRIMARY KEY (x, pk, ck)` shape: the
  * view's partition key is the selected column's value and the base
  * primary key is appended to the view clustering so view rows stay
  * unique.
  *
  * View row layout (typed, CEL8): `(vk = value of `column`,
  * bpk = base pk, bck = base ck, col, value, wt)` — one view cell
  * per base cell of every base row that HAS `column`. The view is
  * itself a cell table, so the whole read path (token pruning, zone
  * maps, k-way LWW merge, slices, reverse reads) applies to view
  * lookups for free.
  *
  * Maintenance mirrors Cassandra's write path, batch-style. `build`
  * records the base generation (flush-file listing) in `_base`;
  * `refresh` heals a stale view DELTA-SIZED: it reads only the
  * flushes the base gained, finds the touched base rows, and
  * - appends the rows' CURRENT cells under their current vk (LWW
  *   collapses same-partition rewrites),
  * - writes view ROW TOMBSTONES where a row MOVED partitions (its
  *   `column` value changed) — ts = the row's max old-generation wt,
  *   so every stale copy is shadowed; this is the batch analogue of
  *   Cassandra's read-before-write MV update,
  * - writes view row tombstones where the base row was deleted
  *   (partition/row tombstone in the delta) — ts = the marker's ts,
  *   exactly the base's own shadowing window.
  * A clustering-RANGE tombstone in the delta or a replaced base
  * generation (compaction/truncation) falls back to a full rebuild.
  *
  * The A-B-A corner (row leaves a view partition and later returns
  * with cells whose writetimes don't exceed the movement tombstone)
  * is the one case the append protocol cannot express — Cassandra
  * needs "shadowable tombstones" for it and still documents MVs as
  * experimental. `refresh` DETECTS it exactly (an existing view row
  * tombstone at-or-after a returning row's min fresh writetime) and
  * falls back to a full rebuild, so views converge on every path;
  * the common paths (update / move / delete) stay delta-sized.
  */
object CellView {
  private val Fmt = "graft.sources.CellSource"
  private val BaseFile = "_base"

  private def generation(dir: String): String =
    CellPlanning.listFiles(dir)
      .map(f => Paths.get(f).getFileName.toString)
      .mkString(",")

  private case class ViewMeta(column: String, baseDir: String,
      gen: String)

  private def readMeta(viewDir: String): Option[ViewMeta] = {
    val p = Paths.get(CellPlanning.normalize(viewDir)).resolve(BaseFile)
    if (!Files.exists(p)) return None
    try {
      val lines = Files.readAllLines(p, StandardCharsets.UTF_8)
      // EXACTLY the 3-line view format: a secondary INDEX writes a
      // 4-line `_base` (…, epoch band) — without this check the two
      // kinds alias and DROP MATERIALIZED VIEW would accept an index
      if (lines.size != 3) None
      else Some(ViewMeta(lines.get(0), lines.get(1), lines.get(2)))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private def writeMeta(viewDir: String, column: String,
      baseDir: String, gen: String): Unit =
    Files.writeString(
      Paths.get(CellPlanning.normalize(viewDir)).resolve(BaseFile),
      s"$column\n${CellPlanning.normalize(baseDir)}\n$gen\n")

  private def reconciled(spark: SparkSession, dir: String): DataFrame =
    spark.read.format(Fmt).option("reconcile", "true").load(dir)

  /** The base's key layout for view derivation (round 9 lifts the
    * default-only restriction; round 10 the single-part one): any
    * partition-key parts plus any clustering parts; every base part
    * appears in the view prefixed with 'b' (the default layout's
    * parts become exactly the historical `bpk`/`bck`). The view's
    * OWN partition key stays `vk` alone — all base parts become view
    * clustering, so a multi-part base like `((tenant, day), seq)`
    * views as `((vk), btenant, bday, bseq)`. Returns
    * (name, typeSimpleString) pairs in key order.
    */
  private def baseParts(dir: String): Seq[(String, String)] = {
    val spec = CellSource.keySpec(CellPlanning.normalize(dir))
    val names = (spec.pkParts ++ spec.ckParts).map(_.name)
    // the view adds its own vk column and b-prefixed base parts —
    // refuse name shapes that would collide instead of mis-selecting
    require(!names.exists(n => n == "vk" || n.startsWith("b")
      && names.contains(n.substring(1))),
      s"base key part names collide with view columns: " +
        names.mkString(", "))
    (spec.pkParts ++ spec.ckParts)
      .map(p => p.name -> p.dataType.simpleString)
  }

  /** Base rows' cells re-keyed by their `column` value: the view
    * relation `(vk, b<part>..., col, value, wt)` — `(vk, bpk, bck,
    * …)` on the default layout.
    */
  private def viewRows(base: DataFrame, column: String,
      parts: Seq[String]): DataFrame = {
    val keys = base.filter(col("col") === column)
      .select((parts.map(col) :+ col("value").as("vk"))
        .toIndexedSeq: _*)
    base.join(keys, parts)
      .select((Seq(col("vk")) ++
        parts.map(p => col(p).as("b" + p)) ++
        Seq(col("col"), col("value"), col("wt"))).toIndexedSeq: _*)
  }

  private def writeView(rows: DataFrame, viewDir: String,
      vkType: String, parts: Seq[(String, String)], files: Int,
      overwrite: Boolean): Unit = {
    var w = rows
      .repartitionByRange(files,
        (col("vk") +: parts.map(p => col("b" + p._1)))
          .toIndexedSeq: _*)
      .write.format(Fmt)
      .option("primaryKey",
        s"((vk),${parts.map("b" + _._1).mkString(",")})")
      .option("keyType.vk", vkType)
    parts.foreach { case (n, t) => w = w.option(s"keyType.b$n", t) }
    w.mode(if (overwrite) "overwrite" else "append").save(viewDir)
  }

  /** Build (or rebuild) the view of `column` over the table at `dir`
    * (default-keyed or typed with a single-part partition key) into
    * the typed cell table at `viewDir`. The base generation is
    * captured BEFORE the read — a racing flush leaves the view stale,
    * never silently incomplete.
    */
  def build(spark: SparkSession, dir: String, viewDir: String,
      column: String, files: Int = 8): Unit = {
    // same refusal as the CQL CREATE MATERIALIZED VIEW front door:
    // the build (and every delta refresh) reads the base
    // reconcile-only (LWW), which merges counter shards wrongly.
    // Cassandra refuses MVs on counter tables too.
    require(!CellPlanning.isCounterTable(dir),
      s"materialized views are not supported on counter table $dir")
    val gen = generation(dir)
    val base = reconciled(spark, dir)
    val parts = baseParts(dir)
    writeView(viewRows(base, column, parts.map(_._1)), viewDir,
      base.schema("value").dataType.simpleString, parts, files,
      overwrite = true)
    // an EMPTY base writes zero view rows, so the writer may never
    // create the directory — the metadata must still land (Cassandra
    // allows creating an MV on an empty table; writes then maintain
    // it through the registry)
    Files.createDirectories(Paths.get(CellPlanning.normalize(viewDir)))
    writeMeta(viewDir, column, dir, gen)
  }

  def isStale(viewDir: String): Boolean =
    readMeta(viewDir).exists(m => generation(m.baseDir) != m.gen)

  // ---- write-through maintenance (round 9, the C18f pattern) ----
  // Registered views are refreshed from the DSv2 batch commit with
  // the same delta protocol the read-side heal uses — Cassandra
  // maintains MVs at write time. A separate registry file from the
  // 2i one: a view's refresh machinery is NOT an index refresh.

  private val RegistryFile = "_views"

  /** Register `viewDir` for write-through maintenance. Idempotent. */
  def register(baseDir: String, viewDir: String): Unit = {
    val f = Paths.get(CellPlanning.normalize(baseDir))
      .resolve(RegistryFile)
    val norm = CellPlanning.normalize(viewDir)
    val existing =
      if (Files.exists(f))
        Files.readAllLines(f, StandardCharsets.UTF_8).asScala.toList
          .map(_.trim).filter(_.nonEmpty)
      else Nil
    if (!existing.contains(norm))
      Files.writeString(f, (existing :+ norm).mkString("", "\n", "\n"))
  }

  /** Remove `viewDir` from the base's write-through registry. */
  def unregister(baseDir: String, viewDir: String): Unit = {
    val f = Paths.get(CellPlanning.normalize(baseDir))
      .resolve(RegistryFile)
    if (!Files.exists(f)) return
    val norm = CellPlanning.normalize(viewDir)
    val kept = Files.readAllLines(f, StandardCharsets.UTF_8).asScala
      .toList.map(_.trim).filter(l => l.nonEmpty && l != norm)
    if (kept.isEmpty) Files.deleteIfExists(f)
    else Files.writeString(f, kept.mkString("", "\n", "\n"))
  }

  /** The base's registered (still-valid) write-through views. */
  def registered(baseDir: String): Seq[String] = {
    val norm = CellPlanning.normalize(baseDir)
    val f = Paths.get(norm).resolve(RegistryFile)
    if (!Files.exists(f)) return Seq.empty
    Files.readAllLines(f, StandardCharsets.UTF_8).asScala.toSeq
      .map(_.trim).filter(_.nonEmpty)
      .filter(v => readMeta(v).exists(_.baseDir == norm))
  }

  /** The view's recorded base table dir (None = not a view). */
  def baseOf(viewDir: String): Option[String] =
    readMeta(viewDir).map(_.baseDir)

  /** The view's recorded re-key column (None = not a view). */
  def columnOf(viewDir: String): Option[String] =
    readMeta(viewDir).map(_.column)

  /** True iff `viewDir` IS a materialized view of exactly (base,
    * column) — the CREATE MV IF NOT EXISTS identity test.
    */
  def isViewOf(viewDir: String, baseDir: String,
      column: String): Boolean =
    baseOf(viewDir).contains(CellPlanning.normalize(baseDir)) &&
      columnOf(viewDir).contains(column)

  /** Drop a view: unregister from its base, delete its dir. */
  def drop(viewDir: String): Unit = {
    readMeta(viewDir).foreach(m => unregister(m.baseDir, viewDir))
    val root = Paths.get(CellPlanning.normalize(viewDir))
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

  /** Write-path MV maintenance (called by the DSv2 batch commit after
    * the new generation is published). Best-effort by design — the
    * data commit is already durable; a skipped refresh leaves the
    * view detectably stale and the next read heals it (the lazy path
    * unregistered views always take).
    */
  def maintainAfterWrite(baseDir: String): Unit = {
    val vs = registered(baseDir)
    if (vs.isEmpty) return
    SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
      .foreach { spark =>
        vs.foreach { v =>
          try refresh(spark, v)
          catch {
            case scala.util.control.NonFatal(e) =>
              // best-effort, but logged — a silently failing refresh
              // would push every read onto the heal path untraceably.
              org.slf4j.LoggerFactory.getLogger(getClass).warn(
                s"write-through view refresh failed for $v " +
                  s"(base $baseDir); reads will heal lazily", e)
          }
        }
      }
  }

  /** Same-filesystem scratch view over a file subset (hard links). */
  private def withScratch[A](baseDir: String, files: Seq[String])(
      f: String => A): A = {
    val dir = Paths.get(CellPlanning.normalize(baseDir))
    val scratch = Files.createTempDirectory(dir, ".view-delta-")
    try {
      files.foreach { fl =>
        val p = Paths.get(fl)
        Files.createLink(scratch.resolve(p.getFileName), p)
      }
      f(scratch.toString)
    } finally {
      Using.resource(Files.list(scratch)) { st =>
        st.iterator().asScala.toList.foreach(Files.deleteIfExists(_))
      }
      Files.deleteIfExists(scratch)
    }
  }

  /** Delta-sized heal of a stale view — see the object doc for the
    * tombstone protocol. Falls back to [[build]] when the recorded
    * generation was replaced or the delta carries a clustering-range
    * tombstone.
    */
  def refresh(spark: SparkSession, viewDir: String,
      files: Int = 8): Unit = {
    val m = readMeta(viewDir).getOrElse(throw new IllegalStateException(
      s"$viewDir carries no _base metadata; use CellView.build"))
    val liveFiles = CellPlanning.listFiles(m.baseDir)
    val liveNames = liveFiles.map(f => Paths.get(f).getFileName.toString)
    val oldNames = m.gen.split(',').filter(_.nonEmpty).toSet
    if (liveNames.toSet == oldNames) return // not stale
    if (!oldNames.subsetOf(liveNames.toSet)) {
      build(spark, m.baseDir, viewDir, m.column, files)
      return
    }
    val gen = liveNames.mkString(",")
    val deltaFiles = liveFiles.filter(f =>
      !oldNames.contains(Paths.get(f).getFileName.toString))
    val oldFiles = liveFiles.filter(f =>
      oldNames.contains(Paths.get(f).getFileName.toString))
    withScratch(m.baseDir, deltaFiles) { deltaDir =>
      // the delta's raw face: marker rows included (a reconciled read
      // folds them away, but view maintenance must SEE deletions)
      val rawDelta = spark.read.format(Fmt).load(deltaDir)
      if (!rawDelta.filter(col("col")
          .startsWith(CellSource.RangeTombstonePrefix)).isEmpty) {
        // range-tombstone translation needs the old rows' ck spans —
        // rebuild is the coarse-but-correct path
        build(spark, m.baseDir, viewDir, m.column, files)
        return
      }
      // the base's named key parts: nm = (pk, ck) on the default
      // layout, the typed part names on a CEL6 base; pkNames are the
      // partition parts (one or several — a partition tombstone
      // names its whole partition key)
      val parts = baseParts(m.baseDir)
      val nm = parts.map(_._1)
      val pkNames = CellSource
        .keySpec(CellPlanning.normalize(m.baseDir))
        .pkParts.map(_.name)
      def asB(df: DataFrame) = nm.foldLeft(df)((d, n) =>
        d.withColumnRenamed(n, "b" + n))
      def fromB(df: DataFrame) = nm.foldLeft(df)((d, n) =>
        d.withColumnRenamed("b" + n, n))
      // touched base rows: data rows name their full key — as does a
      // CELL tombstone (deleting just `column` moves the row OUT of
      // the view); a row tombstone its full key; a partition
      // tombstone every old row of its partition (resolved against
      // the old generation below)
      val dataKeys = rawDelta
        .filter(!col("col").startsWith("!") ||
          col("col").startsWith(CellSource.CellTombstonePrefix))
        .select(nm.map(col).toIndexedSeq: _*).distinct()
      val rowDels = rawDelta
        .filter(col("col") === CellSource.RowTombstone)
        .groupBy(nm.map(col).toIndexedSeq: _*)
        .agg(max(col("wt")).as("dts"))
      val partDels = rawDelta
        .filter(col("col") === CellSource.PartitionTombstone)
        .groupBy(pkNames.map(col).toIndexedSeq: _*)
        .agg(max(col("wt")).as("pdts"))
      withScratch(m.baseDir, oldFiles) { oldDir =>
        val old = reconciled(spark, oldDir)
        // the rows' OLD placement: old vk + max old wt per key
        val oldState = fromB(viewRows(old, m.column, nm))
          .groupBy((nm.map(col) :+ col("vk")).toIndexedSeq: _*)
          .agg(max(col("wt")).as("maxOldWt"))
        val cur = reconciled(spark, m.baseDir)
        val touched = dataKeys
          .unionByName(rowDels.select(nm.map(col).toIndexedSeq: _*))
          .unionByName(partDels.join(
            oldState.select(nm.map(col).toIndexedSeq: _*).distinct(),
            pkNames).select(nm.map(col).toIndexedSeq: _*))
          .distinct()
        // CURRENT cells of touched rows, under their current vk
        val fresh = viewRows(cur.join(touched, nm), m.column, nm)
        // MOVEMENT tombstones: the row had vk=old but now has a
        // DIFFERENT vk (or none) — shadow every stale copy
        val curKeys = fromB(fresh.withColumnRenamed("vk", "newVk"))
          .select((nm.map(col) :+ col("newVk")).toIndexedSeq: _*)
          .distinct()
        val marker = lit(CellSource.RowTombstone).as("col")
        val moved = asB(oldState.join(touched, nm)
          .join(curKeys, nm, "left_outer")
          .filter(col("newVk").isNull || col("newVk") =!= col("vk")))
          .select((Seq(col("vk")) ++ nm.map(n => col("b" + n)) ++
            Seq(marker,
              // the view's value type is the base's; a marker's
              // payload is meaningless but must type-check
              (col("maxOldWt") * lit(0)).cast(
                fresh.schema("value").dataType).as("value"),
              col("maxOldWt").as("wt"))).toIndexedSeq: _*)
        // DELETION tombstones: base partition/row deletes, at the
        // marker's own ts (the base's exact shadowing window)
        val delTombs = asB(oldState
          .join(rowDels, nm)
          .select((Seq(col("vk")) ++ nm.map(col) ++
            Seq(col("dts"))).toIndexedSeq: _*)
          .unionByName(oldState.join(partDels, pkNames)
            .select((Seq(col("vk")) ++ nm.map(col) ++
              Seq(col("pdts").as("dts"))).toIndexedSeq: _*))
          .groupBy((Seq(col("vk")) ++ nm.map(col)).toIndexedSeq: _*)
          .agg(max(col("dts")).as("dts")))
          .select((Seq(col("vk")) ++ nm.map(n => col("b" + n)) ++
            Seq(marker,
              (col("dts") * lit(0)).cast(
                fresh.schema("value").dataType).as("value"),
              col("dts").as("wt"))).toIndexedSeq: _*)
        // A-B-A guard (Cassandra's shadowable-tombstone corner): a
        // row RETURNING to a view partition it once left can arrive
        // with cell writetimes at-or-before the movement tombstone
        // written at departure (maxOldWt is synthesized — it exists
        // nowhere in the base), and LWW would over-shadow the
        // returned row forever. Exact detection: any existing view
        // row tombstone at-or-after a fresh cell of the same
        // (vk, base key) — then the append path cannot converge, so
        // rebuild. Deletion tombstones can't trigger this (their ts
        // is the base marker's own, and the base reconcile already
        // hides cells at-or-before it), so a triggered rebuild is
        // always a genuine A-B-A.
        val vkeyNames = "vk" +: nm.map("b" + _)
        val priorTombs = spark.read.format(Fmt).load(viewDir)
          .filter(col("col") === CellSource.RowTombstone)
          .groupBy(vkeyNames.map(col).toIndexedSeq: _*)
          .agg(max(col("wt")).as("tombWt"))
        val shadowed = fresh
          .groupBy(vkeyNames.map(col).toIndexedSeq: _*)
          .agg(min(col("wt")).as("minFreshWt"))
          .join(priorTombs, vkeyNames)
          .filter(col("tombWt") >= col("minFreshWt"))
        if (!shadowed.isEmpty) {
          build(spark, m.baseDir, viewDir, m.column, files)
          return
        }
        writeView(fresh.unionByName(moved).unionByName(delTombs),
          viewDir, cur.schema("value").dataType.simpleString, parts,
          files, overwrite = false)
      }
    }
    writeMeta(viewDir, m.column, m.baseDir, gen)
  }

  /** The full view relation (reconciled): `(vk, bpk, bck, col,
    * value, wt)` — tombstoned movements and deletions folded away.
    */
  def read(spark: SparkSession, viewDir: String,
      onStale: String = "refresh"): DataFrame = {
    readMeta(viewDir).foreach { m =>
      if (generation(m.baseDir) != m.gen) onStale match {
        case "refresh" => refresh(spark, viewDir)
        case "rebuild" => build(spark, m.baseDir, viewDir, m.column)
        case "fail" => throw new IllegalStateException(
          s"materialized view at $viewDir is STALE: base table " +
            s"${m.baseDir} has flushed since the build (pass " +
            s"onStale=refresh/rebuild/ignore)")
        case _ => // "ignore": serve the recorded generation
      }
    }
    reconciled(spark, viewDir)
  }

  /** Point lookup: the base rows whose `column` = `v`, served
    * ENTIRELY from the view's typed point read (token bloom + zone
    * maps) — no base-table I/O, Cassandra's MV promise.
    */
  def lookup(spark: SparkSession, viewDir: String, v: Any,
      onStale: String = "refresh"): DataFrame =
    read(spark, viewDir, onStale).filter(col("vk") === lit(v))
}
