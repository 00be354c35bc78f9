package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Planning metadata manifest (`_manifest`): one summary line per
  * committed `.cells` file — (name, minPk, maxPk, count, valueTag,
  * decPrec, decScale) — rewritten atomically at every batch/streaming
  * commit and compaction.
  *
  * Why: every scan previously opened EVERY flush file's header at
  * planning time. Headers are small and read once per plan, but at
  * 100 TB (~10⁵ files) that is O(files) driver file-OPENS per query.
  * With the manifest, planning does ONE metadata-file read plus a
  * directory listing (needed anyway, and far cheaper than 10⁵ opens):
  *
  *  - file-level pruning (Summary range check, emptiness, value-type
  *    uniformity) runs on manifest entries — full headers (bloom,
  *    sparse index, chunk table) are opened ONLY for files that
  *    survive the range check, so a point lookup opens O(1) files;
  *  - the header-only aggregate scan (C20) and schema inference are
  *    answered from the manifest with ZERO data-file opens.
  *
  * Staleness: the manifest is trusted only when its file-name list
  * EXACTLY matches the live listing (a commit that crashed before the
  * manifest rewrite, or files dropped by hand, make it stale) — every
  * consumer falls back to per-file header reads then, and the next
  * commit or [[refresh]] heals it. The format is line-oriented text
  * with a versioned magic line; a corrupt or unreadable manifest is
  * treated as absent, never an error.
  */
object CellManifest {
  val FileName = "_manifest"
  private val MagicLine = "CELLMANIFEST 1"

  /** One committed file's planning summary — the Summary.db slice of
    * its header.
    */
  case class Entry(name: String, minPk: Long, maxPk: Long, count: Int,
      valueTag: Int, decPrec: Int, decScale: Int,
      keySpec: KeySpec = KeySpec.Default)

  private def manifestPath(dir: String): Path =
    Paths.get(CellPlanning.normalize(dir)).resolve(FileName)

  private def entryFor(file: String): Entry = {
    val h = CellSource.readHeader(file)
    Entry(Paths.get(file).getFileName.toString, h.minPk, h.maxPk,
      h.count, h.valueTag, h.decPrec, h.decScale, h.keySpec)
  }

  /** Raw manifest contents; None when absent or unparseable. */
  def read(dir: String): Option[Seq[Entry]] = {
    val p = manifestPath(dir)
    if (!Files.exists(p)) return None
    try {
      val lines = Files.readAllLines(p, StandardCharsets.UTF_8).asScala
      if (lines.isEmpty || lines.head != MagicLine) return None
      Some(lines.tail.filter(_.nonEmpty).map { l =>
        val f = l.split('\t')
        // field 8 (CEL6): the typed key spec's serial form; absent in
        // manifests written before typed keys existed = default layout
        Entry(f(0), f(1).toLong, f(2).toLong, f(3).toInt, f(4).toInt,
          f(5).toInt, f(6).toInt,
          if (f.length > 7) KeySpec.parse(f(7)) else KeySpec.Default)
      }.toSeq)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Manifest entries IFF they exactly match the live listing (same
    * names, same flush order) — the planner-facing read. `files` is
    * the caller's already-computed [[CellPlanning.listFiles]] result,
    * so trusting the manifest costs one metadata-file read and zero
    * extra I/O.
    */
  def current(dir: String, files: Seq[String]): Option[Seq[Entry]] =
    read(dir).filter(_.map(_.name) ==
      files.map(f => Paths.get(f).getFileName.toString))

  /** Rewrite the manifest to match the live listing, reusing prior
    * entries and reading headers ONLY for files not yet covered — an
    * append commits O(new files) header reads, not O(all files).
    * Atomic (tmp + ATOMIC_MOVE): readers see the old or the new
    * manifest, never a torn one. Failures are swallowed — a missing
    * manifest only costs the fallback path.
    */
  def refresh(dir: String): Unit = try {
    val files = CellPlanning.listFiles(dir)
    if (files.isEmpty && !Files.exists(
        Paths.get(CellPlanning.normalize(dir)))) return
    val prior = read(dir).getOrElse(Nil).map(e => e.name -> e).toMap
    val entries = files.map { f =>
      val n = Paths.get(f).getFileName.toString
      prior.getOrElse(n, entryFor(f))
    }
    val body = (MagicLine +: entries.map(e =>
      s"${e.name}\t${e.minPk}\t${e.maxPk}\t${e.count}\t${e.valueTag}" +
        s"\t${e.decPrec}\t${e.decScale}\t${e.keySpec.serial}"))
      .mkString("", "\n", "\n")
    val p = manifestPath(dir)
    val tmp = p.resolveSibling(s"$FileName.tmp")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  } catch { case scala.util.control.NonFatal(_) => () }
}
