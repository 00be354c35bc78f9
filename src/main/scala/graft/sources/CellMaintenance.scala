package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Connector-level table maintenance — the compaction face of the
  * SSTable lifecycle, built from the connector's own two halves:
  * the RECONCILING scan (C24: k-way LWW merge across flush files in
  * the reader) feeding the TRUNCATE batch write (C21: executor-staged
  * rolled files, atomic driver-side publish).
  *
  * A long-lived table accumulates flush generations: every DSv2
  * append and every micro-batch lands more `data-NNNN.cells` files,
  * each point lookup pays the merge fan-in, and shadowed cell
  * versions hold disk forever. `compact` rewrites the table to one
  * fully-reconciled generation in ONE distributed pass:
  *
  *  - scan tasks k-way-merge each disjoint pk range across all files
  *    (never materializing more than O(open files) rows);
  *  - write tasks roll sorted staged `.cells` files (bounded heap);
  *  - the commit deletes the old generation and publishes the staged
  *    files as the new one, atomically from a reader's point of view
  *    (staged `.tmp` files are invisible to `listFiles`, and the scan
  *    finished reading before the commit runs).
  *
  * Safe in a single job because DSv2 write tasks PULL from the scan:
  * all reads complete before the driver-side commit truncates.
  * At 100 TB this is exactly a major compaction: shuffle-free (the
  * reconcile ranges ARE the write partitions), executor-parallel,
  * driver holding only file metadata.
  */
object CellMaintenance {
  /** Rewrite `dir` as one reconciled flush generation. Returns
    * (filesBefore, filesAfter).
    */
  def compact(spark: SparkSession, dir: String,
      rollRecords: Int = CellSource.DefaultRollRecords): (Int, Int) = {
    val before = CellPlanning.listFiles(dir).size
    spark.read.format("graft.sources.CellSource")
      .option("reconcile", "true").load(dir)
      .write.format("graft.sources.CellSource")
      .option("rollRecords", rollRecords.toString)
      .mode("overwrite").save(dir)
    (before, CellPlanning.listFiles(dir).size)
  }

  /** Split health of a table: flush-file count and per-file record
    * counts from headers only (no data bytes) — the "do I need a
    * compaction" probe.
    */
  def generations(dir: String): Seq[(String, Int)] =
    CellPlanning.listFiles(dir).map { f =>
      (java.nio.file.Paths.get(f).getFileName.toString,
        CellSource.readHeader(f).count)
    }

  /** The incremental-view variant: compact only when the table has
    * more than `maxFiles` flush files (minor-compaction trigger).
    */
  def compactIfNeeded(spark: SparkSession, dir: String,
      maxFiles: Int): Option[(Int, Int)] =
    if (CellPlanning.listFiles(dir).size > maxFiles)
      Some(compact(spark, dir))
    else None
}
