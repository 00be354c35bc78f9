package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
  * Long-valued columns only (the indexed value must BE a cell-table
  * partition key); non-long base tables are rejected by the write
  * path's type check.
  */
object CellIndex {
  private val Fmt = "graft.sources.CellSource"

  /** Build (or rebuild) the inverted index of `column` over the table
    * at `dir` into the cell table at `idxDir`. Overwrites: a rebuild
    * replaces the index generation wholesale (truncate write), and
    * the commit publishes its `_manifest` like any other cell table.
    */
  def build(spark: SparkSession, dir: String, idxDir: String,
      column: String, files: Int = 8): Unit = {
    val merged = spark.read.format(Fmt)
      .option("reconcile", "true").load(dir)
      .filter(col("col") === column)
    merged.select(
        col("value").as("pk"),
        row_number().over(
          Window.partitionBy(col("value"))
            .orderBy(col("pk"), col("ck"))).as("ck"),
        lit("ref").as("col"),
        col("pk").as("value"),
        col("wt"))
      .repartitionByRange(files, col("pk"), col("ck"))
      .write.format(Fmt).mode("overwrite").save(idxDir)
  }

  /** Distinct primary pks whose `column` equals `v` — served by the
    * index table's PRUNED point scan (pk pushdown on the index = the
    * value lookup).
    */
  def lookupPks(spark: SparkSession, idxDir: String, v: Long): DataFrame =
    spark.read.format(Fmt).load(idxDir)
      .filter(col("pk") === v)
      .select(col("value").as("pk")).distinct()
}
