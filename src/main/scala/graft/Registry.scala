package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared operator/query from SURVEY.md §2.
  *
  * @param name   stable inventory id (e.g. "Q_AGG1_groupby"); becomes the
  *               key in `SparkEntry.queries`.
  * @param fn     the Spark-native implementation. MUST follow SURVEY §7.4
  *               determinism rules (total ORDER BY + tie-break, rounded
  *               floats, casts aligned with the oracle).
  * @param oracle equivalent DuckDB-1.0 SQL over the same parquet tables
  *               (bare table names). None for ops whose output is not
  *               SQL-expressible / not deterministic cross-engine.
  */
final case class GQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Central inventory. Every module contributes a Seq[GQuery]; SparkEntry
  * derives both `queries` and `oracleSql` from here so the two maps can
  * never drift apart.
  */
object Registry {
  def all: Seq[GQuery] =
    graft.queries.Flagship.all ++
      graft.queries.Relational.all ++
      graft.queries.Aggregates.all ++
      graft.queries.Windows.all ++
      graft.queries.Functions.all ++
      graft.queries.Cells.all ++
      graft.queries.NorthStar.all ++
      graft.queries.Streaming.all ++
      graft.queries.Subqueries.all ++
      graft.queries.Tpch.all ++
      graft.queries.Sketches.all ++
      graft.queries.Mixing.all ++
      graft.queries.ScriptTransform.all ++
      graft.queries.Bpe.all ++
      graft.queries.HiveEtl.all ++
      graft.queries.Extras.all ++
      graft.queries.Quality.all ++
      graft.queries.Misc.all

  lazy val byName: Map[String, GQuery] = all.map(q => q.name -> q).toMap
}
