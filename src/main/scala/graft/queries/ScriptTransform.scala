package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{GQuery, Tables}

/** Q_XFORM — Hive's `SELECT TRANSFORM ... USING 'script'` (script
  * transform / streaming), the era's escape hatch for custom per-row
  * logic: rows are piped tab-separated through an external process
  * per partition. Shark inherited it from Hive verbatim; Spark SQL
  * still supports it natively (no-serde mode, no Hive dependency).
  *
  * Scale notes: the script runs PER PARTITION (one subprocess per
  * task, rows streamed through stdin/stdout — no driver involvement,
  * no collect), so it scales exactly like mapPartitions. The
  * downstream aggregation is an ordinary hash agg with map-side
  * combine. Scripts here are deterministic coreutils (awk/grep), so
  * the DuckDB oracle reproduces the arithmetic relationally.
  */
object ScriptTransform {

  private def withLineitem(s: SparkSession, d: String): Unit =
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem_v")

  // Q_XFORM1 — arithmetic through an awk pipe, re-aggregated in SQL.
  private def awkTransform(s: SparkSession, d: String): DataFrame = {
    withLineitem(s, d)
    s.sql(
      """SELECT CAST(x AS BIGINT) AS x_mod,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM (
        |  SELECT TRANSFORM(l_orderkey, l_linenumber)
        |  ROW FORMAT DELIMITED FIELDS TERMINATED BY '\t'
        |  USING 'awk ''{print ($1 + $2) % 7}'''
        |  AS (x)
        |  ROW FORMAT DELIMITED FIELDS TERMINATED BY '\t'
        |  FROM lineitem_v)
        |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  private val awkTransformSql =
    """SELECT (l_orderkey + l_linenumber) % 7 AS x_mod,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  // Q_XFORM2 — a FILTERING script: grep drops non-matching rows (the
  // script controls cardinality, not just values). `|| true` keeps
  // grep's no-match exit status from failing empty partitions.
  private def grepTransform(s: SparkSession, d: String): DataFrame = {
    withLineitem(s, d)
    s.sql(
      """SELECT CAST(k AS BIGINT) AS k, CAST(count(*) AS BIGINT) AS n
        |FROM (
        |  SELECT TRANSFORM(l_orderkey)
        |  USING 'grep 7$ || true' AS (k)
        |  FROM lineitem_v)
        |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  private val grepTransformSql =
    """SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS n
      |FROM lineitem
      |WHERE CAST(l_orderkey AS VARCHAR) LIKE '%7'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  def all: Seq[GQuery] = Seq(
    GQuery("Q_XFORM1_script_transform", awkTransform, Some(awkTransformSql)),
    GQuery("Q_XFORM2_script_filter", grepTransform, Some(grepTransformSql)))
}
