package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GQuery, Tables}

/** Phase 0 (SURVEY §7.2): the flagship pricing-summary query — a TPC-H
  * Q1-shaped scan→filter→partial-agg→final-agg→sort pipeline over
  * `lineitem`. Exercises Q_SRC1 + Q_FILT1 + Q_AGG1 + Q_SORT1 in one
  * plan. At scale: the filter and the 7-column projection push into the
  * parquet scan; the groupBy has 6 distinct keys so the map-side partial
  * aggregate collapses virtually all rows before the shuffle.
  *
  * Determinism (SURVEY §7.4): double sums rounded to 2 (absorbs
  * float-add-order ε between engines), avgs to 4; counts cast to BIGINT
  * in the oracle (DuckDB sums/counts promote differently); total ORDER BY
  * on the unique (returnflag, linestatus) key.
  */
object Flagship {

  def q1Pricing(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax"))), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q1Oracle: String =
    """SELECT l_returnflag, l_linestatus,
      |  ROUND(SUM(l_quantity), 2) AS sum_qty,
      |  ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
      |  ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
      |  ROUND(SUM(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2) AS sum_charge,
      |  ROUND(AVG(l_quantity), 4) AS avg_qty,
      |  ROUND(AVG(l_extendedprice), 4) AS avg_price,
      |  ROUND(AVG(l_discount), 4) AS avg_disc,
      |  CAST(COUNT(*) AS BIGINT) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  def all: Seq[GQuery] = Seq(
    GQuery("q1_pricing_summary", q1Pricing, Some(q1Oracle)))
}
