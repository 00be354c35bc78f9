package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{GQuery, Tables}

/** Subquery surface (SURVEY §4 "free capability upgrade": era-Hive had
  * almost no WHERE-clause subqueries; Catalyst decorrelates them into
  * joins). Exercised through the `spark.sql` entry point — the
  * secondary API surface of SURVEY §3 — over temp views.
  *
  * Scale notes: Q_SUB1's scalar subquery becomes a broadcast of one
  * row; Q_SUB3's correlated aggregate is decorrelated into a
  * groupBy + join on the correlation key (o_custkey) — one shuffle,
  * no per-row re-execution (RewriteCorrelatedScalarSubquery).
  */
object Subqueries {

  private def withOrders(s: SparkSession, d: String): Unit =
    Tables.orders(s, d).createOrReplaceTempView("orders_v")

  // Q_SUB1 — uncorrelated scalar subquery.
  private def scalar(s: SparkSession, d: String): DataFrame = {
    withOrders(s, d)
    s.sql(
      """SELECT o_orderkey, o_totalprice
        |FROM orders_v
        |WHERE o_totalprice > 1.9 * (SELECT AVG(o_totalprice) FROM orders_v)
        |ORDER BY o_orderkey""".stripMargin)
  }

  private val scalarSql =
    """SELECT o_orderkey, o_totalprice
      |FROM orders
      |WHERE o_totalprice > 1.9 * (SELECT AVG(o_totalprice) FROM orders)
      |ORDER BY o_orderkey""".stripMargin

  // Q_SUB2 — IN subquery (plans as left-semi join).
  private def inSub(s: SparkSession, d: String): DataFrame = {
    withOrders(s, d)
    Tables.customer(s, d).createOrReplaceTempView("customer_v")
    s.sql(
      """SELECT c_custkey, c_name
        |FROM customer_v
        |WHERE c_custkey IN (SELECT o_custkey FROM orders_v
        |                    WHERE o_totalprice > 300000.0)
        |ORDER BY c_custkey""".stripMargin)
  }

  private val inSubSql =
    """SELECT c_custkey, c_name
      |FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders
      |                    WHERE o_totalprice > 300000.0)
      |ORDER BY c_custkey""".stripMargin

  // Q_SUB3 — correlated scalar subquery (decorrelated by Catalyst).
  private def correlated(s: SparkSession, d: String): DataFrame = {
    withOrders(s, d)
    s.sql(
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders_v o
        |WHERE o_totalprice > 1.8 * (SELECT AVG(i.o_totalprice)
        |                            FROM orders_v i
        |                            WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin)
  }

  private val correlatedSql =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders o
      |WHERE o_totalprice > 1.8 * (SELECT AVG(i.o_totalprice)
      |                            FROM orders i
      |                            WHERE i.o_custkey = o.o_custkey)
      |ORDER BY o_orderkey""".stripMargin

  // Q_SUB4 — NOT IN with guaranteed-non-null subquery (null-aware
  // anti join).
  private def notIn(s: SparkSession, d: String): DataFrame = {
    withOrders(s, d)
    Tables.customer(s, d).createOrReplaceTempView("customer_v")
    s.sql(
      """SELECT c_custkey, c_name
        |FROM customer_v
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders_v
        |                        WHERE o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin)
  }

  private val notInSql =
    """SELECT c_custkey, c_name
      |FROM customer
      |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
      |                        WHERE o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin

  // Q_SUB5 — LATERAL correlated subquery in FROM: per-nation top-2
  // suppliers by balance. Catalyst plans the correlation as a
  // ranked-window equivalent — no per-row re-execution.
  private def lateral(s: SparkSession, d: String): DataFrame = {
    Tables.nation(s, d).createOrReplaceTempView("nation_v")
    Tables.supplier(s, d).createOrReplaceTempView("supplier_v")
    s.sql(
      """SELECT n_name, s_name, s_acctbal
        |FROM nation_v,
        |LATERAL (SELECT s_name, s_acctbal FROM supplier_v
        |         WHERE s_nationkey = n_nationkey
        |         ORDER BY s_acctbal DESC, s_name LIMIT 2)
        |ORDER BY n_name, s_acctbal DESC, s_name""".stripMargin)
  }

  private val lateralSql =
    """SELECT n_name, s_name, s_acctbal
      |FROM nation,
      |LATERAL (SELECT s_name, s_acctbal FROM supplier
      |         WHERE s_nationkey = n_nationkey
      |         ORDER BY s_acctbal DESC, s_name LIMIT 2) t
      |ORDER BY n_name, s_acctbal DESC, s_name""".stripMargin

  def all: Seq[GQuery] = Seq(
    GQuery("Q_SUB5_lateral", lateral, Some(lateralSql)),
    GQuery("Q_SUB1_scalar", scalar, Some(scalarSql)),
    GQuery("Q_SUB2_in", inSub, Some(inSubSql)),
    GQuery("Q_SUB3_correlated", correlated, Some(correlatedSql)),
    GQuery("Q_SUB4_not_in", notIn, Some(notInSql)))
}
