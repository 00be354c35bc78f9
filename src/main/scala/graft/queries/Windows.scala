package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{GQuery, Tables}

/** SURVEY §2 table Q — window functions (Q_WIN*).
  *
  * Scale notes: every window partitions by a real key (user_id,
  * c_mktsegment) so the WindowExec shuffle distributes across the
  * cluster; none uses an empty partitionBy (which would serialize the
  * whole dataset through one task — the classic window anti-pattern).
  *
  * Determinism: every window ORDER BY carries a unique tie-break column
  * (event_id / custkey) — µs-truncated event timestamps can collide
  * (FIXTURES.md trap 1) — and every query ends in a total ORDER BY.
  */
object Windows {

  private def wSeg = Window.partitionBy(col("c_mktsegment"))
    .orderBy(col("c_acctbal").desc, col("c_custkey"))

  // Q_WIN1 — row_number / rank / dense_rank.
  private def winRank(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .filter(col("c_custkey") % 5 === 0)
      .select(col("c_mktsegment"), col("c_custkey"),
        col("c_acctbal").as("acctbal"),
        row_number().over(wSeg).as("rn"),
        rank().over(wSeg).as("rk"),
        dense_rank().over(wSeg).as("drk"))
      .orderBy(col("c_mktsegment"), col("rn"))

  private val winRankSql =
    """SELECT c_mktsegment, c_custkey, c_acctbal AS acctbal,
      |  CAST(ROW_NUMBER() OVER w AS INTEGER) AS rn,
      |  CAST(RANK() OVER w AS INTEGER) AS rk,
      |  CAST(DENSE_RANK() OVER w AS INTEGER) AS drk
      |FROM customer WHERE c_custkey % 5 = 0
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
      |ORDER BY c_mktsegment, rn""".stripMargin

  // Q_WIN2 — ntile / percent_rank / cume_dist.
  private def winNtile(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .filter(col("c_custkey") % 5 === 0)
      .select(col("c_mktsegment"), col("c_custkey"),
        ntile(4).over(wSeg).as("quartile"),
        round(percent_rank().over(wSeg), 4).as("pct_rank"),
        round(cume_dist().over(wSeg), 4).as("cume"))
      .orderBy(col("c_mktsegment"), col("c_custkey"))

  private val winNtileSql =
    """SELECT c_mktsegment, c_custkey,
      |  CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
      |  ROUND(PERCENT_RANK() OVER w, 4) AS pct_rank,
      |  ROUND(CUME_DIST() OVER w, 4) AS cume
      |FROM customer WHERE c_custkey % 5 = 0
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
      |ORDER BY c_mktsegment, c_custkey""".stripMargin

  private def wUser = Window.partitionBy(col("user_id"))
    .orderBy(col("ts"), col("event_id"))

  // Q_WIN3 — lead / lag over each user's event timeline.
  private def winLeadLag(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("user_id") % 7 === 0)
      .select(col("user_id"), col("event_id"),
        lag(col("event_id"), 1).over(wUser).as("prev_event"),
        lead(col("event_id"), 1).over(wUser).as("next_event"),
        (col("value") - lag(col("value"), 1).over(wUser))
          .as("value_delta"))
      .orderBy(col("user_id"), col("event_id"))

  private val winLeadLagSql =
    """SELECT user_id, event_id,
      |  LAG(event_id, 1) OVER w AS prev_event,
      |  LEAD(event_id, 1) OVER w AS next_event,
      |  value - LAG(value, 1) OVER w AS value_delta
      |FROM events WHERE user_id % 7 = 0
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, event_id""".stripMargin

  // Q_WIN4 — first_value / last_value with an explicit full frame.
  private def winFirstLast(s: SparkSession, d: String): DataFrame = {
    val full = wUser.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    Tables.events(s, d)
      .filter(col("user_id") % 7 === 0)
      .select(col("user_id"), col("event_id"),
        first(col("event_id")).over(full).as("first_event"),
        last(col("event_id")).over(full).as("last_event"))
      .orderBy(col("user_id"), col("event_id"))
  }

  private val winFirstLastSql =
    """SELECT user_id, event_id,
      |  FIRST_VALUE(event_id) OVER w AS first_event,
      |  LAST_VALUE(event_id) OVER w AS last_event
      |FROM events WHERE user_id % 7 = 0
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY user_id, event_id""".stripMargin

  // Q_WIN5 — running aggregate (prefix sums are order-deterministic:
  // both engines add in the same ORDER BY sequence).
  private def winRunning(s: SparkSession, d: String): DataFrame = {
    val run = wUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .filter(col("user_id") % 7 === 0)
      .select(col("user_id"), col("event_id"),
        round(sum(col("value")).over(run), 2).as("running_value"),
        count(lit(1)).over(run).as("running_n"))
      .orderBy(col("user_id"), col("event_id"))
  }

  private val winRunningSql =
    """SELECT user_id, event_id,
      |  ROUND(SUM(value) OVER w, 2) AS running_value,
      |  CAST(COUNT(*) OVER w AS BIGINT) AS running_n
      |FROM events WHERE user_id % 7 = 0
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""".stripMargin

  // Q_WIN6 — sliding frame: trailing 4-row moving average.
  private def winSliding(s: SparkSession, d: String): DataFrame = {
    val slide = wUser.rowsBetween(-3, 0)
    Tables.events(s, d)
      .filter(col("user_id") % 7 === 0)
      .select(col("user_id"), col("event_id"),
        round(avg(col("value")).over(slide), 4).as("ma4"))
      .orderBy(col("user_id"), col("event_id"))
  }

  private val winSlidingSql =
    """SELECT user_id, event_id, ROUND(AVG(value) OVER w, 4) AS ma4
      |FROM events WHERE user_id % 7 = 0
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""".stripMargin

  // Q_WIN7 — RANGE (value-based) frame over a numeric ordering column.
  private def winRangeFrame(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice"))
      .rangeBetween(-10000L, 0L)
    Tables.orders(s, d)
      .filter(col("o_custkey") % 50 === 0)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_totalprice").as("total"),
        count(lit(1)).over(w).as("n_within_10k"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  private val winRangeFrameSql =
    """SELECT o_custkey, o_orderkey, o_totalprice AS total,
      |  CAST(COUNT(*) OVER w AS BIGINT) AS n_within_10k
      |FROM orders WHERE o_custkey % 50 = 0
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice
      |  RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // Q_WIN9 — cumulative distribution (cume_dist; percent_rank's twin
  // in Q_WIN2). Ordering on (o_totalprice, o_orderkey) is unique, so
  // the integer rank ratios are identical across engines.
  private def winCumeDist(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, d)
      .filter(col("o_custkey") % 50 === 0)
      .select(col("o_custkey"), col("o_orderkey"),
        round(cume_dist().over(w), 6).as("cd"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  private val winCumeDistSql =
    """SELECT o_custkey, o_orderkey,
      |  ROUND(CUME_DIST() OVER (PARTITION BY o_custkey
      |    ORDER BY o_totalprice, o_orderkey), 6) AS cd
      |FROM orders WHERE o_custkey % 50 = 0
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // Q_WIN10 — IGNORE NULLS navigation: last non-null preceding value
  // (lag) and last non-null in the running frame (last_value) — the
  // gap-filling / forward-fill idiom over sparse measurements.
  private def winIgnoreNulls(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .filter(col("o_custkey") % 50 === 0)
      .withColumn("urgent_price",
        when(col("o_orderpriority") === "1-URGENT", col("o_totalprice")))
      .select(col("o_custkey"), col("o_orderkey"),
        lag(col("urgent_price"), 1, null, ignoreNulls = true).over(w)
          .as("prev_urgent"),
        last(col("urgent_price"), ignoreNulls = true).over(wf)
          .as("fill_urgent"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  private val winIgnoreNullsSql =
    """SELECT o_custkey, o_orderkey,
      |  lag(urgent_price IGNORE NULLS) OVER w AS prev_urgent,
      |  last_value(urgent_price IGNORE NULLS) OVER
      |    (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS fill_urgent
      |FROM (SELECT *, CASE WHEN o_orderpriority = '1-URGENT'
      |        THEN o_totalprice END AS urgent_price
      |      FROM orders WHERE o_custkey % 50 = 0)
      |WINDOW w AS (PARTITION BY o_custkey
      |  ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  def all: Seq[GQuery] = Seq(
    GQuery("Q_WIN9_cume_dist", winCumeDist, Some(winCumeDistSql)),
    GQuery("Q_WIN10_ignore_nulls", winIgnoreNulls, Some(winIgnoreNullsSql)),
    GQuery("Q_WIN1_ranks", winRank, Some(winRankSql)),
    GQuery("Q_WIN2_ntile_pctrank", winNtile, Some(winNtileSql)),
    GQuery("Q_WIN3_lead_lag", winLeadLag, Some(winLeadLagSql)),
    GQuery("Q_WIN4_first_last", winFirstLast, Some(winFirstLastSql)),
    GQuery("Q_WIN5_running_sum", winRunning, Some(winRunningSql)),
    GQuery("Q_WIN6_sliding_avg", winSliding, Some(winSlidingSql)),
    GQuery("Q_WIN7_range_frame", winRangeFrame, Some(winRangeFrameSql)))
}
