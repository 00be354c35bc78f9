package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{GQuery, Tables}

/** Round-1 tail additions: remaining window analytics (nth_value,
  * defaulted lag) and string formatting family.
  */
object Extras {

  // Q_WIN8 — nth_value over a full frame + lag with a default.
  private def winNth(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val full = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    Tables.events(s, d)
      .filter(col("user_id") % 11 === 0)
      .select(col("user_id"), col("event_id"),
        nth_value(col("event_id"), 2).over(full).as("second_event"),
        lag(col("event_id"), 1, -1L).over(w).as("prev_or_minus1"))
      .orderBy(col("user_id"), col("event_id"))
  }

  private val winNthSql =
    """SELECT user_id, event_id,
      |  nth_value(event_id, 2) OVER w2 AS second_event,
      |  lag(event_id, 1, -1) OVER w1 AS prev_or_minus1
      |FROM events WHERE user_id % 11 = 0
      |WINDOW w1 AS (PARTITION BY user_id ORDER BY ts, event_id),
      |  w2 AS (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY user_id, event_id""".stripMargin

  // F_STR3 — formatting family: printf-style, repeat, ascii/chr,
  // left/right slices.
  private def strFormat(s: SparkSession, d: String): DataFrame =
    Tables.nation(s, d)
      .select(col("n_nationkey"),
        format_string("%s-%04d", col("n_name"), col("n_nationkey"))
          .as("tagged"),
        expr("repeat('*', n_nationkey % 4 + 1)").as("stars"),
        ascii(col("n_name")).as("first_code"),
        expr("char(n_nationkey % 26 + 65)").as("letter"),
        expr("left(n_name, 3)").as("l3"),
        expr("right(n_name, 3)").as("r3"))
      .orderBy(col("n_nationkey"))

  private val strFormatSql =
    """SELECT n_nationkey,
      |  printf('%s-%04d', n_name, n_nationkey) AS tagged,
      |  repeat('*', n_nationkey % 4 + 1) AS stars,
      |  CAST(ascii(n_name) AS INTEGER) AS first_code,
      |  chr(n_nationkey % 26 + 65) AS letter,
      |  left(n_name, 3) AS l3,
      |  right(n_name, 3) AS r3
      |FROM nation ORDER BY n_nationkey""".stripMargin

  def all: Seq[GQuery] = Seq(
    GQuery("Q_WIN8_nth_value", winNth, Some(winNthSql)),
    GQuery("F_STR3_format", strFormat, Some(strFormatSql)))
}
