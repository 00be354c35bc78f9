package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{GQuery, Tables}

/** SURVEY §2 table S — streaming surface, declared in batch-equivalent
  * form over `events` (oracle-checkable); the Structured Streaming
  * twins live in [[graft.streaming.StreamingOps]] and are exercised in
  * StreamingSpec with MemoryStream.
  *
  * Determinism: window ORDER BYs tie-break on event_id (µs-truncated
  * ns timestamps collide — FIXTURES.md trap 1); session gaps compare
  * second-floored epochs identically in both engines.
  */
object Streaming {

  // S_WIN1 — tumbling 1 h windows per event type.
  private def tumbling(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("win_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .orderBy(col("win_start"), col("event_type"))

  private val tumblingSql =
    """SELECT date_trunc('hour', ts) AS win_start, event_type,
      |  CAST(COUNT(*) AS BIGINT) AS n, ROUND(SUM(value), 2) AS total
      |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin

  // S_WIN2 — sliding 1 h / 15 min windows via hop-grid expansion:
  // each event contributes to the 4 hops covering it (the batch twin
  // of `window(ts, "1 hour", "15 minutes")`).
  private def sliding(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("floor15",
        expr("timestamp_seconds((unix_timestamp(ts) div 900) * 900)"))
      .select(col("floor15"), explode(sequence(lit(0), lit(3))).as("k"))
      .select((col("floor15") - expr("make_interval(0,0,0,0,0,0,k*900)"))
        .as("win_start"))
      .groupBy(col("win_start")).agg(count(lit(1)).as("n"))
      .orderBy(col("win_start"))

  private val slidingSql =
    """SELECT win_start, CAST(COUNT(*) AS BIGINT) AS n FROM (
      |  SELECT make_timestamp(((CAST(floor(epoch(ts)) AS BIGINT) // 900)
      |           - k) * 900 * 1000000) AS win_start
      |  FROM events, (SELECT unnest(range(0, 4)) AS k))
      |GROUP BY win_start ORDER BY win_start""".stripMargin

  // S_WIN3 — session windows (30 min gap) via gaps-and-islands.
  private def sessions(s: SparkSession, d: String): DataFrame = {
    val wOrd = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .withColumn("prev", lag(col("ts"), 1).over(wOrd))
      .withColumn("new_session",
        when(col("prev").isNull ||
          col("ts").cast("long") - col("prev").cast("long") > 1800, 1)
          .otherwise(0))
      .withColumn("sid", sum(col("new_session")).over(wRun))
      .groupBy(col("user_id"), col("sid"))
      .agg(count(lit(1)).as("n"),
        date_trunc("second", min(col("ts"))).as("start_ts"),
        date_trunc("second", max(col("ts"))).as("end_ts"))
      .orderBy(col("user_id"), col("sid"))
  }

  private val sessionsSql =
    """WITH l AS (
      |  SELECT user_id, ts, event_id,
      |    LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM events),
      |s AS (
      |  SELECT user_id, ts,
      |    SUM(CASE WHEN prev IS NULL OR
      |      CAST(floor(epoch(ts)) AS BIGINT) -
      |        CAST(floor(epoch(prev)) AS BIGINT) > 1800
      |      THEN 1 ELSE 0 END) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM l)
      |SELECT user_id, CAST(sid AS BIGINT) AS sid,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  date_trunc('second', MIN(ts)) AS start_ts,
      |  date_trunc('second', MAX(ts)) AS end_ts
      |FROM s GROUP BY user_id, sid ORDER BY user_id, sid""".stripMargin

  // S_STATE1 — streaming dedup by key: first event per
  // (user_id, event_type).
  private def dedupFirst(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"),
        col("event_id").as("first_event"))
      .orderBy(col("user_id"), col("event_type"))
  }

  private val dedupFirstSql =
    """SELECT user_id, event_type, event_id AS first_event FROM (
      |  SELECT user_id, event_type, event_id,
      |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type
      |      ORDER BY ts, event_id) AS rn
      |  FROM events) WHERE rn = 1
      |ORDER BY user_id, event_type""".stripMargin

  // S_STATE2 — watermark semantics, two-pass batch form: drop events
  // older than (max ts − 7 days), count survivors per day.
  private def watermark(s: SparkSession, d: String): DataFrame = {
    val wm = Tables.events(s, d).agg(max(col("ts")).as("mx"))
    Tables.events(s, d).crossJoin(broadcast(wm))
      .filter(col("ts") >= col("mx") - expr("INTERVAL 7 DAYS"))
      .groupBy(col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("day"))
  }

  private val watermarkSql =
    """WITH m AS (SELECT MAX(ts) AS mx FROM events)
      |SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
      |FROM events, m WHERE ts >= mx - INTERVAL 7 DAY
      |GROUP BY day ORDER BY day""".stripMargin

  // S_STATE3 — arbitrary stateful aggregation, batch twin: final
  // per-user state (count, total, last activity).
  private def statefulTotals(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"),
        date_trunc("second", max(col("ts"))).as("last_seen"))
      .orderBy(col("user_id"))

  private val statefulTotalsSql =
    """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
      |  ROUND(SUM(value), 2) AS total_value,
      |  date_trunc('second', MAX(ts)) AS last_seen
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  // S_JOIN1 — stream-stream interval join, batch twin: each click
  // pairs with the same user's purchases within the following hour
  // (streaming twin: StreamingOps.intervalJoin, watermark-bounded
  // state, exercised in StreamingSpec).
  private def intervalJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"),
        col("event_id").as("c_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("p_id"))
    clicks.join(purchases, col("user_id") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("interval 1 hour"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"), min(col("c_id")).as("first_click"),
        max(col("p_id")).as("last_purchase"))
      .orderBy(col("user_id"))
  }

  private val intervalJoinSql =
    """WITH c AS (SELECT user_id, ts AS c_ts, event_id AS c_id
      |  FROM events WHERE event_type = 'click'),
      |p AS (SELECT user_id AS p_user, ts AS p_ts, event_id AS p_id
      |  FROM events WHERE event_type = 'purchase')
      |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |  MIN(c_id) AS first_click, MAX(p_id) AS last_purchase
      |FROM c JOIN p ON user_id = p_user
      |  AND p_ts >= c_ts AND p_ts <= c_ts + INTERVAL 1 HOUR
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  // S_JOIN3 — stream-stream LEFT OUTER interval join, batch twin:
  // S_JOIN1's pairing, but clicks with no purchase in the following
  // hour are KEPT (the watermark-evicted null emission of the
  // streaming form — StreamingOps.intervalJoinOuter, exercised in
  // StreamingSpec). Per user: matched pair count, unmatched click
  // count, total clicks — the outer join's conservation law
  // (every click lands in exactly one bucket) visible in the output.
  private def intervalJoinOuterBatch(s: SparkSession,
      d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"),
        col("event_id").as("c_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("p_id"))
    clicks.join(purchases, col("user_id") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("interval 1 hour"), "left")
      .groupBy(col("user_id"))
      .agg(count(col("p_id")).as("n_pairs"),
        countDistinct(when(col("p_id").isNull, col("c_id")))
          .as("n_unmatched_clicks"),
        countDistinct(col("c_id")).as("n_clicks"))
      .orderBy(col("user_id"))
  }

  private val intervalJoinOuterBatchSql =
    """WITH c AS (SELECT user_id, ts AS c_ts, event_id AS c_id
      |  FROM events WHERE event_type = 'click'),
      |p AS (SELECT user_id AS p_user, ts AS p_ts, event_id AS p_id
      |  FROM events WHERE event_type = 'purchase')
      |SELECT user_id, CAST(COUNT(p_id) AS BIGINT) AS n_pairs,
      |  CAST(COUNT(DISTINCT CASE WHEN p_id IS NULL THEN c_id END)
      |    AS BIGINT) AS n_unmatched_clicks,
      |  CAST(COUNT(DISTINCT c_id) AS BIGINT) AS n_clicks
      |FROM c LEFT JOIN p ON user_id = p_user
      |  AND p_ts >= c_ts AND p_ts <= c_ts + INTERVAL 1 HOUR
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  // S_JOIN2 — stream-STATIC enrichment join, batch twin: the event
  // stream joined to the static customer dimension (broadcast — the
  // canonical per-micro-batch enrichment; no join state at all, which
  // is why dims stay cheap at any stream volume). Rollup per market
  // segment; sums in DECIMAL so the cross-engine compare is exact.
  // Streaming twin: StreamingOps.enrich (StreamingSpec).
  private def streamStatic(s: SparkSession, d: String): DataFrame = {
    val dim = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_mktsegment"))
    Tables.events(s, d)
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(12,2)")).as("total_value"))
      .orderBy(col("c_mktsegment"))
  }

  private val streamStaticSql =
    """SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_events,
      |  SUM(CAST(value AS DECIMAL(12,2))) AS total_value
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // S_WIN4 — NATIVE session_window in batch, cross-checked against an
  // INDEPENDENT formulation: the oracle is gaps-and-islands with the
  // native merge rule (new session when the gap is ≥ 30 min — native
  // windows extend only while the next event is strictly inside
  // last + gap). Two different algorithms agreeing is a much stronger
  // check than mirroring one shape.
  private def sessionNative(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"),
        date_trunc("second", col("session_window.start")).as("start_ts"),
        col("n"))
      .orderBy(col("user_id"), col("start_ts"))

  private val sessionNativeSql =
    """WITH o AS (
      |  SELECT user_id, ts,
      |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM events),
      |t AS (SELECT user_id, ts,
      |  CASE WHEN prev IS NULL OR epoch(ts) - epoch(prev) >= 1800
      |    THEN 1 ELSE 0 END AS new_s FROM o),
      |sess AS (SELECT user_id, ts, SUM(new_s) OVER (
      |    PARTITION BY user_id ORDER BY ts
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM t)
      |SELECT user_id, date_trunc('second', MIN(ts)) AS start_ts,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM sess GROUP BY user_id, sid
      |ORDER BY user_id, start_ts""".stripMargin

  // S_STATE4 — batch twin of the event-time-timer sessions
  // (StreamingOps.timerSessions): the same 30-min-gap session close
  // the SessionTimerProcessor implements, declared as gaps-and-
  // islands so the session-close OUTPUT SHAPE (user_id, n, first_ms,
  // last_ms — second-floored epoch ms, exactly the processor's
  // `cast(ts as long) * 1000`) is hash-checked against the oracle.
  // StreamingSpec drives the real timer machinery over an ordered
  // multi-batch feed and asserts it converges to this twin.
  private def timerSessionsTwin(s: SparkSession, d: String): DataFrame = {
    val wOrd = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .withColumn("tsec", col("ts").cast("long"))
      .withColumn("prev", lag(col("tsec"), 1).over(wOrd))
      .withColumn("new_session",
        when(col("prev").isNull || col("tsec") - col("prev") > 1800, 1)
          .otherwise(0))
      .withColumn("sid", sum(col("new_session")).over(wRun))
      .groupBy(col("user_id"), col("sid"))
      .agg(count(lit(1)).as("n"),
        (min(col("tsec")) * 1000).as("first_ms"),
        (max(col("tsec")) * 1000).as("last_ms"))
      .select(col("user_id"), col("n"), col("first_ms"), col("last_ms"))
      .orderBy(col("user_id"), col("first_ms"))
  }

  private val timerSessionsTwinSql =
    """WITH l AS (
      |  SELECT user_id, event_id,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS tsec
      |  FROM events),
      |o AS (
      |  SELECT user_id, event_id, tsec, LAG(tsec) OVER (
      |    PARTITION BY user_id ORDER BY tsec, event_id) AS prev
      |  FROM l),
      |s AS (
      |  SELECT user_id, tsec,
      |    SUM(CASE WHEN prev IS NULL OR tsec - prev > 1800
      |      THEN 1 ELSE 0 END) OVER (PARTITION BY user_id
      |      ORDER BY tsec, event_id ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM o)
      |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(MIN(tsec) * 1000 AS BIGINT) AS first_ms,
      |  CAST(MAX(tsec) * 1000 AS BIGINT) AS last_ms
      |FROM s GROUP BY user_id, sid
      |ORDER BY user_id, first_ms""".stripMargin

  def all: Seq[GQuery] = Seq(
    GQuery("S_STATE4_timer_sessions", timerSessionsTwin,
      Some(timerSessionsTwinSql)),
    GQuery("S_WIN4_session_native", sessionNative, Some(sessionNativeSql)),
    GQuery("S_JOIN1_interval_join", intervalJoin, Some(intervalJoinSql)),
    GQuery("S_JOIN2_stream_static", streamStatic, Some(streamStaticSql)),
    GQuery("S_JOIN3_interval_outer", intervalJoinOuterBatch,
      Some(intervalJoinOuterBatchSql)),
    GQuery("S_WIN1_tumbling", tumbling, Some(tumblingSql)),
    GQuery("S_WIN2_sliding", sliding, Some(slidingSql)),
    GQuery("S_WIN3_session", sessions, Some(sessionsSql)),
    GQuery("S_STATE1_stream_dedup", dedupFirst, Some(dedupFirstSql)),
    GQuery("S_STATE2_watermark", watermark, Some(watermarkSql)),
    GQuery("S_STATE3_stateful_totals", statefulTotals,
      Some(statefulTotalsSql)))
}
