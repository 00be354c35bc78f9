package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Structured Streaming twins of SURVEY §2 table S. The declared
  * oracle queries in [[graft.queries.Streaming]] are the
  * batch-equivalents; these operators run the same semantics over an
  * unbounded stream and are exercised with MemoryStream in
  * StreamingSpec (sketch/stateful internals can't hash-match a batch
  * oracle — SURVEY table S policy).
  *
  * Scale notes: all operators key their state by (window, type) or
  * user_id, so state is hash-distributed across executors; watermarks
  * bound state size (no unbounded accumulation) — the only viable
  * shape for an always-on 100 TB/day ingest.
  */
object StreamingOps {

  /** S_WIN1 twin — tumbling 1 h counts per event type. */
  def tumbling(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))

  /** S_WIN2 twin — sliding 1 h window hopping every 15 min. */
  def sliding(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"))

  /** S_WIN3 twin — session windows with a 30 min inactivity gap. */
  def sessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))

  /** S_STATE1 twin — streaming dedup by key within the watermark. */
  def dedup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** S_JOIN1 twin — stream-stream interval join: each click pairs with
    * the same user's purchases within the following hour. Both sides
    * carry watermarks and the join condition bounds event time, so
    * Spark evicts join state once the slower watermark passes
    * `c_ts + 1 hour` — bounded state, the only viable shape for two
    * unbounded 100 TB/day streams.
    */
  def intervalJoin(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.withWatermark("ts", "10 minutes")
      .select(col("user_id"), col("ts").as("c_ts"), col("event_id").as("c_id"))
    val p = purchases.withWatermark("ts", "2 hours")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("p_id"))
    c.join(p, expr("user_id = p_user AND " +
      "p_ts >= c_ts AND p_ts <= c_ts + interval 1 hour"))
  }

  /** S_JOIN3 — stream-stream LEFT OUTER interval join: every click is
    * emitted — paired while purchases match, and with a NULL purchase
    * side once the watermark proves no match can still arrive. The
    * null emission is exactly the state-eviction contract of
    * watermark-bounded outer joins: a click is held in state until
    * the purchase watermark passes `c_ts + 1h`, then released
    * unmatched — so state stays bounded at any stream volume and no
    * click is ever silently dropped (the difference from S_JOIN1's
    * inner form).
    */
  def intervalJoinOuter(clicks: DataFrame,
      purchases: DataFrame): DataFrame = {
    val c = clicks.withWatermark("ts", "10 minutes")
      .select(col("user_id"), col("ts").as("c_ts"),
        col("event_id").as("c_id"))
    val p = purchases.withWatermark("ts", "2 hours")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("p_id"))
    c.join(p, expr("user_id = p_user AND " +
      "p_ts >= c_ts AND p_ts <= c_ts + interval 1 hour"), "left_outer")
  }

  /** S_JOIN2 twin — stream-STATIC enrichment join: every micro-batch
    * joins against the static dimension, broadcast per batch. No
    * watermark and no join state — the static side is re-resolvable
    * at each batch, which is why enrichment dims cost nothing however
    * large the stream gets (and why this is the right shape for a
    * dim that fits in memory; a huge dim would bucket-join instead).
    */
  def enrich(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dim),
      col("user_id") === col("c_custkey"))

  /** S_SINK1 — idempotent foreachBatch upsert into a partitioned
    * parquet store. Each micro-batch's updated (event_type, totals)
    * rows overwrite ONLY the key partitions they touch
    * (`partitionOverwriteMode=dynamic`), so a replayed micro-batch
    * (post-failure re-trigger — Spark's at-least-once sink contract)
    * deterministically rewrites the same partitions instead of
    * double-counting: the standard exactly-once recipe for
    * non-transactional stores, with no side registry of batch ids.
    */
  def upsertBatch(batch: DataFrame, dir: String): Unit =
    batch.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("event_type")
      .parquet(dir)

  /** The per-type running aggregate whose update-mode stream feeds
    * [[upsertBatch]] through foreachBatch.
    */
  def typeTotals(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))

  /** Incremental LWW view maintenance over the connector's CDC stream
    * (compose with `readStream.format("graft.sources.CellSource")` +
    * `foreachBatch`): merge a micro-batch of newly-flushed cells into
    * a pk-bucketed parquet store, keeping per-(pk, ck, col) LWW
    * winners across ALL batches seen so far. Read-modify-write is
    * limited to the buckets the batch touches; dynamic partition
    * overwrite makes a replayed batch rewrite the same buckets to the
    * same bytes (idempotent — the at-least-once sink contract). At
    * scale the bucket count is the rewrite-granularity knob, exactly
    * like compaction granularity on the source side.
    */
  def lwwUpsertBatch(spark: SparkSession, batch: DataFrame,
      dir: String, buckets: Int = 16): Unit = {
    if (batch.isEmpty) return
    val incoming = batch.withColumn("bucket", pmod(col("pk"), lit(buckets)))
    val touched = incoming.select(col("bucket")).distinct()
      .collect().map(_.getLong(0)) // ≤ `buckets` values — driver-safe
    val existing =
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(dir)))
        Some(spark.read.parquet(dir)
          .filter(col("bucket").isInCollection(touched.toSeq)))
      else None
    val unioned = existing.fold(incoming)(_.unionByName(incoming))
    graft.cassandra.CellModel.lwwMerge(unioned)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket")
      .parquet(dir)
  }

  /** S_SINK2 — streaming writes INTO a cell table: the C19 CDC
    * source's inverse (stream → Cassandra-model writes). Each
    * micro-batch of (pk, ck, col, value, wt) cells appends through
    * the ordinary DSv2 batch writer — flush-file publish protocol and
    * write-through 2i/MV maintenance included — guarded by a
    * per-query BATCH REGISTRY under the table
    * (`_stream_commits/<queryId>/<batchId>`, written AFTER the
    * append): a replayed micro-batch (foreachBatch's at-least-once
    * contract) is detected and skipped. The registry is the fast
    * path; correctness never depends on it — cells carry their
    * writetimes, so a crash BETWEEN append and marker replays to
    * byte-identical cells that LWW folds to the same winners
    * (the same idempotence Cassandra's commit-log replay leans on).
    * At scale each micro-batch is one flush generation; compaction
    * (C17/C51/C54) owns the long-term file count, exactly as on the
    * write-heavy native path.
    */
  def cellSinkBatch(batch: DataFrame, dir: String, queryId: String,
      batchId: Long): Unit = {
    import java.nio.file.{Files => JF, Paths => JP}
    val reg = JP.get(dir, "_stream_commits",
      java.util.UUID.nameUUIDFromBytes(
        queryId.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .toString)
    val marker = reg.resolve(batchId.toString)
    if (JF.exists(marker)) return // replayed batch: already applied
    if (!batch.isEmpty)
      batch.write.format("graft.sources.CellSource")
        .mode("append").save(dir)
    JF.createDirectories(reg)
    try JF.createFile(marker)
    catch { case _: java.nio.file.FileAlreadyExistsException => }
  }

  case class UserTotals(user_id: Long, n: Long, total: Double)

  /** S_STATE3 twin, modern API — the same per-user running totals as a
    * Spark 4 `transformWithState` StatefulProcessor over the new
    * state-v2 store: named ValueState, explicit init/handleInputRows
    * lifecycle. This is the API new state machines should target;
    * [[runningTotals]] keeps the flatMapGroupsWithState form for the
    * legacy surface.
    */
  class TotalsProcessor
      extends StatefulProcessor[Long, (Long, Double), UserTotals] {
    @transient private var state: ValueState[UserTotals] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[UserTotals]("totals",
        Encoders.product[UserTotals], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
        timers: TimerValues): Iterator[UserTotals] = {
      val prev = if (state.exists()) state.get()
        else UserTotals(key, 0L, 0.0)
      var n = prev.n
      var total = prev.total
      rows.foreach { case (_, v) => n += 1; total += v }
      val next = UserTotals(key, n, total)
      state.update(next)
      Iterator(next)
    }
  }

  def runningTotalsTws(spark: SparkSession, events: DataFrame)
      : Dataset[UserTotals] = {
    import spark.implicits._
    events.selectExpr("user_id", "value").as[(Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new TotalsProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  case class SessionOut(user_id: Long, n: Long, first_ms: Long,
      last_ms: Long)

  /** S_STATE4 — EVENT-TIME TIMERS on the state-v2 store: a custom
    * session machine that accumulates per-user (n, first, last) and
    * registers a timer at `last + gap`; when the WATERMARK passes the
    * timer, `handleExpiredTimer` emits the closed session and clears
    * state. This is the canonical timer pattern (session emission in
    * Append mode without session_window), impossible with plain
    * windowed aggregation when the close condition is stateful.
    * State and timers are keyed by user → hash-distributed; the
    * watermark bounds both (every timer fires at most `gap` after the
    * key's last event reaches the watermark).
    */
  class SessionTimerProcessor(gapMs: Long)
      extends StatefulProcessor[Long, (Long, Long), SessionOut] {
    @transient private var sess: ValueState[SessionOut] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sess = getHandle.getValueState[SessionOut]("sess",
        Encoders.product[SessionOut], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
        timers: TimerValues): Iterator[SessionOut] = {
      val prev = if (sess.exists()) Some(sess.get()) else None
      prev.foreach(p => getHandle.deleteTimer(p.last_ms + gapMs))
      var n = prev.map(_.n).getOrElse(0L)
      var first = prev.map(_.first_ms).getOrElse(Long.MaxValue)
      var last = prev.map(_.last_ms).getOrElse(Long.MinValue)
      rows.foreach { case (_, ts) =>
        n += 1
        if (ts < first) first = ts
        if (ts > last) last = ts
      }
      sess.update(SessionOut(key, n, first, last))
      getHandle.registerTimer(last + gapMs)
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
        info: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[SessionOut] = {
      val out = if (sess.exists()) Iterator.single(sess.get())
        else Iterator.empty
      sess.clear()
      out
    }
  }

  /** S_STATE4 — timer-closed sessions over the state-v2 store (30 min
    * gap); requires an event-time watermark on `ts`.
    */
  def timerSessions(spark: SparkSession, events: DataFrame)
      : Dataset[SessionOut] = {
    import spark.implicits._
    events.withWatermark("ts", "10 minutes")
      .selectExpr("user_id", "cast(ts as long) * 1000 as ts_ms")
      .as[(Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new SessionTimerProcessor(30L * 60 * 1000),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** S_STATE3 twin — arbitrary per-user running state via
    * flatMapGroupsWithState (the transformWithState-style custom
    * state machine): emits updated totals on every batch.
    */
  def runningTotals(spark: SparkSession, events: DataFrame)
      : Dataset[UserTotals] = {
    import spark.implicits._
    events.selectExpr("user_id", "value").as[(Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[UserTotals, UserTotals](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Double)],
         state: GroupState[UserTotals]) =>
          val prev = state.getOption.getOrElse(UserTotals(user, 0L, 0.0))
          var n = prev.n
          var total = prev.total
          rows.foreach { case (_, v) => n += 1; total += v }
          val next = UserTotals(user, n, total)
          state.update(next)
          Iterator(next)
      }
  }
}
