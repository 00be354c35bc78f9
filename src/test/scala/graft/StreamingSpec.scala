package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamingOps

/** Structured Streaming twins of table S, driven by MemoryStream
  * (SURVEY table S policy: streaming internals are test-covered, the
  * oracle checks the batch equivalents).
  */
class StreamingSpec extends GraftSpec {
  import spark.implicits._

  private def ts(minute: Int) = new Timestamp(
    1704067200000L + minute * 60000L) // 2024-01-01 00:00 UTC + minutes

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  private def runQuery(name: String, df: org.apache.spark.sql.DataFrame,
      mode: OutputMode = OutputMode.Append()) = {
    val q = df.writeStream.outputMode(mode)
      .format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  test("cell-table streaming sink: batch registry + LWW replay safety (S_SINK2)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_cellsink").toString
    val in = MemoryStream[(Long, Int, String, Long, Long)](spark)
    in.addData((1L, 1, "qty", 10L, 100L), (2L, 1, "qty", 20L, 100L))
    val q = in.toDF().toDF("pk", "ck", "col", "value", "wt")
      .writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          StreamingOps.cellSinkBatch(batch, dir, "q-test", id)
      }
      .start()
    q.processAllAvailable()
    // a second micro-batch REWRITES pk 1 at a later writetime
    in.addData((1L, 1, "qty", 77L, 200L))
    q.processAllAvailable()
    q.stop()
    import scala.jdk.CollectionConverters._
    def live(): Set[(Long, Long)] = spark.read
      .format("graft.sources.CellSource").option("reconcile", "true")
      .load(dir).select(col("pk"), col("value"))
      .as[(Long, Long)].collect().toSet
    assert(live() === Set((1L, 77L), (2L, 20L)))
    // the registry skips a REPLAYED batch id outright
    val files = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .iterator().asScala.count(_.toString.endsWith(".cells"))
    StreamingOps.cellSinkBatch(
      Seq((9L, 9, "qty", 9L, 9L)).toDF("pk", "ck", "col", "value", "wt"),
      dir, "q-test", 0L)
    assert(java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .iterator().asScala.count(_.toString.endsWith(".cells")) === files)
    assert(live() === Set((1L, 77L), (2L, 20L)))
    // crash BETWEEN append and marker: the replay re-appends
    // byte-identical cells — LWW folds them to the same winners
    val crashBatch = Seq((3L, 1, "qty", 30L, 300L))
      .toDF("pk", "ck", "col", "value", "wt")
    crashBatch.write.format("graft.sources.CellSource")
      .mode("append").save(dir) // the pre-crash append, marker lost
    StreamingOps.cellSinkBatch(crashBatch, dir, "q-test", 99L)
    assert(live() === Set((1L, 77L), (2L, 20L), (3L, 30L)))
    // a different query id keeps its own registry
    StreamingOps.cellSinkBatch(
      Seq((4L, 1, "qty", 40L, 400L))
        .toDF("pk", "ck", "col", "value", "wt"),
      dir, "q-other", 0L)
    assert(live() ===
      Set((1L, 77L), (2L, 20L), (3L, 30L), (4L, 40L)))
  }

  test("table-to-table streaming replication: CDC source into cell sink") {
    // the C19 CDC stream composed with the S_SINK2 cell sink IS
    // cross-table replication: raw cells (tombstone markers included)
    // flow verbatim, so the replica converges to the same winners
    val src = java.nio.file.Files
      .createTempDirectory("graft_repl_src").toString
    val dst = java.nio.file.Files
      .createTempDirectory("graft_repl_dst").toString
    def put(rows: Seq[(Long, Int, String, Long, Long)]): Unit =
      rows.toDF("pk", "ck", "col", "value", "wt")
        .coalesce(1).write.format("graft.sources.CellSource")
        .mode("append").save(src)
    put(Seq((1L, 1, "qty", 10L, 100L), (2L, 1, "qty", 20L, 100L)))
    put(Seq((1L, 1, "qty", 11L, 200L))) // rewrite
    val q = spark.readStream.format("graft.sources.CellSource")
      .load(src)
      .writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          StreamingOps.cellSinkBatch(batch, dst, "repl", id)
      }
      .start()
    def reconciled(d: String): Set[(Long, Int, String, Long, Long)] =
      spark.read.format("graft.sources.CellSource")
        .option("reconcile", "true").load(d)
        .as[(Long, Int, String, Long, Long)].collect().toSet
    try {
      q.processAllAvailable()
      assert(reconciled(dst) === reconciled(src))
      // live convergence: a DELETE on the source replicates as its
      // marker cell and shadows on the replica too
      graft.cql.Cql.execute(spark,
        s"DELETE FROM $src WHERE pk = 2 AND ck = 1")
      put(Seq((3L, 1, "qty", 30L, 900L)))
      q.processAllAvailable()
      assert(reconciled(dst) === reconciled(src))
      assert(reconciled(dst).map(_._1) === Set(1L, 3L)) // pk 2 gone
    } finally q.stop()
  }

  test("replication survives a SOURCE compaction mid-stream (C19 offset contract composed)") {
    // the C19 offset contract: compaction replaces the source's file
    // generation at HIGHER indices (never reused), so a live stream's
    // offsets stay valid — new flushes after the compaction deliver,
    // nothing is lost, and any re-delivered compacted output is
    // idempotent under the replica's LWW merge
    val src = java.nio.file.Files
      .createTempDirectory("graft_repl_cmp_src").toString
    val dst = java.nio.file.Files
      .createTempDirectory("graft_repl_cmp_dst").toString
    def put(rows: Seq[(Long, Int, String, Long, Long)]): Unit =
      rows.toDF("pk", "ck", "col", "value", "wt")
        .coalesce(1).write.format("graft.sources.CellSource")
        .mode("append").save(src)
    put(Seq((1L, 1, "qty", 10L, 100L), (2L, 1, "qty", 20L, 100L)))
    put(Seq((1L, 1, "qty", 11L, 200L)))
    put(Seq((2L, 1, "!del:qty", 0L, 300L))) // tombstone to fold
    val q = spark.readStream.format("graft.sources.CellSource")
      .load(src)
      .writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          StreamingOps.cellSinkBatch(batch, dst, "replcmp", id)
      }
      .start()
    def reconciled(d: String): Set[(Long, Int, String, Long, Long)] =
      spark.read.format("graft.sources.CellSource")
        .option("reconcile", "true").load(d)
        .as[(Long, Int, String, Long, Long)].collect().toSet
    try {
      q.processAllAvailable()
      assert(reconciled(dst) === reconciled(src))
      // compact the SOURCE while the stream is live: 4 flushes fold
      // into one file at the next generation index
      val (before, after) =
        graft.sources.CellMaintenance.compact(spark, src)
      assert(before > after)
      // post-compaction flushes keep delivering on the same offsets
      put(Seq((3L, 1, "qty", 30L, 900L)))
      graft.cql.Cql.execute(spark,
        s"DELETE FROM $src WHERE pk = 1 AND ck = 1")
      q.processAllAvailable()
      assert(reconciled(dst) === reconciled(src))
      assert(reconciled(dst).collect {
        case (pk, _, c, _, _) if !c.startsWith("!") => pk } === Set(3L))
    } finally q.stop()
  }

  test("replicated batches keep the SINK's write-through 2i and MV fresh") {
    // cellSinkBatch appends through the ordinary DSv2 commit, so the
    // sink's registered write-through index/view maintenance fires on
    // every replicated micro-batch — the replica serves index-routed
    // and view reads WITHOUT lazy healing
    val src = java.nio.file.Files
      .createTempDirectory("graft_repl_wt_src").toString
    val dst = java.nio.file.Files
      .createTempDirectory("graft_repl_wt_dst").toString
    val idx = java.nio.file.Files
      .createTempDirectory("graft_repl_wt_idx").toString + "/i"
    val view = java.nio.file.Files
      .createTempDirectory("graft_repl_wt_view").toString + "/v"
    def put(rows: Seq[(Long, Int, String, Long, Long)]): Unit =
      rows.toDF("pk", "ck", "col", "value", "wt")
        .coalesce(1).write.format("graft.sources.CellSource")
        .mode("append").save(src)
    // seed the sink so index/view builds have a table to read
    Seq((1L, 1, "qty", 10L, 100L))
      .toDF("pk", "ck", "col", "value", "wt")
      .coalesce(1).write.format("graft.sources.CellSource")
      .mode("append").save(dst)
    graft.sources.CellIndex.build(spark, dst, idx, "qty",
      writeThrough = true)
    graft.sources.CellView.build(spark, dst, view, "qty")
    graft.sources.CellView.register(dst, view)
    put(Seq((2L, 1, "qty", 10L, 200L), (3L, 1, "qty", 30L, 200L)))
    val q = spark.readStream.format("graft.sources.CellSource")
      .load(src)
      .writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          StreamingOps.cellSinkBatch(batch, dst, "replwt", id)
      }
      .start()
    try {
      q.processAllAvailable()
      // fresh WITHOUT healing: the commit hook refreshed both
      assert(!graft.sources.CellIndex.isStale(idx))
      assert(!graft.sources.CellView.isStale(view))
      // and they serve the replicated rows
      val hits = graft.sources.CellIndex
        .lookupBase(spark, dst, idx, 10L, onStale = "fail")
        .filter(col("col") === "qty" && col("value") === 10L)
        .select("pk").as[Long].collect().toSet
      assert(hits === Set(1L, 2L))
      // a second replicated batch stays fresh too
      put(Seq((4L, 1, "qty", 10L, 300L)))
      q.processAllAvailable()
      assert(!graft.sources.CellIndex.isStale(idx))
      assert(!graft.sources.CellView.isStale(view))
      assert(graft.sources.CellIndex
        .lookupBase(spark, dst, idx, 10L, onStale = "fail")
        .filter(col("col") === "qty" && col("value") === 10L)
        .select("pk").as[Long].collect().toSet === Set(1L, 2L, 4L))
    } finally q.stop()
  }

  test("foreachBatch upsert sink is idempotent under batch replay (S_SINK1)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sink").toString
    val in = MemoryStream[Ev](spark)
    in.addData(
      Ev(1, ts(0), 1, "click", 1.0), Ev(2, ts(1), 1, "click", 2.0),
      Ev(3, ts(2), 2, "view", 3.0))
    val q = StreamingOps.typeTotals(in.toDF())
      .writeStream.outputMode(OutputMode.Update())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        StreamingOps.upsertBatch(batch, dir)
      }
      .start()
    q.processAllAvailable()
    // second micro-batch updates one key; its partition is rewritten
    in.addData(Ev(4, ts(3), 2, "click", 4.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(dir)
      .select(col("event_type"), col("n"), col("total"))
      .as[(String, Long, Double)].collect().toSet
    assert(got == Set(("click", 3L, 7.0), ("view", 1L, 3.0)))
    // replaying the same upsert (the failure-retry path) is a no-op:
    // dynamic partition overwrite rewrites the same partitions
    StreamingOps.upsertBatch(
      spark.createDataFrame(Seq(("click", 3L, 7.0)))
        .toDF("event_type", "n", "total"), dir)
    val again = spark.read.parquet(dir)
      .select(col("event_type"), col("n"), col("total"))
      .as[(String, Long, Double)].collect().toSet
    assert(again == got)
  }

  test("Trigger.AvailableNow drains a file source then stops (backfill)") {
    val src = java.nio.file.Files
      .createTempDirectory("graft_an_src").toString
    spark.read.parquet(s"${sf()}/events.parquet")
      .limit(500).write.mode("overwrite").parquet(src)
    val sch = spark.read.parquet(src).schema
    // normalize ts (ns-as-long or TIMESTAMP_NTZ, fixture-dependent) to
    // a real timestamp exactly as Tables.events does
    val stream = Tables.normalizeTs(spark.readStream.schema(sch).parquet(src))
    val q = StreamingOps.tumbling(stream)
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("an_tumb")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    // AvailableNow: processes everything present, then terminates on
    // its own — the batch-backfill-through-the-streaming-path trigger.
    assert(q.awaitTermination(120000), "query did not self-terminate")
    val streamed = spark.table("an_tumb")
      .agg(sum(col("n"))).as[Long].collect().head
    assert(streamed == 500L)
  }

  test("tumbling window counts per type (streaming twin of S_WIN1)") {
    val in = MemoryStream[Ev](spark)
    in.addData(
      Ev(1, ts(5), 1, "click", 1.0), Ev(2, ts(20), 1, "click", 2.0),
      Ev(3, ts(65), 1, "view", 3.0), Ev(4, ts(70), 2, "click", 4.0))
    // Complete mode: no watermark advancement games needed for a test.
    val out = runQuery("tumb", StreamingOps.tumbling(in.toDF()),
      OutputMode.Complete())
    val rows = out.select(col("window.start").cast("long"),
      col("event_type"), col("n")).as[(Long, String, Long)].collect().toSet
    assert(rows == Set(
      (1704067200L, "click", 2L),
      (1704070800L, "view", 1L),
      (1704070800L, "click", 1L)))
  }

  test("session window groups by 30-min gaps (streaming twin of S_WIN3)") {
    val in = MemoryStream[Ev](spark)
    in.addData(
      Ev(1, ts(0), 1, "click", 1.0), Ev(2, ts(10), 1, "click", 1.0),
      Ev(3, ts(60), 1, "click", 1.0),   // 50-min gap → new session
      Ev(4, ts(0), 2, "view", 1.0))
    val out = runQuery("sess", StreamingOps.sessions(in.toDF()),
      OutputMode.Complete())
    val rows = out.select(col("user_id"), col("n"))
      .as[(Long, Long)].collect().toList.sorted
    assert(rows == List((1L, 1L), (1L, 2L), (2L, 1L)))
  }

  test("streaming dedup keeps one row per key (twin of S_STATE1)") {
    val in = MemoryStream[Ev](spark)
    in.addData(
      Ev(1, ts(0), 1, "click", 1.0), Ev(2, ts(1), 1, "click", 2.0),
      Ev(3, ts(2), 1, "view", 3.0))
    val out = runQuery("dedup", StreamingOps.dedup(in.toDF()))
    assert(out.count() == 2)
    assert(out.select("event_type").as[String].collect().toSet ==
      Set("click", "view"))
  }

  test("flatMapGroupsWithState accumulates per-user totals (S_STATE3)") {
    val in = MemoryStream[Ev](spark)
    in.addData(Ev(1, ts(0), 1, "click", 1.5), Ev(2, ts(1), 1, "click", 2.5))
    val q = StreamingOps.runningTotals(spark, in.toDF()).writeStream
      .outputMode(OutputMode.Append()).format("memory")
      .queryName("totals").start()
    q.processAllAvailable()
    in.addData(Ev(3, ts(2), 1, "click", 4.0))
    q.processAllAvailable()
    q.stop()
    val states = spark.table("totals")
      .select("user_id", "n", "total").as[(Long, Long, Double)]
      .collect().toList
    // Two emissions: after batch 1 (n=2, 4.0) and batch 2 (n=3, 8.0).
    assert(states.contains((1L, 2L, 4.0)) && states.contains((1L, 3L, 8.0)))
  }

  test("transformWithState accumulates per-user totals (S_STATE3, state v2)") {
    // transformWithState's multi-column-family state needs the RocksDB
    // provider (the production choice at scale anyway; HDFS-backed
    // store doesn't support state v2).
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[Ev](spark)
      in.addData(Ev(1, ts(0), 7, "click", 1.0), Ev(2, ts(1), 7, "click", 2.0))
      val q = StreamingOps.runningTotalsTws(spark, in.toDF()).writeStream
        .outputMode(OutputMode.Append()).format("memory")
        .queryName("tws_totals").start()
      q.processAllAvailable()
      in.addData(Ev(3, ts(2), 7, "click", 3.0))
      q.processAllAvailable()
      q.stop()
      val states = spark.table("tws_totals")
        .select("user_id", "n", "total").as[(Long, Long, Double)]
        .collect().toList
      assert(states.contains((7L, 2L, 3.0)) && states.contains((7L, 3L, 6.0)))
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("event-time timers close sessions on watermark (S_STATE4)") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[Ev](spark)
      // user 7: events at minutes 0, 1, 2 → session should close once
      // the watermark passes minute 2 + 30 min gap
      in.addData(Ev(1, ts(0), 7, "click", 1.0), Ev(2, ts(1), 7, "click", 1.0),
        Ev(3, ts(2), 7, "click", 1.0))
      val q = StreamingOps.timerSessions(spark, in.toDF()).writeStream
        .outputMode("append").format("memory")
        .queryName("timer_sessions").start()
      q.processAllAvailable()
      // nothing emitted yet: watermark is still behind last + gap
      assert(spark.table("timer_sessions").isEmpty)
      // a later event (minute 50) advances the watermark to minute 40
      // (10 min delay) > minute 32 → user 7's timer fires
      in.addData(Ev(4, ts(50), 8, "click", 1.0))
      q.processAllAvailable()
      // one more batch so the new watermark is applied to timers
      in.addData(Ev(5, ts(51), 8, "click", 1.0))
      q.processAllAvailable()
      q.stop()
      val out = spark.table("timer_sessions")
        .select("user_id", "n", "first_ms", "last_ms")
        .as[(Long, Long, Long, Long)].collect().toList
      assert(out.contains((7L, 3L, ts(0).getTime, ts(2).getTime)), out)
      // user 8's session is still open (watermark hasn't passed it)
      assert(!out.exists(_._1 == 8L), out)
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("timer sessions converge to the S_STATE4 batch twin's " +
      "gaps-and-islands output") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[Ev](spark)
      val q = StreamingOps.timerSessions(spark, in.toDF()).writeStream
        .outputMode("append").format("memory")
        .queryName("timer_sessions_twin").start()
      // ts-ordered feed; user 8 is the watermark ticker. Sessions:
      // user 7 = {0,1,2} and {120,125}; user 9 = {60}.
      in.addData(Ev(1, ts(0), 7, "c", 1.0), Ev(2, ts(1), 7, "c", 1.0),
        Ev(3, ts(2), 7, "c", 1.0))
      q.processAllAvailable()
      in.addData(Ev(4, ts(50), 8, "c", 1.0)) // wm -> 40 > 2+30
      q.processAllAvailable()
      in.addData(Ev(5, ts(60), 9, "c", 1.0)) // 7's first session closes
      q.processAllAvailable()
      in.addData(Ev(6, ts(120), 7, "c", 1.0), Ev(7, ts(125), 7, "c", 1.0))
      q.processAllAvailable()
      in.addData(Ev(8, ts(170), 8, "c", 1.0)) // wm -> 160 > 125+30, 60+30
      q.processAllAvailable()
      in.addData(Ev(9, ts(171), 8, "c", 1.0)) // timers fire on new wm
      q.processAllAvailable()
      q.stop()
      val got = spark.table("timer_sessions_twin")
        .filter(col("user_id").isin(7L, 9L))
        .select("user_id", "n", "first_ms", "last_ms")
        .as[(Long, Long, Long, Long)].collect().toSet
      // exactly the gaps-and-islands sessions the S_STATE4 batch twin
      // (S_STATE4_timer_sessions, queries/Streaming.scala) declares
      val want = Set(
        (7L, 3L, ts(0).getTime, ts(2).getTime),
        (7L, 2L, ts(120).getTime, ts(125).getTime),
        (9L, 1L, ts(60).getTime, ts(60).getTime))
      assert(got === want)
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("stream-stream interval join pairs clicks with purchases (S_JOIN1)") {
    val clicks = MemoryStream[Ev](spark)
    val purchases = MemoryStream[Ev](spark)
    clicks.addData(
      Ev(1, ts(0), 1, "click", 1.0),
      Ev(2, ts(30), 2, "click", 1.0))
    purchases.addData(
      Ev(10, ts(20), 1, "purchase", 9.0),  // within 1h of click 1 → pair
      Ev(11, ts(95), 2, "purchase", 9.0),  // 65 min after click 2 → no pair
      Ev(12, ts(40), 3, "purchase", 9.0))  // no click for user 3
    val out = runQuery("ivj",
      StreamingOps.intervalJoin(clicks.toDF(), purchases.toDF()))
    val pairs = out.select(col("c_id"), col("p_id"))
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 10L)))
  }

  test("outer interval join emits unmatched clicks after watermark (S_JOIN3)") {
    val clicks = MemoryStream[Ev](spark)
    val purchases = MemoryStream[Ev](spark)
    val q = StreamingOps.intervalJoinOuter(clicks.toDF(), purchases.toDF())
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ivjo").start()
    clicks.addData(
      Ev(1, ts(0), 1, "click", 1.0),   // will pair
      Ev(2, ts(30), 2, "click", 1.0))  // will never pair
    purchases.addData(
      Ev(10, ts(20), 1, "purchase", 9.0))
    q.processAllAvailable()
    // advance BOTH watermarks far past click 2's 1-hour window so its
    // state is provably unmatched and must be released with nulls
    clicks.addData(Ev(3, ts(600), 9, "click", 1.0))
    purchases.addData(Ev(11, ts(600), 9, "purchase", 9.0))
    q.processAllAvailable()
    // one more batch: null emission happens when a batch RUNS with
    // the advanced watermark
    purchases.addData(Ev(12, ts(601), 8, "purchase", 9.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ivjo")
      .select(col("c_id"), col("p_id"))
      .as[(Long, Option[Long])].collect().toSet
    assert(rows.contains((1L, Some(10L))), rows)  // matched pair intact
    assert(rows.contains((2L, None)), rows)       // unmatched click emitted
  }

  test("stream-static join enriches events per micro-batch (S_JOIN2)") {
    val in = MemoryStream[Ev](spark)
    in.addData(
      Ev(1, ts(0), 1, "click", 1.0),
      Ev(2, ts(1), 2, "view", 2.0),
      Ev(3, ts(2), 9, "click", 3.0)) // no dim row → dropped
    val dim = Seq((1L, "BUILDING"), (2L, "AUTOMOBILE"))
      .toDF("c_custkey", "c_mktsegment")
    val out = runQuery("enrich",
      StreamingOps.enrich(in.toDF(), dim))
    assert(out.select(col("event_id"), col("c_mktsegment"))
      .as[(Long, String)].collect().toSet ==
      Set((1L, "BUILDING"), (2L, "AUTOMOBILE")))
  }

  test("sliding window assigns each event to 4 hops (twin of S_WIN2)") {
    val in = MemoryStream[Ev](spark)
    in.addData(Ev(1, ts(16), 1, "click", 1.0))
    val out = runQuery("slide", StreamingOps.sliding(in.toDF()),
      OutputMode.Complete())
    assert(out.count() == 4) // one event → 4 overlapping 1h/15m windows
  }

  test("CDC stream + lwwUpsertBatch converges to the batch LWW view") {
    import graft.cassandra.CellModel
    import graft.sources.CellSource
    val snap = java.nio.file.Files.createTempDirectory("cdc-snap").toString
    val store = java.nio.file.Files.createTempDirectory("cdc-store")
      .resolve("view").toString
    val all = CellModel.cells(spark, sf())
      .as[(Long, Int, String, Long, Long)].collect().toSeq
    // Flush 1 = older writes, flush 2 = newer (the +1d rewrites land in
    // flush 2), so LWW winners must be found ACROSS micro-batches.
    val cut = all.map(_._5).sorted.apply(all.size / 2)
    CellSource.writeSnapshot(snap, all.filter(_._5 < cut), files = 1)
    val q = spark.readStream.format("graft.sources.CellSource").load(snap)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        StreamingOps.lwwUpsertBatch(spark, batch, store)
      }
      .start()
    try {
      q.processAllAvailable()
      CellSource.writeSnapshot(snap, all.filter(_._5 >= cut), files = 1,
        startIndex = 1)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(store)
      .select("pk", "ck", "col", "value", "wt")
    val want = CellModel.lwwMerge(CellModel.cells(spark, sf()))
    assert(got.count() === want.count())
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("typed-CDC stream (CEL6): flushes deliver incrementally and " +
      "the LWW view converges") {
    import graft.sources.CellSource
    val d = java.nio.file.Files
      .createTempDirectory("cdc-typed").toString
    val store = java.nio.file.Files
      .createTempDirectory("cdc-typed-store").resolve("acc").toString
    def flush(rows: Seq[(String, Int, String, Long, Long)]): Unit =
      rows.toDF("user", "ck", "col", "value", "wt")
        .coalesce(1).write.format("graft.sources.CellSource")
        .option("primaryKey", "((user),ck)")
        .option("keyType.user", "string").option("keyType.ck", "int")
        .mode("append").save(d)
    flush(Seq(("u-1", 1, "qty", 10L, 100L), ("u-2", 1, "qty", 20L, 100L)))
    var batches = 0
    val q = spark.readStream.format("graft.sources.CellSource").load(d)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) batches += 1
        batch.write.mode("append").parquet(store)
      }
      .start()
    try {
      q.processAllAvailable()
      // the LWW winner for (u-1, 1, qty) now lives in a LATER flush;
      // u-3 is new — both must arrive as their own micro-batch
      flush(Seq(("u-1", 1, "qty", 99L, 200L), ("u-3", 2, "price", 5L, 100L)))
      q.processAllAvailable()
    } finally q.stop()
    assert(batches >= 2, s"expected incremental delivery, got $batches")
    val streamed = spark.read.parquet(store)
    // raw delivery is complete: every cell version arrived exactly once
    val raw = spark.read.format("graft.sources.CellSource").load(d)
      .select("user", "ck", "col", "value", "wt")
      .as[(String, Int, String, Long, Long)].collect().toSeq.sorted
    assert(streamed.select("user", "ck", "col", "value", "wt")
      .as[(String, Int, String, Long, Long)]
      .collect().toSeq.sorted === raw)
    // LWW across micro-batches converges to the typed reconciled read
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user"), col("ck"), col("col"))
      .orderBy(col("wt").desc)
    val lww = streamed
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("user", "ck", "col", "value", "wt")
      .as[(String, Int, String, Long, Long)].collect().toSet
    val want = spark.read.format("graft.sources.CellSource")
      .option("reconcile", "true").load(d)
      .select("user", "ck", "col", "value", "wt")
      .as[(String, Int, String, Long, Long)].collect().toSet
    assert(lww === want)
    assert(want.contains(("u-1", 1, "qty", 99L, 200L)))
  }

  test("streaming sink epochs maintain a registered index (C18f)") {
    import graft.sources.{CellIndex, CellSource}
    val dir = java.nio.file.Files
      .createTempDirectory("cells-sink-idx").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("cells-sink-idx-ckpt").toString
    val idx = java.nio.file.Files
      .createTempDirectory("cells-sink-idx-i").toString
    CellSource.writeSnapshot(dir, Seq((1L, 1, "qty", 100L, 10L)),
      files = 1)
    CellIndex.build(spark, dir, idx, "qty", writeThrough = true)
    val in = MemoryStream[(Long, Int, String, Long, Long)](spark)
    val q = in.toDF().toDF("pk", "ck", "col", "value", "wt")
      .writeStream.format("graft.sources.CellSource")
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start(dir)
    try {
      // each streamed epoch is a flush; the shared batch commit runs
      // the delta-epoch refresh, so the index never goes stale
      in.addData((7L, 1, "qty", 555L, 20L))
      q.processAllAvailable()
      assert(!CellIndex.isStale(idx))
      assert(CellIndex.lookupPks(spark, idx, 555L, onStale = "fail")
        .as[Long].collect().toSet == Set(7L))
      in.addData((8L, 1, "qty", 556L, 20L))
      q.processAllAvailable()
      assert(!CellIndex.isStale(idx))
      assert(CellIndex.lookupPks(spark, idx, 556L, onStale = "fail")
        .as[Long].collect().toSet == Set(8L))
    } finally q.stop()
  }

  test("a write-through materialized view is a CDC SOURCE: base " +
      "writes stream out as view updates") {
    import graft.sources.{CellSource, CellView}
    val base = java.nio.file.Files
      .createTempDirectory("mv-cdc-base").toString
    val view = java.nio.file.Files
      .createTempDirectory("mv-cdc-view").toString
    val acc = java.nio.file.Files
      .createTempDirectory("mv-cdc-acc").resolve("rows").toString
    CellSource.writeSnapshot(base,
      Seq((1L, 1, "qty", 100L, 10L)), files = 1)
    CellView.build(spark, base, view, "qty")
    CellView.register(base, view)
    // the view is itself a cell table, so its refresh flushes are a
    // micro-batch stream — MV maintenance composes with CDC for free
    val q = spark.readStream.format("graft.sources.CellSource")
      .load(view)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.write.mode("append").parquet(acc)
      }.start()
    try {
      q.processAllAvailable()
      // a base write refreshes the view (write-through), and the view
      // delta arrives as the stream's next batch
      Seq((7L, 1, "qty", 300L, 20L))
        .toDF("pk", "ck", "col", "value", "wt")
        .coalesce(1).write.format("graft.sources.CellSource")
        .mode("append").save(base)
      assert(!CellView.isStale(view))
      q.processAllAvailable()
      val streamed = spark.read.parquet(acc)
        .select("vk", "bpk", "col", "value")
        .as[(Long, Long, String, Long)].collect().toSet
      assert(streamed.contains((100L, 1L, "qty", 100L)))
      assert(streamed.contains((300L, 7L, "qty", 300L)))
    } finally q.stop()
  }

  test("connector as streaming SINK: epochs publish as flushes") {
    val dir = java.nio.file.Files
      .createTempDirectory("cells-sink").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("cells-sink-ckpt").toString
    val in = MemoryStream[(Long, Int, String, Long, Long)](spark)
    val q = in.toDF().toDF("pk", "ck", "col", "value", "wt")
      .writeStream.format("graft.sources.CellSource")
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start(dir)
    try {
      in.addData((1L, 1, "qty", 10L, 100L), (2L, 1, "qty", 20L, 100L))
      q.processAllAvailable()
      in.addData((1L, 1, "qty", 99L, 200L))
      q.processAllAvailable()
      val back = spark.read.format("graft.sources.CellSource").load(dir)
      assert(back.count() === 3)
      // each epoch landed as its own flush generation
      val files = java.nio.file.Files.list(
        java.nio.file.Paths.get(dir)).iterator()
      val flushes = scala.jdk.CollectionConverters
        .IteratorHasAsScala(files).asScala
        .map(_.getFileName.toString).count(_.endsWith(".cells"))
      assert(flushes === 2)
      // reconciled view across the streamed flushes: LWW applies
      val merged = spark.read.format("graft.sources.CellSource")
        .option("reconcile", "true").load(dir)
        .as[(Long, Int, String, Long, Long)].collect().toSet
      assert(merged === Set((1L, 1, "qty", 99L, 200L),
        (2L, 1, "qty", 20L, 100L)))
    } finally q.stop()
  }
}
