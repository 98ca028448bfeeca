package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

class EventStreamsSpec extends SparkSpec {
  import EventStreams._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("tumbling window counts over a MemoryStream, watermark finalizes windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = tumblingCounts(mem.toDF(), "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("tumbling_test")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        Event(ts("2024-01-01 00:05:00"), 1, "click", 1.0),
        Event(ts("2024-01-01 00:45:00"), 2, "click", 2.0),
        Event(ts("2024-01-01 00:50:00"), 1, "view", 3.0))
      q.processAllAvailable()
      // advance watermark past hour 0 so its windows finalize
      mem.addData(Event(ts("2024-01-01 02:30:00"), 3, "click", 4.0))
      q.processAllAvailable()
      val rows = spark.table("tumbling_test")
        .as[(Timestamp, String, Long)].collect().toSet
      assert(rows === Set(
        (ts("2024-01-01 00:00:00"), "click", 2L),
        (ts("2024-01-01 00:00:00"), "view", 1L)))
    } finally q.stop()
  }

  test("file-source stream over the real events parquet produces windowed counts") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    // stage the parquet in a directory (streaming sources read dirs)
    val dir = Files.createTempDirectory("graft_stream_src")
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val q = tumblingCounts(EventStreams.readEventsStream(spark, dir.toString), "1 hour", "0 seconds")
      .writeStream.format("memory").queryName("file_stream_test")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete()).start()
    try {
      q.processAllAvailable()
      val n = spark.table("file_stream_test").count()
      assert(n > 100) // ~30 days × 24 windows × 5 event types at sf0.001
      // spot-check against the batch path over the same data
      val batch = graft.streaming.EventWindows
        .tumbling(graft.io.Sources.table(spark, "/root/testdata/sf0.001", "events"), "1 hour")
      assert(n === batch.count())
    } finally q.stop()
  }

  test("flatMapGroupsWithState running totals update per batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = runningUserTotals(mem.toDS())
      .writeStream.format("memory").queryName("running_test")
      .outputMode(OutputMode.Update()).start()
    try {
      mem.addData(
        Event(ts("2024-01-01 00:00:01"), 7, "click", 10.0),
        Event(ts("2024-01-01 00:00:02"), 7, "view", 5.0),
        Event(ts("2024-01-01 00:00:03"), 9, "click", 1.0))
      q.processAllAvailable()
      mem.addData(Event(ts("2024-01-01 00:10:00"), 7, "click", 2.5))
      q.processAllAvailable()
      val byUser = spark.table("running_test")
        .as[UserRunning].collect().groupBy(_.user_id)
      // latest state for user 7 reflects all three events
      assert(byUser(7L).map(_.n_events).max === 3L)
      assert(byUser(7L).map(_.sum_value).max === 17.5)
      assert(byUser(9L).map(_.n_events).max === 1L)
    } finally q.stop()
  }

  test("transformWithState running cents matches the flatMapGroupsWithState contract") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the new-API operator only runs on the RocksDB state store
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = util.Try(Option(spark.conf.get(key))).toOption.flatten
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[Event]
    val q = runningUserCentsTws(mem.toDS())
      .writeStream.format("memory").queryName("tws_cents_test")
      .outputMode(OutputMode.Update()).start()
    try {
      mem.addData(
        Event(ts("2024-01-01 00:00:01"), 7, "click", 10.004),
        Event(ts("2024-01-01 00:00:02"), 7, "view", 5.005),
        Event(ts("2024-01-01 00:00:03"), 9, "click", 1.0))
      q.processAllAvailable()
      mem.addData(Event(ts("2024-01-01 00:10:00"), 7, "click", 2.5))
      q.processAllAvailable()
      val byUser = spark.table("tws_cents_test")
        .as[UserTotals].collect().groupBy(_.user_id)
      // state survives the micro-batch boundary; cents fixed-pointed
      // exactly like the flatMapGroupsWithState form (floor(x*100+.5))
      assert(byUser(7L).map(_.n_events).max === 3L)
      assert(byUser(7L).map(_.sum_cents).max === (1000L + 501L + 250L))
      assert(byUser(9L).map(_.sum_cents).max === 100L)
    } finally {
      q.stop()
      saved match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  test("dropDuplicatesWithinWatermark dedupes with bounded state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    // the bounded-state production form of q5D's exact dedup: key
    // state is evicted once the watermark passes the key's event time
    val q = mem.toDF().withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark(Seq("user_id", "ts"))
      .writeStream.format("memory").queryName("dedup_wm_test")
      .outputMode(OutputMode.Append()).start()
    try {
      val e = Event(ts("2024-01-01 00:00:01"), 1, "click", 1.0)
      mem.addData(e, e) // duplicate within one batch
      q.processAllAvailable()
      mem.addData(e)    // duplicate across batches, inside the watermark
      q.processAllAvailable()
      assert(spark.table("dedup_wm_test").count() === 1)
    } finally q.stop()
  }

  test("integer-cents running totals are exact across micro-batch boundaries") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = runningUserCents(mem.toDS())
      .writeStream.format("memory").queryName("cents_test")
      .outputMode(OutputMode.Update()).start()
    try {
      // 0.1 + 0.2 is the classic float trap: 30 cents exactly here
      mem.addData(Event(ts("2024-01-01 00:00:01"), 7, "click", 0.1))
      q.processAllAvailable()
      mem.addData(Event(ts("2024-01-01 00:00:02"), 7, "view", 0.2),
        Event(ts("2024-01-01 00:00:03"), 9, "click", 12.345))
      q.processAllAvailable()
      val byUser = spark.table("cents_test")
        .as[UserTotals].collect().groupBy(_.user_id)
      assert(byUser(7L).map(_.sum_cents).max === 30L)
      assert(byUser(7L).map(_.n_events).max === 2L)
      // 12.345 → floor(1234.5 + 0.5) = 1235 (the half-up edge)
      assert(byUser(9L).map(_.sum_cents).max === 1235L)
    } finally q.stop()
  }

  test("session windows in APPEND mode emit only watermark-closed sessions") {
    // qBE's drain harness uses Complete for batch-equality; this is
    // the unbounded-PRODUCTION mode: append emits a session exactly
    // once, after the watermark passes its close, and evicts its
    // state — bounded memory on an infinite stream.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val sessions = mem.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "5 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("n_events"))
    val q = sessions.writeStream.format("memory").queryName("sess_append")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: two events 2 min apart = one session; user 2: one event
      mem.addData(
        Event(ts("2024-01-01 00:00:00"), 1, "click", 1.0),
        Event(ts("2024-01-01 00:02:00"), 1, "view", 1.0),
        Event(ts("2024-01-01 00:03:00"), 2, "click", 1.0))
      q.processAllAvailable()
      // nothing emitted yet: watermark hasn't passed the session ends
      assert(spark.table("sess_append").count() === 0L)
      // advance event time far enough to close all three sessions
      mem.addData(Event(ts("2024-01-01 01:00:00"), 3, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("sess_append")
        .as[(Long, Timestamp, Long)].collect().toSet
      assert(rows === Set(
        (1L, ts("2024-01-01 00:00:00"), 2L),
        (2L, ts("2024-01-01 00:03:00"), 1L)))
    } finally q.stop()
  }

  test("append session windows drop late rows, evict closed state, and match the batch twin") {
    // The full production contract for SURVEY §8.5's unbounded mode,
    // asserted with the engine's own metrics:
    //  1. a row older than the watermark is DROPPED (the bounded-state
    //     guarantee — its session can never re-open);
    //  2. closed-session state is EVICTED: at end of stream the state
    //     store holds only the still-open sessions, not every session
    //     ever seen;
    //  3. everything emitted equals the BATCH session aggregation over
    //     the accepted events, restricted to sessions the final
    //     watermark closed — streaming adds timing semantics, never
    //     different math.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val sessions = mem.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "5 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("n_events"))
    val q = sessions.writeStream.format("memory").queryName("sess_append_prod")
      .outputMode(OutputMode.Append()).start()
    try {
      val accepted = Seq(
        Event(ts("2024-01-01 00:00:00"), 1, "click", 1.0),
        Event(ts("2024-01-01 00:02:00"), 1, "view", 1.0),
        Event(ts("2024-01-01 00:03:00"), 2, "click", 1.0))
      mem.addData(accepted: _*)
      q.processAllAvailable()
      // watermark advances to 00:50
      val wmAdvance = Event(ts("2024-01-01 01:00:00"), 3, "click", 1.0)
      mem.addData(wmAdvance)
      q.processAllAvailable()
      // LATE: 00:20 < watermark 00:50 → dropped, user 4 never appears
      mem.addData(Event(ts("2024-01-01 00:20:00"), 4, "click", 1.0))
      q.processAllAvailable()
      // close user 3's session (watermark → 01:50 > 01:05); user 5's
      // own session stays OPEN at end of test
      val openTail = Event(ts("2024-01-01 02:00:00"), 5, "click", 1.0)
      mem.addData(openTail)
      q.processAllAvailable()

      // (1) the late row was dropped by the watermark, per the
      // engine's own state-operator metrics
      val progs = q.recentProgress.flatMap(_.stateOperators)
      assert(progs.map(_.numRowsDroppedByWatermark).max >= 1L,
        "late row was not dropped by the watermark")
      val emitted = spark.table("sess_append_prod")
        .as[(Long, Timestamp, Long)].collect().toSet
      assert(!emitted.exists(_._1 == 4L), "late row leaked into a session")

      // (2) state is bounded: only user 5's open session remains in
      // the store (closed sessions were emitted AND evicted)
      val lastState = q.lastProgress.stateOperators
      assert(lastState.nonEmpty && lastState.map(_.numRowsTotal).sum === 1L,
        s"state not evicted: ${lastState.map(_.numRowsTotal).mkString(",")}")

      // (3) batch twin: same session aggregation over the ACCEPTED
      // events, restricted to sessions closed by the final watermark
      // (02:00 − 10 min = 01:50)
      val finalWatermark = ts("2024-01-01 01:50:00")
      val batchTwin = (accepted :+ wmAdvance :+ openTail).toDF()
        .groupBy(session_window(col("ts"), "5 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .where(col("w.end") <= lit(finalWatermark))
        .select(col("user_id"), col("w.start"), col("n_events"))
        .as[(Long, Timestamp, Long)].collect().toSet
      assert(emitted === batchTwin,
        s"stream emitted $emitted but batch twin closed $batchTwin")
      assert(emitted.size === 3) // u1, u2, u3 — non-degenerate
    } finally q.stop()
  }
}
