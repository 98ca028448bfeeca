package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming wiring (SURVEY.md §2.9: the reference is
  * batch-only; this is the engine's streaming surface). The windowed
  * transformations are the SAME functions as the batch path
  * ([[EventWindows]]) — `readStream → transform → writeStream` with a
  * watermark bounding state.
  *
  * Scale notes: watermark + append output keeps per-window state
  * bounded (windows close and evict once the watermark passes);
  * `flatMapGroupsWithState` state is per-key and explicitly
  * timeout-evicted — the knobs that keep a 100 TB/day stream's state
  * from growing without bound.
  */
object EventStreams {

  final case class Event(ts: java.sql.Timestamp, user_id: Long,
                         event_type: String, value: Double)

  /** File-source stream over an events parquet directory — the
    * readStream twin of [[graft.io.Sources.table]]'s batch reader,
    * with the same TIMESTAMP(NANOS) handling (read int64 nanos,
    * floor-divide to µs). Streaming sources need an explicit schema. */
  def readEventsStream(spark: org.apache.spark.sql.SparkSession,
                       dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // peek at the batch-read schema (footer only) to decide whether
    // this directory actually carries nanos-as-long — a µs-timestamp
    // directory must pass through untouched, like Sources.table
    // no catch: a failed peek must propagate, not silently default —
    // defaulting to nanos against a µs directory would declare ts as
    // LongType and shift every event time 1000× (or fail per-batch)
    val tsIsNanoLong =
      spark.read.parquet(dir).schema("ts").dataType == LongType
    if (tsIsNanoLong) {
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("ts", LongType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType), StructField("props", StringType)))
      spark.readStream.schema(schema).parquet(dir)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else {
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("ts", TimestampType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType), StructField("props", StringType)))
      spark.readStream.schema(schema).parquet(dir)
    }
  }

  final case class UserRunning(user_id: Long, n_events: Long, sum_value: Double)

  final case class UserTotals(user_id: Long, n_events: Long, sum_cents: Long)

  /** Integer-exact running per-user totals: value is fixed-pointed to
    * cents BEFORE accumulation, so the state total is independent of
    * arrival order and micro-batch boundaries (Long addition commutes;
    * float addition doesn't) — the property that makes the streamed
    * result oracle-checkable against a batch SQL twin. Same
    * flatMapGroupsWithState shape as [[runningUserTotals]]. */
  def runningUserCents(events: Dataset[Event]): Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserTotals, UserTotals](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (user: Long, batch: Iterator[Event], state: GroupState[UserTotals]) =>
          val prev = state.getOption.getOrElse(UserTotals(user, 0L, 0L))
          var n = prev.n_events
          var c = prev.sum_cents
          // floor(x*100 + 0.5): identical fixed-pointing on both
          // engines (DuckDB round() is half-away-from-zero, Java
          // Math.round is half-up — floor(+0.5) sidesteps both)
          batch.foreach { e =>
            // loud on non-finite: NaN would fix-point to 0 cents and
            // Infinity to Long.MaxValue, silently corrupting the
            // running sum where the batch-SQL twin aborts on the cast
            require(java.lang.Double.isFinite(e.value),
              s"non-finite event value ${e.value}")
            n += 1; c += math.floor(e.value * 100 + 0.5).toLong
          }
          val next = UserTotals(user, n, c)
          state.update(next)
          Iterator.single(next)
      }
  }

  /** [[runningUserCents]] on Spark 4's arbitrary-state API
    * (`transformWithState` + [[StatefulProcessor]]): typed,
    * composable per-key state (ValueState/ListState/MapState, each
    * independently TTL-able, plus timers) instead of one opaque
    * GroupState blob — the forward path for custom streaming state,
    * and the API that unlocks per-state-variable TTL eviction at
    * 100 TB/day key cardinalities. Same integer-cents contract as the
    * flatMapGroupsWithState form; EventStreamsSpec pins both to the
    * same totals. Requires the RocksDB state store provider (the only
    * provider implementing the new state schema). */
  def runningUserCentsTws(events: Dataset[Event]): Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events
      .groupByKey(_.user_id)
      .transformWithState(new CentsProcessor, TimeMode.None(), OutputMode.Update())
  }

  /** Per-user exact-cents accumulator for [[runningUserCentsTws]]. */
  private class CentsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, UserTotals] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TimerValues, TTLConfig, ValueState}

    @transient private var totals: ValueState[UserTotals] = _

    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[UserTotals]("totals",
        org.apache.spark.sql.Encoders.product[UserTotals], TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[Event],
                                 tv: TimerValues): Iterator[UserTotals] = {
      val prev = if (totals.exists()) totals.get() else UserTotals(user, 0L, 0L)
      var n = prev.n_events
      var c = prev.sum_cents
      rows.foreach { e =>
        require(java.lang.Double.isFinite(e.value), // same guard as above
          s"non-finite event value ${e.value}")
        n += 1; c += math.floor(e.value * 100 + 0.5).toLong
      }
      val next = UserTotals(user, n, c)
      totals.update(next)
      Iterator.single(next)
    }
  }

  /** Watermarked tumbling-window counts; append-mode compatible
    * (finalized windows only). */
  def tumblingCounts(stream: DataFrame, width: String = "1 hour",
                     watermark: String = "10 minutes"): DataFrame =
    stream
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))

  /** Custom stateful operator: running per-user totals via
    * flatMapGroupsWithState. Pass `evictAfter` to evict idle keys via
    * processing-time timeout (bounded state) — NOTE eviction DROPS
    * the key's accumulated totals: a user active again later restarts
    * from zero. That is the deliberate bounded-state trade-off;
    * totals that must survive idleness belong in a durable sink
    * keyed by user. (With a timeout set the engine schedules
    * continuous timeout-evaluation micro-batches, so tests use
    * NoTimeout.) */
  def runningUserTotals(events: Dataset[Event],
                        evictAfter: Option[String] = None): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (evictAfter.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserRunning, UserRunning](
        OutputMode.Update(), timeoutConf) {
        (user: Long, batch: Iterator[Event], state: GroupState[UserRunning]) =>
          if (state.hasTimedOut) {
            // evict silently: re-emitting the last record would send
            // the sink a duplicate of an already-delivered value
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(UserRunning(user, 0L, 0.0))
            var n = prev.n_events
            var sv = prev.sum_value
            batch.foreach { e => n += 1; sv += e.value }
            val next = UserRunning(user, n, sv)
            state.update(next)
            evictAfter.foreach(state.setTimeoutDuration)
            Iterator.single(next)
          }
      }
  }
}
