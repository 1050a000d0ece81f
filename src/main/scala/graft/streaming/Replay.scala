package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event replay + streaming analytics.
  *
  * Mirrors reference scripts/spark_replay_events.py:
  *  - kafkaShape      <- write_to_kafka_batch/:184-201 — key = run/partition
  *    id, value = JSON of all fields. The Kafka sink itself is swappable
  *    (`.format("kafka")` vs parquet/memory); shaping is the testable part.
  *  - batchSummary    <- write_to_console/:285-309 per-microbatch summary.
  *  - streaming analytics are the Structured Streaming equivalents of the
  *    reference's batch slicing: watermarked windowed counts, streaming
  *    dedup, stateful sessionization (mapGroupsWithState).
  *
  * Scale notes: `kafkaShape` repartitions to the producer parallelism;
  * watermarks bound state; sessionization state is per-key and expires on
  * processing-time timeout, so state size tracks active keys, not history.
  */
object Replay {

  /** Kafka-record shaping: (key, value) with the full row as JSON
    * (spark_replay_events.py:184-186). `numPartitions` matches the topic's
    * partition count (:199 repartition).
    */
  def kafkaShape(events: DataFrame, keyCol: String, numPartitions: Int = 0): DataFrame = {
    val shaped = events.select(
      col(keyCol).cast("string").as("key"),
      to_json(struct(events.columns.toIndexedSeq.map(col): _*)).as("value"))
    if (numPartitions > 0) shaped.repartition(numPartitions) else shaped
  }

  /** Per-batch replay summary (spark_replay_events.py:300-309). */
  def batchSummary(events: DataFrame, keyCol: String, pulseCol: String): DataFrame =
    events.groupBy(col(keyCol)).agg(
      count(lit(1)).as("event_count"),
      min(col(pulseCol)).as("min_pulse"),
      max(col(pulseCol)).as("max_pulse"))

  /** Rate-limited batch replay: assign rows to emission waves of
    * `eventsPerWave` by position within each key (a distributed analog of
    * the reference's sleep-based rate limiting at :206-223 — downstream
    * consumers pace by wave id rather than the driver sleeping).
    */
  def withWaves(events: DataFrame, keyCol: String, orderCol: String,
                eventsPerWave: Long): DataFrame =
    events.withColumn("wave",
      expr(s"CAST((row_number() OVER (PARTITION BY `$keyCol` ORDER BY `$orderCol`)) - 1 AS BIGINT) div $eventsPerWave"))

  /** Watermarked tumbling-window counts over a streaming events frame
    * (the streaming analog of EventTime.countByInterval). `tsCol` must be
    * a timestamp column; late data beyond the watermark is dropped, which
    * bounds state.
    */
  def windowedCounts(stream: DataFrame, tsCol: String, typeCol: String,
                     windowDur: String, watermark: String): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur), col(typeCol))
      .agg(count(lit(1)).as("event_count"))
      .select(col("window.start").as("window_start"),
              col("window.end").as("window_end"),
              col(typeCol), col("event_count"))

  /** Watermarked tumbling-window APPROXIMATE distinct counts — the
    * streaming "unique users/sessions/values per window" at any
    * cardinality: per-window datasketches HLL sketch state (KB per
    * window group, vs the unbounded exact-distinct set) estimated at
    * emission. The sketch aggregate is mergeable, so partial aggregation
    * and state-store merges stay correct; within the coupon-exact
    * regime the estimate equals the exact count (the batch
    * sketch_epoch_distinct contract, windowed).
    *
    * The estimate goes through the self-union
    * (`hll_union(__hll, __hll)`) for the same reason
    * [[graft.ops.Sketches.hllMergeEstimate]] does: a raw single-group
    * sketch keeps the order-sensitive HIP estimator, so beyond the
    * exact regime the SAME window could report a different count under
    * different micro-batch boundaries or shuffle partitioning — the
    * self-union drops HIP and forces the order-independent composite
    * estimator, making window estimates replay-deterministic.
    */
  def windowedApproxDistinct(stream: DataFrame, tsCol: String,
                             valueCol: String, windowDur: String,
                             watermark: String, lgK: Int = 12): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur))
      .agg(expr(s"hll_sketch_agg($valueCol, $lgK)").as("__hll"))
      .select(col("window.start").as("window_start"),
              col("window.end").as("window_end"),
              expr("hll_sketch_estimate(hll_union(__hll, __hll))")
                .as("n_distinct_est"))

  /** Stream-stream interval join: enrich each event with pulses from the
    * same key whose time lies in [event - maxLag, event] — the streaming
    * analog of the batch as-of correlation (each side watermarked, so
    * Spark buffers only rows inside the watermark horizon and state stays
    * bounded; the interval bound is what makes the join's state
    * expirable).
    *
    * Returns the inner join (one row per event x matching pulse; callers
    * wanting only the latest pulse aggregate downstream — streaming joins
    * cannot take a per-row argmax without a second stateful stage).
    */
  def joinEventsWithPulses(
      events: DataFrame,
      pulses: DataFrame,
      keys: Seq[String],
      eventTs: String,
      pulseTs: String,
      maxLag: String,
      watermark: String): DataFrame = {
    val e = events.withWatermark(eventTs, watermark)
    // prefix non-key pulse columns so the joined schema is unambiguous
    val renamed = pulses.columns.foldLeft(pulses) { (acc, c) =>
      if (keys.contains(c)) acc else acc.withColumnRenamed(c, s"pulse_$c")
    }
    val pTs = s"pulse_$pulseTs"
    val p = renamed.withWatermark(pTs, watermark)
    val cond = keys.map(k => e(k) === p(k)).reduce(_ && _) &&
      p(pTs) <= e(eventTs) &&
      p(pTs) >= e(eventTs) - expr(s"INTERVAL $maxLag")
    val joined = e.join(p, cond, "inner")
    keys.foldLeft(joined)((acc, k) => acc.drop(p(k)))
  }

  /** Stream-static enrichment: join the unbounded stream against a static
    * dimension frame (run/instrument metadata in the reference's world;
    * any slowly-changing lookup in general). The static side re-plans per
    * micro-batch, so a small dimension broadcasts; a left join keeps
    * unmatched stream rows (nulls) rather than silently dropping them.
    */
  def enrichStream(stream: DataFrame, dim: DataFrame,
                   keys: Seq[String]): DataFrame =
    stream.join(broadcast(dim), keys, "left")

  /** Streaming exact dedup within the watermark horizon. */
  def streamingDedup(stream: DataFrame, tsCol: String, keyCols: Seq[String],
                     watermark: String): DataFrame =
    stream.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  case class SessionUpdate(userId: Long, nEvents: Long, firstTs: Long, lastTs: Long,
                           closed: Boolean)
  // public: Spark needs an accessible constructor to encode state
  case class SessionState(nEvents: Long, firstTs: Long, lastTs: Long)

  /** Custom per-key state: user sessionization with a gap timeout —
    * the KeyValueGroupedDataset.mapGroupsWithState pattern the brief calls
    * for. Emits a running update per key per batch; with gapMs > 0 state
    * expires after that idle period (processing-time timeout; note this
    * makes the query trigger continuously — tests use gapMs = 0 /
    * NoTimeout so processAllAvailable converges).
    */
  def sessionize(spark: SparkSession, stream: Dataset[(Long, Long)], gapMs: Long): Dataset[SessionUpdate] = {
    import spark.implicits._
    val timeout = if (gapMs > 0) GroupStateTimeout.ProcessingTimeTimeout
                  else GroupStateTimeout.NoTimeout
    stream.groupByKey(_._1)
      .mapGroupsWithState[SessionState, SessionUpdate](timeout) {
        (userId: Long, rows: Iterator[(Long, Long)], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            SessionUpdate(userId, s.nEvents, s.firstTs, s.lastTs, closed = true)
          } else {
            val ts = rows.map(_._2).toSeq
            val prev = state.getOption.getOrElse(SessionState(0L, Long.MaxValue, Long.MinValue))
            val next = SessionState(prev.nEvents + ts.size,
              math.min(prev.firstTs, ts.min), math.max(prev.lastTs, ts.max))
            state.update(next)
            if (gapMs > 0) state.setTimeoutDuration(gapMs)
            SessionUpdate(userId, next.nEvents, next.firstTs, next.lastTs, closed = false)
          }
      }
  }

  case class ClosedSession(userId: Long, nEvents: Long, firstTs: Long, lastTs: Long)

  /** Event-time sessionization: sessions close when the WATERMARK passes
    * last-event + gap (flatMapGroupsWithState + EventTimeTimeout), so
    * late data within the watermark still joins its session and state is
    * bounded by the watermark horizon — the production-grade variant of
    * [[sessionize]]'s processing-time timeout.
    *
    * @param stream (userId, eventTime) rows; watermark must already be
    *               applied to the timestamp column upstream
    */
  def sessionizeByEventTime(spark: SparkSession,
                            stream: Dataset[(Long, java.sql.Timestamp)],
                            gapMs: Long): Dataset[ClosedSession] = {
    import spark.implicits._
    stream.groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[(Long, java.sql.Timestamp)],
         state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(userId, s.nEvents, s.firstTs, s.lastTs))
          } else {
            val ts = rows.map(_._2.getTime).toSeq
            val prev = state.getOption.getOrElse(SessionState(0L, Long.MaxValue, Long.MinValue))
            val next = SessionState(prev.nEvents + ts.size,
              math.min(prev.firstTs, ts.min), math.max(prev.lastTs, ts.max))
            state.update(next)
            state.setTimeoutTimestamp(next.lastTs + gapMs)
            Iterator.empty
          }
      }
  }

  /** Streaming source over an ETL output directory — the "continuously
    * stream new events as they're ingested" mode
    * (spark_replay_events.py:134-163), with parquet standing in for the
    * Iceberg streaming source.
    */
  def streamFromDir(spark: SparkSession, dir: String,
                    schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.readStream.schema(schema).option("maxFilesPerTrigger", 4).parquet(dir)

  /** Write a replay stream to a directory sink with checkpointing (the
    * Kafka sink swapped for parquet so the path is testable offline).
    */
  def writeStreamToDir(shaped: DataFrame, dir: String, checkpoint: String) =
    shaped.writeStream
      .format("parquet")
      .option("path", dir)
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append)
}
