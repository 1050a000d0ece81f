package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSuite

class ReplaySpec extends SparkSuite {
  import spark.implicits._

  test("kafkaShape emits (key, value-json) per event (spark_replay_events.py:184)") {
    val ev = Seq((1L, "REF_L:1", "bank1"), (2L, "REF_L:1", "bank2"))
      .toDF("event_id", "run_id", "bank")
    val shaped = Replay.kafkaShape(ev, "run_id")
    assert(shaped.columns.toSeq === Seq("key", "value"))
    val row = shaped.orderBy(get_json_object(col("value"), "$.event_id")).head()
    assert(row.getString(0) === "REF_L:1")
    assert(row.getString(1) === """{"event_id":1,"run_id":"REF_L:1","bank":"bank1"}""")
  }

  test("batchSummary aggregates per key (spark_replay_events.py:300-309)") {
    val ev = Seq(("r1", 0L), ("r1", 5L), ("r2", 2L)).toDF("run_id", "pulse_index")
    val out = Replay.batchSummary(ev, "run_id", "pulse_index")
      .orderBy("run_id")
      .select("run_id", "event_count", "min_pulse", "max_pulse")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out === Seq(("r1", 2L, 0L, 5L), ("r2", 1L, 2L, 2L)))
  }

  test("withWaves assigns rate-limit waves by position within key") {
    val ev = (1L to 10L).map(i => ("r1", i)).toDF("run_id", "event_id")
    val waves = Replay.withWaves(ev, "run_id", "event_id", eventsPerWave = 4)
      .select("event_id", "wave").as[(Long, Long)].collect().toMap
    assert(waves(1L) === 0L && waves(4L) === 0L && waves(5L) === 1L && waves(10L) === 2L)
  }

  test("windowedCounts: watermarked tumbling windows over a memory stream") {
    val input = MemoryStream[(java.sql.Timestamp, String)](spark)
    val df = input.toDF().toDF("ts", "event_type")
    val query = Replay.windowedCounts(df, "ts", "event_type", "10 seconds", "5 seconds")
      .writeStream.format("memory").queryName("wc").outputMode(OutputMode.Complete).start()
    def t(s: Long) = new java.sql.Timestamp(s * 1000)
    input.addData((t(1), "a"), (t(2), "a"), (t(3), "b"), (t(11), "a"))
    query.processAllAvailable()
    val rows = spark.table("wc")
      .select(col("window_start").cast("long"), col("event_type"), col("event_count"))
      .as[(Long, String, Long)].collect().toSet
    query.stop()
    assert(rows === Set((0L, "a", 2L), (0L, "b", 1L), (10L, "a", 1L)))
  }

  test("windowedApproxDistinct: exact in the coupon regime, mergeable across batches") {
    val input = MemoryStream[(java.sql.Timestamp, Long)](spark)
    val df = input.toDF().toDF("ts", "user_id")
    val query = Replay.windowedApproxDistinct(df, "ts", "user_id",
        "10 seconds", "5 seconds")
      .writeStream.format("memory").queryName("wad")
      .outputMode(OutputMode.Complete).start()
    def t(s: Long) = new java.sql.Timestamp(s * 1000)
    // window [0,10): users 1,2,3 (1 repeated across two micro-batches —
    // the state-store sketch must merge, not double-count);
    // window [10,20): user 7
    input.addData((t(1), 1L), (t(2), 2L), (t(3), 1L))
    query.processAllAvailable()
    input.addData((t(4), 3L), (t(5), 1L), (t(11), 7L))
    query.processAllAvailable()
    val rows = spark.table("wad")
      .select(col("window_start").cast("long"), col("n_distinct_est"))
      .as[(Long, Long)].collect().toMap
    query.stop()
    assert(rows === Map(0L -> 3L, 10L -> 1L))
  }

  test("streamingDedup drops duplicates within the watermark") {
    val input = MemoryStream[(java.sql.Timestamp, Long)](spark)
    val df = input.toDF().toDF("ts", "event_id")
    val query = Replay.streamingDedup(df, "ts", Seq("event_id"), "10 seconds")
      .writeStream.format("memory").queryName("sd").outputMode(OutputMode.Append).start()
    def t(s: Long) = new java.sql.Timestamp(s * 1000)
    input.addData((t(1), 1L), (t(2), 1L), (t(3), 2L))
    query.processAllAvailable()
    query.stop()
    assert(spark.table("sd").select("event_id").as[Long].collect().sorted.toSeq === Seq(1L, 2L))
  }

  test("enrichStream: stream-static left join keeps unmatched rows") {
    val input = MemoryStream[(Long, Long)](spark)
    val df = input.toDF().toDF("event_id", "run_id")
    val dim = Seq((1L, "SNAP"), (2L, "NOMAD")).toDF("run_id", "instrument")
    val query = Replay.enrichStream(df, dim, Seq("run_id"))
      .writeStream.format("memory").queryName("es").outputMode(OutputMode.Append).start()
    input.addData((10L, 1L), (11L, 2L), (12L, 99L)) // 99 has no dim row
    query.processAllAvailable()
    query.stop()
    val rows = spark.table("es")
      .select(col("event_id"), col("instrument"))
      .as[(Long, Option[String])].collect().toSet
    assert(rows === Set((10L, Some("SNAP")), (11L, Some("NOMAD")), (12L, None)))
  }

  test("joinEventsWithPulses: stream-stream interval join within the lag window") {
    val ev = MemoryStream[(String, java.sql.Timestamp, Long)](spark)
    val pu = MemoryStream[(String, java.sql.Timestamp, Long)](spark)
    val events = ev.toDF().toDF("run_id", "ts", "event_id")
    val pulses = pu.toDF().toDF("run_id", "ts", "pulse_index")
    val query = Replay.joinEventsWithPulses(
        events, pulses, Seq("run_id"), "ts", "ts",
        maxLag = "5 seconds", watermark = "10 seconds")
      .writeStream.format("memory").queryName("ssj")
      .outputMode(OutputMode.Append).start()
    def t(s: Long) = new java.sql.Timestamp(s * 1000)
    pu.addData(("r1", t(1), 0L), ("r1", t(3), 1L), ("r2", t(1), 0L))
    ev.addData(("r1", t(4), 100L), ("r1", t(20), 101L), ("r2", t(2), 200L))
    query.processAllAvailable()
    query.stop()
    val rows = spark.table("ssj")
      .select("run_id", "event_id", "pulse_pulse_index")
      .as[(String, Long, Long)].collect().toSet
    // event 100 at t=4 sees pulses at t=1 and t=3 of ITS run only; event
    // 101 at t=20 is beyond every pulse + 5s lag; event 200 matches r2's
    // pulse — no cross-run contamination
    assert(rows === Set(("r1", 100L, 0L), ("r1", 100L, 1L), ("r2", 200L, 0L)))
  }

  test("sessionize maintains per-user state via mapGroupsWithState") {
    val input = MemoryStream[(Long, Long)](spark)
    val sessions = Replay.sessionize(spark, input.toDS(), gapMs = 0)
    val query = sessions.writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Update).start()
    input.addData((7L, 100L), (7L, 200L), (9L, 50L))
    query.processAllAvailable()
    input.addData((7L, 300L))
    query.processAllAvailable()
    query.stop()
    val rows = spark.table("sess")
      .select("userId", "nEvents", "firstTs", "lastTs")
      .as[(Long, Long, Long, Long)].collect()
    // latest state for user 7 accumulates across batches
    assert(rows.filter(_._1 == 7L).map(_._2).max === 3L)
    assert(rows.filter(_._1 == 7L).map(_._4).max === 300L)
    assert(rows.exists(r => r._1 == 9L && r._2 == 1L))
  }

  test("sessionizeByEventTime closes sessions when the watermark passes the gap") {
    val input = MemoryStream[(Long, java.sql.Timestamp)](spark)
    def t(s: Long) = new java.sql.Timestamp(s * 1000)
    val withWm = input.toDF().toDF("userId", "ts")
      .withWatermark("ts", "5 seconds")
      .as[(Long, java.sql.Timestamp)]
    val sessions = Replay.sessionizeByEventTime(spark, withWm, gapMs = 10000)
    val query = sessions.writeStream.format("memory").queryName("evsess")
      .outputMode(OutputMode.Append).start()
    // user 7's session: events at 1s and 3s; gap 10s -> times out at 13s
    input.addData((7L, t(1)), (7L, t(3)))
    query.processAllAvailable()
    assert(spark.table("evsess").count() === 0) // watermark not past 13s yet
    // a much later event pushes the watermark (100-5=95s > 13s)
    input.addData((9L, t(100)))
    query.processAllAvailable()
    input.addData((9L, t(101))) // one more batch so the timeout fires
    query.processAllAvailable()
    query.stop()
    val closed = spark.table("evsess")
      .select("userId", "nEvents", "firstTs", "lastTs")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(closed.contains((7L, 2L, 1000L, 3000L)), s"got $closed")
  }

  test("streamFromDir + writeStreamToDir round-trip through parquet") {
    val srcDir = java.nio.file.Files.createTempDirectory("graft_stream_src").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_stream_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_ckpt").toString
    val ev = Seq((1L, "r1"), (2L, "r1")).toDF("event_id", "run_id")
    ev.write.mode("overwrite").parquet(srcDir)
    val stream = Replay.streamFromDir(spark, srcDir, ev.schema)
    val shaped = Replay.kafkaShape(stream, "run_id")
    val q = Replay.writeStreamToDir(shaped, outDir, ckpt).start()
    q.processAllAvailable()
    q.stop()
    val out = spark.read.parquet(outDir)
    assert(out.count() === 2)
    assert(out.columns.toSeq === Seq("key", "value"))
  }
}
