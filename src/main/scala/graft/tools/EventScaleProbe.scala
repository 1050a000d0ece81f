package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe for the event pipeline at larger event counts than the
  * scale suite runs (BenchScale fixes copies for the whole suite; this
  * amplifies ONLY events). Usage:
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.EventScaleProbe 1000"
  *
  * copies=1000 over sf0.1 = 100M events across 1000 run timelines — the
  * "would it hold at 10x-100x" check for pulse derivation, both as-of
  * join paths, and interval counts. Prints per-stage seconds to stderr.
  */
object EventScaleProbe {
  def main(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(1000)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val work = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scale")
    val spark = graft.Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val path = s"$work/events_probe_x$copies"
    if (!new java.io.File(path).exists()) {
      graft.BenchScale.amplifyEvents(spark, sfDir, copies)
        .repartition(cpus.toInt * 2).write.mode("overwrite").parquet(path)
    }
    val events = spark.read.parquet(path)
    val n = events.count()
    System.err.println(s"[probe] $n events across $copies runs")

    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      System.err.println(
        f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.1fs ($rows rows)")
    }

    val ev = graft.Tables.withTsUs(events)
    // materialize ONCE (eager checkpoint, timed as the derivation stage):
    // both as-of stages then read the same pulse frame, so their timings
    // compare the joins, not a re-derivation each. Eager (not lazy)
    // matters beyond timing: the lazy variant keeps the ev lineage in the
    // plan and the downstream as-of join over the same ev frame trips the
    // analyzer's ambiguous-self-join check.
    var pulses: org.apache.spark.sql.DataFrame = null
    timed("pulse_derivation") {
      pulses = graft.ops.EventTime.derivePulseTimes(
          ev, "event_type", "ts_us", "click",
          runKeys = Seq("run_id"), tieBreak = Seq("event_id"))
        .select("run_id", "pulse_time", "pulse_index")
        .localCheckpoint()
      pulses.count()
    }
    timed("asof_bucketed") {
      graft.ops.AsOfJoin.backward(
        ev.select("run_id", "event_id", "ts_us"), pulses,
        leftTime = "ts_us", rightTime = "pulse_time",
        keys = Seq("run_id"), bucketWidth = 3600L * 1000 * 1000,
        rightCols = Seq("pulse_index")).count()
    }
    timed("asof_merge") {
      graft.plans.AsOfMergeJoin.backward(
        ev.select("run_id", "event_id", "ts_us"), pulses,
        leftTime = "ts_us", rightTime = "pulse_time",
        keys = Seq("run_id"), rightCols = Seq("pulse_index")).count()
    }
    timed("interval_counts") {
      graft.ops.EventTime.countByInterval(ev, "ts_us",
        3600L * 1000 * 1000, bankCol = Some("event_type"),
        pulseCol = None).count()
    }
    timed("asof_sql_keyless") {
      // the r5 keyless-ASOF rewrite at scale: a global (no USING keys)
      // as-of over every pulse — pre-r5 this planned LEAD over ONE
      // partition holding the whole right side; now the LEAD is
      // bucket-partitioned with an aggregate-level stitch
      ev.select("event_id", "ts_us").createOrReplaceTempView("probe_events")
      pulses.select("pulse_time", "pulse_index")
        .createOrReplaceTempView("probe_pulses")
      spark.sql(
        s"""SELECT COUNT(pulse_index) AS n
            FROM probe_events ASOF JOIN probe_pulses
            MATCH_CONDITION (ts_us >= pulse_time)
            WITHIN ${3600L * 1000 * 1000}""").head().getLong(0)
    }
    spark.stop()
  }
}
