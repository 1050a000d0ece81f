package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSuite

class NexusEtlSpec extends SparkSuite {
  import spark.implicits._

  test("withRunKeys builds composite run_id like make_run_id (parquet.py:126)") {
    val df = Seq(("x")).toDF("payload")
    val out = NexusEtl.withRunKeys(df, lit("REF_L"), lit(218386))
      .select("instrument_id", "run_number", "run_id").as[(String, Long, String)]
      .head()
    assert(out === ("REF_L", 218386L, "REF_L:218386"))
  }

  test("valueNumeric mirrors try_parse_numeric (schemas.py:302)") {
    val out = Seq("3.5", "abc", "42", "", null)
      .toDF("v").select(NexusEtl.valueNumeric(col("v"))).as[Option[Double]]
      .collect().toSeq
    assert(out === Seq(Some(3.5), None, Some(42.0), None, None))
  }

  test("normalizeToString JSON-encodes nested values (schemas.py:324)") {
    val df = Seq((Seq(1, 2), 7, "s")).toDF("arr", "num", "str")
    val row = df.select(
      NexusEtl.normalizeToString(df, "arr"),
      NexusEtl.normalizeToString(df, "num"),
      NexusEtl.normalizeToString(df, "str")).as[(String, String, String)].head()
    assert(row === ("[1,2]", "7", "s"))
  }

  test("attributeMap strips prefix and keeps only prefixed columns (schemas.py:346)") {
    val df = Seq(("h5", "2.0", "REF_L")).toDF("file_attr_format", "file_attr_version", "name")
    val m = df.select(NexusEtl.attributeMap(df, "file_attr_").as("m"))
      .as[Map[String, String]].head()
    assert(m === Map("format" -> "h5", "version" -> "2.0"))
  }

  test("additionalFieldsMap excludes known fields and attr columns (schemas.py:367)") {
    val df = Seq(("n", "x", "y", "z")).toDF("name", "extra1", "extra2", "file_attr_a")
    val m = df.select(NexusEtl.additionalFieldsMap(df, Seq("name")).as("m"))
      .as[Map[String, String]].head()
    assert(m === Map("extra1" -> "x", "extra2" -> "y"))
  }

  test("explodeEventsWithPulseIndex maps event positions to pulses (parquet.py:463-471)") {
    // event_index[i] = first event of pulse i: pulses 0:[0,1], 1:[], 2:[2,3], 3:[4]
    val banks = Seq(
      ("bank1", Seq(10L, 11L, 12L, 13L, 14L), Seq(0.1, 0.2, 0.3, 0.4, 0.5),
       Seq(0L, 2L, 2L, 4L)))
      .toDF("bank", "event_ids", "event_offsets", "event_index")
    val out = NexusEtl.explodeEventsWithPulseIndex(banks, "event_ids", "event_offsets", "event_index")
      .select("event_idx", "pulse_index", "event_id", "time_offset")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(out === Seq(
      (0L, 0L, 10L, 0.1), (1L, 0L, 11L, 0.2),
      (2L, 2L, 12L, 0.3), (3L, 2L, 13L, 0.4),
      (4L, 3L, 14L, 0.5)))
  }

  test("daslogStats computes per-log aggregate stats (parquet.py:288-400)") {
    val logs = Seq(
      ("temp", 1.0), ("temp", 3.0), ("temp", 2.0), ("press", 10.0))
      .toDF("log_name", "value_numeric")
    val out = NexusEtl.daslogStats(logs, Seq("log_name"))
      .orderBy("log_name")
      .select("log_name", "n_points", "average_value", "min_value", "max_value")
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(out === Seq(("press", 1L, 10.0, 10.0, 10.0), ("temp", 3L, 2.0, 1.0, 3.0)))
  }

  test("eventSummary aggregates per bank (parquet.py:760-779)") {
    val ev = Seq(("r1", "b1", 0L), ("r1", "b1", 1L), ("r1", "b2", 4L))
      .toDF("run_id", "bank", "pulse_index")
    val out = NexusEtl.eventSummary(ev, Seq("run_id"), "bank", "pulse_index")
      .orderBy("bank")
      .select("bank", "events_extracted", "total_counts", "n_pulses")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out === Seq(("b1", 2L, 2L, 2L), ("b2", 1L, 1L, 5L)))
  }

  test("eventSummary n_pulses = len(event_index), incl. trailing empty pulses (parquet.py:714)") {
    val ev = Seq(("r1", "b1", 0L), ("r1", "b1", 1L), ("r1", "b2", 4L))
      .toDF("run_id", "bank", "pulse_index")
    // b1 has 7 pulses (trailing ones empty), b2's only event is at pulse 4
    // of a 5-pulse index: both must report the index length, not max+1
    val banks = Seq(
      ("r1", "b1", Seq(0L, 1L, 2L, 2L, 2L, 2L, 2L)),
      ("r1", "b2", Seq(0L, 0L, 0L, 0L, 1L)))
      .toDF("run_id", "bank", "event_index")
    val out = NexusEtl.eventSummary(ev, Seq("run_id"), "bank", "pulse_index",
        nPulsesPerBank = Some(NexusEtl.nPulsesFromBanks(
          banks, Seq("run_id"), "bank", "event_index")))
      .orderBy("bank")
      .select("bank", "events_extracted", "n_pulses")
      .as[(String, Long, Long)].collect().toSeq
    assert(out === Seq(("b1", 2L, 7L), ("b2", 1L, 5L)))
  }

  test("eventSummary emits zero-event banks when the bank table is given (parquet.py:491-496)") {
    val ev = Seq(("r1", "b1", 0L)).toDF("run_id", "bank", "pulse_index")
    // b2 recorded pulses but extracted no events: the reference still
    // stores its summary row with events 0
    val banks = Seq(
      ("r1", "b1", Seq(0L, 1L)),
      ("r1", "b2", Seq(0L, 0L, 0L)))
      .toDF("run_id", "bank", "event_index")
    val out = NexusEtl.eventSummary(ev, Seq("run_id"), "bank", "pulse_index",
        nPulsesPerBank = Some(NexusEtl.nPulsesFromBanks(
          banks, Seq("run_id"), "bank", "event_index")))
      .orderBy("bank")
      .select("bank", "events_extracted", "total_counts", "n_pulses")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out === Seq(("b1", 1L, 1L, 2L), ("b2", 0L, 0L, 3L)))
  }

  test("explodeDaslogs: series explode, veto fallback, metadata-only rows (parquet.py:288-400)") {
    val logs = Seq(
      // ordinary series; value array shorter -> truncate to 2 points
      ("temp", Some(Seq(0.5, 1.5, 2.5)), Some(Seq("300", "301")), None: Option[Seq[Double]]),
      // Veto_pulse shape: no time array, veto_pulse_time supplies it,
      // values become the 1.0 pulse indicator
      ("Veto_pulse", None, None, Some(Seq(10.0, 20.0))),
      // metadata-only log: no series at all, survives as one null row
      ("phase", None, None, None))
      .toDF("log_name", "time", "value", "veto_pulse_time")
    val out = NexusEtl.explodeDaslogs(logs)
      .select("log_name", "time", "value")
      .as[(String, Option[Double], Option[String])]
      .collect().toSeq.sortBy(r => (r._1, r._2))
    assert(out === Seq(
      ("Veto_pulse", Some(10.0), Some("1.0")),
      ("Veto_pulse", Some(20.0), Some("1.0")),
      ("phase", None, None),
      ("temp", Some(0.5), Some("300")),
      ("temp", Some(1.5), Some("301"))))
    assert(!NexusEtl.explodeDaslogs(logs).columns.contains("veto_pulse_time"))
  }
}
