package graft.cli

import java.nio.file.Files

import graft.SparkSuite

/** Drives both CLI mains end-to-end: raw frames -> ConvertCli -> typed
  * tables -> EventSliceCli -> interval counts, like a user switching from
  * the reference's `nexus-processor` + spark-submit workflow.
  */
class CliSpec extends SparkSuite {
  import spark.implicits._

  test("ConvertCli then EventSliceCli round-trip") {
    val in = Files.createTempDirectory("graft_cli_in").toString
    val out = Files.createTempDirectory("graft_cli_out").toString
    val slice = Files.createTempDirectory("graft_cli_slice").toString

    Seq(("REF_L", 1L, "t"))
      .toDF("instrument_id", "run_number", "title").write.parquet(s"$in/metadata")
    Seq(("REF_L", 1L, "s")).toDF("instrument_id", "run_number", "name")
      .write.parquet(s"$in/sample")
    Seq(("REF_L", 1L, "REF_L")).toDF("instrument_id", "run_number", "name")
      .write.parquet(s"$in/instrument")
    Seq(("REF_L", 1L, "c", "n", "v"))
      .toDF("instrument_id", "run_number", "component", "name", "version")
      .write.parquet(s"$in/software")
    Seq(("REF_L", 1L, "user1", "Ada"))
      .toDF("instrument_id", "run_number", "user_id", "name").write.parquet(s"$in/users")
    Seq(
      ("REF_L", 1L, "proton_charge", 0.0, "1.0"),
      ("REF_L", 1L, "proton_charge", 60.0, "1.1"),
      ("REF_L", 1L, "proton_charge", 120.0, "1.2"))
      .toDF("instrument_id", "run_number", "log_name", "time", "value")
      .write.parquet(s"$in/daslogs")
    Seq(("REF_L", 1L, "bank1", Seq(1L, 2L, 3L, 4L),
        Seq(1000.0, 2000.0, 3000.0, 4000.0), Seq(0L, 2L, 3L)))
      .toDF("instrument_id", "run_number", "bank", "event_ids",
        "event_offsets", "event_index")
      .write.parquet(s"$in/event_banks")

    ConvertCli.main(Array(in, "--output-dir", out,
      "--include-events", "--include-users", "--max-events-per-file", "1000"))

    val events = spark.read.parquet(s"$out/events")
    assert(events.count() === 4)
    assert(spark.read.parquet(s"$out/daslogs").count() === 3)
    assert(spark.read.parquet(s"$out/users").count() === 1)

    EventSliceCli.main(Array(
      "--parquet-dir", out, "--run-id", "REF_L:1",
      "--interval", "60", "--output", s"$slice/counts"))

    // pulses at 0/60/120 s; events: pulse0 -> 2 events, pulse1 -> 1, pulse2 -> 1
    // absolute = pulse_time + offset/1e6 (offsets ~ms), so intervals 0,1,2
    val counts = spark.read.parquet(s"$slice/counts")
      .orderBy("interval")
      .select("interval", "event_count")
      .as[(Long, Long)].collect().toSeq
    assert(counts === Seq((0L, 2L), (1L, 1L), (2L, 1L)))
  }
}
