package graft.cli

import java.nio.file.Files

import graft.SparkSuite

/** Drives both CLI mains end-to-end: raw frames -> ConvertCli -> typed
  * tables -> EventSliceCli -> interval counts, like a user switching from
  * the reference's `nexus-processor` + spark-submit workflow.
  */
class CliSpec extends SparkSuite {
  import spark.implicits._

  /** One-run input fixture in a fresh temp dir (the landing-zone layout
    * ConvertCli reads) — built per test so output dirs never collide.
    * `extraBanks` adds a second event bank plus an error bank for the
    * EventSliceCli flag-matrix cases (kept OFF for the ConvertCli cases,
    * whose --max-events counts assume a single bank). */
  private def writeFixture(extraBanks: Boolean = false): String = {
    val in = Files.createTempDirectory("graft_cli_in").toString
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
    val bank1 = ("REF_L", 1L, "bank1", Seq(1L, 2L, 3L, 4L),
      Seq(1000.0, 2000.0, 3000.0, 4000.0), Seq(0L, 2L, 3L))
    val banks =
      if (!extraBanks) Seq(bank1)
      else Seq(bank1,
        // two pulse-0 events on a second bank; an error bank that the
        // default error-exclusion must drop
        ("REF_L", 1L, "bank2", Seq(5L, 6L), Seq(1500.0, 2500.0), Seq(0L)),
        ("REF_L", 1L, "bank_error_events", Seq(7L), Seq(1800.0), Seq(0L)))
    banks
      .toDF("instrument_id", "run_number", "bank", "event_ids",
        "event_offsets", "event_index")
      .write.parquet(s"$in/event_banks")
    in
  }

  /** Converted tables (events+users included) for the EventSliceCli
    * matrix, plus a scratch dir for its outputs. */
  private def convertedWithBanks(): (String, String) = {
    val in = writeFixture(extraBanks = true)
    val out = Files.createTempDirectory("graft_cli_conv").toString
    ConvertCli.run(spark, ConvertCli.parseArgs(
      Array(in, "-o", out, "--include-events", "--include-users")).toOption.get)
    (out, Files.createTempDirectory("graft_cli_slice_out").toString)
  }

  private def exists(path: String): Boolean =
    Files.exists(java.nio.file.Paths.get(path))

  // ---- reference behavior matrix (tests/test_cli.py:62-340), one case
  // ---- per reference test class

  test("parseArgs: defaults, short flags, missing input, unknown option") {
    // TestCliBasicUsage: missing argument and default output dir
    assert(ConvertCli.parseArgs(Array.empty).swap.exists(_.contains("Missing argument")))
    assert(ConvertCli.parseArgs(Array("--include-events")).isLeft)
    assert(ConvertCli.parseArgs(Array("/data/in")).exists(
      _.outputDir == "/data/in/parquet_output"))
    // short forms parse like the long ones
    val short = ConvertCli.parseArgs(Array("/d", "-o", "/out", "-m", "7")).toOption.get
    assert(short.outputDir == "/out" && short.maxEvents.contains(7))
    assert(ConvertCli.parseArgs(Array("/d", "--bogus")).swap.exists(
      _.contains("unknown option")))
    assert(ConvertCli.parseArgs(Array("/d", "-o")).swap.exists(
      _.contains("needs a value")))
  }

  test("events and users are excluded by default; partition cols everywhere") {
    // TestCliEventOptions.test_events_excluded_by_default +
    // TestCliUserOptions.test_users_excluded_by_default +
    // TestCliPartitionColumns
    val in = writeFixture()
    val out = Files.createTempDirectory("graft_cli_dflt").toString
    val written = ConvertCli.run(spark,
      ConvertCli.parseArgs(Array(in, "-o", out)).toOption.get)
    assert(!written.contains("events") && !written.contains("event_summary") &&
      !written.contains("users"))
    assert(!exists(s"$out/events") && !exists(s"$out/event_summary") &&
      !exists(s"$out/users"))
    assert(written.keySet === Set("experiment_runs", "sample", "instrument",
      "software", "daslogs"))
    // every written table carries the partition columns, run_id = inst:run
    written.values.foreach { p =>
      val df = spark.read.parquet(p)
      assert(df.columns.contains("instrument_id") && df.columns.contains("run_id"),
        s"$p missing partition columns")
      assert(df.select("run_id").distinct().as[String].collect().toSeq ===
        Seq("REF_L:1"))
    }
  }

  test("include/exclude flag precedence: the last flag wins") {
    // TestCliEventOptions.test_include_events_flag / test_no_events_explicit_flag
    // and the click-style pair semantics for combined flags
    val in = writeFixture()
    val out1 = Files.createTempDirectory("graft_cli_prec1").toString
    val w1 = ConvertCli.run(spark, ConvertCli.parseArgs(
      Array(in, "-o", out1, "--include-events", "--no-events")).toOption.get)
    assert(!w1.contains("events"), "--no-events after --include-events must win")
    val out2 = Files.createTempDirectory("graft_cli_prec2").toString
    val w2 = ConvertCli.run(spark, ConvertCli.parseArgs(
      Array(in, "-o", out2, "--no-events", "--include-events")).toOption.get)
    assert(w2.contains("events"), "--include-events after --no-events must win")
    assert(spark.read.parquet(w2("events")).count() === 4)
  }

  test("users opt-in writes the users table with its data") {
    // TestCliUserOptions.test_include_users_flag
    val in = writeFixture()
    val out = Files.createTempDirectory("graft_cli_users").toString
    val w = ConvertCli.run(spark, ConvertCli.parseArgs(
      Array(in, "-o", out, "--include-users")).toOption.get)
    assert(w.contains("users") && !w.contains("events"))
    val users = spark.read.parquet(w("users"))
    assert(users.select("name").as[String].collect().toSeq === Seq("Ada"))
  }

  test("--max-events truncates each bank (long and short form)") {
    // TestCliEventOptions.test_max_events_option +
    // TestCliOutputOptions.test_short_max_events_option +
    // TestCliCombinedOptions.test_include_events_with_max_limit
    val in = writeFixture()
    val out2 = Files.createTempDirectory("graft_cli_max2").toString
    ConvertCli.run(spark, ConvertCli.parseArgs(
      Array(in, "-o", out2, "--include-events", "--max-events", "2")).toOption.get)
    assert(spark.read.parquet(s"$out2/events").count() === 2)
    val out1 = Files.createTempDirectory("graft_cli_max1").toString
    ConvertCli.run(spark, ConvertCli.parseArgs(
      Array(in, "-o", out1, "--include-events", "-m", "1")).toOption.get)
    assert(spark.read.parquet(s"$out1/events").count() === 1)
  }

  test("completion report prints directory, file count, and KB/MB sizes") {
    // TestCliOutputMessages: "Processing complete!", "Output directory:",
    // "Files created:", and a KB/MB size per table
    val in = writeFixture()
    val out = Files.createTempDirectory("graft_cli_msg").toString
    val written = ConvertCli.run(spark,
      ConvertCli.parseArgs(Array(in, "-o", out)).toOption.get)
    val buf = new java.io.ByteArrayOutputStream()
    ConvertCli.printSummary(written, out,
      spark.sparkContext.hadoopConfiguration, new java.io.PrintStream(buf))
    val text = buf.toString("UTF-8")
    assert(text.contains("Processing complete!"))
    assert(text.contains(s"Output directory: $out"))
    assert(text.contains(s"Files created: ${written.size}"))
    assert(text.contains("KB") || text.contains("MB"))
    // every table appears with a nonzero size
    written.keys.foreach(t => assert(text.contains(s"  $t: "), s"missing $t"))
    assert(!text.contains("(0.0 KB)"), "sizes must be real, not zero")
  }

  test("combined --include-events --include-users writes both") {
    // TestCliCombinedOptions.test_include_both_events_and_users
    val in = writeFixture()
    val out = Files.createTempDirectory("graft_cli_both").toString
    val w = ConvertCli.run(spark, ConvertCli.parseArgs(
      Array(in, "-o", out, "--include-events", "--include-users")).toOption.get)
    assert(w.contains("events") && w.contains("event_summary") &&
      w.contains("users"))
  }

  // ---- EventSliceCli flag matrix (the reference script's full surface:
  // ---- --interval | --start/--end, --time-log fallback, --bank,
  // ---- --by-bank, error-bank default exclusion)

  test("EventSliceCli --start/--end window aggregation") {
    val (conv, sliceDir) = convertedWithBanks()
    // events at abs ~0.001/0.002/60.003/120.004 (bank1) + 0.0015/0.0025
    // (bank2); error bank excluded by default -> [0, 100) holds 5
    EventSliceCli.main(Array("--parquet-dir", conv, "--run-id", "REF_L:1",
      "--start", "0", "--end", "100", "--output", s"$sliceDir/win"))
    val row = spark.read.parquet(s"$sliceDir/win")
      .select("event_count", "n_banks").as[(Long, Long)].collect().head
    assert(row === ((5L, 2L)))
  }

  test("EventSliceCli --bank filters to one bank") {
    val (conv, sliceDir) = convertedWithBanks()
    EventSliceCli.main(Array("--parquet-dir", conv, "--run-id", "REF_L:1",
      "--interval", "60", "--bank", "bank2", "--output", s"$sliceDir/b2"))
    val rows = spark.read.parquet(s"$sliceDir/b2")
      .select("interval", "event_count").as[(Long, Long)].collect().toSeq
    assert(rows === Seq((0L, 2L)))
  }

  test("EventSliceCli --by-bank groups per (interval, bank)") {
    val (conv, sliceDir) = convertedWithBanks()
    EventSliceCli.main(Array("--parquet-dir", conv, "--run-id", "REF_L:1",
      "--interval", "60", "--by-bank", "--output", s"$sliceDir/bb"))
    val rows = spark.read.parquet(s"$sliceDir/bb")
      .select("interval", "bank", "event_count")
      .as[(Long, String, Long)].collect().toSet
    assert(rows === Set((0L, "bank1", 2L), (0L, "bank2", 2L),
      (1L, "bank1", 1L), (2L, "bank1", 1L)))
    // the error bank never appears without --include-error-events
    assert(!rows.exists(_._2.contains("error")))
  }

  test("EventSliceCli --include-error-events restores excluded banks") {
    val (conv, sliceDir) = convertedWithBanks()
    EventSliceCli.main(Array("--parquet-dir", conv, "--run-id", "REF_L:1",
      "--interval", "60", "--by-bank", "--include-error-events",
      "--output", s"$sliceDir/err"))
    val banks = spark.read.parquet(s"$sliceDir/err")
      .select("bank").as[String].collect().toSet
    assert(banks === Set("bank1", "bank2", "bank_error_events"))
  }

  test("EventSliceCli --time-log falls back to the alternates") {
    val (conv, sliceDir) = convertedWithBanks()
    // a log name absent from daslogs: the reference's fallback chain
    // lands on proton_charge, so results equal the default run
    EventSliceCli.main(Array("--parquet-dir", conv, "--run-id", "REF_L:1",
      "--interval", "60", "--time-log", "no_such_log",
      "--output", s"$sliceDir/fb"))
    EventSliceCli.main(Array("--parquet-dir", conv, "--run-id", "REF_L:1",
      "--interval", "60", "--output", s"$sliceDir/dflt"))
    def read(p: String) = spark.read.parquet(p)
      .select("interval", "event_count").as[(Long, Long)].collect().toSet
    assert(read(s"$sliceDir/fb") === read(s"$sliceDir/dflt"))
    assert(read(s"$sliceDir/fb") === Set((0L, 4L), (1L, 1L), (2L, 1L)))
  }

  test("EventSliceCli rejects missing required arguments") {
    intercept[IllegalArgumentException] {
      EventSliceCli.main(Array("--parquet-dir", "/tmp/x"))
    }
    intercept[IllegalArgumentException] {
      // run-id present but neither --interval nor --start/--end
      EventSliceCli.main(Array("--parquet-dir", "/tmp/x", "--run-id", "a:1"))
    }
  }

  test("ConvertCli then EventSliceCli round-trip") {
    val in = writeFixture()
    val out = Files.createTempDirectory("graft_cli_out").toString
    val slice = Files.createTempDirectory("graft_cli_slice").toString

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
