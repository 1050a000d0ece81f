package graft.cli

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.etl.NexusPipeline

/** Conversion CLI — the reference's `nexus-processor` entry point
  * (cli.py:17-66) re-expressed over the distributed pipeline. Instead of
  * one HDF5 file, the input is a directory of per-concern parquet frames
  * (metadata/ sample/ instrument/ software/ users/ daslogs/ event_banks/ —
  * any upstream reader's landing zone), and the output is the 8 typed
  * tables for every run in the input at once.
  *
  * Usage: runMain graft.cli.ConvertCli INPUT_DIR
  *   [--output-dir DIR] [--include-events|--no-events]
  *   [--include-users|--no-users] [--max-events N] [--max-events-per-file N]
  */
object ConvertCli {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { System.err.println("usage: ConvertCli INPUT_DIR [options]"); sys.exit(2) }
    val inputDir = args(0)
    var outputDir = s"$inputDir/parquet_output"
    var includeEvents = false
    var includeUsers = false
    var maxEvents: Option[Int] = None
    var maxEventsPerFile = 5000000L
    var i = 1
    while (i < args.length) {
      args(i) match {
        case "--output-dir" | "-o" => outputDir = args(i + 1); i += 2
        case "--include-events" => includeEvents = true; i += 1
        case "--no-events" => includeEvents = false; i += 1
        case "--include-users" => includeUsers = true; i += 1
        case "--no-users" => includeUsers = false; i += 1
        case "--max-events" | "-m" => maxEvents = Some(args(i + 1).toInt); i += 2
        case "--max-events-per-file" => maxEventsPerFile = args(i + 1).toLong; i += 2
        case other => System.err.println(s"unknown option: $other"); sys.exit(2)
      }
    }

    val preexisting = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession).isDefined
    val spark = Tables.configure(SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def in(name: String) = spark.read.parquet(s"$inputDir/$name")

    // --max-events: truncate each bank's arrays (cli.py --max-events)
    val banks0 = in("event_banks")
    val banks = maxEvents.fold(banks0) { m =>
      banks0
        .withColumn("event_ids", expr(s"slice(event_ids, 1, $m)"))
        .withColumn("event_offsets", expr(s"slice(event_offsets, 1, $m)"))
        .withColumn("event_index", expr(s"filter(event_index, x -> x < $m)"))
    }

    val bundle = NexusPipeline.RunBundle(
      metadata = in("metadata"), sample = in("sample"),
      instrument = in("instrument"), software = in("software"),
      users = in("users"), daslogs = in("daslogs"), eventBanks = banks)

    val tables = NexusPipeline.processRuns(spark, bundle)
      .filter { case (name, _) =>
        (includeEvents || (name != "events" && name != "event_summary")) &&
        (includeUsers || name != "users")
      }
    val written = tables.map { case (table, df) =>
      val path = s"$outputDir/$table"
      graft.etl.NexusEtl.writeTable(df, path, table,
        partitionByRun = true, maxRecordsPerFile = maxEventsPerFile)
      table -> path
    }

    println("\nProcessing complete!")
    println(s"Output directory: $outputDir")
    println(s"Tables created: ${written.size}")
    written.toSeq.sortBy(_._1).foreach { case (t, p) => println(s"  $t: $p") }
    if (!preexisting) spark.stop()
  }
}
