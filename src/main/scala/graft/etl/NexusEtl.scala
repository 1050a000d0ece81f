package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-level ETL building blocks mirroring the reference's conversion
  * core (src/nexus_processor/parquet.py + schemas.py helpers), expressed
  * as Catalyst expressions so they stay inside whole-stage codegen — no
  * Python/Scala UDFs in the hot path.
  */
object NexusEtl {

  /** run_id = instrument_id:run_number (parquet.py:126 make_run_id). */
  def runId(instrumentId: Column, runNumber: Column): Column =
    concat_ws(":", instrumentId, runNumber.cast("string"))

  /** Add the composite key + partition columns to any record batch. */
  def withRunKeys(df: DataFrame, instrumentId: Column, runNumber: Column): DataFrame =
    df.withColumn("instrument_id", instrumentId)
      .withColumn("run_number", runNumber.cast("long"))
      .withColumn("run_id", runId(instrumentId, runNumber))

  /** Numeric coercion of mixed-type log values (schemas.py:302
    * try_parse_numeric): parseable strings become double, everything else
    * null — `try_cast`, not a UDF, so it vectorizes and pushes into
    * codegen.
    */
  def valueNumeric(value: Column): Column =
    value.try_cast("double")

  /** String normalization (schemas.py:324 normalize_to_string):
    * arrays/maps/structs -> JSON, scalars -> cast string. */
  def normalizeToString(df: DataFrame, colName: String): Column = {
    import org.apache.spark.sql.types._
    df.schema(colName).dataType match {
      case _: ArrayType | _: MapType | _: StructType => to_json(col(colName))
      case StringType => col(colName)
      case _ => col(colName).cast("string")
    }
  }

  /** Build a string->string attribute map from prefixed columns
    * (schemas.py:346 build_attribute_map): keeps columns starting with
    * `prefix`, strips the prefix from the key.
    */
  def attributeMap(df: DataFrame, prefix: String): Column = {
    val entries = df.columns.filter(_.startsWith(prefix)).map { c =>
      struct(lit(c.stripPrefix(prefix)).as("key"),
             normalizeToString(df, c).as("value"))
    }
    if (entries.isEmpty) typedLit(Map.empty[String, String])
    else map_from_entries(array(entries.toIndexedSeq: _*))
  }

  /** Everything NOT in `known` packed into additional_fields
    * (schemas.py:367 extract_known_fields).
    */
  def additionalFieldsMap(df: DataFrame, known: Seq[String]): Column = {
    val extra = df.columns.filterNot(c =>
      known.contains(c) || c.startsWith("file_attr_") || c.startsWith("entry_attr_"))
    if (extra.isEmpty) typedLit(Map.empty[String, String])
    else map_from_entries(array(extra.toIndexedSeq.map(c =>
      struct(lit(c).as("key"), normalizeToString(df, c).as("value"))): _*))
  }

  /** DASlogs array->row explode (parquet.py:288-400 extract_daslogs): one
    * input row per (run, log) with `time`/`value` series ARRAYS becomes
    * one output row per time point, entirely executor-side:
    *
    *  - logs with no `time` array fall back to `veto_pulse_time` with a
    *    constant 1.0 pulse indicator (the reference's Veto_pulse special
    *    case, parquet.py:346-348);
    *  - unequal array lengths truncate to the shorter
    *    (`n_points = min(len(times), len(values))`, parquet.py:366);
    *  - logs with no series at all survive as ONE metadata-only row with
    *    null time/value (parquet.py:387-398) — `explode_outer`, so the
    *    log's device metadata is never dropped.
    *
    * The reference builds these rows in a per-file python loop on one
    * machine; here the explode is a Generate over the array columns, so a
    * million-point log never leaves its executor and thousands of logs
    * fan out in parallel.
    */
  def explodeDaslogs(logs: DataFrame, timeCol: String = "time",
                     valueCol: String = "value",
                     vetoCol: String = "veto_pulse_time"): DataFrame = {
    import org.apache.spark.sql.types.ArrayType
    val hasVeto = logs.columns.contains(vetoCol)
    val valueElem = logs.schema(valueCol).dataType
      .asInstanceOf[ArrayType].elementType
    val tRaw = if (hasVeto) coalesce(col(timeCol), col(vetoCol)) else col(timeCol)
    val vRaw = if (hasVeto)
        when(col(timeCol).isNull && col(vetoCol).isNotNull,
          array_repeat(lit(1.0).cast(valueElem), size(col(vetoCol))))
          .otherwise(col(valueCol))
      else col(valueCol)
    val n = least(size(tRaw), size(vRaw))
    val zipped = when(tRaw.isNotNull && vRaw.isNotNull,
      arrays_zip(slice(tRaw, lit(1), n), slice(vRaw, lit(1), n)))
    val out = logs
      .withColumn("__pt", explode_outer(zipped))
      .withColumn(timeCol, col("__pt").getField("0").cast("double"))
      .withColumn(valueCol, col("__pt").getField("1"))
      .drop("__pt")
    if (hasVeto) out.drop(vetoCol) else out
  }

  /** DASlogs normalization (parquet.py:672-693): string-encode the raw
    * value, derive value_numeric, keep per-log aggregate stats columns.
    */
  def normalizeDaslogs(df: DataFrame, valueCol: String): DataFrame =
    df.withColumn("value_numeric", valueNumeric(col(valueCol)))
      .withColumn(valueCol, normalizeToString(df, valueCol))

  /** Per-log aggregate stats over the time series (parquet.py:288-400
    * captures average/min/max per log; here computed distributively with
    * map-side partial aggregation instead of per-file python loops).
    */
  def daslogStats(daslogs: DataFrame, keys: Seq[String]): DataFrame =
    daslogs.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n_points"),
      avg(col("value_numeric")).as("average_value"),
      min(col("value_numeric")).as("min_value"),
      max(col("value_numeric")).as("max_value"))

  /** Per-bank event summary (parquet.py:760-779 _save_events): one row per
    * bank with totals. One shuffle on (run, bank).
    *
    * n_pulses follows the reference (`n_pulses = len(event_index)`,
    * parquet.py:714): the length of the bank's pulse-index array, supplied
    * via `nPulsesPerBank` keyed by (runKeys, bankCol). Inferring it from
    * observed event pulse indices undercounts trailing pulses with no
    * events (and a bank whose only event sits at pulse 4 would report 5);
    * the inference remains only as a documented lower-bound fallback when
    * no bank table is available.
    *
    * When `nPulsesPerBank` is given, the BANKS frame drives the output:
    * every bank yields a summary row even with zero extracted events
    * (the reference stores `events: 0, total_counts: 0` rows —
    * parquet.py:491-496, n_pulses = len(event_index) with no events).
    */
  def eventSummary(events: DataFrame, runKeys: Seq[String], bankCol: String,
                   pulseCol: String,
                   nPulsesPerBank: Option[DataFrame] = None): DataFrame = {
    val counts = events.groupBy((runKeys :+ bankCol).map(col): _*).agg(
      count(lit(1)).as("events_extracted"),
      count(lit(1)).as("total_counts"),
      (max(col(pulseCol)) + 1).as("__n_pulses_observed"))
    nPulsesPerBank match {
      case Some(banks) =>
        banks.join(counts.drop("__n_pulses_observed"),
            runKeys :+ bankCol, "left")
          .withColumn("events_extracted",
            coalesce(col("events_extracted"), lit(0L)))
          .withColumn("total_counts",
            coalesce(col("total_counts"), lit(0L)))
      case None =>
        counts.withColumnRenamed("__n_pulses_observed", "n_pulses")
    }
  }

  /** The (runKeys, bankCol, n_pulses) frame for [[eventSummary]] from the
    * raw bank rows: n_pulses = size(event_index).
    */
  def nPulsesFromBanks(banks: DataFrame, runKeys: Seq[String], bankCol: String,
                       eventIndexCol: String): DataFrame =
    banks.select((runKeys :+ bankCol).map(col) :+
      size(col(eventIndexCol)).cast("long").as("n_pulses"): _*)

  /** Map event positions to pulse indices given per-pulse start offsets
    * (parquet.py:463-471: event_index[i] is the first event of pulse i).
    * Input: one row per (bank) with array columns. Output: one row per
    * event with pulse_index attached — the explode is distributed, the
    * per-bank arrays never hit the driver.
    */
  def explodeEventsWithPulseIndex(
      banks: DataFrame,
      eventIdsCol: String,
      eventOffsetsCol: String,
      eventIndexCol: String): DataFrame = {
    // intervals: (pulse_idx, start, end) from consecutive event_index entries
    val withIntervals = banks.withColumn(
      "__pulse_span",
      expr(s"""transform(`$eventIndexCol`, (s, i) ->
               named_struct(
                 'pulse_index', CAST(i AS LONG),
                 'start', s,
                 'end', coalesce(try_element_at(`$eventIndexCol`, i + 2),
                                 size(`$eventIdsCol`))))"""))
    withIntervals
      .withColumn("__span", explode(col("__pulse_span")))
      .withColumn("__pos", explode(expr("CASE WHEN __span.end > __span.start THEN sequence(__span.start, __span.end - 1) ELSE array() END")))
      .withColumn("event_idx", col("__pos").cast("long"))
      .withColumn("pulse_index", col("__span.pulse_index"))
      .withColumn("event_id", expr(s"try_element_at(`$eventIdsCol`, CAST(__pos + 1 AS INT))"))
      .withColumn("time_offset", expr(s"try_element_at(`$eventOffsetsCol`, CAST(__pos + 1 AS INT))"))
      .withColumn("event_weight", lit(1.0))
      .drop("__pulse_span", "__span", "__pos", eventIdsCol, eventOffsetsCol, eventIndexCol)
  }

  /** Write a typed table the way the reference does (parquet.py:68-87 +
    * cli.py:50 --max-events-per-file): ZSTD parquet, partitioned by the
    * composite key, chunked into bounded files. Routing metadata that the
    * reference embeds in the parquet footer (`iceberg_table`) is written
    * as a sidecar `_routing.json`, since Spark's parquet writer does not
    * expose footer key-value metadata; IcebergRouting reads both.
    */
  def writeTable(
      df: DataFrame,
      path: String,
      icebergTable: String,
      partitionByRun: Boolean = true,
      maxRecordsPerFile: Long = 5000000L): Unit = {
    val w = df.write.mode("overwrite")
      .option("compression", "zstd")
      .option("maxRecordsPerFile", maxRecordsPerFile)
    val w2 = if (partitionByRun && df.columns.contains("instrument_id") &&
                 df.columns.contains("run_number"))
               w.partitionBy("instrument_id", "run_number")
             else w
    w2.parquet(path)
    IcebergRouting.writeSidecar(path, icebergTable)
  }
}
