package graft.etl

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._
import scala.util.Try

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

/** Metadata-driven routing of parquet files to lakehouse tables.
  *
  * Mirrors reference lakehouse_scripts/ingest_neutron_data.py:42-131:
  *  1. prefer the `iceberg_table` key embedded in the parquet footer
  *     key-value metadata (the reference writes it in parquet.py:68-87);
  *  2. fall back to filename patterns (`*_daslogs.parquet` -> daslogs, …).
  *
  * Spark's writer cannot embed custom footer metadata, so NexusEtl.writeTable
  * emits a `_routing.json` sidecar per output directory; that is checked
  * between (1) and (2) so round-trips through this library stay
  * metadata-driven rather than name-driven.
  */
object IcebergRouting {

  /** Filename-suffix routing (ingest_neutron_data.py:75-93). Checked in
    * order; `_part\d+` event chunks and bank-named event files all land in
    * `events`.
    */
  val filenamePatterns: Seq[(String, String)] = Seq(
    "_metadata.parquet" -> "experiment_runs",
    "_sample.parquet" -> "sample",
    "_instrument.parquet" -> "instrument",
    "_software.parquet" -> "software",
    "_users.parquet" -> "users",
    "_daslogs.parquet" -> "daslogs",
    "_event_summary.parquet" -> "event_summary",
    "_events.parquet" -> "events")

  private val eventPart = raw".*_events_part\d+\.parquet$$".r
  private val bankEvents = raw".*_(bank\w+|monitor\w*)_events(_part\d+)?\.parquet$$".r

  def fromFilename(name: String): Option[String] = {
    val lower = name.toLowerCase
    filenamePatterns.collectFirst { case (suffix, table) if lower.endsWith(suffix) => table }
      .orElse(if (eventPart.matches(lower) || bankEvents.matches(lower)) Some("events") else None)
  }

  /** Read the `iceberg_table` footer key the reference embeds
    * (ingest_neutron_data.py:62-69). Returns None for files without it.
    */
  def fromFooterMetadata(file: String): Option[String] = Try {
    val in = HadoopInputFile.fromPath(new Path(file), new Configuration())
    val reader = ParquetFileReader.open(in)
    try {
      Option(reader.getFileMetaData.getKeyValueMetaData.asScala.getOrElse("iceberg_table", null))
    } finally reader.close()
  }.toOption.flatten

  def fromSidecar(dir: String): Option[String] = Try {
    val p = Paths.get(dir, "_routing.json")
    if (Files.exists(p)) {
      val s = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      "\"iceberg_table\"\\s*:\\s*\"([^\"]+)\"".r.findFirstMatchIn(s).map(_.group(1))
    } else None
  }.toOption.flatten

  /** Full resolution order: footer metadata, sidecar of the parent dir,
    * filename pattern.
    */
  def tableFor(file: String): Option[String] =
    fromFooterMetadata(file)
      .orElse(fromSidecar(Paths.get(file).getParent.toString))
      .orElse(fromFilename(Paths.get(file).getFileName.toString))

  def writeSidecar(dir: String, icebergTable: String): Unit = {
    val p = Paths.get(dir, "_routing.json")
    Files.createDirectories(p.getParent)
    Files.write(p, s"""{"iceberg_table": "$icebergTable"}""".getBytes(StandardCharsets.UTF_8))
  }
}
