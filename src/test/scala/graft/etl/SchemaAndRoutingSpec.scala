package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.types.{DoubleType, LongType, MapType, StringType}

import graft.SparkSuite

class SchemaAndRoutingSpec extends SparkSuite {
  import spark.implicits._

  test("all eight table schemas carry the composite partition key (schemas.py:22-215)") {
    NexusSchemas.byTable.values.foreach { s =>
      assert(s.fieldNames.take(3).toSeq === Seq("instrument_id", "run_number", "run_id"))
      assert(s("run_number").dataType === LongType)
    }
    assert(NexusSchemas.byTable.size === 8)
  }

  test("daslogs schema has string value + numeric coercion column") {
    val s = NexusSchemas.daslogs
    assert(s("value").dataType === StringType)
    assert(s("value_numeric").dataType === DoubleType)
    assert(s("average_value").dataType === DoubleType)
  }

  test("metadata schema keeps attribute maps and field descriptions") {
    val s = NexusSchemas.metadata
    assert(s("file_attributes").dataType.isInstanceOf[MapType])
    assert(s("entry_attributes").dataType.isInstanceOf[MapType])
    assert(s("title").metadata.getString("description").nonEmpty)
  }

  test("experiment_runs nests sample/instrument/software/users (schemas.py:163-210)") {
    val s = NexusSchemas.experimentRuns
    assert(s.fieldNames.toSeq.containsSlice(Seq("sample", "instrument", "software", "users")))
  }

  test("fieldsWithoutPartition drops the two partition columns (schemas.py:217)") {
    val fields = NexusSchemas.fieldsWithoutPartition(NexusSchemas.events)
    assert(!fields.exists(f => f.name == "instrument_id" || f.name == "run_number"))
    assert(fields.exists(_.name == "run_id"))
  }

  test("toCreateTableDdl emits partitioned Iceberg DDL (init_neutron_data.py:55-184)") {
    val ddl = NexusSchemas.toCreateTableDdl("daslogs", "lake.neutron")
    assert(ddl.contains("CREATE TABLE IF NOT EXISTS lake.neutron.daslogs"))
    assert(ddl.contains("instrument_id STRING"))
    assert(ddl.contains("run_number BIGINT"))
    assert(ddl.contains("value_numeric DOUBLE"))
    assert(ddl.contains("PARTITIONED BY (instrument_id, run_number)"))
    // nested/map columns render valid SQL types
    assert(NexusSchemas.toCreateTableDdl("experiment_runs")
      .contains("MAP<STRING, STRING>"))
  }

  test("filename routing mirrors ingest_neutron_data.py:75-93") {
    assert(IcebergRouting.fromFilename("run1_metadata.parquet") === Some("experiment_runs"))
    assert(IcebergRouting.fromFilename("run1_daslogs.parquet") === Some("daslogs"))
    assert(IcebergRouting.fromFilename("run1_bank1_events.parquet") === Some("events"))
    assert(IcebergRouting.fromFilename("run1_bank1_events_part003.parquet") === Some("events"))
    assert(IcebergRouting.fromFilename("run1_event_summary.parquet") === Some("event_summary"))
    assert(IcebergRouting.fromFilename("random.parquet") === None)
  }

  test("writeTable emits zstd chunked files + routing sidecar; tableFor resolves it") {
    val dir = Files.createTempDirectory("graft_writer").toString
    val df = (1 to 10).map(i => ("REF_L", 7L, s"REF_L:7", s"b$i")).toDF(
      "instrument_id", "run_number", "run_id", "bank")
    NexusEtl.writeTable(df, dir, "event_summary", partitionByRun = true,
      maxRecordsPerFile = 3)
    // partition directories
    assert(new java.io.File(s"$dir/instrument_id=REF_L/run_number=7").exists())
    // chunking: >1 data file for 10 rows with maxRecordsPerFile=3
    val files = new java.io.File(s"$dir/instrument_id=REF_L/run_number=7")
      .listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length >= 3)
    assert(files.forall(_.getName.contains("zstd")))
    // routing resolves via sidecar
    assert(IcebergRouting.fromSidecar(dir) === Some("event_summary"))
    assert(IcebergRouting.tableFor(s"$dir/_unknown_name.parquet") === Some("event_summary"))
    // round-trip read preserves rows
    assert(spark.read.parquet(dir).count() === 10)
  }
}
