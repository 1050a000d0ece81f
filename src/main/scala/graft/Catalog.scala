package graft

import org.apache.spark.sql.SparkSession

/** SQL-first entry point: register every testdata/ETL table as a temp view
  * so users can work in plain `spark.sql` on top of the same engine
  * (the reference's users drive its Spark layer the same way through the
  * lakehouse catalog).
  */
object Catalog {

  /** Register all tables from a scale-factor directory as temp views. */
  def registerTables(spark: SparkSession, dir: String): Unit =
    Tables.AllTables.foreach { t =>
      Tables.load(spark, dir, t).createOrReplaceTempView(t)
    }

  /** Register the outputs of a NexusPipeline/ConvertCli run (the 8 typed
    * tables) as temp views named by their routing table names.
    */
  def registerEtlOutput(spark: SparkSession, outDir: String): Unit =
    graft.etl.NexusSchemas.byTable.keys.foreach { t =>
      val path = s"$outDir/$t"
      if (new java.io.File(path).exists())
        spark.read.parquet(path).createOrReplaceTempView(t)
    }

  /** Register an IcebergLite warehouse
    * ([[graft.etl.NexusPipeline.processAndWriteIceberg]] output) as temp
    * views — the reference's `spark.read.table` route
    * (spark_events_by_time.py:49-96) against the in-repo table format:
    * reads resolve through version-hint → metadata → manifests, so a
    * registered view always sees the table's CURRENT snapshot as of
    * registration. */
  def registerIcebergWarehouse(spark: SparkSession, warehouseDir: String): Unit =
    graft.etl.NexusSchemas.byTable.keys.foreach { t =>
      val dir = s"$warehouseDir/$t"
      if (new java.io.File(s"$dir/metadata/version-hint.text").exists())
        graft.sources.IcebergLite.readTable(spark, dir)
          .createOrReplaceTempView(t)
    }
}
