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
    * (spark_events_by_time.py:49-96) against the in-repo table format. */
  def registerIcebergWarehouse(spark: SparkSession, warehouseDir: String): Unit =
    graft.etl.NexusSchemas.byTable.keys.foreach { t =>
      val dir = s"$warehouseDir/$t"
      if (new java.io.File(s"$dir/metadata/version-hint.text").exists())
        registerIcebergTable(spark, t, dir)
    }

  /** Register ONE IcebergLite table as a SQL name. In a session built
    * with `spark.sql.extensions=graft.GraftExtensions` the view is a
    * planning-time scan node ([[graft.plans.IcebergScanNode]]): a SQL
    * `WHERE` file-skips through manifest bounds / partition transforms /
    * Bloom sidecars exactly like the [[graft.sources.IcebergLite.readTableWhere]]
    * API, every query reads the table's CURRENT snapshot, and
    * `FOR VERSION AS OF` / `FOR TIMESTAMP AS OF` time-travel. Without
    * the extensions the view falls back to a materialized full read of
    * the snapshot as of registration (no file skipping, no time travel
    * — the pre-r15 behavior). */
  def registerIcebergTable(spark: SparkSession, name: String,
                           tableDir: String): Unit =
    if (spark.conf.get("spark.sql.extensions", "")
        .contains("graft.GraftExtensions")) {
      org.apache.spark.sql.GraftPlanShim
        .ofRows(spark, graft.plans.IcebergScanNode.forTable(spark, tableDir))
        .createOrReplaceTempView(name)
      graft.plans.IcebergSqlTables.put(spark, name, tableDir)
      // the operational metadata tables ride along as `<name>__<kind>`
      // views (temp-view names can't carry Iceberg's `$`), resolved
      // per query like the data view
      Seq("snapshots", "manifests", "files", "partitions", "refs",
          "history").foreach { kind =>
        org.apache.spark.sql.GraftPlanShim
          .ofRows(spark,
            graft.plans.IcebergScanNode.forMetaTable(spark, tableDir, kind))
          .createOrReplaceTempView(s"${name}__$kind")
      }
    } else
      graft.sources.IcebergLite.readTable(spark, tableDir)
        .createOrReplaceTempView(name)
}
