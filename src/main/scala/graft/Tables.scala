package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's synthetic parquet tables plus the session
  * settings every entry point (Verify / Bench / tests) must share.
  *
  * Scale notes: these tables are single parquet files locally, but nothing
  * here assumes that — `spark.read.parquet` over a directory of thousands
  * of files behaves identically, and all downstream operators rely on
  * Catalyst pushdown (filters / column pruning reach the scan) rather than
  * any local-file assumption.
  */
object Tables {

  /** Config applied to every SparkSession the library creates.
    *
    * - `nanosAsLong`: the `events` table carries TIMESTAMP(NANOS) which
    *   Spark 4 does not model natively; reading it as epoch-nanos Long is
    *   lossless and keeps event-time arithmetic in exact integer math.
    * - UTC session timezone so TIMESTAMP_NTZ/LTZ conversions never depend
    *   on host timezone.
    */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.parquet.compression.codec", "zstd")
    .config("spark.sql.adaptive.enabled", "true")

  def load(spark: SparkSession, dir: String, table: String): DataFrame =
    spark.read.parquet(s"$dir/$table.parquet")

  val AllTables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")
}
