package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed co-located joins: pre-shuffle both sides of a recurring join
  * into the same bucket layout so the join itself needs NO exchange.
  *
  * This is the 100 TB answer for fact-to-fact joins that run repeatedly
  * (e.g. events ⋈ pulse-times per run, lineitem ⋈ orders): pay the
  * shuffle once at write time, then every subsequent join on the bucket
  * key is exchange-free — each task reads matching buckets from both
  * sides. AQE cannot remove a shuffle it doesn't know is redundant;
  * bucketing encodes the co-location in the table layout itself.
  *
  * Spark's bucketing rides the session catalog (`bucketBy` requires
  * `saveAsTable`), so these helpers work in table space rather than raw
  * paths.
  */
object Bucketing {

  /** Persist `df` bucketed (and sorted) by `keys` into `numBuckets`. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    numBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .option("compression", "zstd")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket keys. When both were
    * written with [[writeBucketed]] on the same keys and bucket count the
    * physical plan contains no Exchange (verify with
    * `joinBucketed(...).queryExecution.executedPlan`).
    */
  def joinBucketed(spark: SparkSession, left: String, right: String,
                   keys: Seq[String]): DataFrame =
    spark.table(left).join(spark.table(right), keys)
}
