package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL corpus ingest/egress — the de-facto interchange format for
  * LLM training corpora (one JSON document per line). Wraps Spark's
  * built-in json source with the corpus conventions the rest of the
  * engine assumes: an explicit contract schema (schema inference over
  * 100 TB means a full extra pass and nondeterministic field sets —
  * never infer at scale), PERMISSIVE parsing with the malformed lines
  * RETAINED in a `_corrupt_record` audit column (a crawl drop should be
  * a counted decision, not a silent parser loss), and a deterministic
  * content-hash shard assignment on write (the downstream trainer's
  * shard membership must be reproducible across writes — Spark's
  * default round-robin file packing is partitioning-dependent).
  *
  * At 100 TB: reading JSONL is a line-splittable scan (gzip'd inputs
  * are NOT splittable — store jsonl uncompressed or zstd-framed, or
  * convert to parquet with [[toParquet]] at first touch, which also
  * buys column pruning for every later pass); the sharded write
  * shuffles once on the shard key.
  */
object CorpusIO {

  /** The minimal corpus contract: a stable document id and the text. */
  val DocSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  /** Read a JSONL corpus under an explicit contract schema. Extra
    * fields ride along when passed in `extra`; malformed lines survive
    * as rows whose `_corrupt_record` holds the raw line and whose
    * contract columns are NULL.
    */
  def readJsonlDocs(spark: SparkSession, path: String,
                    extra: Seq[StructField] = Nil): DataFrame = {
    val schema = StructType(
      (DocSchema.fields ++ extra) :+
        StructField("_corrupt_record", StringType))
    spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
  }

  /** The malformed-line audit. Projects a contract column alongside the
    * raw line: Spark refuses a raw-file query whose required schema is
    * ONLY the corrupt-record column (it would have to re-parse the file
    * just for the audit), and the extra NULL column costs nothing.
    */
  def corruptRecords(docs: DataFrame): DataFrame =
    docs.filter(col("_corrupt_record").isNotNull)
      .select(col("doc_id"), col("_corrupt_record").as("raw_line"))

  /** The well-formed corpus (audit column dropped).
    *
    * Engine note: Spark refuses raw-file queries whose required schema
    * prunes down to ONLY the corrupt-record column — e.g. a bare
    * `validDocs(df).count()` (the filter is the only column reference
    * left). Use [[ingestStats]] for counts, or cache the parsed frame
    * (Spark's documented contract) before audit-only aggregates.
    */
  def validDocs(docs: DataFrame): DataFrame =
    docs.filter(col("_corrupt_record").isNull).drop("_corrupt_record")

  /** One-pass ingest audit: total lines, lines with a document id, and
    * malformed lines. References a contract column alongside the audit
    * column, so it stays clear of the raw-file corrupt-only-schema
    * restriction without caching.
    */
  def ingestStats(docs: DataFrame): DataFrame =
    docs.agg(
      count(lit(1)).as("n_lines"),
      count(col("doc_id")).as("n_with_id"),
      sum(when(col("_corrupt_record").isNotNull, 1L).otherwise(0L))
        .as("n_corrupt"))

  /** Deterministic sharded JSONL write: shard = xxhash64(id) mod
    * nShards, written as `shard=N/` partition directories — membership
    * depends only on ids, so rewriting the same corpus (any input
    * partitioning, any cluster size) reproduces the same shards.
    * One shuffle on the shard key.
    */
  def writeJsonlSharded(docs: DataFrame, path: String, nShards: Int,
                        idCol: String = "doc_id"): Unit = {
    require(nShards > 0, "nShards must be positive")
    docs
      .withColumn("shard", pmod(xxhash64(col(idCol)), lit(nShards.toLong)))
      .repartition(nShards, col("shard"))
      .write.mode("overwrite")
      .partitionBy("shard")
      .json(path)
  }

  /** Read back a sharded JSONL corpus (the `shard` partition column is
    * restored from the directory names by the source).
    */
  def readJsonlSharded(spark: SparkSession, path: String,
                       extra: Seq[StructField] = Nil): DataFrame = {
    val schema = StructType(
      (DocSchema.fields ++ extra) :+ StructField("shard", LongType))
    spark.read.schema(schema).json(path)
  }

  /** One-touch JSONL → parquet conversion (zstd via the session conf):
    * the first thing to do to a large JSONL drop — every later pass
    * then gets column pruning, predicate pushdown, and real splits.
    */
  def toParquet(spark: SparkSession, jsonlPath: String, parquetPath: String,
                extra: Seq[StructField] = Nil): Long = {
    val docs = validDocs(readJsonlDocs(spark, jsonlPath, extra))
    docs.write.mode("overwrite").parquet(parquetPath)
    spark.read.parquet(parquetPath).count()
  }
}
