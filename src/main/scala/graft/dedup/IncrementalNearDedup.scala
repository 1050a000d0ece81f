package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Append-only near-dedup MAINTENANCE around [[Dedup.incrementalCandidates]]:
  * the corpus's MinHash signature table is a maintained parquet table, and
  * each arriving batch is folded in by one `ingest` call — shingle the
  * DELTA only, emit exactly the verified pairs that touch it (new-new and
  * new-old; old-old pairs were reported when their batches arrived), then
  * append the delta's signatures to the table. This is the daily-crawl
  * compaction loop at 100 TB: the corpus is never re-shingled, the banding
  * join is |delta| x bucket width, and the signature table grows by
  * appends (at real scale the same appends land in a lakehouse table
  * partitioned on a band-hash prefix; the orchestration is identical).
  *
  * Invariant (inherited from incrementalCandidates): batch ids must be
  * disjoint from every previously ingested id — enforce upstream with the
  * exact-dedup/content-hash stage, which is also what keeps identical
  * re-crawls from re-entering as "new" documents.
  *
  * Streaming front end: `sink(textCol, idCol)(onPairs)` adapts `ingest`
  * to `writeStream.foreachBatch`, so a curateStream output folds into the
  * same maintained table per micro-batch.
  *
  * Reference behavior anchor: the reference has no incremental dedup; this
  * extends its batch semantics (SURVEY §2.5) with the accumulate/compact
  * loop a production crawl pipeline needs.
  */
final class IncrementalNearDedup(
    spark: SparkSession,
    sigPath: String,
    shingleSize: Int = 3,
    numHashes: Int = 64,
    bands: Int = 16,
    minJaccard: Double = 0.5,
    prefilterMargin: Double = 0.2,
    maxBucketSize: Int = Dedup.DefaultMaxBucketSize) {

  private def bandedPath = sigPath + "_banded"

  private def fs = new org.apache.hadoop.fs.Path(sigPath)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def exists(path: String): Boolean =
    fs.exists(new org.apache.hadoop.fs.Path(path))
  private def tableExists: Boolean = exists(sigPath)

  /** `epoch=<value>` child dir names under a table root — one fs listing
    * (metadata only; epoch dirs are one-per-ingested-batch, not
    * one-per-file).
    */
  private def epochDirNames(root: String): Set[String] = {
    val p = new org.apache.hadoop.fs.Path(root)
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).collect {
      case st if st.isDirectory && st.getPath.getName.startsWith("epoch=") =>
        st.getPath.getName
    }.toSet
  }

  /** The maintained corpus signature table, if any batch has been
    * ingested ([[Dedup.signatureTable]] schema: id, sh, minhash_sig).
    * Ingests land as `epoch=<id>` partition dirs (the discovery column is
    * projected away here); the streaming sink overwrites ITS epoch's dir
    * on micro-batch replay, which is what makes the fold exactly-once on
    * this table across checkpoint restarts.
    */
  def corpusSignatures: Option[DataFrame] =
    if (tableExists) Some(spark.read.parquet(sigPath)
      .select("id", "sh", "minhash_sig"))
    else None

  /** The maintained BANDED table `(id, band_id, band_hash)` — the slim
    * 3-column form every fold's candidate join and fat-bucket sizing
    * read. Banding is computed once per delta AT INGEST and appended
    * here (same epoch-dir idempotency as the signatures), so a fold
    * never re-hashes the corpus's signatures: without this table each
    * ingest paid two full corpus banding passes (measured: the 10%-delta
    * fold cost as much as a full-corpus run at 500k docs).
    */
  def corpusBanded: Option[DataFrame] =
    if (exists(bandedPath)) Some(spark.read.parquet(bandedPath)
      .select("id", "band_id", "band_hash"))
    else None

  /** Bring the banded table's epoch set in line with the signature
    * table's before a fold — two fs listings plus work proportional only
    * to the mismatched epochs (zero on the steady-state path):
    *
    *  - ORPHAN banded epochs (present under `_banded`, absent from the
    *    signature table — a crashed batch that was never retried) are
    *    DELETED: their rows would inflate fat-bucket counts and silently
    *    cap healthy buckets forever.
    *  - MISSING banded epochs (signatures present, banded rows absent —
    *    the documented `epoch=legacy/` flat-table migration lands here)
    *    are BACKFILLED from that epoch's signatures. Without this, every
    *    fold's `bandedOld` would silently lack the legacy corpus and
    *    new-vs-legacy duplicate pairs would be permanently missed.
    */
  private def reconcileEpochs(): Unit = {
    val sigEpochs = epochDirNames(sigPath)
    val bandedEpochs = epochDirNames(bandedPath)
    (bandedEpochs -- sigEpochs).foreach { e =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$bandedPath/$e"), true)
    }
    (sigEpochs -- bandedEpochs).foreach { e =>
      val sigs = spark.read.parquet(s"$sigPath/$e")
      Dedup.withBands(sigs.select("id", "minhash_sig"), numHashes, bands)
        .select(col("id"), col("band.band_id").as("band_id"),
          col("band.band_hash").as("band_hash"))
        .write.mode("overwrite").parquet(s"$bandedPath/$e")
    }
  }

  /** Corpus reads for a fold, with the REPLAYED epoch's rows excluded:
    * on a replay (prior attempt wrote both tables, then crashed before
    * the downstream commit) the maintained tables already contain the
    * delta's rows, so folding against the full tables would (a) count
    * the delta's banded rows twice in fat-bucket sizing — falsely
    * capping any bucket whose true size is in (max/2, max] and dropping
    * its pairs — and (b) duplicate the delta ids on the b side,
    * multiplying the prefilter/verify join rows. Excluding the epoch
    * makes a replayed fold plan-identical to the first attempt. The
    * filter is a partition-column comparison, so Spark prunes the
    * epoch's dirs at the scan.
    */
  private def sigsExcluding(epoch: Option[String]): Option[DataFrame] =
    if (!tableExists) None
    else {
      val full = spark.read.parquet(sigPath)
      val pruned = epoch.fold(full)(e =>
        full.filter(col("epoch").cast("string") =!= e))
      Some(pruned.select("id", "sh", "minhash_sig"))
    }

  private def bandedExcluding(epoch: Option[String]): Option[DataFrame] =
    if (!exists(bandedPath)) None
    else {
      val full = spark.read.parquet(bandedPath)
      val pruned = epoch.fold(full)(e =>
        full.filter(col("epoch").cast("string") =!= e))
      Some(pruned.select("id", "band_id", "band_hash"))
    }

  /** Running corpus size, maintained ACROSS ingests so the per-batch fold
    * never re-counts the signature table (at 100 TB that count is a full
    * scan of the largest table per daily batch): seeded once from the
    * existing table — parquet row-group metadata, not a data scan, via
    * the pushed-down count — then advanced by each delta's (cheap,
    * persisted) count.
    */
  private var knownCorpusSize: Option[Long] = None

  private def corpusSize: Long = knownCorpusSize.getOrElse {
    val n = corpusSignatures.map(_.count()).getOrElse(0L)
    knownCorpusSize = Some(n)
    n
  }

  /** Fold one batch in. Returns the batch's newly discovered verified
    * pairs `(id_a, id_b, jaccard)` — MATERIALIZED (localCheckpoint)
    * before the signature write, so the returned frame can never
    * lazily observe its own fold.
    *
    * The batch's epoch dir is derived from the batch's ID SET (count,
    * min, max, sum, quadratic checksum), not a random UUID: a crashed
    * ingest retried with the same documents lands in the SAME dirs and
    * overwrites its own partial writes — the batch path gets the
    * streaming path's replay idempotency, and a crash between the two
    * table writes can never leave a permanent orphan epoch (whose
    * duplicate banded rows would otherwise inflate fat-bucket counts
    * and silently cap healthy buckets).
    */
  def ingest(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    ingestInto(docs, textCol, idCol, None)

  private def ingestInto(docs: DataFrame, textCol: String, idCol: String,
                         streamEpoch: Option[Long]): DataFrame = {
    requireEpochLayout()
    reconcileEpochs()
    val sigsNew = Dedup
      .signatureTable(docs, textCol, idCol, shingleSize, numHashes)
      .persist()
    // order-insensitive, type-agnostic, ANSI-overflow-safe id-set
    // fingerprint: every term is a sum/min/max over pmod(xxhash64(id), p)
    // values (< 2^31), so 2^31 docs stay far from long overflow
    val p31 = 2147483647L
    val h = pmod(xxhash64(col("id")), lit(p31))
    val fp = sigsNew.agg(count(lit(1)), min(h), max(h), sum(h),
      sum(pmod(h * h, lit(p31)))).head()
    val nNew = fp.getLong(0)
    val epochDir = streamEpoch match {
      case Some(e) => s"epoch=$e"
      case None =>
        val key = (1 until 5).map(i => if (fp.isNullAt(i)) "x" else fp.get(i))
          .mkString(s"$nNew:", ":", "")
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(key.getBytes("UTF-8"))
          .map(b => f"${b & 0xFF}%02x").mkString
        s"epoch=batch-$hex"
    }
    // a replayed epoch REPLACES its rows — the corpus total only grows
    // on a first-time fold (sig-epoch existence is the replay signal;
    // after a crash between writes the sig dir is absent, so the retry
    // correctly counts the batch). The replayed epoch's rows are
    // EXCLUDED from the fold's corpus reads (see [[sigsExcluding]]), so
    // a replay is plan-identical to the first attempt — no double-
    // counted banded rows in fat-bucket sizing, no duplicate ids in the
    // verify join.
    val replay = exists(s"$sigPath/$epochDir")
    val excl = if (replay) Some(epochDir.stripPrefix("epoch=")) else None
    val total = if (replay) corpusSize else corpusSize + nNew
    val pairs = sigsExcluding(excl) match {
      case Some(old) => Dedup.incrementalCandidates(old, sigsNew,
        numHashes, bands, minJaccard, prefilterMargin, maxBucketSize,
        corpusSize = Some(total), bandedOld = bandedExcluding(excl),
        // delta-banded rows are (id, band_id, band_hash) triples; up to
        // ~4M of them (~100 MB) broadcast comfortably — beyond that the
        // fold falls back to the shuffled join
        broadcastDelta = nNew * bands <= 4000000L)
      case None => Dedup.minHashCandidatesFromSigs(sigsNew,
        numHashes, bands, minJaccard, prefilterMargin, maxBucketSize)
    }
    val out = pairs.localCheckpoint()
    // overwrite of a per-ingest partition dir, not a flat append: a
    // foreachBatch replay of the same epoch lands in the same dir and
    // replaces itself — duplicate signatures (or banded rows) can never
    // enter the tables.
    //
    // WRITE ORDER MATTERS on a crash between the two writes: the banded
    // table goes FIRST. An orphan banded epoch (banded written, sigs
    // not) produces ghost candidates whose ids the verify lookup drops,
    // HEALS on retry (the content-derived epoch dir overwrites itself),
    // and is DELETED by the next fold's [[reconcileEpochs]] if the batch
    // is abandoned instead; the reverse order (sigs without banded)
    // would make every later fold's bandedOld silently INCOMPLETE and
    // lose pairs against this epoch's documents, with no healing path —
    // reconcileEpochs would backfill it only at the NEXT ingest, leaving
    // the current fold wrong.
    Dedup.withBands(sigsNew.select("id", "minhash_sig"), numHashes, bands)
      .select(org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.col("band.band_id").as("band_id"),
        org.apache.spark.sql.functions.col("band.band_hash").as("band_hash"))
      .write.mode("overwrite").parquet(s"$bandedPath/$epochDir")
    sigsNew.write.mode("overwrite").parquet(s"$sigPath/$epochDir")
    sigsNew.unpersist()
    knownCorpusSize = Some(total)
    out
  }

  /** `writeStream.foreachBatch` adapter: every micro-batch is one
    * epoch-keyed ingest fold; `onPairs` receives that batch's new pairs
    * (write them to the pair/cluster table, alert, etc.).
    *
    * Restart semantics with a checkpointed query: the signature table is
    * EXACTLY-ONCE (a replayed micro-batch overwrites its own epoch dir),
    * while `onPairs` is at-least-once (a replayed epoch re-reports its
    * pairs) — idempotent downstream writes, e.g. keyed upserts on
    * (id_a, id_b), complete the end-to-end guarantee.
    */
  def sink(textCol: String, idCol: String)(
      onPairs: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit =
    (batch, epochId) =>
      onPairs(ingestInto(batch, textCol, idCol, Some(epochId)), epochId)

  /** Fail fast — with migration guidance — on a signature table written
    * by the pre-epoch flat-append layout: parquet part files at the
    * table ROOT cannot coexist with `epoch=` partition dirs (Spark's
    * partition discovery rejects mixed depths), so resuming such a table
    * would wedge on the SECOND read with an opaque error.
    */
  private def requireEpochLayout(): Unit = {
    val p = new org.apache.hadoop.fs.Path(sigPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) {
      val flat = fs.listStatus(p).exists(st =>
        st.isFile && st.getPath.getName.endsWith(".parquet"))
      if (flat) throw new IllegalStateException(
        s"$sigPath holds a flat (pre-epoch) signature table: root-level " +
          "parquet files cannot mix with epoch= partition dirs. Migrate " +
          "once by moving the existing part files into a single " +
          s"subdirectory, e.g. $sigPath/epoch=legacy/, and delete any " +
          "_SUCCESS marker at the root; the migrated epoch's banded " +
          "rows are backfilled automatically at the next ingest.")
    }
  }
}
