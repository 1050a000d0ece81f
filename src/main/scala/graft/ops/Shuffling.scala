package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus ordering for training-data delivery: a seeded
  * global shuffle, balanced shard assignment, and multi-source mixing —
  * the step between curation and the trainer, where example order must be
  * random-LOOKING but exactly reproducible (a re-run of the pipeline, or
  * a resumed training job, must see the same order).
  *
  * No `rand()` anywhere ([[Sampling]]'s determinism argument): the
  * shuffle key is `md5(seed:id)`, so the permutation is a pure function
  * of (seed, id). Positions come from [[Ranking.globalRowNumber]] — a
  * range-partitioned sort on the hash, never a single-partition window —
  * and sharding is round-robin on the position, so shard sizes differ by
  * at most one WITHOUT a count-based split computation.
  */
object Shuffling {

  /** The per-row shuffle key: `md5(seed:id)` — hex-string ordering is a
    * uniform pseudo-random total order (ties only on md5 collisions;
    * `idCol` is appended as the formal tie-breaker).
    */
  def shuffleKey(seed: String, id: Column): Column =
    md5(concat_ws(":", lit(seed), id.cast("string")))

  /** Seeded deterministic global shuffle: adds 0-based `posCol` = the
    * row's position in the shuffled order.
    */
  def shuffled(df: DataFrame, idCol: String, seed: String,
               posCol: String = "pos"): DataFrame =
    Ranking.globalRowNumber(df,
        Seq(shuffleKey(seed, col(idCol)), col(idCol)), posCol)
      .withColumn(posCol, col(posCol) - 1)

  /** [[shuffled]] + balanced shard assignment: `shardCol` = pos mod
    * `nShards` (sizes differ by ≤ 1), `posCol` = the row's 0-based
    * position WITHIN its shard (= pos div nShards — round-robin dealing
    * preserves the global shuffle order inside every shard). Writers
    * partition the output by `shardCol`; a trainer reading shard k in
    * `posCol` order sees a deterministic uniform sample of the corpus.
    */
  def sharded(df: DataFrame, idCol: String, seed: String, nShards: Int,
              shardCol: String = "shard",
              posCol: String = "pos_in_shard"): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    shuffled(df, idCol, seed, "__g_pos")
      .withColumn(shardCol, pmod(col("__g_pos"), lit(nShards.toLong)))
      // integral DIV, not Column `/` (IEEE double division — exact only
      // below 2^53, and the lint in Ranking.globalNtile applies here too)
      .withColumn(posCol, expr(s"__g_pos div ${nShards}"))
      .drop("__g_pos")
  }

  /** Deterministic multi-source mixing: each source is replicated at its
    * rate ([[Sampling.upsampled]] — `floor(rate)` copies plus an
    * md5-lottery extra, so expected multiplicity is exactly the rate and
    * replays are identical), tagged with its index in `sourceCol`, and
    * the union is globally shuffled on the composite (source, id, copy)
    * key. The result is the training-mix stream: sources interleaved in
    * proportion, order reproducible from `seed` alone.
    *
    * All sources must share a schema (they are unioned by name). Rates
    * above 1.0 express epochs ("2.3 passes of source A"); below 1.0,
    * subsampling.
    */
  def mixCorpora(sources: Seq[(DataFrame, Double)], idCol: String,
                 seed: String, sourceCol: String = "source_id",
                 posCol: String = "pos"): DataFrame = {
    require(sources.nonEmpty, "need at least one source")
    val tagged = sources.zipWithIndex.map { case ((df, rate), i) =>
      Sampling.upsampled(df, idCol, rate).withColumn(sourceCol, lit(i.toLong))
    }
    val all = tagged.reduce(_ unionByName _)
    val key = md5(concat_ws(":", lit(seed), col(sourceCol),
      col(idCol).cast("string"), col("copy")))
    Ranking.globalRowNumber(all,
        Seq(key, col(sourceCol), col(idCol), col("copy")), posCol)
      .withColumn(posCol, col(posCol) - 1)
  }

  /** Curriculum ordering: rows are dealt into `phases` difficulty tiers
    * (global NTILE over `(difficultyCol, id)` ascending — phase 1 =
    * easiest) and deterministically shuffled WITHIN each phase, the
    * standard easy→hard curriculum delivery (Bengio et al. 2009) with
    * in-phase order decorrelated from difficulty. `posCol` is the
    * 0-based global training position: all of phase 1 shuffled, then all
    * of phase 2, and so on. Both ranks come from [[Ranking]]'s
    * range-partitioned machinery — no single-partition window at any
    * corpus size — and the order is reproducible from `seed` alone
    * (replay-stable, no rand()).
    *
    * `difficultyCol` is any exact, portable difficulty proxy: length,
    * token count, integer-quantized perplexity or quality rank. (Float
    * scores should be quantized first so the phase assignment is
    * engine-portable — same discipline as the integer-substrate
    * oracles.)
    */
  def curriculumOrder(df: DataFrame, idCol: String, difficultyCol: String,
                      phases: Int, seed: String,
                      phaseCol: String = "phase",
                      posCol: String = "pos"): DataFrame = {
    require(phases > 0, "phases must be positive")
    val tiled = Ranking.globalNtile(df, phases,
      Seq(col(difficultyCol), col(idCol)), phaseCol)
    Ranking.globalRowNumber(tiled,
        Seq(col(phaseCol), shuffleKey(seed, col(idCol)), col(idCol)), posCol)
      .withColumn(posCol, col(posCol) - 1)
  }
}
