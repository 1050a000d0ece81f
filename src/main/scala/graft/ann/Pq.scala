package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al. 2011) — the MEMORY leg of the ANN
  * family: where LSH/IVF cut how many vectors a query SCANS, PQ cuts
  * what each vector COSTS to store and score. The embedding splits into
  * `m` sub-blocks; each block quantizes to one of `kSub` codebook
  * centroids; a vector becomes `m` small codes (8 ints instead of 64
  * floats here — the table that has to live in memory at 10^11 vectors).
  * Search scores candidates by asymmetric distance (ADC): the probe
  * stays full-precision and dots against each block's chosen centroid.
  *
  * This implementation is the ENGINE-PORTABLE integer form, playing the
  * `ivfTopKPortable`/`lshTopKPortable` role for the PQ family: vectors
  * quantize to BIGINTs (`floor(x·1e7 + 0.5)`, the ann_exact substrate),
  * codebooks derive deterministically from the corpus (the modulo-spread
  * anchor pick ivfTopKPortable uses — anchor vector c's j-th sub-block
  * is block-j's c-th centroid), code assignment is exact integer
  * squared distance with (d², centroid) tie-breaks, and ADC scores are
  * exact integer sums — so the ENTIRE pipeline replays in SQL and the
  * `ann_pq` oracle is a data-derived cross-engine identity at any
  * scale. A production deployment swaps the anchor pick for per-block
  * k-means (`Similarity.kmeansCentroids` over sliced blocks) and keeps
  * everything else; recall floors live in PqSpec.
  *
  * Scale shape: the codes table is built ONCE (one corpus scan ×
  * broadcast anchors; `m` rows — or one `m`-array row — per vector, the
  * 32× compression artifact worth materializing); search broadcasts
  * probes and anchors, streams the codes table map-side, and shuffles
  * only the (probe, neighbor) partial ADC sums — never a raw-vector
  * join. Composing with IVF routing (scan only probed lists' codes) is
  * the standard IVF-PQ layering and works unchanged on the
  * `IncrementalIvfIndex` partition pruning.
  */
object Pq {

  private def quantVec(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * lit(1.0e7) + lit(0.5)).cast("long"))

  /** Squared distance; `zero` picks the accumulator substrate
    * (BIGINT for the exact portable path, DOUBLE for learned
    * codebooks — the integer paths must never ride double sums). */
  private def sqDist(a: Column, b: Column, zero: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      zero, (acc, v) => acc + v)

  private def dot(a: Column, b: Column, zero: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), zero, (acc, v) => acc + v)

  /** Deterministic codebook anchors: `kSub` modulo-spread corpus vectors
    * (quantized), indexed 1..kSub. Anchor c's j-th block is block j's
    * c-th centroid. */
  def pqAnchors(corpus: DataFrame, idCol: String, vecCol: String,
                kSub: Int): DataFrame = {
    val q = corpus.select(col(idCol).as("__aid"), quantVec(col(vecCol)).as("__ae"))
      .persist()
    // eager count fixes `step` at plan time — the ivfTopKPortable pattern
    val n = q.count()
    val step = math.max(1L, n / kSub)
    val anchors = q.filter(pmod(col("__aid"), lit(step)) === 0)
      .orderBy("__aid").limit(kSub)
      // global window over <= kSub rows — bounded by construction; the
      // single-valued NON-FOLDABLE partition key (a literal is stripped
      // by EliminateWindowPartitions) keeps WindowExec's
      // single-partition warning out of the logs for a deliberately
      // bounded move
      .select(row_number().over(
          Window.partitionBy(pmod(xxhash64(col("__aid")), lit(1L)))
            .orderBy("__aid")).as("cidx"),
        col("__ae"))
      .localCheckpoint() // materialize, then release the cached corpus
    q.unpersist()
    anchors
  }

  /** Full-vector anchors → the per-block codebook frame
    * `(j, cidx, __cb)` the generic encode/search core consumes (anchor
    * c's j-th sub-block is block j's c-th centroid). */
  private def anchorsToCodebooks(anchors: DataFrame, m: Int,
                                 dsub: Int): DataFrame =
    anchors
      .withColumn("j", explode(sequence(lit(0), lit(m - 1))))
      .select(col("j"), col("cidx"),
        slice(col("__ae"), col("j") * dsub + 1, lit(dsub)).as("__cb"))

  /** Generic per-block argmin encode against a codebook frame — works
    * for the integer (portable) AND double (learned) substrates, since
    * the distance expressions are type-generic. */
  private def encodeAgainst(q: DataFrame, codebooks: DataFrame,
                            m: Int, dsub: Int, zero: Column): DataFrame = {
    val w = Window.partitionBy("neighbor_id", "j")
      .orderBy(col("__d2"), col("cidx"))
    q.withColumn("j", explode(sequence(lit(0), lit(m - 1))))
      .join(broadcast(codebooks), Seq("j"))
      .withColumn("__d2", sqDist(
        slice(col("__e"), col("j") * dsub + 1, lit(dsub)), col("__cb"), zero))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select("neighbor_id", "j", "cidx")
  }

  /** Generic ADC scoring core over a codebook frame. */
  private def adcSearch(codebooks: DataFrame, codes: DataFrame,
                        p: DataFrame, k: Int, dsub: Int,
                        excludeSelf: Boolean, zero: Column): DataFrame = {
    val partial = codes
      .join(broadcast(codebooks), Seq("j", "cidx"))
      .crossJoin(broadcast(p))
      .withColumn("__pd", dot(
        slice(col("__pe"), col("j") * dsub + 1, lit(dsub)), col("__cb"), zero))
      .groupBy("probe_id", "neighbor_id")
      .agg(sum(col("__pd")).as("adc"))
    val scored =
      if (excludeSelf) partial.filter(col("probe_id") =!= col("neighbor_id"))
      else partial
    val w = Window.partitionBy("probe_id")
      .orderBy(col("adc").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("probe_id", "neighbor_id", "adc", "rank")
  }

  /** The PQ INDEX: one row per (vector, block) with the assigned code —
    * `(neighbor_id, j, cidx)`. At scale this is the materialized table
    * (m small ints per vector vs d floats). */
  def pqCodes(corpus: DataFrame, anchors: DataFrame, idCol: String,
              vecCol: String, m: Int, dim: Int): DataFrame = {
    require(dim % m == 0, s"dim $dim must split into $m blocks")
    val dsub = dim / m
    encodeAgainst(
      corpus.select(col(idCol).as("neighbor_id"),
        quantVec(col(vecCol)).as("__e")),
      anchorsToCodebooks(anchors, m, dsub), m, dsub, lit(0L))
  }

  /** ADC top-k: probes stay full precision; every candidate's score is
    * Σ_j dot(probe block j, centroid of its block-j code). */
  def pqSearch(anchors: DataFrame, codes: DataFrame, probes: DataFrame,
               idCol: String, vecCol: String, k: Int, m: Int, dim: Int,
               excludeSelf: Boolean = true): DataFrame = {
    val dsub = dim / m
    adcSearch(anchorsToCodebooks(anchors, m, dsub), codes,
      probes.select(col(idCol).as("probe_id"),
        quantVec(col(vecCol)).as("__pe")),
      k, dsub, excludeSelf, lit(0L))
  }

  /** PRODUCTION codebooks: per-block Lloyd k-means
    * ([[Similarity.kmeansCentroids]] over each block's sub-vectors —
    * `m` bounded runs, each the documented collect-free iteration
    * shape), returned as the `(j, cidx, __cb)` codebook frame. Learned
    * codebooks fit the actual sub-vector distribution instead of
    * riding corpus picks — the anchors' ScalaTest-pinned quality floor
    * is the baseline they must beat. */
  def pqCodebooksKmeans(corpus: DataFrame, idCol: String, vecCol: String,
                        m: Int, kSub: Int, dim: Int,
                        iters: Int = 3): DataFrame = {
    require(dim % m == 0, s"dim $dim must split into $m blocks")
    val dsub = dim / m
    (0 until m).map { j =>
      val sub = corpus.select(col(idCol).as("__sid"),
        slice(col(vecCol), j * dsub + 1, dsub).as("__sv"))
      Similarity.kmeansCentroids(sub, "__sid", "__sv", kSub, iters)
        // stable 1..kSub codes: rank the (bounded, kSub-row) centroid
        // table by its seed id; non-foldable constant key — see pqAnchors
        .select(lit(j).as("j"),
          row_number().over(
            Window.partitionBy(pmod(xxhash64(col("centroid_id")), lit(1L)))
              .orderBy("centroid_id")).as("cidx"),
          col("centroid_vec").as("__cb"))
        .localCheckpoint()
    }.reduce(_ unionByName _)
  }

  /** Encode + search on LEARNED codebooks (double substrate; float-sum
    * ordering is ScalaTest territory like the other production ANN
    * paths — the portable integer form above remains the oracle). */
  def pqTopKLearned(corpus: DataFrame, probes: DataFrame, idCol: String,
                    vecCol: String, k: Int, m: Int, kSub: Int, dim: Int,
                    iters: Int = 3,
                    excludeSelf: Boolean = true,
                    codebooks0: Option[DataFrame] = None): DataFrame = {
    val dsub = dim / m
    val codebooks = codebooks0.getOrElse(
      pqCodebooksKmeans(corpus, idCol, vecCol, m, kSub, dim, iters))
    def dbl(vec: Column): Column =
      transform(vec, x => x.cast("double"))
    val codes = encodeAgainst(
      corpus.select(col(idCol).as("neighbor_id"), dbl(col(vecCol)).as("__e")),
      codebooks, m, dsub, lit(0.0))
    adcSearch(codebooks, codes,
      probes.select(col(idCol).as("probe_id"), dbl(col(vecCol)).as("__pe")),
      k, dsub, excludeSelf, lit(0.0))
  }

  /** LEARNED IVF-PQ: the production layering — the same integer IVF
    * routing as [[ivfPqTopKPortable]] restricts candidacy to the probed
    * lists, and the ADC runs on k-means codebooks
    * ([[pqCodebooksKmeans]], reusable via `codebooks0` so one training
    * serves several operating points). */
  def ivfPqTopKLearned(corpus: DataFrame, probes: DataFrame, idCol: String,
                       vecCol: String, k: Int, m: Int, kSub: Int, dim: Int,
                       nLists: Int, nProbe: Int, iters: Int = 3,
                       excludeSelf: Boolean = true,
                       codebooks0: Option[DataFrame] = None,
                       routing0: Option[(DataFrame, DataFrame)] = None)
      : DataFrame = {
    val dsub = dim / m
    val (lists, probeLists) = routing0.getOrElse(
      ivfPqRouting(corpus, probes, idCol, vecCol, nLists, nProbe))
    val codebooks = codebooks0.getOrElse(
      pqCodebooksKmeans(corpus, idCol, vecCol, m, kSub, dim, iters))
    def dbl(vec: Column): Column =
      transform(vec, x => x.cast("double"))
    val codes = encodeAgainst(
      corpus.select(col(idCol).as("neighbor_id"), dbl(col(vecCol)).as("__e")),
      codebooks, m, dsub, lit(0.0))
    val p = probes.select(col(idCol).as("probe_id"),
      dbl(col(vecCol)).as("__pe")).localCheckpoint()
    val cand = broadcast(probeLists).join(lists, Seq("centroid_id"))
      .select("probe_id", "neighbor_id").distinct()
    val partial = cand
      .join(codes, Seq("neighbor_id"))
      .join(broadcast(codebooks), Seq("j", "cidx"))
      .join(broadcast(p), Seq("probe_id"))
      .withColumn("__pd", dot(
        slice(col("__pe"), col("j") * dsub + 1, lit(dsub)), col("__cb"),
        lit(0.0)))
      .groupBy("probe_id", "neighbor_id")
      .agg(sum(col("__pd")).as("adc"))
    val scored =
      if (excludeSelf) partial.filter(col("probe_id") =!= col("neighbor_id"))
      else partial
    val w = Window.partitionBy("probe_id")
      .orderBy(col("adc").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("probe_id", "neighbor_id", "adc", "rank")
  }

  /** Exact re-scoring of a candidate shortlist — the second half of the
    * production PQ deployment: ADC ranks cheaply over codes, then the
    * FULL vectors (cold storage at scale — only `shortlist` rows per
    * probe are ever fetched) re-score the survivors exactly on the
    * integer substrate, so the final ordering is the brute-force one
    * RESTRICTED to the shortlist. */
  def rerankExact(pairs: DataFrame, corpus: DataFrame, probes: DataFrame,
                  idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("__ce"))
    val p = probes.select(col(idCol).as("probe_id"),
      col(vecCol).as("__pe2"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("score").desc, col("neighbor_id"))
    pairs.select("probe_id", "neighbor_id")
      .join(c, Seq("neighbor_id"))
      .join(broadcast(p), Seq("probe_id"))
      // cosine, the ANN family's metric — so rerank output is exactly
      // the brute-force ordering restricted to the shortlist
      .withColumn("score", Similarity.cosine(col("__pe2"), col("__ce")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("probe_id", "neighbor_id", "score", "rank")
  }

  /** [[pqTopKLearned]] shortlist + [[rerankExact]]: ADC retrieves
    * `shortlist` candidates per probe, exact dots pick the final top-k. */
  def pqTopKLearnedRerank(corpus: DataFrame, probes: DataFrame,
                          idCol: String, vecCol: String, k: Int, m: Int,
                          kSub: Int, dim: Int, shortlist: Int,
                          iters: Int = 3, excludeSelf: Boolean = true,
                          codebooks0: Option[DataFrame] = None): DataFrame =
    rerankExact(
      pqTopKLearned(corpus, probes, idCol, vecCol, shortlist, m, kSub, dim,
        iters, excludeSelf, codebooks0),
      corpus, probes, idCol, vecCol, k)

  /** [[ivfPqTopKLearned]] shortlist + [[rerankExact]]. */
  def ivfPqTopKLearnedRerank(corpus: DataFrame, probes: DataFrame,
                             idCol: String, vecCol: String, k: Int, m: Int,
                             kSub: Int, dim: Int, nLists: Int, nProbe: Int,
                             shortlist: Int, iters: Int = 3,
                             excludeSelf: Boolean = true,
                             codebooks0: Option[DataFrame] = None,
                             routing0: Option[(DataFrame, DataFrame)] = None)
      : DataFrame =
    rerankExact(
      ivfPqTopKLearned(corpus, probes, idCol, vecCol, shortlist, m, kSub,
        dim, nLists, nProbe, iters, excludeSelf, codebooks0, routing0),
      corpus, probes, idCol, vecCol, k)

  /** [[pqTopKPortable]] shortlist + INTEGER-EXACT rerank on the
    * quantized substrate — the portable twin of [[pqTopKLearnedRerank]]
    * (which reranks by float cosine): ADC ranks a `shortlist`-deep
    * candidate set over the codes, then the full QUANTIZED vectors
    * re-score the survivors by exact integer dot with deterministic
    * tie-breaks, so DuckDB rederives every (probe, neighbor, dotq,
    * rank) row and the `ann_rerank` oracle is a VALUE check, not a
    * recall floor. Cost shape is the production two-stage deployment:
    * codes-only scan + `shortlist` full-vector fetches per probe. */
  def pqTopKPortableRerank(corpus: DataFrame, probes: DataFrame,
                           idCol: String, vecCol: String, k: Int, m: Int,
                           kSub: Int, dim: Int, shortlist: Int,
                           excludeSelf: Boolean = true): DataFrame = {
    val short = pqTopKPortable(corpus, probes, idCol, vecCol, shortlist,
      m, kSub, dim, excludeSelf)
    val c = corpus.select(col(idCol).as("neighbor_id"),
      quantVec(col(vecCol)).as("__ce"))
    val p = probes.select(col(idCol).as("probe_id"),
      quantVec(col(vecCol)).as("__pe2"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("dotq").desc, col("neighbor_id"))
    short.select("probe_id", "neighbor_id")
      .join(c, Seq("neighbor_id"))
      .join(broadcast(p), Seq("probe_id"))
      .withColumn("dotq", dot(col("__pe2"), col("__ce"), lit(0L)))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("probe_id", "neighbor_id", "dotq", "rank")
  }

  /** One-shot: build the index and search it. */
  def pqTopKPortable(corpus: DataFrame, probes: DataFrame, idCol: String,
                     vecCol: String, k: Int, m: Int, kSub: Int, dim: Int,
                     excludeSelf: Boolean = true): DataFrame = {
    val anchors = pqAnchors(corpus, idCol, vecCol, kSub)
    val codes = pqCodes(corpus, anchors, idCol, vecCol, m, dim)
    pqSearch(anchors, codes, probes, idCol, vecCol, k, m, dim, excludeSelf)
  }

  /** IVF-PQ: the standard layering — IVF routing cuts how many
    * candidates a probe SCANS (~nProbe/nLists of the corpus), PQ codes
    * cut what each candidate COSTS; together they are the shape a
    * 10^11-vector index actually runs. Same modulo-spread integer
    * routing as `Similarity.ivfTopKPortable`, same codes/ADC as
    * [[pqSearch]] — semantically ≡ [[pqTopKPortable]] RESTRICTED to the
    * probed lists' members (the identity PqSpec pins). */
  /** The IVF layer of [[ivfPqTopKPortable]] exposed on its own (for
    * operating-point cost accounting): modulo-spread integer centroids,
    * every corpus vector routed to its top list, probes to their top
    * `nProbe` — `(lists(neighbor_id, centroid_id),
    * probeLists(probe_id, centroid_id))`. Candidate count = the
    * size of `probeLists ⋈ lists` on `centroid_id`. */
  def ivfPqRouting(corpus: DataFrame, probes: DataFrame, idCol: String,
                   vecCol: String, nLists: Int, nProbe: Int)
      : (DataFrame, DataFrame) = {
    val q = corpus.select(col(idCol).as("neighbor_id"),
      quantVec(col(vecCol)).as("__e")).persist()
    val n = q.count()
    val step = math.max(1L, n / nLists)
    val cents = q.filter(pmod(col("neighbor_id"), lit(step)) === 0)
      .orderBy("neighbor_id").limit(nLists)
      .select(col("neighbor_id").as("centroid_id"), col("__e").as("__cen"))
      .localCheckpoint()
    def routed(df: DataFrame, idOut: String, take: Int): DataFrame = {
      val w = Window.partitionBy(idOut)
        .orderBy(col("__cdot").desc, col("centroid_id"))
      df.crossJoin(broadcast(cents))
        .withColumn("__cdot", dot(col("__e"), col("__cen"), lit(0L)))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= take)
        .select(idOut, "centroid_id")
    }
    val lists = routed(q, "neighbor_id", 1)
      .localCheckpoint() // materialize routing, then release the cache
    q.unpersist()
    val p = probes.select(col(idCol).as("probe_id"),
      quantVec(col(vecCol)).as("__e"))
    val probeLists = routed(p, "probe_id", nProbe).localCheckpoint()
    (lists, probeLists)
  }

  def ivfPqTopKPortable(corpus: DataFrame, probes: DataFrame, idCol: String,
                        vecCol: String, k: Int, m: Int, kSub: Int, dim: Int,
                        nLists: Int, nProbe: Int,
                        excludeSelf: Boolean = true): DataFrame = {
    val dsub = dim / m
    val (lists, probeLists) =
      ivfPqRouting(corpus, probes, idCol, vecCol, nLists, nProbe)
    val p = probes.select(col(idCol).as("probe_id"),
      quantVec(col(vecCol)).as("__pe")).localCheckpoint()

    val anchors = pqAnchors(corpus, idCol, vecCol, kSub)
    val codes = pqCodes(corpus, anchors, idCol, vecCol, m, dim)
    // candidacy = sharing a probed list; then the ADC scoring of pqSearch
    val cand = broadcast(probeLists).join(lists, Seq("centroid_id"))
      .select("probe_id", "neighbor_id").distinct()
    val partial = cand
      .join(codes, Seq("neighbor_id"))
      .join(broadcast(anchors), Seq("cidx"))
      .join(broadcast(p), Seq("probe_id"))
      .withColumn("__pd", dot(
        slice(col("__pe"), col("j") * dsub + 1, lit(dsub)),
        slice(col("__ae"), col("j") * dsub + 1, lit(dsub)), lit(0L)))
      .groupBy("probe_id", "neighbor_id")
      .agg(sum(col("__pd")).as("adc"))
    val scored =
      if (excludeSelf) partial.filter(col("probe_id") =!= col("neighbor_id"))
      else partial
    val w = Window.partitionBy("probe_id")
      .orderBy(col("adc").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("probe_id", "neighbor_id", "adc", "rank")
  }
}
