package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  * Two tiers, as a 100 TB pipeline needs both:
  *  - brute-force cosine top-k: exact baseline. The probe set is
  *    broadcast, so the big side streams once with no shuffle; cost is
  *    O(|corpus| * |probes| * dim).
  *  - random-hyperplane LSH: corpus is bucketed by sign-bit sketch (one
  *    shuffle on bucket id); probes only meet their own bucket. The
  *    all-pairs term disappears; recall is tunable via sketch bits /
  *    multi-probe.
  *
  * Dot products run in a codegen'd aggregate/zip_with fold — deterministic
  * left-to-right order, no UDF.
  */
object Similarity {

  /** cos(a, b) over two array<float> columns via the native codegen
    * expression [[graft.functions.CosineSim]] — one fused loop, index-order
    * accumulation (bit-identical to a fold, ~10x an interpreted
    * aggregate/zip_with pipeline).
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSim.col(a, b)

  /** Exact top-k cosine neighbors for each probe row.
    * @param corpus  (idCol, vecCol) big side — streamed, never shuffled
    * @param probes  small probe set — broadcast
    */
  def bruteForceTopK(
      corpus: DataFrame,
      probes: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("__pv"))
    val joined = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
      .crossJoin(broadcast(p))
    val scored0 = joined.withColumn("cos", cosine(col("__pv"), col("__cv")))
    val scored = if (excludeSelf) scored0.filter(col("probe_id") =!= col("neighbor_id")) else scored0
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("probe_id", "neighbor_id", "cos", "rank")
  }

  /** Sign-bit sketch bucket id for a vector column, via the native
    * codegen expression [[graft.functions.LshBucket]] (deterministic
    * hash-derived hyperplanes cached per (bits, dim); one fused loop
    * instead of bits x dim interpreted lambda dispatches). `dim` is kept
    * for API stability; the expression reads it from the array.
    */
  def withLshBucket(df: DataFrame, vecCol: String, bits: Int, dim: Int,
      table: Int = 0): DataFrame =
    df.withColumn("lsh_bucket",
      graft.functions.LshBucket.col(col(vecCol), bits, table))

  /** Per-table bucket array for the OR-construction — the ONE
    * definition [[lshTopK]] and [[lshScanCost]] share, so the cost
    * function prices exactly the fan-out the search scores (pinned by
    * SimilaritySpec; a silent divergence here would mis-price the
    * published ann_curve). */
  private def lshBucketArr(vec: Column, bits: Int, tables: Int): Column =
    array((0 until tables).map(t =>
      graft.functions.LshBucket.col(vec, bits, t)): _*)

  /** Hamming-1 multi-probe fan-out over a probe's own bucket `__b0` —
    * shared by [[lshTopK]] and [[lshScanCost]] for the same reason. */
  private def lshProbeBuckets(bits: Int): Column =
    explode(expr(
      s"""array_union(array(__b0),
            transform(sequence(0, ${bits - 1}),
              b -> __b0 ^ shiftleft(CAST(1 AS BIGINT), b)))"""))

  /** Default OR-construction width for [[lshTopK]]: candidates are the
    * union over this many INDEPENDENT hyperplane tables. r5's measured
    * recall ladder at (bits=4, k=5) made the single-table default a trap
    * — 12/100 plain, 43/100 multi-probe — so the default is now
    * multi-table + multi-probe (recall pinned in the `ann_recall` driver
    * entry; floor asserted in SimilaritySpec).
    */
  val DefaultLshTables = 4

  /** LSH-bucketed approximate top-k: probes meet only corpus rows in the
    * same bucket. With `tables` > 1 (the default), each vector is
    * sketched under `tables` independent hyperplane sets and a candidate
    * pair counts if it collides in ANY table — the classic AND-OR
    * construction (AND over `bits` within a table, OR across tables).
    * With `multiProbe` (also default) each probe additionally visits the
    * `bits` Hamming-1 buckets of every table.
    *
    * Scale shape: the corpus side fans out x`tables` rows and shuffles
    * once on (table, bucket); the probe side is broadcast with
    * x`tables`·(1+`bits`) fan-out — probe-side cost only. The all-pairs
    * term never materializes; pair dedup across tables happens on the
    * projected (probe_id, neighbor_id, cos) triple, not the vectors.
    */
  def lshTopK(
      corpus: DataFrame,
      probes: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      bits: Int,
      dim: Int,
      excludeSelf: Boolean = true,
      multiProbe: Boolean = true,
      tables: Int = DefaultLshTables): DataFrame = {
    require(tables >= 1, "tables must be >= 1")
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
      .select(col("neighbor_id"), col("__cv"),
        posexplode(lshBucketArr(col("__cv"), bits, tables))
          .as(Seq("__t", "lsh_bucket")))
    val p0 = probes.select(col(idCol).as("probe_id"), col(vecCol).as("__pv"))
      .select(col("probe_id"), col("__pv"),
        posexplode(lshBucketArr(col("__pv"), bits, tables))
          .as(Seq("__t", "__b0")))
    val p = if (!multiProbe) p0.withColumn("lsh_bucket", col("__b0"))
      else p0.withColumn("lsh_bucket", lshProbeBuckets(bits))
    val joined = c.join(broadcast(p.select("probe_id", "__pv", "__t", "lsh_bucket")),
      Seq("__t", "lsh_bucket"))
    val scored0 = joined.withColumn("cos", cosine(col("__pv"), col("__cv")))
    val scored = if (excludeSelf) scored0.filter(col("probe_id") =!= col("neighbor_id")) else scored0
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored
      // a pair colliding in several tables/probes must rank once
      .select("probe_id", "neighbor_id", "cos").dropDuplicates("probe_id", "neighbor_id")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("probe_id", "neighbor_id", "cos", "rank")
  }

  // ------- Engine-portable audit variants ---------------------------
  //
  // The production ANN paths above rank by float cosine over xxhash64-
  // derived sketches — deterministic, but with no cross-engine twin
  // (xxhash64 has no DuckDB equivalent and IEEE sum order is engine-
  // specific). The *Portable variants below re-express the SAME search
  // mechanics on an integer substrate any engine reproduces exactly:
  // vectors quantized to BIGINTs (floor(x*1e7+0.5), the ann_exact
  // substrate), md5-derived integer hyperplane weights
  // ([[graft.functions.PortableLshBucket]]), and ranking by the exact
  // integer dot. They play the role minHashCandidatesPortable plays for
  // the minhash family: the audit/oracle path whose result set is a
  // DATA-DERIVED cross-engine identity at ANY corpus scale, while
  // production corpora keep the (faster) native float paths, whose
  // recall floors live in SimilaritySpec + the ann_recall entry.

  /** Exact integer quantization of a float/double vector column:
    * `floor(x*1e7 + 0.5)` per element as BIGINT. */
  private def quantVec(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * lit(1.0e7) + lit(0.5)).cast("long"))

  /** Exact integer dot of two quantized BIGINT array columns. */
  private def quantDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** [[lshTopK]] on the engine-portable integer substrate: buckets from
    * [[graft.functions.PortableLshBucket]] (md5-integer hyperplanes,
    * quantized-integer projections), candidates ranked by the exact
    * integer dot. Same AND-OR construction, multi-probe fan-out, and
    * scale shape (one corpus shuffle on (table, bucket); probes
    * broadcast) as the production path.
    */
  def lshTopKPortable(
      corpus: DataFrame,
      probes: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      bits: Int,
      excludeSelf: Boolean = true,
      multiProbe: Boolean = true,
      tables: Int = DefaultLshTables): DataFrame = {
    require(tables >= 1, "tables must be >= 1")
    def bucketArr(vec: Column): Column =
      array((0 until tables).map(t =>
        graft.functions.PortableLshBucket.col(vec, bits, t)): _*)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
      .select(col("neighbor_id"), quantVec(col("__cv")).as("__ce"),
        posexplode(bucketArr(col("__cv"))).as(Seq("__t", "lsh_bucket")))
    val p0 = probes.select(col(idCol).as("probe_id"), col(vecCol).as("__pv"))
      .select(col("probe_id"), quantVec(col("__pv")).as("__pe"),
        posexplode(bucketArr(col("__pv"))).as(Seq("__t", "__b0")))
    val p = if (!multiProbe) p0.withColumn("lsh_bucket", col("__b0"))
      else p0.withColumn("lsh_bucket", lshProbeBuckets(bits))
    val joined = c.join(broadcast(p.select("probe_id", "__pe", "__t", "lsh_bucket")),
      Seq("__t", "lsh_bucket"))
    val scored0 = joined.withColumn("dot", quantDot(col("__pe"), col("__ce")))
    val scored = if (excludeSelf) scored0.filter(col("probe_id") =!= col("neighbor_id")) else scored0
    val w = Window.partitionBy("probe_id")
      .orderBy(col("dot").desc, col("neighbor_id"))
    scored
      .select("probe_id", "neighbor_id", "dot").dropDuplicates("probe_id", "neighbor_id")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("probe_id", "neighbor_id", "dot", "rank")
  }

  /** [[ivfTopK]] on the engine-portable integer substrate. Centroids are
    * the (at most) `nLists` corpus rows with `id % max(1, n/nLists) = 0`
    * lowest-first — a deterministic spread any engine re-derives with
    * COUNT(*) + a modulo filter (the portable stand-in for the
    * production path's xxhash64 sample / learned k-means, which have no
    * SQL twin). Assignment and search both rank by the exact integer
    * dot with ties to the smaller id, via per-row windows (the audit
    * path trades ivfTopK's map-only literal-centroid codegen assignment
    * for cross-engine replicability; |corpus| x nLists rows is the
    * accounted cost).
    */
  def ivfTopKPortable(
      corpus: DataFrame,
      probes: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nLists: Int,
      nProbe: Int,
      excludeSelf: Boolean = true): DataFrame = {
    // persist: the quantized corpus feeds the (already-eager, the list
    // count fixes `step` at plan time) count, the centroid pick, and the
    // assignment pass — one quantization scan instead of three
    val q = corpus.select(col(idCol).as("neighbor_id"),
      quantVec(col(vecCol)).as("__ce"))
      .persist()
    val n = q.count()
    val step = math.max(1L, n / nLists)
    val cents = q.filter(pmod(col("neighbor_id"), lit(step)) === 0)
      .orderBy("neighbor_id").limit(nLists)
      .select(col("neighbor_id").as("centroid_id"), col("__ce").as("__cen"))
    val aw = Window.partitionBy("neighbor_id")
      .orderBy(col("__cdot").desc, col("centroid_id"))
    val assigned = q.crossJoin(broadcast(cents))
      .withColumn("__cdot", quantDot(col("__ce"), col("__cen")))
      .withColumn("__rn", row_number().over(aw))
      .filter(col("__rn") === 1)
      .select("neighbor_id", "__ce", "centroid_id")
    val p = probes.select(col(idCol).as("probe_id"),
      quantVec(col(vecCol)).as("__pe"))
    val pw = Window.partitionBy("probe_id")
      .orderBy(col("__cdot").desc, col("centroid_id"))
    val plists = p.crossJoin(broadcast(cents))
      .withColumn("__cdot", quantDot(col("__pe"), col("__cen")))
      .withColumn("__rn", row_number().over(pw))
      .filter(col("__rn") <= nProbe)
      .select("probe_id", "__pe", "centroid_id")
    val cand = assigned.join(broadcast(plists), Seq("centroid_id"))
    val scored0 = cand.withColumn("dot", quantDot(col("__pe"), col("__ce")))
    val scored = if (excludeSelf) scored0.filter(col("probe_id") =!= col("neighbor_id")) else scored0
    val w = Window.partitionBy("probe_id")
      .orderBy(col("dot").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("probe_id", "neighbor_id", "dot", "rank")
  }

  /** Lloyd k-means over the embedding column, expressed as iterated
    * broadcast-assign + elementwise-mean aggregation — no driver-side
    * vectors, no RNG (seeds are a deterministic hash sample). Used to
    * learn IVF centroids; `iters` of 2-5 is plenty for routing quality.
    *
    * WHEN IT PAYS: learned centroids balance the inverted lists, so each
    * probed list is SMALLER — at equal `nProbe` recall therefore drops
    * vs a hash sample's fat lists (66 vs 73 on the sf0.01 pin), which is
    * a cost artifact, not a quality loss. At equal SCANNED ROWS learned
    * wins on the same fixture (89 vs 73 at ~60% scan; its cost/recall
    * curve dominates throughout) AND balanced lists mean predictable
    * per-probe latency at scale. Compare variants with [[ivfScanCost]]
    * at your recall target; expect roughly `nProbe_learned ≈
    * nProbe_sampled x (sampled scan share / balanced share)` for the
    * same budget.
    *
    * Scale shape per iteration: one broadcast join (corpus x k centroids,
    * map-side), one shuffle keyed on (centroid, dim) for the means. Run
    * on a sample for very large corpora — routing centroids don't need
    * the full corpus.
    */
  /** Collect a (tiny) centroid table into literal columns for map-only
    * assignment: nLists x dim floats always fit the driver — the same
    * assumption every k-means implementation makes. Handles float/double
    * vectors and rows from localCheckpoint'd frames (raw ArrayData).
    */
  private[ann] def centroidLiterals(centroids: DataFrame): Array[(Any, Column)] = {
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
    val elemT = centroids.schema("centroid_vec").dataType
      .asInstanceOf[ArrayType].elementType
    val cents = centroids.collect().map { r =>
      val vec: Column = (r.get(1), elemT) match {
        case (a: ArrayData, FloatType) => typedLit(a.toFloatArray().toSeq)
        case (a: ArrayData, DoubleType) => typedLit(a.toDoubleArray().toSeq)
        case (s: scala.collection.Seq[_], FloatType) =>
          typedLit(s.map(_.asInstanceOf[Number].floatValue()).toSeq)
        case (s: scala.collection.Seq[_], DoubleType) =>
          typedLit(s.map(_.asInstanceOf[Number].doubleValue()).toSeq)
        case (v, t) => throw new IllegalArgumentException(
          s"unsupported centroid vector ($t, ${v.getClass.getName})")
      }
      (r.get(0), vec)
    }
    require(cents.nonEmpty, "empty centroid set")
    cents
  }

  /** Argmax-cosine centroid id as a static codegen expression (ties to
    * the largest id, matching max_by over struct(cos, id)).
    */
  private def bestCentroid(cents: Array[(Any, Column)], vec: Column): Column = {
    val scored = cents.map { case (cid, cv) =>
      struct(cosine(vec, cv).as("c"), lit(cid).as("id"))
    }
    (if (scored.length == 1) scored.head
     else greatest(scored.toIndexedSeq: _*)).getField("id")
  }

  def kmeansCentroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("__id"), col(vecCol).as("__v"))
    // exactly-k seeds: hash-rank the (sample-sized) corpus and take the
    // bottom k — a probability filter would yield a Binomial count, not k
    // lineage truncation per iteration (localCheckpoint, not persist):
    // iterative loops otherwise re-analyze a growing plan per action and
    // can recompute partially-cached lineage — see
    // Dedup.connectedComponents for the measured failure mode
    var centroids = c
      .withColumn("__rk", pmod(xxhash64(col("__id")), lit(1000000007L)))
      .orderBy("__rk", "__id")
      .limit(k)
      .select(col("__id").as("centroid_id"),
        expr("transform(__v, x -> CAST(x AS DOUBLE))").as("centroid_vec"))
      .localCheckpoint()

    for (_ <- 1 to iters) {
      // assignment is map-only (literal centroid tree, see ivfTopK) — the
      // crossJoin + vector-keyed groupBy it replaces shuffled
      // |corpus| x k full vectors per Lloyd iteration
      val assigned = c.withColumn("centroid_id",
        bestCentroid(centroidLiterals(centroids), col("__v")))
      val means = assigned
        .select(col("centroid_id"), posexplode(col("__v")).as(Seq("__pos", "__x")))
        .groupBy("centroid_id", "__pos")
        .agg(avg(col("__x")).as("__m"))
        .groupBy("centroid_id")
        .agg(array_sort(collect_list(struct(col("__pos"), col("__m")))).as("__pm"))
        .select(col("centroid_id"),
          expr("transform(__pm, p -> p.__m)").as("__new_vec"))
      // clusters that lost every member keep their previous centroid
      centroids = centroids.join(means, Seq("centroid_id"), "left")
        .select(col("centroid_id"),
          coalesce(col("__new_vec"), col("centroid_vec")).as("centroid_vec"))
        .localCheckpoint()
    }
    centroids
  }

  /** IVF-style ANN: partition the corpus into `nLists` centroid-owned
    * inverted lists, probes search only their `nProbe` nearest lists.
    *
    * Scale shape: centroids are a deterministic hash-sample (tiny,
    * broadcast); assignment is one broadcast join + max_by aggregation
    * (shuffle keyed on the corpus id); the search joins probe-lists to
    * corpus-lists on centroid id — the all-pairs term shrinks by
    * ~nLists/nProbe. A production variant would learn centroids with
    * k-means|| on a sample; the list/probe mechanics are identical.
    */
  def ivfTopK(
      corpus: DataFrame,
      probes: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nLists: Int,
      nProbe: Int,
      excludeSelf: Boolean = true,
      learnedCentroids: Option[DataFrame] = None): DataFrame = {
    val (centroids, lists) =
      ivfIndex(corpus, idCol, vecCol, nLists, learnedCentroids)
    ivfSearchIndex(centroids, lists, probes, idCol, vecCol, k, nProbe,
      excludeSelf)
  }

  /** Build a REUSABLE IVF index over the corpus: `(centroids, lists)`
    * where `centroids` is the tiny `(centroid_id, centroid_vec)` table
    * and `lists` is the corpus assigned to its inverted lists
    * `(neighbor_id, __cv, centroid_id)`.
    *
    * The index is the expensive part (a full corpus pass); build it once
    * per corpus snapshot, persist/materialize `lists` (at 100 TB: a table
    * partitioned by `centroid_id`, so a probe batch prunes to its nProbe
    * lists at the scan), and serve every probe batch from it via
    * [[ivfSearchIndex]] — the same build-once/query-many shape as
    * [[graft.dedup.Dedup.signatureTable]].
    */
  def ivfIndex(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nLists: Int,
      learnedCentroids: Option[DataFrame] = None): (DataFrame, DataFrame) = {
    val c = corpus.select(col(idCol).as("cid_"), col(vecCol).as("cv"))
    // centroids: learned (kmeansCentroids) or a deterministic hash sample
    val centroids = learnedCentroids.getOrElse {
      val n = c.count()
      val step = math.max(1L, n / nLists)
      // localCheckpoint pins ONE sample: limit() over an unordered filter
      // is not stable across re-evaluations, and the lists built below
      // are assigned to THIS pick — a caller re-collecting the returned
      // frame (ivfSearchIndex, scan-cost audits) must see the same rows,
      // never a re-executed different subset. nLists rows — cost is nil.
      c.withColumn("__rk", pmod(xxhash64(col("cid_")), lit(step)))
        .filter(col("__rk") === 0)
        .limit(nLists)
        .select(col("cid_").as("centroid_id"), col("cv").as("centroid_vec"))
        .localCheckpoint()
    }

    // Centroid assignment is MAP-ONLY: the centroid table is tiny
    // (nLists x dim floats — k-means centroids always fit the driver), so
    // it collects into a static expression tree of native cosines and the
    // argmax runs inside codegen with ZERO shuffle. The first formulation
    // (crossJoin(broadcast(centroids)) + groupBy over the vector column)
    // re-shuffled |rows| x nLists copies of the full vectors as group
    // keys — measured 169 s vs 1.6 s brute force at 200k x 64 lists.
    val lists = assignCentroids(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv")),
      "neighbor_id", "__cv", centroids, keep = 1)
    (centroids, lists)
  }

  /** Map-only centroid assignment: each row of `df` gets its nearest
    * (`keep = 1`) or `keep` nearest `centroid_id`s via the static
    * literal-codegen argmax tree (zero shuffle — see the ivfIndex plan
    * note). Returns `(idCol, vecCol, centroid_id)`. Exposed for
    * index-maintenance callers ([[IncrementalIvfIndex]]) so a batch
    * folds into a maintained lists table with the exact expression the
    * one-shot build uses.
    */
  private[graft] def assignCentroids(df: DataFrame, idCol: String,
      vecCol: String, centroids: DataFrame, keep: Int): DataFrame = {
    val cents = centroidLiterals(centroids)
    if (keep == 1) {
      df.withColumn("centroid_id", bestCentroid(cents, col(vecCol)))
        .select(col(idCol), col(vecCol), col("centroid_id"))
    } else {
      // top `keep` centroids: sort the scored structs descending and
      // explode the head slice — probe-side only, fan-out = nProbe
      val scored = cents.map { case (cid, cv) =>
        struct(cosine(col(vecCol), cv).as("c"), lit(cid).as("id"))
      }
      df.withColumn("centroid_id",
          explode(slice(reverse(sort_array(array(scored.toIndexedSeq: _*))),
            1, keep).getField("id")))
        .select(col(idCol), col(vecCol), col("centroid_id"))
    }
  }

  /** Serve one probe batch from a prebuilt [[ivfIndex]]. Probe-side work
    * only: assign each probe to its `nProbe` nearest centroids (map-only,
    * static codegen argmax), broadcast the probe batch, and join it to
    * the inverted lists on `centroid_id`.
    */
  def ivfSearchIndex(
      centroids: DataFrame,
      lists: DataFrame,
      probes: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nProbe: Int,
      excludeSelf: Boolean = true): DataFrame = {
    val cents = centroidLiterals(centroids)
    val scoredC = cents.map { case (cid, cv) =>
      struct(cosine(col("__pv"), cv).as("c"), lit(cid).as("id"))
    }
    val probed = probes.select(col(idCol).as("probe_id"), col(vecCol).as("__pv"))
      .withColumn("centroid_id",
        explode(slice(reverse(sort_array(array(scoredC.toIndexedSeq: _*))),
          1, nProbe).getField("id")))

    val joined = lists.join(broadcast(probed), "centroid_id")
    val scored0 = joined.withColumn("cos", cosine(col("__pv"), col("__cv")))
    val scored = if (excludeSelf) scored0.filter(col("probe_id") =!= col("neighbor_id")) else scored0
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("probe_id", "neighbor_id", "cos", "rank")
  }

  /** Probe cost of an [[ivfIndex]]: corpus rows scanned per probe at
    * `nProbe` — the sum of the probed lists' sizes, `(probe_id,
    * scanned_rows)`. Recall comparisons between centroid variants are
    * only meaningful at EQUAL scanned rows: hash-sampled centroids make
    * UNBALANCED lists whose nearest-nProbe set covers more corpus per
    * probe than k-means' balanced lists, so at equal `nProbe` the sample
    * "wins" recall purely by scanning more. Measured on the sf0.01
    * fixture (nLists=8, 20 probes, k=5): sampled nProbe=3 scans 59.8%
    * of the corpus for recall 73/100, learned nProbe=3 scans 37.3% for
    * 66 — but at MATCHED ~60% scan (learned nProbe=5, 62.1%) learned
    * reaches 89. The learned curve dominates at every sampled operating
    * point on this fixture: sampled (39.9% scan, 54) < learned (37.3%,
    * 66); sampled (59.8%, 73) < learned (49.8%, 79); sampled (79.3%,
    * 83) < learned (74.8%, 93). See SimilaritySpec's
    * equal-cost test and the `ivf_learned_eqcost` ann_recall driver pin.
    * Use this to pick the cheaper variant at YOUR recall target, never
    * nProbe-vs-nProbe.
    */
  def ivfScanCost(
      centroids: DataFrame,
      lists: DataFrame,
      probes: DataFrame,
      idCol: String,
      vecCol: String,
      nProbe: Int): DataFrame = {
    val cents = centroidLiterals(centroids)
    val scoredC = cents.map { case (cid, cv) =>
      struct(cosine(col("__pv"), cv).as("c"), lit(cid).as("id"))
    }
    val probed = probes.select(col(idCol).as("probe_id"), col(vecCol).as("__pv"))
      .withColumn("centroid_id",
        explode(slice(reverse(sort_array(array(scoredC.toIndexedSeq: _*))),
          1, nProbe).getField("id")))
    // list sizes: nLists rows — broadcast into the probe-side join
    val sizes = lists.groupBy("centroid_id").agg(count(lit(1)).as("__lsz"))
    probed.join(broadcast(sizes), Seq("centroid_id"), "left")
      .groupBy("probe_id")
      .agg(sum(coalesce(col("__lsz"), lit(0L))).as("scanned_rows"))
  }

  /** Probe cost of [[lshTopK]] at a given `(bits, tables, multiProbe)`
    * operating point: corpus rows cosine-scored per probe — the sum,
    * over every (table, bucket) the probe opens (its own bucket plus
    * the `bits` Hamming-1 buckets when `multiProbe`), of that bucket's
    * corpus occupancy. The LSH counterpart of [[ivfScanCost]], on the
    * same "rows scored" scale, so the two variants' recall curves are
    * comparable at equal cost. Plan shape: the corpus collapses to a
    * `(table, bucket) -> count` histogram (at most `tables * 2^bits`
    * rows — KBs at any corpus size), which broadcasts into the
    * probe-side bucket fan-out; the corpus is scanned exactly once
    * regardless of probe count.
    */
  def lshScanCost(
      corpus: DataFrame,
      probes: DataFrame,
      idCol: String,
      vecCol: String,
      bits: Int,
      dim: Int,
      multiProbe: Boolean = true,
      tables: Int = DefaultLshTables): DataFrame = {
    require(tables >= 1, "tables must be >= 1")
    val hist = corpus.select(col(vecCol).as("__cv"))
      .select(posexplode(lshBucketArr(col("__cv"), bits, tables))
        .as(Seq("__t", "lsh_bucket")))
      .groupBy("__t", "lsh_bucket").agg(count(lit(1)).as("__bsz"))
    val p0 = probes.select(col(idCol).as("probe_id"), col(vecCol).as("__pv"))
      .select(col("probe_id"),
        posexplode(lshBucketArr(col("__pv"), bits, tables))
          .as(Seq("__t", "__b0")))
    val p = if (!multiProbe) p0.withColumn("lsh_bucket", col("__b0"))
      else p0.withColumn("lsh_bucket", lshProbeBuckets(bits))
    p.join(broadcast(hist), Seq("__t", "lsh_bucket"), "left")
      .groupBy("probe_id")
      .agg(sum(coalesce(col("__bsz"), lit(0L))).as("scanned_rows"))
  }

  /** Embedding near-duplicate pairs: bucket by sign sketch, pair within
    * buckets, keep cosine >= minCos. Same no-all-pairs discipline as
    * Dedup.minHashCandidates — and the same LIVENESS valve: within-bucket
    * pairing is quadratic in bucket size, and a degenerate corpus (many
    * near-identical vectors collapsing into one sign-sketch bucket)
    * reproduces exactly the fat-bucket wedge the text LSH path measured
    * at 2M docs. Buckets above `maxBucketSize` are therefore SKIPPED by
    * default.
    *
    * Recall note — this sketch has ONE bucket per vector (no bands), so
    * unlike MinHash banding a skipped bucket's pairs are NOT recovered
    * elsewhere: a fat bucket means an identical/near-identical embedding
    * cluster, which belongs to exact dedup (checksum or quantized-vector
    * groupBy) run first, or to a higher `bits` resolution. Pass
    * `maxBucketSize = 0` for exhaustive pairing on a corpus you control —
    * and because the loss is otherwise SILENT, check
    * [[cosineDedupSkippedBuckets]] (same arguments): a non-empty result
    * enumerates exactly the buckets whose pairs this call dropped.
    */
  def cosineDedupCandidates(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      bits: Int,
      dim: Int,
      minCos: Double,
      maxBucketSize: Int = graft.dedup.Dedup.DefaultMaxBucketSize): DataFrame = {
    val b0 = withLshBucket(corpus.select(col(idCol).as("id"), col(vecCol).as("v")), "v", bits, dim)
    val b = if (maxBucketSize > 0) {
      // anti-join against the (tiny, usually empty) fat-bucket list —
      // bounded by |corpus| / maxBucketSize rows, so it broadcasts
      val fat = b0.groupBy("lsh_bucket").agg(count(lit(1)).as("__bsz"))
        .filter(col("__bsz") > maxBucketSize)
        .select("lsh_bucket")
      b0.join(broadcast(fat), Seq("lsh_bucket"), "left_anti")
    } else b0
    val a = b.alias("a")
    val c = b.alias("b")
    a.join(c, col("a.lsh_bucket") === col("b.lsh_bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
              cosine(col("a.v"), col("b.v")).as("cos"))
      .filter(col("cos") >= minCos)
  }

  /** The buckets a capped [[cosineDedupCandidates]] call SKIPPED, as
    * `(lsh_bucket, n_vectors)` — the recall-loss audit for the
    * single-bucket sketch, where a skipped bucket's pairs are permanently
    * lost (no bands to recover them). Empty result = the cap was a no-op
    * and the candidate set is exhaustive. One aggregate pass over the
    * sketch (same shuffle key as the candidate join); run it alongside
    * any capped production dedup and alert on non-empty.
    */
  def cosineDedupSkippedBuckets(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      bits: Int,
      dim: Int,
      maxBucketSize: Int = graft.dedup.Dedup.DefaultMaxBucketSize): DataFrame = {
    require(maxBucketSize > 0, "audit is for capped runs (maxBucketSize > 0)")
    withLshBucket(corpus.select(col(idCol).as("id"), col(vecCol).as("v")), "v", bits, dim)
      .groupBy("lsh_bucket").agg(count(lit(1)).as("n_vectors"))
      .filter(col("n_vectors") > maxBucketSize)
  }
}
