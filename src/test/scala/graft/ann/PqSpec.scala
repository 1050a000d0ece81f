package graft.ann

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Product quantization (ann/Pq): recall against the exact integer
  * top-k on a clustered fixture, index/search split equivalence,
  * compression shape, determinism. */
class PqSpec extends SparkSuite {
  import spark.implicits._

  private val Dim = 16
  private val rnd = new scala.util.Random(11)

  /** 4 well-separated cluster centers + jittered members. */
  private lazy val vectors: Seq[(Long, Seq[Float])] = {
    val centers = Seq.tabulate(4)(c =>
      Array.tabulate(Dim)(i => if (i % 4 == c) 1.0f else 0.05f))
    (0 until 240).map { id =>
      // cluster pattern deliberately decorrelated from the modulo anchor
      // pick (ids 0, 30, 60, …), so the 8 anchors cover all 4 clusters
      val c = centers(((id % 4) + (id / 30)) % 4)
      (id.toLong, c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.08f).toSeq)
    }
  }

  private lazy val df = vectors.toDF("vec_id", "embedding").repartition(5)

  private def exactTopK(probe: Long, k: Int): Seq[Long] = {
    def quant(v: Seq[Float]): Seq[Long] =
      v.map(x => math.floor(x.toDouble * 1e7 + 0.5).toLong)
    val pe = quant(vectors.find(_._1 == probe).get._2)
    vectors.filter(_._1 != probe)
      .map { case (id, v) => (quant(v).zip(pe).map { case (a, b) => a * b }.sum, id) }
      .sortBy { case (dotV, id) => (-dotV, id) }
      .take(k).map(_._2)
  }

  private def clusterOf(id: Long): Int = (((id % 4) + (id / 30)) % 4).toInt

  test("ADC top-k recovers the probe's cluster (what PQ promises)") {
    // PQ deliberately collapses within-cluster jitter (same-cluster
    // members share codes → identical ADC), so the honest metric at
    // this granularity is CLUSTER recall — every ranked neighbor should
    // come from the probe's cluster, as the exact top-k's do.
    val got = Pq.pqTopKPortable(df, df.filter(col("vec_id") < 8),
        "vec_id", "embedding", k = 10, m = 4, kSub = 8, dim = Dim)
      .collect()
      .groupBy(_.getAs[Long]("probe_id"))
      .view.mapValues(_.sortBy(_.getAs[Long]("rank"))
        .map(_.getAs[Long]("neighbor_id")).toSeq).toMap
    (0L until 8L).foreach { p =>
      val sameCluster = got(p).count(nb => clusterOf(nb) == clusterOf(p))
      assert(sameCluster >= 9, s"probe $p: $sameCluster/10 in-cluster")
      // and the exact top-k agrees on the cluster, so PQ's candidates
      // are drawn from the same pool the exact ranking uses
      assert(exactTopK(p, 10).forall(nb => clusterOf(nb) == clusterOf(p)))
    }
  }

  test("index/search split ≡ one-shot; codes table is m rows per vector") {
    val anchors = Pq.pqAnchors(df, "vec_id", "embedding", kSub = 8)
      .localCheckpoint()
    val codes = Pq.pqCodes(df, anchors, "vec_id", "embedding",
      m = 4, dim = Dim).localCheckpoint()
    assert(codes.count() == 240L * 4)
    assert(codes.groupBy("neighbor_id").count()
      .filter(col("count") =!= 4).count() == 0L)
    // every code points at a real anchor
    assert(codes.select("cidx").distinct().collect()
      .map(_.getInt(0)).forall(c => c >= 1 && c <= 8))
    val split = Pq.pqSearch(anchors, codes, df.filter(col("vec_id") < 4),
        "vec_id", "embedding", k = 5, m = 4, dim = Dim)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(1))).toSet
    val oneShot = Pq.pqTopKPortable(df, df.filter(col("vec_id") < 4),
        "vec_id", "embedding", k = 5, m = 4, kSub = 8, dim = Dim)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"))).toSet
    assert(split == oneShot)
  }

  test("IVF-PQ ≡ PQ restricted to the probed lists (the layering identity)") {
    val nLists = 6
    val nProbe = 2
    // plain-Scala rederivation of the modulo routing
    def quant(v: Seq[Float]): Seq[Long] =
      v.map(x => math.floor(x.toDouble * 1e7 + 0.5).toLong)
    val n = vectors.size
    val step = math.max(1L, n.toLong / nLists)
    val cents = vectors.filter(_._1 % step == 0).sortBy(_._1).take(nLists)
      .map { case (id, v) => (id, quant(v)) }
    def routeTop(v: Seq[Float], take: Int): Seq[Long] =
      cents.map { case (cid, ce) =>
        (quant(v).zip(ce).map { case (a, b) => a * b }.sum, cid) }
        .sortBy { case (d, cid) => (-d, cid) }.take(take).map(_._2)
    val listOf = vectors.map { case (id, v) => id -> routeTop(v, 1).head }.toMap

    val probes = df.filter(col("vec_id") < 6)
    val full = Pq.pqTopKPortable(df, probes, "vec_id", "embedding",
        k = vectors.size, m = 4, kSub = 8, dim = Dim)
      .collect()
      .map(r => (r.getLong(0), r.getAs[Long]("neighbor_id"),
        r.getAs[Long]("adc")))
    val got = Pq.ivfPqTopKPortable(df, probes, "vec_id", "embedding",
        k = 5, m = 4, kSub = 8, dim = Dim, nLists = nLists, nProbe = nProbe)
      .collect()
      .groupBy(_.getAs[Long]("probe_id"))
      .view.mapValues(_.sortBy(_.getAs[Long]("rank"))
        .map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Long]("adc")))
        .toSeq).toMap
    (0L until 6L).foreach { pid =>
      val probedLists = routeTop(vectors.find(_._1 == pid).get._2, nProbe).toSet
      val expected = full.filter { case (p, nb, _) =>
        p == pid && probedLists.contains(listOf(nb)) }
        .map { case (_, nb, adc) => (adc, nb) }
        .sortBy { case (adc, nb) => (-adc, nb) }
        .take(5).map { case (adc, nb) => (nb, adc) }.toSeq
      assert(got(pid) == expected, s"probe $pid")
    }
  }

  test("learned per-block codebooks match or beat the anchor pick") {
    def clusterHits(rows: Array[org.apache.spark.sql.Row]): Int =
      rows.count(r => clusterOf(r.getAs[Long]("neighbor_id")) ==
        clusterOf(r.getAs[Long]("probe_id")))
    val probes = df.filter(col("vec_id") < 8)
    val anchorHits = clusterHits(Pq.pqTopKPortable(df, probes,
      "vec_id", "embedding", k = 10, m = 4, kSub = 8, dim = Dim).collect())
    val learnedHits = clusterHits(Pq.pqTopKLearned(df, probes,
      "vec_id", "embedding", k = 10, m = 4, kSub = 8, dim = Dim).collect())
    assert(learnedHits >= anchorHits, s"learned $learnedHits < $anchorHits")
    assert(learnedHits >= 72, s"learned cluster hits $learnedHits/80")
    // the codebook frame has m·kSub rows with dsub-wide centroids
    val cb = Pq.pqCodebooksKmeans(df, "vec_id", "embedding",
      m = 4, kSub = 8, dim = Dim)
    assert(cb.count() == 32L)
    assert(cb.select(org.apache.spark.sql.functions.size(col("__cb")))
      .distinct().head().getInt(0) == Dim / 4)
  }

  test("learned IVF-PQ ≡ learned PQ restricted to the probed lists") {
    // the layering identity on the LEARNED substrate: with one shared
    // codebook training, ivfPqTopKLearned must equal pqTopKLearned
    // filtered to the probed lists' members (same routing as the
    // portable identity above)
    val nLists = 6
    val nProbe = 2
    def quant(v: Seq[Float]): Seq[Long] =
      v.map(x => math.floor(x.toDouble * 1e7 + 0.5).toLong)
    val n = vectors.size
    val step = math.max(1L, n.toLong / nLists)
    val cents = vectors.filter(_._1 % step == 0).sortBy(_._1).take(nLists)
      .map { case (id, v) => (id, quant(v)) }
    def routeTop(v: Seq[Float], take: Int): Seq[Long] =
      cents.map { case (cid, ce) =>
        (quant(v).zip(ce).map { case (a, b) => a * b }.sum, cid) }
        .sortBy { case (d, cid) => (-d, cid) }.take(take).map(_._2)
    val listOf = vectors.map { case (id, v) => id -> routeTop(v, 1).head }.toMap

    val probes = df.filter(col("vec_id") < 6)
    val cb = Pq.pqCodebooksKmeans(df, "vec_id", "embedding",
      m = 4, kSub = 8, dim = Dim).localCheckpoint()
    val full = Pq.pqTopKLearned(df, probes, "vec_id", "embedding",
        k = vectors.size, m = 4, kSub = 8, dim = Dim, codebooks0 = Some(cb))
      .collect()
      .map(r => (r.getLong(0), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("adc")))
    val got = Pq.ivfPqTopKLearned(df, probes, "vec_id", "embedding",
        k = 5, m = 4, kSub = 8, dim = Dim, nLists = nLists, nProbe = nProbe,
        codebooks0 = Some(cb))
      .collect()
      .groupBy(_.getAs[Long]("probe_id"))
      .view.mapValues(_.sortBy(_.getAs[Long]("rank"))
        .map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Double]("adc")))
        .toSeq).toMap
    (0L until 6L).foreach { pid =>
      val probedLists = routeTop(vectors.find(_._1 == pid).get._2, nProbe).toSet
      val expected = full.filter { case (p, nb, _) =>
        p == pid && probedLists.contains(listOf(nb)) }
        .map { case (_, nb, adc) => (adc, nb) }
        .sortBy { case (adc, nb) => (-adc, nb) }
        .take(5).map { case (adc, nb) => (nb, adc) }.toSeq
      // ids exact; adc to 1e-9 relative — the restricted plan sums the
      // same doubles in a different order (the documented float-sum
      // caveat of the learned substrate; the portable identity above
      // is the bit-exact one)
      assert(got(pid).map(_._1) == expected.map(_._1), s"probe $pid ids")
      got(pid).zip(expected).foreach { case ((_, a), (_, b)) =>
        assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b)),
          s"probe $pid adc $a vs $b")
      }
    }
  }

  test("ADC shortlist + exact rerank ≡ brute force at full shortlist") {
    // with the shortlist covering the whole corpus, the rerank's exact
    // cosine ordering must reproduce brute force verbatim — pins that
    // the production deployment (codes retrieve, full vectors re-score)
    // degrades ONLY through shortlist misses, never through scoring
    val probes = df.filter(col("vec_id") < 4)
    def ids(rows: Array[org.apache.spark.sql.Row]): Map[Long, Seq[Long]] =
      rows.groupBy(_.getAs[Long]("probe_id"))
        .view.mapValues(_.sortBy(_.getAs[Long]("rank"))
          .map(_.getAs[Long]("neighbor_id")).toSeq).toMap
    val exact = ids(Similarity.bruteForceTopK(df, probes,
      "vec_id", "embedding", k = 5).collect())
    val reranked = ids(Pq.pqTopKLearnedRerank(df, probes,
      "vec_id", "embedding", k = 5, m = 4, kSub = 8, dim = Dim,
      shortlist = vectors.size).collect())
    assert(reranked == exact)
  }

  test("results are partitioning-invariant (integer substrate)") {
    def run(parts: Int) = Pq.pqTopKPortable(df.repartition(parts),
        df.filter(col("vec_id") === 0L), "vec_id", "embedding",
        k = 8, m = 4, kSub = 8, dim = Dim)
      .collect().map(r => (r.getAs[Long]("rank"), r.getAs[Long]("neighbor_id"),
        r.getAs[Long]("adc"))).toSet
    assert(run(2) == run(11))
  }
}
