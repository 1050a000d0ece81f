package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

class SamplingSpec extends SparkSuite {
  import spark.implicits._

  private def df = (1L to 4000L).map(i =>
    (i, if (i % 2 == 0) "keep_all" else "half")).toDF("id", "stratum")

  test("stratified keeps rate-1.0 strata fully and others near their rate") {
    val kept = Sampling.stratified(df, "id", "stratum",
      Map("keep_all" -> 1.0, "half" -> 0.5), defaultRate = 0.0)
    val counts = kept.groupBy("stratum").count()
      .as[(String, Long)].collect().toMap
    assert(counts("keep_all") === 2000L)
    assert(math.abs(counts("half") - 1000L) < 100, s"got ${counts("half")}")
  }

  test("sampling is deterministic and monotone in the rate") {
    val a = Sampling.stratified(df, "id", "stratum", Map.empty, 0.3)
      .select("id").as[Long].collect().toSet
    val b = Sampling.stratified(df, "id", "stratum", Map.empty, 0.3)
      .select("id").as[Long].collect().toSet
    assert(a === b)
    val wider = Sampling.stratified(df, "id", "stratum", Map.empty, 0.6)
      .select("id").as[Long].collect().toSet
    assert(a.subsetOf(wider)) // raising the rate only adds rows
  }

  test("upsampled emits floor(rate) copies plus a deterministic fraction") {
    val src = (1L to 4000L).map(i => (i, s"d$i")).toDF("id", "payload")
    val up = Sampling.upsampled(src, "id", 2.3)
    val n = up.count()
    // expectation 2.3 * 4000 = 9200; hash fraction is near-uniform
    assert(math.abs(n - 9200L) < 200, s"got $n")
    // every id has 2 or 3 copies, numbered from 0 contiguously
    val perId = up.groupBy("id").agg(
        count(lit(1)).as("n"), min("copy").as("lo"), max("copy").as("hi"))
      .select("n", "lo", "hi").as[(Long, Long, Long)].collect()
    assert(perId.forall { case (c, lo, hi) =>
      (c == 2L || c == 3L) && lo == 0L && hi == c - 1 })
    // deterministic across evaluations
    val again = Sampling.upsampled(src, "id", 2.3).count()
    assert(again === n)
    // sub-1.0 rates degenerate to stratified-style filtering
    val down = Sampling.upsampled(src, "id", 0.5)
    assert(math.abs(down.count() - 2000L) < 100)
    assert(down.select(max("copy")).as[Long].head() === 0L)
  }

  test("default rate applies to unlisted strata") {
    val kept = Sampling.stratified(df, "id", "stratum",
      Map("keep_all" -> 0.0), defaultRate = 1.0)
    val counts = kept.groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(!counts.contains("keep_all"))
    assert(counts("half") === 2000L)
  }

  test("assignSplit: proportional, exhaustive, weight-scale invariant") {
    val ids = (0L until 10000L).toDF("id")
    val out = Sampling.assignSplit(ids, "id",
        Seq(("train", 8.0), ("val", 1.0), ("test", 1.0)))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    // every row lands in exactly one split
    assert(out.values.sum === 10000L)
    assert(out.keySet === Set("train", "val", "test"))
    // ~80/10/10 within sampling noise
    assert(math.abs(out("train") - 8000L) < 300, out.toString)
    assert(math.abs(out("val") - 1000L) < 150, out.toString)
    assert(math.abs(out("test") - 1000L) < 150, out.toString)
    // weights normalize: (8,1,1) ≡ (0.8,0.1,0.1)
    val frac = Sampling.assignSplit(ids, "id",
        Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(frac === out)
  }

  test("assignSplit on a group key is leakage-safe: groups never straddle splits") {
    // rows carry a group key (e.g. a near-dup cluster representative);
    // hashing the KEY puts every member in the same split
    val rows = (0L until 3000L).map(i => (i, i / 3)).toDF("id", "component")
    val splits = Sampling.assignSplit(rows, "component",
      Seq(("train", 0.8), ("test", 0.2)))
    val perGroup = splits.groupBy("component")
      .agg(countDistinct("split").as("n")).select("n").as[Long].collect()
    assert(perGroup.forall(_ === 1L))
    // and the group-level proportions still track the weights
    val trainGroups = splits.filter($"split" === "train")
      .select("component").distinct().count()
    assert(math.abs(trainGroups - 800L) < 80, trainGroups.toString)
  }

  test("clusterCapped keeps at most cap per cluster, deterministically") {
    // cluster 0: 100 members; cluster 1: 3; cluster 2: exactly cap
    val rows = ((0L until 100L).map(i => (i, "c0")) ++
      (100L until 103L).map(i => (i, "c1")) ++
      (200L until 205L).map(i => (i, "c2"))).toDF("id", "cluster")
    val kept = Sampling.clusterCapped(rows, "id", "cluster", cap = 5, "s1")
    val byCluster = kept.groupBy("cluster").count()
      .as[(String, Long)].collect().toMap
    assert(byCluster === Map("c0" -> 5L, "c1" -> 3L, "c2" -> 5L))
    // replay-stable: same survivors both times
    val again = Sampling.clusterCapped(rows, "id", "cluster", cap = 5, "s1")
      .select("id").as[Long].collect().toSet
    assert(again === kept.select("id").as[Long].collect().toSet)
    // seed changes the big cluster's selection (5-of-100 overlap is
    // vanishingly unlikely to be identical)
    val other = Sampling.clusterCapped(rows, "id", "cluster", cap = 5, "s2")
      .filter($"cluster" === "c0").select("id").as[Long].collect().toSet
    val first = kept.filter($"cluster" === "c0")
      .select("id").as[Long].collect().toSet
    assert(other !== first)
    // adding rows to ANOTHER cluster never changes c0's survivors
    val grown = rows.unionByName(Seq((300L, "c9")).toDF("id", "cluster"))
    val c0After = Sampling.clusterCapped(grown, "id", "cluster", cap = 5, "s1")
      .filter($"cluster" === "c0").select("id").as[Long].collect().toSet
    assert(c0After === first)
  }

  test("fixedSizeSample: exactly k, deterministic, seed-sensitive") {
    val rows = (0L until 1000L).toDF("id")
    val s1 = Sampling.fixedSizeSample(rows, "id", k = 50, "seedA")
      .select("id").as[Long].collect().toSet
    assert(s1.size === 50)
    assert(s1 === Sampling.fixedSizeSample(rows, "id", k = 50, "seedA")
      .select("id").as[Long].collect().toSet, "replay-stable")
    val s2 = Sampling.fixedSizeSample(rows, "id", k = 50, "seedB")
      .select("id").as[Long].collect().toSet
    assert(s1 !== s2, "different seed draws a different set")
    // smaller k is a prefix of larger k under the same seed (rank-based)
    val s3 = Sampling.fixedSizeSample(rows, "id", k = 20, "seedA")
      .select("id").as[Long].collect().toSet
    assert(s3.subsetOf(s1))
    // k >= corpus returns everything
    assert(Sampling.fixedSizeSample(rows, "id", k = 5000, "seedA").count() === 1000L)
  }

  test("temperatureRates: α=1 identity, α=0 uniform, size-preserving in between") {
    val counts = Seq(("head", 8000L), ("mid", 1500L), ("tail", 500L))
    val n = counts.map(_._2).sum.toDouble
    // α=1: natural proportions, every rate exactly 1
    Sampling.temperatureRates(counts, alpha = 1.0).values
      .foreach(r => assert(math.abs(r - 1.0) < 1e-12))
    // α=0: uniform strata — expected counts n_i·r_i all equal N/k
    val flat = Sampling.temperatureRates(counts, alpha = 0.0)
    counts.foreach { case (s, c) =>
      assert(math.abs(c * flat(s) - n / 3) < 1e-6) }
    // α=0.5: head shrinks, tail grows, total preserved
    val half = Sampling.temperatureRates(counts, alpha = 0.5)
    assert(half("head") < 1.0 && half("tail") > 1.0)
    assert(half("tail") > half("mid") && half("mid") > half("head"))
    val total = counts.map { case (s, c) => c * half(s) }.sum
    assert(math.abs(total - n) < 1e-6, s"Σ n_i·r_i must stay N: $total vs $n")
  }

  test("upsampledByStratum: per-stratum multiplicities, deterministic replay") {
    val rows = ((0L until 400L).map(i => (i, "a")) ++
      (1000L until 1200L).map(i => (i, "b"))).toDF("id", "s")
    val rates = Map("a" -> 0.5, "b" -> 2.25)
    val out = Sampling.upsampledByStratum(rows, "id", "s", rates)
    val byStratum = out.groupBy("s").count()
      .as[(String, Long)].collect().toMap
    // a: 400·0.5 = 200 expected; b: 200·2.25 = 450 expected
    assert(byStratum("a") > 150 && byStratum("a") < 250, s"a=${byStratum("a")}")
    assert(byStratum("b") > 430 && byStratum("b") < 470, s"b=${byStratum("b")}")
    // whole copies are exact: every b row appears at least twice
    val bCopies = out.filter($"s" === "b").groupBy("id").count()
      .as[(Long, Long)].collect().toMap
    assert(bCopies.values.forall(c => c == 2L || c == 3L))
    // replay-stable
    val again = Sampling.upsampledByStratum(rows, "id", "s", rates)
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(again === byStratum)
  }

  test("temperatureMixSqrt ≈ float α=0.5 mix, integer-deterministic") {
    val rows = ((0L until 3000L).map(i => (i, "head")) ++
      (10000L until 10600L).map(i => (i, "mid")) ++
      (20000L until 20150L).map(i => (i, "tail"))).toDF("id", "s")
    val counts = Seq(("head", 3000L), ("mid", 600L), ("tail", 150L))
    val floatRates = Sampling.temperatureRates(counts, alpha = 0.5)
    val out = Sampling.temperatureMixSqrt(rows, "id", "s")
    val got = out.groupBy("s").count().as[(String, Long)].collect().toMap
    // realized multiplicities track the float rates (lottery noise only:
    // ±4·sqrt(n) around n_i·r_i)
    counts.foreach { case (s, c) =>
      val expected = c * floatRates(s)
      assert(math.abs(got(s) - expected) < 4 * math.sqrt(expected) + 4,
        s"$s: got ${got(s)}, expected ~$expected")
    }
    // total size preserved (within lottery noise)
    assert(math.abs(got.values.sum - 3750L) < 100)
    // exact replay: identical multiset both times
    val a1 = out.select("id", "copy").as[(Long, Long)].collect().sorted.toSeq
    val a2 = Sampling.temperatureMixSqrt(rows, "id", "s")
      .select("id", "copy").as[(Long, Long)].collect().sorted.toSeq
    assert(a1 === a2)
  }

  test("tokenBudgetMix keeps each stratum's id-order prefix under the cap") {
    val docs = Seq(
      (1L, "a", 400L), (2L, "a", 500L), (3L, "a", 200L), (4L, "a", 50L),
      (5L, "b", 1500L), (6L, "b", 10L),  // over-long head closes b at once
      (7L, "c", 1000L), (8L, "c", 1L))   // exact boundary is kept
      .toDF("doc_id", "source", "n_tokens")
    val kept = Sampling.tokenBudgetMix(docs, "source", "n_tokens",
        col("doc_id"), budgetPerStratum = 1000L)
      .select("doc_id", "cum_tokens").as[(Long, Long)].collect().toMap
    // a: 400, 900, then 1100 > 1000 stops doc 3; doc 4 would fit the
    // remaining budget but prefix semantics (inclusive cumsum) still
    // exclude it — budgets cut a PREFIX, not a best-fit subset
    assert(kept.keySet === Set(1L, 2L, 7L))
    assert(kept(2L) === 900L && kept(7L) === 1000L)
  }
}
