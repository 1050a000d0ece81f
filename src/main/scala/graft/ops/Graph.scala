package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-graph ranking on a pure integer substrate — the domain-quality
  * prior web-curation pipelines attach to crawled documents (Common-Crawl
  * style host/domain ranking; composes with `graft.text.Web`'s
  * `registeredDomain`/`domainStats` and `Sampling.clusterCapped` on the
  * domain key).
  *
  * Why integers: a float power iteration is reduce-order-sensitive —
  * rank sums would differ run to run and engine to engine. Here total
  * mass is `scale` (default 10^12) integer units, every share is a
  * FLOOR division, and every per-iteration quantity is a sum of integers,
  * so the result is bit-identical across partitionings AND engines (the
  * `domain_pagerank` oracle replays the same iterations in SQL) — the
  * same no-libm discipline as `quality_pareto_lottery`/`temperature_mix`.
  * Floor losses stay in the graph's total mass as a small deficit
  * (bounded by n units per division site per iteration), never
  * redistributed noise.
  *
  * Scale shape: each iteration is ONE shuffle — ranks ⋈ out-degree-
  * annotated edges on src, then a map-side-combining sum keyed on dst.
  * The dangling mass is a single scalar (bounded collect, the k-means/
  * BPE bounded-model argument) and rides the next projection as a
  * literal. The per-iteration `localCheckpoint` is the standing
  * iterative-loop lineage rule (connected components, k-means).
  */
object Graph {

  /** Ranks after `iterations` synchronized power-iteration steps.
    * Input edges are used AS GIVEN (multi-edges weigh multiply — dedup
    * upstream if that is not intended). Returns `(node, rank)` where
    * rank is in integer `scale` units (Σ rank ≤ scale, the deficit being
    * accumulated floor loss).
    *
    * rank₀ = scale div n; then per step, with damping d = dampingPct:
    *   contrib(v) = Σ_{u→v} rank(u) div outdeg(u)
    *   dangling   = Σ_{outdeg(u)=0} rank(u)
    *   rank'(v)   = ((100−d)·scale) div (100·n)
    *              + (d·dangling) div (100·n)
    *              + (d·contrib(v)) div 100
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int = 3, dampingPct: Int = 85,
               scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 0 && dampingPct >= 0 && dampingPct <= 100)
    val src = col(srcCol)
    val dst = col(dstCol)

    val nodes = edges.select(src.as("node"))
      .union(edges.select(dst.as("node")))
      .distinct()
      .localCheckpoint() // two consumers per iteration + the node count
    val n = nodes.count()
    if (n == 0) return nodes.withColumn("rank", lit(0L))

    val outdeg = edges.groupBy(src.as("node"))
      .agg(count(lit(1)).as("__deg"))
    // one frame feeds every iteration: (src, dst, src outdeg)
    val linked = edges.select(src.as("__src"), dst.as("__dst"))
      .join(outdeg.withColumnRenamed("node", "__src"), Seq("__src"))
      .localCheckpoint()

    val base = ((100L - dampingPct) * scale) / (100L * n)
    var ranks = nodes.withColumn("rank", lit(scale / n))

    var i = 0
    while (i < iterations) {
      val withDeg = ranks.join(
        outdeg.withColumnRenamed("__deg", "__outdeg"), Seq("node"), "left")
      // dangling mass: one scalar, bounded collect
      val dangling = withDeg.filter(col("__outdeg").isNull)
        .agg(coalesce(sum(col("rank")), lit(0L))).head().getLong(0)
      val dangShare = (dampingPct * dangling) / (100L * n)
      // floor division BEFORE the sum (per-edge share, then integer sum)
      val contribExact = ranks
        .join(linked.withColumnRenamed("__src", "node"), Seq("node"))
        .groupBy(col("__dst").as("node"))
        .agg(sum(expr("rank div __deg")).as("__c"))
      ranks = nodes
        .join(contribExact, Seq("node"), "left")
        .select(col("node"),
          // integral `div`, not divide+cast: double division is only
          // exact while dampingPct*contrib < 2^53, and the float-free
          // bit-identical contract must hold for any caller scale
          (lit(base + dangShare) +
            expr(s"($dampingPct * coalesce(__c, 0L)) div 100"))
            .as("rank"))
        .localCheckpoint()
      i += 1
    }
    ranks
  }

  /** Convenience: rank registered domains from a (src_url, dst_url) link
    * frame — parse both sides with [[graft.text.Web.registeredDomain]],
    * drop self-links and dedup, then [[pageRank]]. */
  def domainPageRank(links: DataFrame, srcUrlCol: String, dstUrlCol: String,
                     iterations: Int = 3, dampingPct: Int = 85): DataFrame = {
    import graft.text.Web
    val e = links.select(
        Web.registeredDomain(Web.host(col(srcUrlCol))).as("src_domain"),
        Web.registeredDomain(Web.host(col(dstUrlCol))).as("dst_domain"))
      .filter(col("src_domain") =!= "" && col("dst_domain") =!= "" &&
        col("src_domain") =!= col("dst_domain"))
      .distinct()
    pageRank(e, "src_domain", "dst_domain", iterations, dampingPct)
  }
}
