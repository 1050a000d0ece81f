package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Integer-substrate PageRank (ops/Graph): hand-derived fixture ranks,
  * partitioning invariance, dangling-mass handling, multi-edge weights. */
class GraphSpec extends SparkSuite {
  import spark.implicits._

  private val S = 1000000000000L

  /** The operator's documented formulas on plain Scala longs — an
    * independent rederivation (same role as the DuckDB oracle, minus
    * the engine). */
  private def expectedRanks(edges: Seq[(String, String)], iters: Int,
                            d: Int = 85): Map[String, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = nodes.map(_ -> S / n).toMap
    (0 until iters).foreach { _ =>
      val dangling = nodes.filterNot(deg.contains).map(r).sum
      val contrib = edges.groupBy(_._2).view.mapValues(_.map {
        case (s, _) => r(s) / deg(s)
      }.sum).toMap
      val base = (100L - d) * S / (100L * n)
      val dangShare = d * dangling / (100L * n)
      r = nodes.map(v =>
        v -> (base + dangShare + d * contrib.getOrElse(v, 0L) / 100L)).toMap
    }
    r
  }

  private def run(edges: Seq[(String, String)], iters: Int,
                  parts: Int = 4): Map[String, Long] =
    Graph.pageRank(edges.toDF("src", "dst").repartition(parts),
        "src", "dst", iterations = iters)
      .collect().map(row => row.getString(0) -> row.getLong(1)).toMap

  private val triangle = Seq("A" -> "B", "A" -> "C", "B" -> "C") // C dangles

  test("ranks match the hand formula, dangling node included") {
    for (iters <- Seq(0, 1, 3)) {
      assert(run(triangle, iters) == expectedRanks(triangle, iters),
        s"at $iters iterations")
    }
    // sink of the triangle outranks its feeders
    val r = run(triangle, 3)
    assert(r("C") > r("B") && r("B") > r("A"))
  }

  test("partitioning never changes a rank (integer substrate)") {
    val edges = (0 until 200).map(i =>
      (s"n${i % 17}", s"n${(i * 7 + 3) % 23}")).distinct
      .filter { case (a, b) => a != b }
    assert(run(edges, 3, parts = 1) == run(edges, 3, parts = 13))
    assert(run(edges, 3, parts = 13) == expectedRanks(edges, 3))
  }

  test("total mass is conserved up to floor loss") {
    val r = run(triangle, 4)
    val total = r.values.sum
    assert(total <= S)
    // loss bounded by iterations * nodes * division sites
    assert(S - total < 4L * 3 * 3)
  }

  test("multi-edges weigh multiply") {
    val single = run(Seq("A" -> "B", "A" -> "C"), 1)
    val doubled = run(Seq("A" -> "B", "A" -> "B", "A" -> "C"), 1)
    // with the duplicated edge, A's outdegree is 3 and B receives 2 shares
    assert(doubled("B") > single("B"))
    assert(doubled == expectedRanks(
      Seq("A" -> "B", "A" -> "B", "A" -> "C"), 1))
  }

  test("domainPageRank parses, drops self-links, and dedups") {
    val links = Seq(
      ("https://a.example.com/x", "https://b.example.org/y"),
      ("https://www.a.example.com/z", "https://b.example.org/w"), // same pair
      ("https://b.example.org/1", "https://cdn.b.example.org/2"), // self
      ("https://b.example.org/1", "https://c.example.net/2"))
      .toDF("src_url", "dst_url")
    val r = Graph.domainPageRank(links, "src_url", "dst_url", iterations = 2)
      .collect().map(row => row.getString(0) -> row.getLong(1)).toMap
    assert(r.keySet == Set("example.com", "example.org", "example.net"))
    assert(r == expectedRanks(
      Seq("example.com" -> "example.org", "example.org" -> "example.net"), 2))
  }
}
