package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

class HeavyHittersSpec extends SparkSuite {
  import spark.implicits._

  test("exact regime: k >= distinct values reproduces groupBy counts") {
    val df = (Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(7)("c"))
      .toDF("v").repartition(4)
    val hh = df.agg(HeavyHitters.topK(col("v"), 10).as("top"))
      .selectExpr("inline(top)")
      .select("value", "count", "error")
      .as[(String, Long, Long)].collect().toSeq
    assert(hh === Seq(("a", 50L, 0L), ("b", 30L, 0L), ("c", 7L, 0L)))
  }

  test("bounded state: heavy hitter survives eviction with bounded error") {
    val values = Seq.fill(1000)("hot") ++ (1 to 200).map(i => s"rare$i")
    val df = values.toDF("v").repartition(4)
    val hh = df.agg(HeavyHitters.topK(col("v"), 8).as("top"))
      .selectExpr("inline(top)")
      .select("value", "count", "error")
      .as[(String, Long, Long)].collect().toSeq
    val hot = hh.find(_._1 == "hot").get
    assert(hot._2 >= 1000L) // SpaceSaving never undercounts
    assert(hot._2 - hot._3 <= 1000L) // count - error is a lower bound
    assert(hh.size <= 8)
    assert(hh.head._1 === "hot") // still ranked first
  }

  test("works per group inside a groupBy") {
    val df = Seq(("g1", "x"), ("g1", "x"), ("g1", "y"), ("g2", "z"))
      .toDF("g", "v")
    val rows = df.groupBy("g").agg(HeavyHitters.topK(col("v"), 4).as("top"))
      .select(col("g"), expr("transform(top, t -> t.value)").as("vals"))
      .as[(String, Seq[String])].collect().toMap
    assert(rows("g1") === Seq("x", "y"))
    assert(rows("g2") === Seq("z"))
  }
}
