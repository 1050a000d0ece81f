package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

class LayoutSpec extends SparkSuite {
  import spark.implicits._

  test("zValue interleaves bits: column 0 low lane, column 1 high lane") {
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (5L, 3L))
      .toDF("x", "y")
      .select(Layout.zValue(Seq(col("x"), col("y")), 4).as("z"))
      .as[Long].collect().toSeq
    def ref(x: Long, y: Long): Long =
      (0 until 4).foldLeft(0L) { (acc, b) =>
        acc | (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1))
      }
    assert(rows === Seq(ref(0, 0), ref(1, 0), ref(0, 1), ref(1, 1), ref(5, 3)))
    // spot values: (1,0) -> 1, (0,1) -> 2, (1,1) -> 3 (classic Morton)
    assert(rows(1) === 1L && rows(2) === 2L && rows(3) === 3L)
  }

  test("zOrderBy clusters a 2-D grid: per-partition spans shrink on BOTH columns") {
    // 32x32 uniform grid; z-order into 8 range partitions
    val grid = spark.range(0, 1024)
      .select((col("id") % 32).as("x"), expr("id div 32").as("y"))
    val parts = Layout.zOrderBy(grid, Seq("x", "y"), bitsPerCol = 5,
        numPartitions = 8)
      .withColumn("p", spark_partition_id())
      .groupBy("p")
      .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"),
        count(lit(1)).as("n"))
      .collect()
    assert(parts.map(_.getAs[Long]("n")).sum === 1024L)
    // a pure y-sort would leave x spanning the full 0..31 in every
    // partition; z-order keeps the AVERAGE span well under the global 31
    // on both axes simultaneously
    val avgSx = parts.map(_.getAs[Long]("sx")).sum.toDouble / parts.length
    val avgSy = parts.map(_.getAs[Long]("sy")).sum.toDouble / parts.length
    assert(avgSx <= 24.0, s"avg x span $avgSx")
    assert(avgSy <= 24.0, s"avg y span $avgSy")
    assert(avgSx + avgSy <= 40.0, s"joint span ${avgSx + avgSy}")
  }

  test("withZRank spreads skewed domains over the full bit lane") {
    // heavily skewed x (power-ish) and uniform y; rank-based z still uses
    // the whole 0..2^4-1 bucket range on both lanes
    val df = spark.range(0, 512)
      .select(col("id").as("doc_id"), (col("id") * col("id")).as("x"),
        (col("id") % 16).as("y"))
    val z = Layout.withZRank(df, Seq("x", "y"), "doc_id", bitsPerCol = 4)
    assert(z.count() === 512)
    val stats = z.agg(min("__z"), max("__z")).head()
    assert(stats.getLong(0) === 0L)
    // max z uses high buckets of both lanes (>= half the full code range)
    assert(stats.getLong(1) >= 128L)
  }
}
