package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generic range joins (point-in-interval and interval-overlap) as
  * shuffle-friendly equi-joins.
  *
  * Spark plans a raw inequality join (`p >= s AND p < e`) as a broadcast
  * nested loop or a cartesian product — O(|L|*|R|) work per executor,
  * dead at 100 TB. The standard scalable formulation used here maps both
  * sides onto fixed-width time/value buckets, equi-joins on
  * (keys, bucket), and re-applies the exact range predicate as a
  * residual filter:
  *
  *  - an interval [s, e) lands on every bucket in
  *    [s div W, (e-1) div W];
  *  - a point p lands on bucket p div W — exactly one, so
  *    point-in-interval needs no post-join dedup;
  *  - a pair of overlapping intervals co-occurs in every shared bucket;
  *    keeping only the FIRST shared bucket (`greatest(s_a, s_b) div W`)
  *    emits each pair exactly once — no `distinct()` shuffle.
  *
  * Work scales as |rows| * (span/W + 1): pick `bucketWidth` near the
  * typical interval span so the explosion factor stays near 1. The only
  * wide operation is the equi-join shuffle on (keys, bucket); AQE
  * handles runtime skew (a hot bucket splits). `RangeJoinSpec` pins the
  * physical plan: sort-merge/hash join, never a nested loop.
  *
  * The reference's event/pulse correlation is the degenerate case of
  * this (adjacent non-overlapping intervals → [[AsOfJoin]]); this
  * operator covers the general case: overlapping validity windows,
  * sensor calibration ranges, session containment.
  */
object RangeJoin {

  /** For every point row attach every interval row whose [start, end)
    * contains it (inner join; points in no interval drop out).
    *
    * Column names of `points` and `intervals` must be disjoint apart
    * from `keys`. All range columns must share one integral unit (epoch
    * days/µs/ns — integral `div` arithmetic is exact beyond 2^53 where
    * doubles are not).
    *
    * @param keys        extra equality keys (empty = pure range join)
    * @param bucketWidth bucket size in range units, ~typical span
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      keys: Seq[String] = Nil,
      bucketWidth: Long = 1024L): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val iv = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__bucket", explode(expr(
        s"sequence(`$startCol` div $bucketWidth, (`$endCol` - 1) div $bucketWidth)")))
    val pt = points.withColumn("__bucket", expr(s"`$pointCol` div $bucketWidth"))
    val cond = ("__bucket" +: keys).map(k => pt(k) === iv(k)).reduce(_ && _) &&
      iv(startCol) <= pt(pointCol) && pt(pointCol) < iv(endCol)
    pt.join(iv, cond)
      .select(points.columns.toIndexedSeq.map(pt.apply) ++
        intervals.columns.filterNot(keys.contains).map(iv.apply): _*)
  }

  /** [[pointInInterval]] with a LONG-INTERVAL escape hatch: real interval
    * tables are usually a mass of short intervals plus a few huge ones
    * (calibration windows, maintenance periods). A huge interval explodes
    * onto span/bucketWidth rows — one year at 1-minute buckets is 525k
    * copies — while being exactly the kind of tiny-side row a broadcast
    * join handles for free. So: intervals spanning more than
    * `longSpanBuckets` buckets go through a broadcast range join (they
    * must be FEW — that is what makes them broadcastable), everything
    * else through the bucketed equi-join; the result is their union.
    * Same output as [[pointInInterval]], no explosion term.
    */
  def pointInIntervalHybrid(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      keys: Seq[String] = Nil,
      bucketWidth: Long = 1024L,
      longSpanBuckets: Int = 64): DataFrame = {
    require(longSpanBuckets > 0, "longSpanBuckets must be positive")
    val spanLimit = bucketWidth * longSpanBuckets
    val isLong = (col(endCol) - col(startCol)) > spanLimit
    val short = intervals.filter(!isLong)
    val long = intervals.filter(isLong)
    val viaBuckets = pointInInterval(points, short, pointCol, startCol,
      endCol, keys, bucketWidth)
    val cond = keys.map(k => points(k) === long(k))
      .foldLeft(long(startCol) <= points(pointCol) &&
                points(pointCol) < long(endCol))(_ && _)
    val viaBroadcast = points.join(broadcast(long), cond)
      .select(points.columns.toIndexedSeq.map(points.apply) ++
        intervals.columns.filterNot(keys.contains).map(long.apply): _*)
    viaBuckets.unionByName(viaBroadcast)
  }

  /** All pairs (a, b) whose [start, end) intervals overlap:
    * `a.start < b.end AND b.start < a.end`. Each qualifying pair is
    * emitted exactly once (first-shared-bucket rule — no distinct).
    *
    * Column names of `a` and `b` must be disjoint apart from `keys`.
    */
  def intervalOverlap(
      a: DataFrame,
      b: DataFrame,
      aStart: String,
      aEnd: String,
      bStart: String,
      bEnd: String,
      keys: Seq[String] = Nil,
      bucketWidth: Long = 1024L): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def banded(df: DataFrame, s: String, e: String) = df
      .filter(col(e) > col(s))
      .withColumn("__bucket", explode(expr(
        s"sequence(`$s` div $bucketWidth, (`$e` - 1) div $bucketWidth)")))
    val ba = banded(a, aStart, aEnd)
    val bb = banded(b, bStart, bEnd)
    val cond = ("__bucket" +: keys).map(k => ba(k) === bb(k)).reduce(_ && _) &&
      ba(aStart) < bb(bEnd) && bb(bStart) < ba(aEnd) &&
      // overlap pairs co-occur in every shared bucket; count the pair only
      // in the first one (which both sides provably cover)
      ba("__bucket") === expr(s"greatest(`$aStart`, `$bStart`) div $bucketWidth")
    ba.join(bb, cond)
      .select(a.columns.toIndexedSeq.map(ba.apply) ++
        b.columns.filterNot(keys.contains).map(bb.apply): _*)
  }

  /** [[intervalOverlap]] with the same LONG-INTERVAL escape hatch as
    * [[pointInIntervalHybrid]]: an interval spanning more than
    * `longSpanBuckets` buckets explodes onto span/bucketWidth banded rows
    * AND overlaps a correspondingly huge number of buckets on the other
    * side — the quadratic skew term of banded overlap joins. Super-wide
    * intervals are rare by construction (a validity window covering the
    * whole timeline is closer to a dimension than to a fact), so they go
    * through a broadcast join instead:
    *
    *  - short a × short b: the bucketed first-shared-bucket equi-join;
    *  - long a × ALL b: `b ⋈ broadcast(long a)`;
    *  - short a × long b: `short a ⋈ broadcast(long b)`
    *    (long×long already covered by the second path).
    *
    * The three paths partition the pair space, so the union emits each
    * overlapping pair exactly once, matching [[intervalOverlap]]. With no
    * `keys` the broadcast paths plan as a broadcast nested loop — that is
    * the point: the loop side is the handful of wide intervals, giving
    * O(|rows| * |long|) with |long| small, instead of the unbounded
    * bucket fan-out.
    */
  def intervalOverlapHybrid(
      a: DataFrame,
      b: DataFrame,
      aStart: String,
      aEnd: String,
      bStart: String,
      bEnd: String,
      keys: Seq[String] = Nil,
      bucketWidth: Long = 1024L,
      longSpanBuckets: Int = 64): DataFrame = {
    require(longSpanBuckets > 0, "longSpanBuckets must be positive")
    val spanLimit = bucketWidth * longSpanBuckets
    def split(df: DataFrame, s: String, e: String)
        : (DataFrame, DataFrame, DataFrame) = {
      val nonEmpty = df.filter(col(e) > col(s))
      (nonEmpty,
        nonEmpty.filter(col(e) - col(s) <= spanLimit),
        nonEmpty.filter(col(e) - col(s) > spanLimit))
    }
    val (_, shortA, longA) = split(a, aStart, aEnd)
    val (allB, shortB, longB) = split(b, bStart, bEnd)
    def overlapCond(af: DataFrame, bf: DataFrame) =
      keys.map(k => af(k) === bf(k))
        .foldLeft(af(aStart) < bf(bEnd) && bf(bStart) < af(aEnd))(_ && _)
    def outCols(af: DataFrame, bf: DataFrame) =
      a.columns.toIndexedSeq.map(af.apply) ++
        b.columns.filterNot(keys.contains).map(bf.apply)
    val viaBuckets = intervalOverlap(
      shortA, shortB, aStart, aEnd, bStart, bEnd, keys, bucketWidth)
    val viaLongA = allB.join(broadcast(longA), overlapCond(longA, allB))
      .select(outCols(longA, allB): _*)
    val viaLongB = shortA.join(broadcast(longB), overlapCond(shortA, longB))
      .select(outCols(shortA, longB): _*)
    viaBuckets.unionByName(viaLongA).unionByName(viaLongB)
  }
}
