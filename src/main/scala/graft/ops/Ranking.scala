package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable global-ordering primitives.
  *
  * A global `Window.orderBy` (row_number/ntile/lead with no partition
  * spec) moves ALL rows to a single partition — the exact pattern the
  * reference's pulse derivation uses (spark_events_by_time_parquet.py:119
  * orders the whole timing log globally) and the one thing that cannot
  * survive 100 TB. These helpers compute the same results with a
  * range-partitioned sort:
  *
  *  1. `repartitionByRange` on the sort keys (sampled range boundaries,
  *     the same mechanism a global sort uses) + `sortWithinPartitions`;
  *  2. per-row positions come from `monotonically_increasing_id()` over
  *     the sorted partitions (contiguous within a partition), so no
  *     second shuffle and no window at all for row numbers;
  *  3. a tiny per-partition summary (one row per partition — row counts,
  *     id bases, first values) is collected to the driver and broadcast
  *     back to stitch partitions together.
  *
  * The driver-side step is O(numPartitions), independent of data size —
  * the same cost class as the range-boundary sampling Spark already does.
  *
  * Results are identical to the single-partition window ONLY when the
  * ordering is total (callers must pass tie-breaking columns), which the
  * cross-engine oracle checks require anyway.
  */
object Ranking {

  private val Pid = "__rank_pid"
  private val Mid = "__rank_mid"

  /** Range-partition + sort, tagging each row with its partition id and a
    * monotonic id (row order within the partition).
    *
    * MUST materialize (localCheckpoint) before use: the per-partition
    * stats and the final output are separate actions, and
    * `repartitionByRange` samples its boundaries with an RDD-id-dependent
    * seed — without pinning, the two actions can land on DIFFERENT range
    * boundaries and the stitched offsets mis-assign whole partitions
    * (observed as ~whole-partition row-number shifts at sf0.01). The
    * materialized pass is also what the second action reads, so the sort
    * runs once, not twice. (On a real cluster: a reliable checkpoint or
    * an explicit staging table plays this role.)
    */
  private def ranged(df: DataFrame, orderCols: Seq[Column],
                     numPartitions: Int): DataFrame =
    df.repartitionByRange(numPartitions, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .withColumn(Pid, spark_partition_id())
      .withColumn(Mid, monotonically_increasing_id())
      .localCheckpoint()

  private def resolveN(df: DataFrame, numPartitions: Int): Int =
    if (numPartitions > 0) numPartitions
    else {
      val n = df.sparkSession.sessionState.conf.numShufflePartitions
      // SCALE-ADAPTIVE width (optimization guide §2.2 "fewer, larger
      // reduce partitions"): a frame whose whole optimizer-estimated
      // size fits ONE scan split gains nothing from n-way ranging —
      // each range stage then pays n task launches (and the stitch n
      // driver rows) to move a handful of KB. Width 1 makes every
      // stitch input trivial (offsets 0, no next-partition patch), so
      // the ops below drop the checkpoint materialization AND the
      // driver collect entirely and become one plain partition-local
      // window — measured 2 fewer jobs per ranking op at sf0.1 (r19
      // ran these at compactWidth and still paid both stitch actions).
      // Results are width-independent (the stitch math is exact), so
      // this only changes task counts. Large frames keep the full
      // width — the 100 TB shape is untouched.
      if (Parallelism.isSmall(df)) 1
      else n
    }

  /** The `n == 1` fast path's window: ALL rows form one group. The
    * constant partition key is what makes this the scale-UNSAFE shape —
    * only reachable when `resolveN` proved the frame fits one scan
    * split (or a caller explicitly asked for 1) — but it keeps the op
    * to ONE exchange with ZERO extra actions, where the ranged stitch
    * pays a checkpoint job + a stats collect job.
    *
    * The key must be single-valued AND non-foldable: a literal key is
    * stripped by the optimizer (FoldablePropagation +
    * EliminateWindowPartitions), leaving the bare global window whose
    * WindowExec warning exists to flag UNINTENTIONAL collapses —
    * this one is deliberate and size-gated, so it must not cry wolf
    * in every log. pmod(xxhash64(col), 1) is 0 on every row (null
    * included) yet input-dependent to the optimizer; frames with no
    * hash-safe atomic column fall back to the literal (worst case: the
    * warning, never a wrong result). */
  private def singleWindow(df: DataFrame, orderCols: Seq[Column]) = {
    import org.apache.spark.sql.types._
    val key = df.schema.fields
      .find(_.dataType match {
        case _: NumericType | StringType | BooleanType | DateType |
             TimestampType | TimestampNTZType | BinaryType => true
        case _ => false
      })
      // backtick-quote: a dotted column name would otherwise parse as
      // nested access and break frames the stitched path handled fine
      .map(f => pmod(xxhash64(
        col(s"`${f.name.replace("`", "``")}`")), lit(1L)))
      .getOrElse(lit(0L))
    Window.partitionBy(key).orderBy(orderCols: _*)
  }

  /** (tagged frame with row numbers, total row count). */
  private def withRowNumber(df: DataFrame, orderCols: Seq[Column], as: String,
                            n: Int): (DataFrame, Long) = {
    val tagged = ranged(df, orderCols, n)
    // one row per partition -> driver: (count, first monotonic id)
    val stats = tagged.groupBy(col(Pid))
      .agg(count(lit(1)).as("cnt"), min(col(Mid)).as("m0"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val counts = (0 until n).map(p => stats.get(p).map(_._1).getOrElse(0L))
    val offsets = counts.scanLeft(0L)(_ + _).take(n).toIndexedSeq
    val bases = (0 until n).map(p => stats.get(p).map(_._2).getOrElse(0L))
    // rn = rows-before-this-partition + position-within-partition + 1
    val rn = element_at(typedLit(offsets), col(Pid) + 1) +
      (col(Mid) - element_at(typedLit(bases.toIndexedSeq), col(Pid) + 1)) + 1
    (tagged.withColumn(as, rn), counts.sum)
  }

  /** Global 1-based row number by `orderCols` without a single-partition
    * window. `orderCols` must be a total order for deterministic output.
    */
  def globalRowNumber(df: DataFrame, orderCols: Seq[Column], as: String,
                      numPartitions: Int = 0): DataFrame = {
    val n = resolveN(df, numPartitions)
    if (n == 1)
      df.withColumn(as,
        row_number().over(singleWindow(df, orderCols)).cast("long"))
    else {
      val (tagged, _) = withRowNumber(df, orderCols, as, n)
      tagged.drop(Pid, Mid)
    }
  }

  /** Global NTILE(k) by `orderCols` — the standard SQL bucket sizing
    * (first `total % k` buckets get one extra row), computed from the
    * scalable global row number instead of a one-partition window.
    */
  def globalNtile(df: DataFrame, k: Int, orderCols: Seq[Column], as: String,
                  numPartitions: Int = 0): DataFrame = {
    require(k > 0, "ntile buckets must be positive")
    val n = resolveN(df, numPartitions)
    if (n == 1)
      // Spark's ntile IS the standard SQL bucket sizing the stitched
      // variant reproduces — one window, no total-count action
      return df.withColumn(as,
        ntile(k).over(singleWindow(df, orderCols)).cast("long"))
    val (withRn, total) =
      withRowNumber(df, orderCols, "__rank_rn", n)
    val base = total / k
    val rem = total % k
    // INTEGRAL division (DIV), not Column `/`: the latter is IEEE double
    // division, and once row numbers pass ~2^40 a correctly-rounded
    // quotient can truncate into the adjacent bucket at exact boundaries
    // — invisible at test SF, wrong at 100 TB row counts.
    // rows 1..(base+1)*rem fall in the first rem (larger) buckets
    val bucket =
      if (base == 0) col("__rank_rn") // fewer rows than buckets
      else
        when(col("__rank_rn") <= lit((base + 1) * rem),
          expr(s"(__rank_rn - 1) DIV ${base + 1} + 1"))
        .otherwise(
          expr(s"$rem + (__rank_rn - ${(base + 1) * rem} - 1) DIV $base + 1"))
    withRn.withColumn(as, bucket.cast("long"))
      .drop(Pid, Mid, "__rank_rn")
  }

  /** Global INCLUSIVE running sum of `srcCol` (integral) by `orderCols`
    * without a single-partition window: per-partition running sums (the
    * window partitions by the range-partition id, so it never
    * concentrates rows) plus a driver-side O(numPartitions) prefix of the
    * per-partition totals broadcast back as offsets.
    *
    * `orderCols` must be ASCENDING and a total order for deterministic
    * output. The exclusive variant is `result - srcCol`. The frame is
    * ROWS-explicit (unboundedPreceding..currentRow): if a caller violates
    * the total-order requirement, tied rows get positional running sums
    * (order within ties non-deterministic) rather than silently sharing
    * the peer-inclusive RANGE-frame sum.
    */
  def globalRunningSum(df: DataFrame, srcCol: String, orderCols: Seq[Column],
                       as: String, numPartitions: Int = 0): DataFrame = {
    val n = resolveN(df, numPartitions)
    if (n == 1)
      return df.withColumn(as,
        sum(col(srcCol).cast("long")).over(singleWindow(df, orderCols)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tagged = ranged(df, orderCols, n)
    val totals = tagged.groupBy(col(Pid))
      .agg(sum(col(srcCol).cast("long")).as("s"))
      .collect().map(r =>
        // a partition whose srcCol values are all NULL sums to NULL;
        // it contributes 0 to downstream offsets (matching the global
        // window, where sum skips NULLs)
        r.getInt(0) -> (if (r.isNullAt(1)) 0L else r.getLong(1))).toMap
    val offsets = (0 until n)
      .scanLeft(0L)((acc, p) => acc + totals.getOrElse(p, 0L))
      .take(n).toIndexedSeq
    val w = Window.partitionBy(col(Pid)).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn(as,
        sum(col(srcCol).cast("long")).over(w) +
          element_at(typedLit(offsets), col(Pid) + 1))
      .drop(Pid, Mid)
  }

  /** Per-KEY inclusive running sum of `srcCol` by `orderCols` within each
    * `keyCol` group, without `Window.partitionBy(key)` — the SQL-obvious
    * form concentrates EVERY row of a key into one reducer, which for
    * corpus-slice keys (tens of sources over 100 TB) is a guaranteed
    * straggler. Here the data is range-partitioned on (key, order), so a
    * hot key spreads over many partitions; the stitch summary is one row
    * per (partition, key) — and because range partitioning keeps each
    * key's rows contiguous, that is O(numPartitions + |keys|) driver
    * rows, the same cost class as the global variant.
    *
    * Same contracts as [[globalRunningSum]]: ASCENDING total-order
    * `orderCols` (per key), integral `srcCol`, ROWS-explicit frame.
    */
  def keyedRunningSum(df: DataFrame, keyCol: String, srcCol: String,
                      orderCols: Seq[Column], as: String,
                      numPartitions: Int = 0): DataFrame = {
    val n = resolveN(df, numPartitions)
    if (n == 1)
      // the SQL-obvious per-key window: sound EXACTLY here, where the
      // whole frame fits one scan split (the scale hazard this op
      // exists for is a hot key concentrating a 100 TB corpus slice)
      return df.withColumn(as,
        sum(col(srcCol).cast("long")).over(
          Window.partitionBy(col(keyCol)).orderBy(orderCols: _*)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tagged = ranged(df, col(keyCol) +: orderCols, n)
    // NUL sentinel keeps a null key addressable in the offset map (and
    // cannot collide: it is not a value cast-to-string produces)
    def keyStr(v: Any): String = Option(v).map(_.toString).getOrElse("\u0000")
    val totals = tagged.groupBy(col(Pid), col(keyCol))
      .agg(sum(col(srcCol).cast("long")).as("s"))
      .collect().map(r => (r.getInt(0), keyStr(r.get(1))) ->
        (if (r.isNullAt(2)) 0L else r.getLong(2))).toMap
    // per (pid, key) offset = this key's total over earlier pids
    val offsetMap: Map[String, Long] = totals.keys.map(_._2).toSeq.distinct
      .flatMap { k =>
        var acc = 0L
        (0 until n).flatMap { p =>
          val entry = totals.get((p, k)).map { t =>
            val e = s"$p|$k" -> acc; acc += t; e
          }
          entry
        }
      }.toMap
    val w = Window.partitionBy(col(Pid), col(keyCol)).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lookupKey = concat(col(Pid).cast("string"), lit("|"),
      coalesce(col(keyCol).cast("string"), lit("\u0000")))
    tagged.withColumn(as,
        sum(col(srcCol).cast("long")).over(w) +
          coalesce(element_at(typedLit(offsetMap), lookupKey), lit(0L)))
      .drop(Pid, Mid)
  }

  /** Global lead(srcCol, 1) by `orderCols` without a single-partition
    * window: per-partition lead, with each partition's last row patched
    * from the first value of the next non-empty partition (one row per
    * partition via the driver, broadcast back).
    *
    * `orderCols` must be ASCENDING (the per-partition "first" is computed
    * as a struct-min) and a total order.
    */
  def globalLead(df: DataFrame, srcCol: String, orderCols: Seq[Column],
                 as: String, numPartitions: Int = 0): DataFrame = {
    val n = resolveN(df, numPartitions)
    if (n == 1)
      // one group: the window's own lead IS total — no partition-edge
      // patch, so no stats collect and no checkpoint
      return df.withColumn(as,
        lead(col(srcCol), 1).over(singleWindow(df, orderCols)))
    val srcType = df.schema(srcCol).dataType
    val tagged = ranged(df, orderCols, n)
    // first srcCol value of each partition, in sort order: min of the
    // (orderCols..., src) struct — one row per partition
    val firstStruct = min(struct(
      orderCols.zipWithIndex.map { case (c, i) => c.as(s"__o$i") } :+
        col(srcCol).as("__src"): _*))
    val firsts = tagged.groupBy(col(Pid)).agg(firstStruct.as("f"))
      .select(col(Pid), col("f.__src").as("first_src"))
      .collect().map(r => r.getInt(0) -> r.get(1)).toMap
    // next non-empty partition's first value, per pid (null for the last)
    val nextFirst = (0 until n).map { pid =>
      ((pid + 1) until n).collectFirst {
        case p if firsts.contains(p) => firsts(p)
      }.orNull
    }
    val nextOf = array(nextFirst.map(v => lit(v).cast(srcType)): _*)
    val w = Window.partitionBy(col(Pid)).orderBy(orderCols: _*)
    tagged
      .withColumn(as,
        coalesce(lead(col(srcCol), 1).over(w),
          element_at(nextOf, col(Pid) + 1)))
      .drop(Pid, Mid)
  }
}
