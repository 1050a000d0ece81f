package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.LongType

/** A whole-operator backward as-of join as a custom Catalyst plan —
  * design-ladder step (c): logical node + planner strategy + physical
  * `SparkPlan` (registered through `GraftExtensions`).
  *
  * [[graft.ops.AsOfJoin.backward]] composes the same semantics from
  * built-in operators via interval bucketing, which is the right default
  * — but its cost carries an explosion factor of (interval span /
  * bucketWidth). When right-side gaps are HEAVY-TAILED (a run that idles
  * for hours between pulse bursts), no single bucketWidth works: narrow
  * buckets explode the idle intervals into millions of rows, wide ones
  * pile many pulses into each bucket. That cost model is exactly what a
  * sort-merge walk doesn't have: shuffle both sides once on the run
  * keys, sort each partition by (keys, time) — Spark's EnsureRequirements
  * inserts the exchanges/sorts from this node's required distribution and
  * ordering, reusing existing partitioning/ordering when upstream already
  * provides it — then a single forward pass per partition matches every
  * left row to the latest right row at-or-before it. O(|L|+|R|) per
  * partition, constant memory (one candidate row buffered), zero
  * explosion, any gap distribution.
  *
  * Semantics (pinned by AsOfMergeJoinSpec to match AsOfJoin.backward
  * exactly): for each left row, the right row with the greatest
  * `rightTime <= leftTime` within equal `keys`; carried right columns are
  * null when no such row exists. Ties on rightTime resolve to the later
  * sorted right row (both engines: the max row_number wins).
  *
  * Reference anchor: the event→pulse correlation of
  * scripts/spark_events_by_time_parquet.py:205-243.
  */
object AsOfMergeJoin {

  /** @param keys      non-empty equality keys (e.g. run_id) — the shuffle
    *                  keys. (A keyless global as-of would serialize into
    *                  one partition here; use AsOfJoin.backward's
    *                  range-partitioned formulation for that case.)
    * @param rightCols right columns to carry (nullable on misses)
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      leftTime: String,
      rightTime: String,
      keys: Seq[String],
      rightCols: Seq[String],
      forward: Boolean = false): DataFrame = {
    require(keys.nonEmpty,
      "AsOfMergeJoin needs equality keys; use AsOfJoin.backward for a global timeline")
    val spark = left.sparkSession
    val lPlan = GraftPlanShim.analyzedPlan(left)
    // carried right columns only (keys live on the left output)
    val carried = (rightCols :+ rightTime).distinct.filterNot(keys.contains)
    val rPruned = right.select((keys ++ carried).distinct.map(col): _*)
    // Self-join safety: when `right` shares lineage with `left` (e.g. a
    // pulse timeline derived from the event frame itself) the two
    // subtrees expose the SAME exprIds; the analyzer's
    // DeduplicateRelations then rewrites the right subtree and a key
    // attribute captured from it would silently re-bind to the LEFT side
    // (and the true right key gets column-pruned away — an execution
    // error at best). Re-aliasing every right output through fresh
    // exprIds makes the node's right-side references unambiguous, exactly
    // what Dataset.join's self-join handling does.
    val rBase = GraftPlanShim.analyzedPlan(rPruned)
    val rAliases = rBase.output.map(a =>
      org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)())
    val rPlan: LogicalPlan =
      org.apache.spark.sql.catalyst.plans.logical.Project(rAliases, rBase)
    val rAttrs = rAliases.map(_.toAttribute)
    def lattr(name: String): Attribute =
      lPlan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found in [${lPlan.output.map(_.name).mkString(", ")}]"))
    def rattr(name: String): Attribute =
      rAttrs.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found in [${rAttrs.map(_.name).mkString(", ")}]"))
    val node = AsOfJoinNode(
      lPlan, rPlan,
      keys.map(lattr), keys.map(rattr),
      lattr(leftTime), rattr(rightTime),
      carried.map(rattr), forward = forward)
    GraftPlanShim.ofRows(spark, node)
  }

  /** Forward as-of: the EARLIEST right row with `rightTime >= leftTime`
    * per key (the mirror of [[backward]]; pandas merge_asof
    * direction='forward'). Same custom sort-merge plan, walking to the
    * first not-yet-passed right row instead of the last passed one.
    */
  def forward(
      left: DataFrame,
      right: DataFrame,
      leftTime: String,
      rightTime: String,
      keys: Seq[String],
      rightCols: Seq[String]): DataFrame =
    backward(left, right, leftTime, rightTime, keys, rightCols, forward = true)

  /** NEAREST as-of: attach the right row minimizing |rightTime −
    * leftTime| (sensor sync, closest-calibration lookup — the third
    * direction next to backward/forward). Composed from the two
    * O(L+R) directional walks — each left row sees at most its
    * backward and forward candidate, and the winner is a pure
    * per-row integer comparison: backward wins ties (deterministic).
    * Carried right columns keep their names, as in backward/forward;
    * the matched right time lands in `rightTime` like the directional
    * forms. */
  def nearest(
      left: DataFrame,
      right: DataFrame,
      leftTime: String,
      rightTime: String,
      keys: Seq[String],
      rightCols: Seq[String]): DataFrame = {
    // functions._ would shadow the left/right parameters
    import org.apache.spark.sql.functions.{col, when}
    val carried = (rightCols :+ rightTime).distinct.filterNot(keys.contains)
    val bSuffix = "__asof_b_"
    val fSuffix = "__asof_f_"
    def renamed(df: DataFrame, suffix: String): DataFrame =
      carried.foldLeft(df)((d, c) => d.withColumnRenamed(c, suffix + c))
    val back = renamed(
      backward(left, right, leftTime, rightTime, keys, rightCols), bSuffix)
    val both = renamed(
      forward(back, right, leftTime, rightTime, keys, rightCols), fSuffix)
    val bt = col(bSuffix + rightTime)
    val ft = col(fSuffix + rightTime)
    // backward gap = lt - bt >= 0; forward gap = ft - lt >= 0
    val useBackward = ft.isNull ||
      (bt.isNotNull && (col(leftTime) - bt) <= (ft - col(leftTime)))
    val picked = carried.foldLeft(both)((d, c) =>
      d.withColumn(c,
        when(useBackward, col(bSuffix + c)).otherwise(col(fSuffix + c))))
    picked.select((left.columns.toIndexedSeq ++ carried).map(col): _*)
  }
}

/** Logical node: left enriched with the latest right row at-or-before its
  * time, per key. Built from RESOLVED children (the public API constructs
  * it post-analysis, like Dataset.join does).
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    carry: Seq[Attribute],
    forward: Boolean = false) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ (carry :+ rightTime).distinct.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy (injected via GraftExtensions). */
class AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, carry, fwd) =>
      AsOfMergeJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, carry, fwd) :: Nil
    case _ => Nil
  }
}

/** Physical sort-merge as-of walk. Declares clustered distribution on the
  * keys and (keys, time) ordering for BOTH children; EnsureRequirements
  * materializes only the exchanges/sorts not already satisfied.
  */
case class AsOfMergeJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    carry: Seq[Attribute],
    forward: Boolean = false) extends SparkPlan with BinaryExecNode {

  require(leftTime.dataType == LongType && rightTime.dataType == LongType,
    "as-of time columns must be integral epochs (LongType)")

  private val rightCarried: Seq[Attribute] = (carry :+ rightTime).distinct

  override def output: Seq[Attribute] =
    left.output ++ rightCarried.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfMergeJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lk = leftKeys
    val rk = rightKeys
    val lt = leftTime
    val rt = rightTime
    val outAttrs = output
    val rCarried = rightCarried
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lk, lOut)
      val rKeyProj = UnsafeProjection.create(rk, rOut)
      val lTimeProj = UnsafeProjection.create(Seq[Expression](lt), lOut)
      val rTimeProj = UnsafeProjection.create(Seq[Expression](rt), rOut)
      // output = left columns + carried right columns, via one projection
      // over the concatenated schema
      val outProj = UnsafeProjection.create(
        outAttrs.map(a => a: Expression),
        lOut ++ rCarried.map(_.withNullability(true)))
      val carryProj = UnsafeProjection.create(
        rCarried.map(a => a: Expression), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lk.map(_.dataType))
      val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
      val nullCarry = new GenericInternalRow(rCarried.size)

      val buffered = rIter.buffered
      // one-row state: the latest right row (key + time + carried cols)
      // at-or-before the current left cursor — O(1) memory
      var candKey: InternalRow = null
      var candTime: Long = 0L
      var candCarry: InternalRow = null
      val fwd = forward

      lIter.map { lrow =>
        val lkey = lKeyProj(lrow)
        val lTimeRow = lTimeProj(lrow)
        if (lTimeRow.isNullAt(0)) {
          // NULL left time matches nothing (mirrors AsOfJoin.backward,
          // where NULL <= t / NULL >= t is never true). The right cursor
          // stays put for the following non-null rows of this key.
          outProj(joined(lrow, nullCarry))
        } else {
        val ltime = lTimeRow.getLong(0)
        var done = false
        while (!done && buffered.hasNext) {
          val peek = buffered.head
          val cmp = keyOrd.compare(rKeyProj(peek), lkey)
          if (cmp < 0) { buffered.next() } // right side behind this key
          else if (cmp == 0) {
            val tRow = rTimeProj(peek) // project the time ONCE per step
            if (tRow.isNullAt(0)) {
              // NULL right time never matches in either direction; consume
              // (nulls sort first, so they precede every real candidate)
              buffered.next()
            } else {
              val rt = tRow.getLong(0)
              if (if (fwd) rt < ltime else rt <= ltime) {
                // backward: every passed row is a (better) candidate.
                // forward: rows strictly before the cursor are dead —
                // consume without recording; the candidate is the
                // unconsumed head.
                val row = buffered.next()
                if (!fwd) {
                  candKey = rKeyProj(row).copy()
                  candTime = rt
                  candCarry = carryProj(row).copy()
                }
              } else done = true
            }
          } else done = true
        }
        val matched =
          if (fwd) {
            // head (if any) is the first right row with time >= cursor;
            // it stays buffered for subsequent left rows
            buffered.hasNext && keyOrd.compare(rKeyProj(buffered.head), lkey) == 0
          } else {
            candKey != null && keyOrd.compare(candKey, lkey) == 0 &&
              candTime <= ltime
          }
        val carryRow =
          if (!matched) nullCarry
          else if (fwd) carryProj(buffered.head)
          else candCarry
        outProj(joined(lrow, carryRow))
        }
      }
    }
  }
}
