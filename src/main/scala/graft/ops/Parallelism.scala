package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Scan-parallelism repair for compute-heavy stages (optimization guide
  * §2.5 "input skew: one huge unsplittable file ... repartition
  * immediately after the read").
  *
  * A parquet input with fewer row groups than the cluster has cores
  * cannot be split further by the scanner: every downstream map-side
  * stage (shingling, MinHash, trigram language ID) then runs on a
  * handful of tasks while the rest of the cluster idles — measured
  * 3.3 s single-task vs ~0.5 s spread on the 105k-doc signature probe.
  * [[spread]] repartitions such inputs to `defaultParallelism` BEFORE
  * the heavy compute.
  *
  * The decision comes from the optimizer's size estimate (no jobs, no
  * plan execution): only an input whose ENTIRE estimated size fits in
  * one scan split (`spark.sql.files.maxPartitionBytes`) is spread — by
  * construction such a scan runs 1-2 tasks. Anything larger keeps its
  * scanner-provided parallelism (the 100 TB case — thousands of splits),
  * so large corpora never pay a gratuitous full-payload shuffle; frames
  * with unknown stats (e.g. checkpoint-backed) conservatively stay put.
  *
  * The partitioning key must be provided (hash repartition, deterministic
  * under task retry — guide §2.5 warns round-robin repartition of
  * non-deterministic input can lose/duplicate rows on retries; all call
  * sites here have a natural id). The explicit partition count keeps AQE
  * from coalescing the tiny shuffle back into one partition, which would
  * recreate the skew this exists to fix.
  */
object Parallelism {

  /** True when [[spread]] would repartition `df` — the whole estimated
    * input fits one scan split, so the scanner gives it 1-2 tasks. */
  def isSmall(df: DataFrame): Boolean = {
    val conf = df.sparkSession.sessionState.conf
    df.sparkSession.sparkContext.defaultParallelism > 2 &&
      df.queryExecution.optimizedPlan.stats.sizeInBytes <=
        BigInt(conf.filesMaxPartitionBytes)
  }

  def spread(df: DataFrame, by: Column): DataFrame =
    if (isSmall(df))
      df.repartition(df.sparkSession.sparkContext.defaultParallelism, by)
    else df

  /** Partition count to COALESCE a spread-and-materialized small frame
    * back down to: wide enough that no task is hot, narrow enough that
    * the many tiny downstream jobs reading the checkpoint don't pay
    * 32-task launch overhead each (measured +1.5 s across a 54-job
    * pipeline at sf0.1 when checkpoints stayed at full width). Only
    * meaningful after `isSmall` returned true — a large frame must keep
    * its width.
    */
  def compactWidth(df: DataFrame): Int =
    math.max(2, df.sparkSession.sparkContext.defaultParallelism / 8)
}
