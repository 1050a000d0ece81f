package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.util.QuantileSummaries
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Persistable, mergeable QUANTILE sketches — the percentile companion
  * of [[graft.ops.Sketches]]' HLL tables and [[HeavyHitters]]' top-k:
  * the third leg of the maintained-aggregate algebra (distinct counts /
  * heavy keys / distribution shape) a 100 TB corpus dashboard needs
  * without ever re-scanning the corpus.
  *
  * Substrate: the engine's own Greenwald-Khanna summaries
  * (`catalyst.util.QuantileSummaries` — what `percentile_approx`
  * runs on), so the guarantee is the standard GK one: a value returned
  * for rank φ has true rank within ±ε·n. Sketch rows serialize with
  * Java serialization of the summary (KB-sized at any input
  * cardinality) and MERGE losslessly with respect to that bound —
  * per-epoch sketches fold into corpus-wide quantiles the same way HLL
  * epoch sketches fold into distinct counts.
  *
  * Aggregation shape: typed Aggregators, so both forms run as ordinary
  * map-side partial + reduce aggregations; the buffer is the live
  * summary object and serialization happens only at exchange
  * boundaries, never per row.
  */
object QuantileSketch {

  private def ser(qs: QuantileSummaries): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(qs.compress())
    oos.close()
    bos.toByteArray
  }

  private def deser(bytes: Array[Byte]): QuantileSummaries =
    new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(bytes))
      .readObject().asInstanceOf[QuantileSummaries]

  private def fresh(eps: Double): QuantileSummaries =
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold, eps)

  /** values → serialized summary (the sketch-table form). */
  class GkSketch(eps: Double)
      extends Aggregator[Double, QuantileSummaries, Array[Byte]] {
    override def zero: QuantileSummaries = fresh(eps)
    override def reduce(b: QuantileSummaries, v: Double): QuantileSummaries =
      b.insert(v)
    override def merge(a: QuantileSummaries,
                       b: QuantileSummaries): QuantileSummaries =
      a.compress().merge(b.compress())
    override def finish(b: QuantileSummaries): Array[Byte] = ser(b)
    override def bufferEncoder: Encoder[QuantileSummaries] =
      Encoders.kryo[QuantileSummaries]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** serialized summaries → quantiles at `phis` (the epoch-merge form;
    * the merge is register algebra on KB rows, the corpus is absent). */
  class GkMerge(phis: Seq[Double], eps: Double)
      extends Aggregator[Array[Byte], QuantileSummaries, Seq[Double]] {
    override def zero: QuantileSummaries = fresh(eps)
    override def reduce(b: QuantileSummaries,
                        bytes: Array[Byte]): QuantileSummaries =
      b.compress().merge(deser(bytes))
    override def merge(a: QuantileSummaries,
                       b: QuantileSummaries): QuantileSummaries =
      a.compress().merge(b.compress())
    override def finish(b: QuantileSummaries): Seq[Double] =
      if (b.count == 0) phis.map(_ => Double.NaN)
      else phis.map(p => b.query(p).getOrElse(Double.NaN))
    override def bufferEncoder: Encoder[QuantileSummaries] =
      Encoders.kryo[QuantileSummaries]
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** `df.agg(QuantileSketch.sketch(col("latency"), 0.001))` → binary. */
  def sketch(c: Column, eps: Double = 0.001): Column =
    udaf(new GkSketch(eps)).apply(c)

  /** `sketches.agg(QuantileSketch.mergeQuantiles(col("qsk"), Seq(0.5, 0.95)))`
    * → array of quantile values. */
  def mergeQuantiles(c: Column, phis: Seq[Double],
                     eps: Double = 0.001): Column =
    udaf(new GkMerge(phis, eps)).apply(c)
}
