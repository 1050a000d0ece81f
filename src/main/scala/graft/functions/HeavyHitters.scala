package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** SpaceSaving top-k heavy hitters as a typed Aggregator — the custom
  * *aggregate* companion to this package's scalar expressions. Bounded
  * state (k counters per partition buffer) regardless of input
  * cardinality, mergeable partials, so it runs as an ordinary map-side
  * partial + reduce aggregation: the standard way to get "top URLs /
  * top tokens / top pixels" out of 100 TB without a full groupBy of the
  * raw keys.
  *
  * Counts are exact whenever the number of distinct values <= k (the
  * regime the tests pin down); beyond that they are the usual SpaceSaving
  * overestimates with error bounded by n/k.
  */
object HeavyHitters {

  case class Entry(value: String, count: Long, error: Long)

  type Buf = mutable.HashMap[String, (Long, Long)] // value -> (count, err)

  class SpaceSaving(k: Int) extends Aggregator[String, Buf, Seq[Entry]] {
    override def zero: Buf = mutable.HashMap.empty

    override def reduce(b: Buf, v: String): Buf = add(b, v, 1L, 0L)

    private def add(b: Buf, v: String, n: Long, err: Long): Buf = {
      b.get(v) match {
        case Some((c, e)) => b.update(v, (c + n, e + err))
        case None if b.size < k => b.update(v, (n, err))
        case None =>
          // evict the deterministic minimum (count, then value);
          // newcomer inherits its count as error
          val (minV, (minC, _)) = b.minBy { case (v2, (c, _)) => (c, v2) }
          b.remove(minV)
          b.update(v, (minC + n, minC + err))
      }
      b
    }

    override def merge(a: Buf, b: Buf): Buf = {
      b.foreach { case (v, (c, e)) => add(a, v, c, e) }
      a
    }

    override def finish(b: Buf): Seq[Entry] =
      b.toSeq.map { case (v, (c, e)) => Entry(v, c, e) }
        .sortBy(en => (-en.count, en.value))

    override def bufferEncoder: Encoder[Buf] =
      Encoders.kryo[Buf]
    override def outputEncoder: Encoder[Seq[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
  }

  /** Column form: `df.agg(HeavyHitters.topK(col("event_type"), 3))`. */
  def topK(c: Column, k: Int): Column = udaf(new SpaceSaving(k)).apply(c)
}
