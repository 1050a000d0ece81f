package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Bloom-filter membership test over a BIGINT column:
  * `mightContainLong(h)` against a driver-built
  * `org.apache.spark.util.sketch.BloomFilter`, inlined into whole-stage
  * codegen (one virtual call per row on a referenced object — the same
  * literal-model pattern as [[DotLiteral]] / [[BpeEncode]]).
  *
  * This is the map-only PREFILTER shape for "does this key exist in a
  * bounded reference set" at corpus scale: the reference set collapses
  * to a few MB of bits that ride the closure, so corpus rows that match
  * nothing are dropped inside the scan and never reach an Exchange —
  * versus a join, which shuffles every corpus row on the key. False
  * positives (rate `fpp`) pass the prefilter and MUST be eliminated by
  * an exact verify downstream (e.g. the contamination equi-join); false
  * negatives are impossible, so the prefilter never loses a real match.
  *
  * The expression carries the SERIALIZED filter (a plain byte array) so
  * the plan tree stays Java-serializable regardless of sketch
  * implementation details; each deserialized instance (driver for
  * codegen, one per executor task closure) rebuilds the filter lazily
  * exactly once.
  */
case class BloomContainsLong(child: Expression, bytes: Array[Byte])
  extends UnaryExpression {
  require(bytes != null && bytes.nonEmpty, "serialized bloom filter is empty")

  @transient private lazy val filter: BloomFilter = BloomFilter.readFrom(bytes)

  // Case-class equality over an Array[Byte] field degrades to array
  // REFERENCE equality, which would make two semantically identical
  // predicates never compare equal — defeating expression dedup /
  // subexpression elimination (and semanticEquals, which delegates to
  // equals on the canonicalized tree). Compare the byte CONTENT.
  override def equals(other: Any): Boolean = other match {
    case that: BloomContainsLong =>
      child == that.child && java.util.Arrays.equals(bytes, that.bytes)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(bytes)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_contains expects BIGINT, got ${other.sql}")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override protected def nullSafeEval(input: Any): Any =
    filter.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", filter,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomContainsLong =
    copy(child = newChild)
}

object BloomContains {
  /** Serialize once on the driver; the bytes are what ships. */
  def serialize(bf: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  def col(c: Column, bf: BloomFilter): Column =
    GraftColumnShim.column(
      BloomContainsLong(GraftColumnShim.expression(c), serialize(bf)))
}
