package graft.sources

import org.apache.spark.sql.{Column, GraftColumnShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg PARTITION TRANSFORMS (spec "Partition Transforms" +
  * Appendix B bucket hashing) — the HIDDEN-partitioning substrate:
  * users query SOURCE columns, the table partitions by a DERIVED value
  * (`bucket[N]`, `truncate[W]`, `day`/`month`/`year`/`hour`), and scan
  * planning maps source-column predicates through the transform to
  * prune partitions. This is how a real 100 TB table is laid out —
  * time-partitioned by `day(ts)` with hash-bucketed keys — without the
  * query author ever naming a partition column (the mistake-proofing
  * that made Iceberg's layout model win over Hive's).
  *
  * One transform, three faces, all here so they can never drift:
  *   - [[column]]: the WRITE-side Column (derives partition values in
  *     the batch; bucket is a native codegen expression),
  *   - [[applyValue]]: the PLAN-side scalar (maps a predicate literal
  *     to its partition value for pruning),
  *   - [[resultType]]: the partition value's type in manifests.
  *
  * Bucketing is murmur3_x86_32 seed 0 over the spec byte layouts
  * (int/long: 8-byte little-endian — int and long bucket IDENTICALLY,
  * so widening never reshuffles; string: UTF-8; date: days-from-epoch;
  * timestamp: micros-from-epoch), pinned against the spec's Appendix B
  * test vectors. Monotone transforms (identity/truncate/day/month/
  * year/hour) prune ranges; bucket prunes equality only.
  */
object IcebergTransforms {

  /** One partition-spec field: the DERIVED column name (the directory
    * key), the transform (spec json rendering, e.g. `bucket[16]`), and
    * the SOURCE column it derives from. */
  case class PartField(name: String, transform: String, sourceCol: String)

  /** Parse a caller's partition item: `"col"` (identity),
    * `"bucket[16]:col"`, `"truncate[8]:col"`, `"day:col"`,
    * `"month:col"`, `"year:col"`, `"hour:col"`. Derived fields name
    * themselves `col_bucket` / `col_trunc` / `col_day` / … — the
    * Iceberg naming convention. */
  def parse(item: String): PartField = item.split(":", 2) match {
    case Array(c) => PartField(c, "identity", c)
    case Array(t, c) =>
      val B = """bucket\[(\d+)\]""".r
      val W = """truncate\[(\d+)\]""".r
      t match {
        case "identity" => PartField(c, "identity", c)
        case B(n) =>
          require(n.toInt > 0, s"bucket count must be positive in '$item'")
          PartField(s"${c}_bucket", t, c)
        case W(w) =>
          require(w.toInt > 0, s"truncate width must be positive in '$item'")
          PartField(s"${c}_trunc", t, c)
        case "day" => PartField(s"${c}_day", t, c)
        case "month" => PartField(s"${c}_month", t, c)
        case "year" => PartField(s"${c}_year", t, c)
        case "hour" => PartField(s"${c}_hour", t, c)
        case other => sys.error(s"unsupported partition transform '$other' " +
          "(identity, bucket[N], truncate[W], day, month, year, hour)")
      }
  }

  private val Bucket = """bucket\[(\d+)\]""".r
  private val Trunc = """truncate\[(\d+)\]""".r

  /** The partition VALUE type a transform produces over a source type
    * (what the manifest partition record stores) — also the transform/
    * source-type compatibility gate (loud error outside the subset). */
  def resultType(transform: String, src: DataType): DataType =
    (transform, src) match {
      case ("identity", t) => t
      case (Bucket(_), IntegerType | LongType | StringType | DateType |
                       TimestampType) => IntegerType
      case (Trunc(_), IntegerType | LongType) => src
      case (Trunc(_), StringType) => StringType
      case ("day" | "month" | "year", DateType | TimestampType) => IntegerType
      case ("hour", TimestampType) => IntegerType
      case (t, s) => sys.error(
        s"transform $t not defined over ${s.simpleString}")
    }

  /** WRITE-side derivation: the Column computing the partition value
    * from the source column. `month`/`year` over timestamps read the
    * session-local calendar, so they require a UTC session (the
    * transform is defined on UTC; a non-UTC session would write
    * misaligned partitions silently). */
  def column(spark: org.apache.spark.sql.SparkSession, transform: String,
             src: Column, srcType: DataType): Column = {
    def micros = unix_micros(src)
    def floorDiv(x: Column, d: Long): Column =
      ((x - pmod(x, lit(d))) / lit(d)).cast(IntegerType)
    def requireUtc(): Unit = {
      val tz = spark.conf.get("spark.sql.session.timeZone")
      require(tz == "UTC" || tz == "Etc/UTC" || tz == "GMT",
        s"$transform over timestamp requires a UTC session " +
          s"(spark.sql.session.timeZone is $tz) — the transform is " +
          "defined on UTC and a local calendar would misalign partitions")
    }
    (transform, srcType) match {
      case ("identity", _) => src
      case (Bucket(n), _) =>
        val asLong = srcType match {
          case IntegerType | LongType => src.cast(LongType)
          case DateType => datediff(src, to_date(lit("1970-01-01"))).cast(LongType)
          case TimestampType => micros
          case StringType => src
          case other => sys.error(s"bucket over ${other.simpleString}")
        }
        GraftColumnShim.column(IcebergBucketExpr(
          GraftColumnShim.expression(asLong), n.toInt))
      case (Trunc(w), IntegerType | LongType) =>
        (src - pmod(src, lit(w.toLong))).cast(srcType)
      case (Trunc(w), StringType) => substring(src, 1, w.toInt)
      case ("day", TimestampType) => floorDiv(micros, 86400000000L)
      case ("day", DateType) =>
        datediff(src, to_date(lit("1970-01-01")))
      case ("hour", TimestampType) => floorDiv(micros, 3600000000L)
      case ("month", t) =>
        if (t == TimestampType) requireUtc()
        ((year(src) - 1970) * 12 + month(src) - 1).cast(IntegerType)
      case ("year", t) =>
        if (t == TimestampType) requireUtc()
        (year(src) - 1970).cast(IntegerType)
      case (t, s) => sys.error(s"transform $t not defined over ${s.simpleString}")
    }
  }

  /** PLAN-side scalar twin of [[column]]: the partition value of one
    * predicate literal — what [[IcebergLite.readTableWhere]] compares
    * against manifest partition values to prune files. Must agree with
    * the write side exactly (both are pinned against each other). */
  def applyValue(transform: String, srcType: DataType, v: Any): Any = {
    def asMicros: Long = v match {
      case t: java.sql.Timestamp =>
        Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
      case i: java.time.Instant => i.getEpochSecond * 1000000L + i.getNano / 1000
      case n: Number => n.longValue()
      case other => sys.error(s"no timestamp reading of $other")
    }
    def asEpochDay: Long = v match {
      case d: java.sql.Date => d.toLocalDate.toEpochDay
      case d: java.time.LocalDate => d.toEpochDay
      case n: Number => n.longValue()
      case other => sys.error(s"no date reading of $other")
    }
    def utcDate: java.time.LocalDate = srcType match {
      case DateType => java.time.LocalDate.ofEpochDay(asEpochDay)
      case TimestampType => java.time.Instant.ofEpochSecond(
        Math.floorDiv(asMicros, 1000000L)).atZone(java.time.ZoneOffset.UTC)
        .toLocalDate
      case other => sys.error(s"no calendar reading of ${other.simpleString}")
    }
    (transform, srcType) match {
      case ("identity", _) => v
      case (Bucket(n), IntegerType | LongType) =>
        bucketLong(v.asInstanceOf[Number].longValue(), n.toInt)
      case (Bucket(n), StringType) => bucketString(v.toString, n.toInt)
      case (Bucket(n), DateType) => bucketLong(asEpochDay, n.toInt)
      case (Bucket(n), TimestampType) => bucketLong(asMicros, n.toInt)
      case (Trunc(w), IntegerType) =>
        val x = v.asInstanceOf[Number].intValue()
        x - Math.floorMod(x, w.toInt)
      case (Trunc(w), LongType) =>
        val x = v.asInstanceOf[Number].longValue()
        x - Math.floorMod(x, w.toLong)
      case (Trunc(w), StringType) =>
        val s = v.toString
        val n = w.toInt
        if (s.codePointCount(0, s.length) <= n) s
        else s.substring(0, s.offsetByCodePoints(0, n))
      case ("day", DateType) => asEpochDay.toInt
      case ("day", TimestampType) =>
        Math.floorDiv(asMicros, 86400000000L).toInt
      case ("hour", TimestampType) =>
        Math.floorDiv(asMicros, 3600000000L).toInt
      case ("month", _) =>
        val d = utcDate
        (d.getYear - 1970) * 12 + d.getMonthValue - 1
      case ("year", _) => utcDate.getYear - 1970
      case (t, s) => sys.error(s"transform $t not defined over ${s.simpleString}")
    }
  }

  /** Is the transform order-preserving on its source (ranges map to
    * ranges)? Bucket is the one that isn't — it prunes equality only. */
  def isMonotone(transform: String): Boolean = transform match {
    case Bucket(_) => false
    case _ => true
  }

  // ---- spec bucket hashing (murmur3_x86_32, seed 0) ------------------------

  /** murmur3_x86_32 (Austin Appleby, public domain) — the hash the
    * Iceberg spec fixes for `bucket[N]` so every engine agrees on
    * partition placement. */
  def murmur3(bytes: Array[Byte], seed: Int = 0): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h = seed
    val n4 = bytes.length & ~3
    var i = 0
    while (i < n4) {
      var k = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8) |
        ((bytes(i + 2) & 0xff) << 16) | ((bytes(i + 3) & 0xff) << 24)
      k *= c1; k = Integer.rotateLeft(k, 15); k *= c2
      h ^= k; h = Integer.rotateLeft(h, 13); h = h * 5 + 0xe6546b64
      i += 4
    }
    var k = 0
    (bytes.length & 3) match {
      case 3 =>
        k ^= (bytes(n4 + 2) & 0xff) << 16
        k ^= (bytes(n4 + 1) & 0xff) << 8
        k ^= bytes(n4) & 0xff
      case 2 =>
        k ^= (bytes(n4 + 1) & 0xff) << 8
        k ^= bytes(n4) & 0xff
      case 1 => k ^= bytes(n4) & 0xff
      case _ =>
    }
    if ((bytes.length & 3) != 0) {
      k *= c1; k = Integer.rotateLeft(k, 15); k *= c2; h ^= k
    }
    h ^= bytes.length
    h ^= h >>> 16; h *= 0x85ebca6b
    h ^= h >>> 13; h *= 0xc2b2ae35
    h ^= h >>> 16
    h
  }

  /** Spec hash of an int/long/date/timestamp value: murmur3 over the
    * 8-byte LITTLE-ENDIAN long — ints hash as longs, so an int→long
    * widening never changes bucket placement. */
  def hashLong(v: Long): Int =
    murmur3(Array.tabulate(8)(i => ((v >> (8 * i)) & 0xff).toByte))

  def bucketLong(v: Long, n: Int): Int =
    ((hashLong(v) & Int.MaxValue) % n)

  def bucketUtf8(b: Array[Byte], n: Int): Int =
    ((murmur3(b) & Int.MaxValue) % n)

  def bucketString(s: String, n: Int): Int =
    bucketUtf8(s.getBytes(java.nio.charset.StandardCharsets.UTF_8), n)
}

/** `bucket[N]` as a native codegen expression over a LONG or STRING
  * child — the write-side partition derivation stays inside whole-stage
  * codegen (one static call per row, no UDF). */
case class IcebergBucketExpr(child: Expression, n: Int)
  extends UnaryExpression {
  require(n > 0, "bucket count must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"iceberg_bucket expects BIGINT or STRING, got ${other.sql}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "iceberg_bucket"

  override protected def nullSafeEval(input: Any): Any = child.dataType match {
    case LongType => IcebergTransforms.bucketLong(input.asInstanceOf[Long], n)
    case StringType =>
      IcebergTransforms.bucketUtf8(input.asInstanceOf[UTF8String].getBytes, n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val T = IcebergTransforms.getClass.getName.stripSuffix("$") + "$.MODULE$"
    child.dataType match {
      case LongType =>
        defineCodeGen(ctx, ev, c => s"$T.bucketLong($c, $n)")
      case StringType =>
        defineCodeGen(ctx, ev, c => s"$T.bucketUtf8(($c).getBytes(), $n)")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): IcebergBucketExpr =
    copy(child = newChild)
}
