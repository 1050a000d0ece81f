package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native signature expressions for the LSH dedup family.
  *
  * Why these exist: Spark's higher-order functions (`transform`/`aggregate`
  * lambdas) are evaluated *interpreted* — they never enter whole-stage
  * codegen. A MinHash signature written that way costs
  * O(shingles x numHashes) interpreted lambda dispatches per document and
  * dominated the benchmark (~97 s at sf0.1). These expressions do the same
  * arithmetic in one tight JVM loop via `doGenCode`, touching each shingle
  * exactly twice (two xxhash64 evaluations) regardless of signature size.
  */

/** sig[j] = min over shingles of (h1 + j*h2) mod p, p = 2^31-1, where
  * h1/h2 are xxhash64 of the shingle with seeds 42/1. Input array<string>,
  * output array<long> of length `numHashes`. Empty/null-only input yields
  * sentinel p (no shingle can produce it, so distinct docs never collide
  * on emptiness alone vs real signatures).
  */
case class MinHashSig(child: Expression, numHashes: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects ARRAY<STRING>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashSig.compute($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  final val P = 2147483647L // 2^31 - 1

  def compute(shingles: ArrayData, k: Int): ArrayData = {
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, P)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val s = shingles.getUTF8String(i)
        val h1 = Math.floorMod(
          XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L), P)
        val h2 = Math.floorMod(
          XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 1L), P)
        var j = 0
        var v = h1 // (h1 + j*h2) mod P, updated incrementally: +h2 each step
        while (j < k) {
          if (v < mins(j)) mins(j) = v
          v += h2
          if (v >= P) v -= P
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  def col(c: Column, numHashes: Int): Column =
    GraftColumnShim.column(MinHashSig(GraftColumnShim.expression(c), numHashes))
}

/** [[MinHashSig]]'s ENGINE-PORTABLE twin: identical double-hash minima
  * `sig[j] = min over shingles of (h1 + j*h2) mod p`, but with h1/h2
  * taken from the two md5 halves the portable SQL formulation uses —
  * `conv(substring(md5(x), 1, 15), 16, 10) % p` and the same for chars
  * 16..30 — so the output is BIT-IDENTICAL to what DuckDB (or any engine
  * with md5 + string slicing) rederives, while running as one compiled
  * loop instead of O(shingles x numHashes) interpreted lambda
  * dispatches (the `transform`/`zip_with` formulation it replaces
  * measured 75 s vs ~2 s on the 105k-doc dedup_sigs_10k probe).
  * Empty/null-only input keeps MinHashSig's sentinel-P contract.
  */
case class PortableMinHashSig(child: Expression, numHashes: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"portable_minhash_sig expects ARRAY<STRING>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_portable_minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    PortableMinHashSig.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PortableMinHashSig.compute($c, $numHashes)")

  override protected def withNewChildInternal(
      newChild: Expression): PortableMinHashSig =
    copy(child = newChild)
}

object PortableMinHashSig {
  import MinHashSig.P

  private val md5Local =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  def compute(shingles: ArrayData, k: Int): ArrayData = {
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, P)
    val md = md5Local.get()
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val s = shingles.getUTF8String(i)
        md.reset()
        val d = md.digest(s.getBytes)
        // hex chars 1..15 (1-based) = nibbles 0..14: bytes 0..7 as an
        // unsigned big-endian long, dropping the 16th nibble (b7's low)
        var v0 = 0L
        var b = 0
        while (b < 8) { v0 = (v0 << 8) | (d(b) & 0xFFL); b += 1 }
        val h1 = (v0 >>> 4) % P
        // hex chars 16..30 = nibbles 15..29: b7's low nibble then bytes
        // 8..14 — 60 bits
        var v1 = d(7) & 0xFL
        b = 8
        while (b < 15) { v1 = (v1 << 8) | (d(b) & 0xFFL); b += 1 }
        val h2 = v1 % P
        var j = 0
        var v = h1 // (h1 + j*h2) mod P, incrementally like MinHashSig
        while (j < k) {
          if (v < mins(j)) mins(j) = v
          v += h2
          if (v >= P) v -= P
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  def col(c: Column, numHashes: Int): Column =
    GraftColumnShim.column(
      PortableMinHashSig(GraftColumnShim.expression(c), numHashes))
}

/** [[BandHashes]]' ENGINE-PORTABLE twin: band b's hash is the lowercase
  * md5 HEX STRING of the comma-joined decimal signature slice — exactly
  * `md5(concat_ws(',', transform(slice(sig, b*r+1, r), x -> CAST(x AS
  * STRING))))`, which any engine rederives — computed in one fused loop
  * instead of `bands` interpreted lambda dispatches per row. Output
  * array<string> of length `bands`.
  */
case class PortableBandHashes(child: Expression, bands: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"portable_band_hashes expects ARRAY<BIGINT>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_portable_band_hashes"

  override protected def nullSafeEval(input: Any): Any =
    PortableBandHashes.compute(input.asInstanceOf[ArrayData], bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PortableBandHashes.compute($c, $bands)")

  override protected def withNewChildInternal(
      newChild: Expression): PortableBandHashes =
    copy(child = newChild)
}

object PortableBandHashes {
  private val md5Local =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }
  private val HexChars = "0123456789abcdef".toCharArray

  def compute(sig: ArrayData, bands: Int): ArrayData = {
    val n = sig.numElements()
    if (bands <= 0 || n == 0 || n % bands != 0)
      throw new IllegalArgumentException(
        s"graft_portable_band_hashes: signature length $n not divisible into $bands bands")
    val r = n / bands
    val md = md5Local.get()
    val out = new Array[AnyRef](bands)
    val sb = new java.lang.StringBuilder(r * 12)
    var b = 0
    var j = 0
    while (b < bands) {
      sb.setLength(0)
      var k = 0
      while (k < r) {
        if (k > 0) sb.append(',')
        sb.append(sig.getLong(j))
        j += 1
        k += 1
      }
      md.reset()
      // the joined slice is all ASCII (digits/commas/minus), so the
      // ISO-8859-1 fast path equals the UTF-8 bytes md5() hashes
      val d = md.digest(sb.toString.getBytes(
        java.nio.charset.StandardCharsets.ISO_8859_1))
      val hex = new Array[Char](32)
      var i = 0
      while (i < 16) {
        hex(2 * i) = HexChars((d(i) >> 4) & 0xF)
        hex(2 * i + 1) = HexChars(d(i) & 0xF)
        i += 1
      }
      out(b) = UTF8String.fromString(new String(hex))
      b += 1
    }
    new GenericArrayData(out)
  }

  def col(c: Column, bands: Int): Column =
    GraftColumnShim.column(
      PortableBandHashes(GraftColumnShim.expression(c), bands))
}

/** Per-row hashed-feature VECTOR: counts of md5-bucketed strings,
  * `out[pmod(first-15-hex-digits-of-md5(x), buckets)] += 1` per element —
  * the same portable bucket id `Selection.hashedNgramFeatures` emits as
  * (id, bucket, n) rows, but folded into a fixed-width array INSIDE the
  * scan. The row form exists for the cross-engine oracle; this form is
  * the scale path: a corpus-wide DSIR featurization becomes map-only
  * (no (id, bucket) shuffle — measured 67M shuffled rows at 2M docs),
  * and scoring against a k-bucket model is a static expression over the
  * array. Null elements are skipped; output length is `buckets`.
  */
case class HashedBucketCounts(child: Expression, buckets: Int)
  extends UnaryExpression {
  require(buckets >= 1, "buckets must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hashed_bucket_counts expects ARRAY<STRING>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hashed_bucket_counts"

  override protected def nullSafeEval(input: Any): Any =
    HashedBucketCounts.compute(input.asInstanceOf[ArrayData], buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashedBucketCounts.compute($c, $buckets)")

  override protected def withNewChildInternal(
      newChild: Expression): HashedBucketCounts =
    copy(child = newChild)
}

object HashedBucketCounts {
  private val md5Local =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  def compute(elems: ArrayData, buckets: Int): ArrayData = {
    val counts = new Array[Long](buckets)
    val md = md5Local.get()
    val n = elems.numElements()
    var i = 0
    while (i < n) {
      if (!elems.isNullAt(i)) {
        val s = elems.getUTF8String(i)
        md.reset()
        val d = md.digest(s.getBytes)
        // first 15 hex digits as a 60-bit value — identical to
        // conv(substring(md5(x), 1, 15), 16, 10), see PortableMinHashSig
        var v0 = 0L
        var b = 0
        while (b < 8) { v0 = (v0 << 8) | (d(b) & 0xFFL); b += 1 }
        counts(((v0 >>> 4) % buckets).toInt) += 1L
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  def col(c: Column, buckets: Int): Column =
    GraftColumnShim.column(
      HashedBucketCounts(GraftColumnShim.expression(c), buckets))
}

/** LSH band hashes of a MinHash signature: split the array<long> into
  * `bands` contiguous bands and hash each one, returning array<long> of
  * length `bands`. Values are BIT-IDENTICAL to the column formulation
  * `xxhash64(slice(sig, b*r+1, r))` (Spark hashes an array<long> by
  * folding XXH64.hashLong over the elements from seed 42), but computed
  * in one compiled pass — the `transform(sequence(...), b ->
  * xxhash64(slice(...)))` lambda it replaces is interpreted and measured
  * 133 s vs 13 s for the signature pass itself on a 500k-doc corpus.
  */
case class BandHashes(child: Expression, bands: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"band_hashes expects ARRAY<BIGINT>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_band_hashes"

  override protected def nullSafeEval(input: Any): Any =
    BandHashes.compute(input.asInstanceOf[ArrayData], bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BandHashes.compute($c, $bands)")

  override protected def withNewChildInternal(newChild: Expression): BandHashes =
    copy(child = newChild)
}

object BandHashes {
  def compute(sig: ArrayData, bands: Int): ArrayData = {
    val n = sig.numElements()
    // Fail loudly on both API surfaces (the Column path has its own
    // require; the SQL-registered graft_band_hashes lands here directly):
    // a signature length not divisible by bands would silently drop
    // trailing hashes, and bands > n would emit the bare seed per band.
    if (bands <= 0 || n == 0 || n % bands != 0)
      throw new IllegalArgumentException(
        s"graft_band_hashes: signature length $n not divisible into $bands bands")
    val r = n / bands
    val out = new Array[Long](bands)
    var b = 0
    var j = 0
    while (b < bands) {
      var h = 42L // xxhash64's seed, matching the Column formulation
      var k = 0
      while (k < r) {
        h = XXH64.hashLong(sig.getLong(j), h)
        j += 1
        k += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  def col(c: Column, bands: Int): Column =
    GraftColumnShim.column(BandHashes(GraftColumnShim.expression(c), bands))
}

/** 64-bit SimHash over an array of tokens: per-bit +-1 votes of each
  * token's xxhash64, sign of the vote becomes the bit. Same rationale as
  * MinHashSig: one compiled pass instead of 64 interpreted lambda scans.
  */
case class SimHashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_sig expects ARRAY<STRING>, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    SimHashSig.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashSig.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

object SimHashSig {
  def compute(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val s = tokens.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def col(c: Column): Column =
    GraftColumnShim.column(SimHashSig(GraftColumnShim.expression(c)))
}
