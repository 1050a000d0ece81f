package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import java.util.zip.{CRC32, Deflater, Inflater}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ZIP archive source/sink — the other container datasets ship in
  * (Kaggle drops, scraped-site exports, model checkpoints). Implemented
  * from the public PKWARE APPNOTE: the reader walks from the END OF
  * CENTRAL DIRECTORY record (the archive's authoritative index — local
  * headers alone cannot be trusted, the manifest-over-listing
  * discipline), reads central-directory entries, and decompresses
  * STORED or DEFLATE data through `java.util.zip.Inflater`, verifying
  * CRC-32 and both sizes per entry so corruption is loud. The writer
  * emits local headers + central directory + EOCD, choosing DEFLATE
  * per entry only when it actually shrinks the payload (both methods
  * exercised by any realistic corpus).
  *
  * Subset discipline (named refusals): zip64, encryption (general-
  * purpose flag bit 0), streaming data descriptors (bit 3), multi-disk
  * archives, and compression methods other than stored/deflate are out
  * of subset.
  *
  * Spark side: `readZipEntries` rides `binaryFile` — ONE TASK PER
  * ARCHIVE, parse + inflate task-local (the TarIO/WARC/HDF5
  * one-file-one-task shape), nothing shuffles; `writeZipShards` is the
  * deterministic sink (shard = xxhash64(name) mod N, the CorpusIO
  * membership discipline).
  */
object ZipIO {

  private val LocalSig = 0x04034b50L
  private val CentralSig = 0x02014b50L
  private val EocdSig = 0x06054b50L
  private val Zip64EocdSig = 0x06064b50L

  // ---- byte-level --------------------------------------------------------

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
  private def putLe16(out: ArrayBuffer[Byte], v: Int): Unit = {
    out += (v & 0xff).toByte; out += ((v >> 8) & 0xff).toByte
  }
  private def putLe32(out: ArrayBuffer[Byte], v: Long): Unit = {
    out += (v & 0xff).toByte; out += ((v >> 8) & 0xff).toByte
    out += ((v >> 16) & 0xff).toByte; out += ((v >> 24) & 0xff).toByte
  }

  /** Serialize entries as a ZIP archive. Per entry, DEFLATE is used
    * only when it shrinks the payload (otherwise STORED) — the choice
    * is recorded in both the local header and the central directory,
    * as the spec requires them to agree. */
  def writeZip(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new ArrayBuffer[Byte]()
    val central = new ArrayBuffer[Byte]()
    var count = 0
    entries.foreach { case (name, bytes) =>
      require(bytes != null, s"zip: null payload for $name")
      val nameB = name.getBytes(UTF_8)
      require(nameB.length <= 0xffff, s"zip: name too long ($name)")
      val crc = new CRC32(); crc.update(bytes)
      val deflated = {
        val d = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
        d.setInput(bytes); d.finish()
        val buf = new ArrayBuffer[Byte]()
        val chunk = new Array[Byte](8192)
        while (!d.finished()) {
          val n = d.deflate(chunk)
          buf ++= chunk.take(n)
        }
        d.end()
        buf.toArray
      }
      val useDeflate = deflated.length < bytes.length
      val (method, data) = if (useDeflate) (8, deflated) else (0, bytes)
      val offset = out.length.toLong
      require(offset <= 0xfffffffeL && data.length <= 0xfffffffeL &&
        bytes.length <= 0xfffffffeL, "zip: zip64 sizes are out of subset")
      putLe32(out, LocalSig)
      putLe16(out, 20)                   // version needed
      putLe16(out, 0)                    // flags: no encryption/descriptor
      putLe16(out, method)
      putLe16(out, 0); putLe16(out, 0x21) // fixed mod time/date (determinism)
      putLe32(out, crc.getValue)
      putLe32(out, data.length.toLong)
      putLe32(out, bytes.length.toLong)
      putLe16(out, nameB.length); putLe16(out, 0)
      out ++= nameB; out ++= data

      putLe32(central, CentralSig)
      putLe16(central, 20); putLe16(central, 20)
      putLe16(central, 0); putLe16(central, method)
      putLe16(central, 0); putLe16(central, 0x21)
      putLe32(central, crc.getValue)
      putLe32(central, data.length.toLong)
      putLe32(central, bytes.length.toLong)
      putLe16(central, nameB.length); putLe16(central, 0); putLe16(central, 0)
      putLe16(central, 0)                // disk number start
      putLe16(central, 0); putLe32(central, 0L) // internal/external attrs
      putLe32(central, offset)
      central ++= nameB
      count += 1
    }
    val cdOffset = out.length.toLong
    // all EOCD fields are 16/32-bit: beyond these limits is zip64
    require(count <= 0xffff,
      s"zip: $count entries exceed the 16-bit EOCD count (zip64 is out " +
        "of subset) — use more shards")
    require(cdOffset <= 0xfffffffeL && central.length <= 0xfffffffeL,
      "zip: archive exceeds 32-bit offsets (zip64 is out of subset)")
    out ++= central
    putLe32(out, EocdSig)
    putLe16(out, 0); putLe16(out, 0)     // disk numbers
    putLe16(out, count); putLe16(out, count)
    putLe32(out, central.length.toLong)
    putLe32(out, cdOffset)
    putLe16(out, 0)                      // no comment
    out.toArray
  }

  def writeZipFile(path: String, entries: Seq[(String, Array[Byte])]): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.write(p, writeZip(entries))
  }

  /** Parse a ZIP archive through its central directory: locate EOCD
    * from the tail, walk the central entries, inflate and CRC-verify
    * each payload. Everything outside the subset refuses by name. */
  def parseZip(bytes: Array[Byte]): Vector[(String, Array[Byte])] = {
    require(bytes != null && bytes.length >= 22, "zip: too short for EOCD")
    // EOCD: last occurrence within the final 64 KiB + 22 (max comment)
    var e = bytes.length - 22
    val floor = math.max(0, bytes.length - 22 - 0xffff)
    while (e >= floor && le32(bytes, e) != EocdSig) e -= 1
    require(e >= floor, "zip: end-of-central-directory record not found")
    require(le16(bytes, e + 4) == 0 && le16(bytes, e + 6) == 0,
      "zip: multi-disk archives are out of subset")
    val nEntries = le16(bytes, e + 10)
    val cdOffset = le32(bytes, e + 16)
    require(cdOffset != 0xffffffffL && nEntries != 0xffff,
      "zip: zip64 is out of subset")
    if (cdOffset.toInt < bytes.length - 3 &&
        le32(bytes, cdOffset.toInt) == Zip64EocdSig)
      throw new IllegalArgumentException("zip: zip64 is out of subset")

    val out = Vector.newBuilder[(String, Array[Byte])]
    var p = cdOffset.toInt
    (0 until nEntries).foreach { _ =>
      require(p + 46 <= bytes.length && le32(bytes, p) == CentralSig,
        s"zip: bad central-directory signature at $p")
      val flags = le16(bytes, p + 8)
      require((flags & 0x1) == 0, "zip: encrypted entries are out of subset")
      require((flags & 0x8) == 0,
        "zip: streaming data descriptors are out of subset")
      val method = le16(bytes, p + 10)
      val crcWant = le32(bytes, p + 16)
      require(le32(bytes, p + 20) != 0xffffffffL &&
        le32(bytes, p + 24) != 0xffffffffL, "zip: zip64 is out of subset")
      // entries ≥2 GiB are legal non-zip64 but overflow the Int
      // narrowing below — refuse by name, never wrap negative
      require(le32(bytes, p + 20) <= Int.MaxValue &&
        le32(bytes, p + 24) <= Int.MaxValue,
        "zip: entries over 2 GiB are out of subset")
      val csize = le32(bytes, p + 20).toInt
      val usize = le32(bytes, p + 24).toInt
      val nameLen = le16(bytes, p + 28)
      val extraLen = le16(bytes, p + 30)
      val commentLen = le16(bytes, p + 32)
      require(le32(bytes, p + 42) <= Int.MaxValue,
        "zip: local-header offsets over 2 GiB are out of subset")
      val lho = le32(bytes, p + 42).toInt
      val name = new String(bytes, p + 46, nameLen, UTF_8)

      require(lho + 30 <= bytes.length,
        s"zip: central entry '$name' local header overruns the archive")
      require(le32(bytes, lho) == LocalSig,
        s"zip: central entry '$name' points at a bad local header")
      val lNameLen = le16(bytes, lho + 26)
      val lExtraLen = le16(bytes, lho + 28)
      val dataAt = lho + 30 + lNameLen + lExtraLen
      require(dataAt + csize <= bytes.length,
        s"zip: entry '$name' data overruns the archive")
      val raw = java.util.Arrays.copyOfRange(bytes, dataAt, dataAt + csize)
      val data = method match {
        case 0 =>
          require(csize == usize,
            s"zip: stored entry '$name' size mismatch")
          raw
        case 8 =>
          val inf = new Inflater(true)
          inf.setInput(raw)
          val buf = new Array[Byte](usize)
          var got = 0
          while (got < usize && !inf.finished()) {
            val n = inf.inflate(buf, got, usize - got)
            require(n > 0 || !inf.needsInput,
              s"zip: truncated deflate stream in '$name'")
            got += n
          }
          val leftover = inf.finished() || inf.getRemaining == 0
          inf.end()
          require(got == usize && leftover,
            s"zip: entry '$name' inflated to $got of $usize bytes")
          buf
        case other => throw new IllegalArgumentException(
          s"zip: compression method $other is out of subset (stored/deflate)")
      }
      val crc = new CRC32(); crc.update(data)
      require(crc.getValue == crcWant,
        s"zip: CRC mismatch in '$name' (${crc.getValue} vs $crcWant)")
      out += (name -> data)
      p += 46 + nameLen + extraLen + commentLen
    }
    out.result()
  }

  // ---- Spark side --------------------------------------------------------

  /** All entries of every archive under `dir` as (archive, name,
    * content) — one task per archive, parse + inflate task-local. */
  def readZipEntries(spark: SparkSession, dir: String,
                     pattern: String = "*.zip"): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", pattern).load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        parseZip(bytes).iterator.map { case (n, d) => (path, n, d) }
      }
      .toDF("archive", "name", "content")
  }

  /** Deterministic sharded ZIP write: shard = xxhash64(name) mod
    * nShards, one shuffle to co-locate, sorted-name layout, one
    * `shard-NNNNN.zip` per shard. */
  def writeZipShards(df: DataFrame, dir: String, nShards: Int,
                     nameCol: String = "name",
                     contentCol: String = "content"): Unit = {
    require(nShards > 0, "nShards must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    Files.createDirectories(Paths.get(dir))
    df.select(col(nameCol).cast("string").as("name"),
        col(contentCol).cast("binary").as("content"))
      .withColumn("shard", pmod(xxhash64(col("name")), lit(nShards.toLong)))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", "name")
      .as[(String, Array[Byte], Long)]
      .foreachPartition { it: Iterator[(String, Array[Byte], Long)] =>
        var current = -1L
        var entries = new ArrayBuffer[(String, Array[Byte])]()
        def flush(): Unit = if (current >= 0 && entries.nonEmpty) {
          writeZipFile(
            Paths.get(dir, f"shard-$current%05d.zip").toString, entries.toSeq)
          entries = new ArrayBuffer[(String, Array[Byte])]()
        }
        it.foreach { case (name, content, shard) =>
          if (shard != current) { flush(); current = shard }
          entries += (name -> content)
        }
        flush()
      }
  }
}
