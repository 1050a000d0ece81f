package graft.sources

import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}
import java.nio.file.{Files, Paths}

import scala.collection.mutable.{ArrayBuffer, LinkedHashMap}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WebDataset-style tar shard source/sink — the multimodal training
  * interchange format: a corpus ships as many `.tar` shards, each shard
  * holds samples as consecutive files sharing a KEY (the name up to the
  * first dot of the basename; the rest is the extension), e.g.
  * `000123.jpg` + `000123.txt` + `000123.cls` is one sample. Spark has
  * no tar source, so the container is implemented from the POSIX ustar
  * spec (IEEE 1003.1 pax archive format, ustar interchange subset) and
  * rides `binaryFile` — ONE TASK PER SHARD, parse and sample grouping
  * both task-local, so ingest never shuffles and parallelism = shard
  * count (the WARC/HDF5 one-file-one-task shape; real WebDataset
  * corpora are thousands of ~1 GB shards).
  *
  * Subset discipline (loud named refusals outside):
  *  - regular files only ('0'/NUL typeflag); directory entries carry no
  *    data and are skipped; symlinks/hardlinks, pax extended headers
  *    ('x'/'g') and GNU longname/longlink ('L'/'K') refuse by name;
  *  - POSIX magic `ustar` required; GNU base-256 sizes refuse by name;
  *  - header checksums verified on every block (a corrupt shard fails
  *    loudly, never parses shifted).
  *
  * Reference behavior: nexus-processor has no archive source; this is
  * builder-brief multimodal-pipeline surface.
  */
object TarIO {

  final case class TarEntry(name: String, bytes: Array[Byte])

  private val BlockSize = 512

  // ---- byte-level ustar ----------------------------------------------------

  private def octal(v: Long, width: Int): Array[Byte] = {
    // width-1 octal digits + NUL, zero-padded (the common ustar form)
    val s = java.lang.Long.toOctalString(v)
    require(s.length <= width - 1, s"tar: value $v overflows $width-byte octal field")
    (("0" * (width - 1 - s.length)) + s + "\u0000").getBytes(US_ASCII)
  }

  private def headerFor(name: String, size: Long): Array[Byte] = {
    // names are UTF-8 (the GNU/pax de-facto; US_ASCII getBytes would
    // SILENTLY mangle non-ASCII keys to '?') and parsed back as UTF-8
    val nameBytes = name.getBytes(UTF_8)
    require(nameBytes.length <= 100,
      s"tar: entry name longer than 100 bytes is out of subset ($name)")
    require(!name.contains("\u0000"), "tar: NUL in entry name")
    val h = new Array[Byte](BlockSize)
    System.arraycopy(nameBytes, 0, h, 0, nameBytes.length)
    System.arraycopy(octal(420 /* 0644 */, 8), 0, h, 100, 8)   // mode
    System.arraycopy(octal(0, 8), 0, h, 108, 8)                // uid
    System.arraycopy(octal(0, 8), 0, h, 116, 8)                // gid
    System.arraycopy(octal(size, 12), 0, h, 124, 12)           // size
    System.arraycopy(octal(0, 12), 0, h, 136, 12)              // mtime
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)             // chksum blanks
    h(156) = '0'                                               // regular file
    System.arraycopy("ustar\u000000".getBytes(US_ASCII), 0, h, 257, 8)
    var sum = 0L
    h.foreach(b => sum += b & 0xff)
    val ck = java.lang.Long.toOctalString(sum)
    val ckField = ("0" * (6 - ck.length)) + ck
    System.arraycopy(ckField.getBytes(US_ASCII), 0, h, 148, 6)
    h(154) = 0; h(155) = ' '
    h
  }

  /** Serialize entries as a POSIX ustar archive (in memory — shards are
    * the unit of parallelism and stay well under executor memory). */
  def writeTar(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new ArrayBuffer[Byte]()
    entries.foreach { case (name, bytes) =>
      require(bytes != null, s"tar: null payload for $name")
      out ++= headerFor(name, bytes.length.toLong)
      out ++= bytes
      val pad = (BlockSize - (bytes.length % BlockSize)) % BlockSize
      (0 until pad).foreach(_ => out += 0)
    }
    (0 until 2 * BlockSize).foreach(_ => out += 0) // end-of-archive marker
    out.toArray
  }

  def writeTarFile(path: String, entries: Seq[(String, Array[Byte])]): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.write(p, writeTar(entries))
  }

  /** Parse a ustar archive. Checksums verified per block; everything
    * outside the subset refuses by name. */
  def parseTar(bytes: Array[Byte]): Vector[TarEntry] = {
    require(bytes != null && bytes.length % BlockSize == 0,
      "tar: archive is not block-aligned")
    val out = Vector.newBuilder[TarEntry]
    var p = 0
    def str(off: Int, len: Int): String = {
      var end = p + off
      val max = p + off + len
      while (end < max && bytes(end) != 0) end += 1
      new String(bytes, p + off, end - (p + off), UTF_8)
    }
    def oct(off: Int, len: Int): Long = {
      require((bytes(p + off) & 0x80) == 0,
        "tar: GNU base-256 numeric fields are out of subset")
      val s = str(off, len).trim
      if (s.isEmpty) 0L else java.lang.Long.parseLong(s, 8)
    }
    var done = false
    while (!done && p + BlockSize <= bytes.length) {
      if ((0 until BlockSize).forall(i => bytes(p + i) == 0)) {
        done = true // first zero block: end-of-archive
      } else {
        val magic = str(257, 6)
        require(magic == "ustar",
          s"tar: magic '$magic' is out of subset (POSIX ustar only)")
        var sum = 0L
        (0 until BlockSize).foreach { i =>
          sum += (if (i >= 148 && i < 156) ' '.toInt else bytes(p + i) & 0xff)
        }
        val declared = java.lang.Long.parseLong(str(148, 8).trim, 8)
        require(sum == declared,
          s"tar: header checksum mismatch at offset $p ($sum vs $declared)")
        val size = oct(124, 12)
        val typeflag = bytes(p + 156).toChar
        val prefix = str(345, 155)
        val name0 = str(0, 100)
        val name = if (prefix.isEmpty) name0 else s"$prefix/$name0"
        require(p + BlockSize + size <= bytes.length,
          s"tar: entry '$name' overruns the archive")
        typeflag match {
          case '0' | '\u0000' =>
            out += TarEntry(name, java.util.Arrays.copyOfRange(
              bytes, p + BlockSize, p + BlockSize + size.toInt))
          case '5' => () // directory: no data, hopped
          case 'x' | 'g' =>
            throw new IllegalArgumentException(
              "tar: pax extended headers are out of subset")
          case 'L' | 'K' =>
            throw new IllegalArgumentException(
              "tar: GNU longname/longlink entries are out of subset")
          case other =>
            throw new IllegalArgumentException(
              s"tar: typeflag '$other' is out of subset")
        }
        val dataBlocks = ((size + BlockSize - 1) / BlockSize).toInt
        p += BlockSize * (1 + dataBlocks)
      }
    }
    require(done, "tar: missing end-of-archive marker")
    out.result()
  }

  /** WebDataset sample key/extension split: key = name up to the first
    * dot of the BASENAME (directory part included in the key), ext =
    * everything after it. `dir/000123.seg.txt` → (`dir/000123`,
    * `seg.txt`). Extension-less names get ext "". */
  def splitKey(name: String): (String, String) = {
    val slash = name.lastIndexOf('/')
    val dot = name.indexOf('.', slash + 1)
    if (dot < 0) (name, "") else (name.substring(0, dot), name.substring(dot + 1))
  }

  // ---- Spark side -----------------------------------------------------------

  /** All tar entries under `dir` as (shard, name, content) — one task
    * per shard via binaryFile, parse task-local, nothing shuffles. */
  def readTarEntries(spark: SparkSession, dir: String,
                     pattern: String = "*.tar"): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", pattern).load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        parseTar(bytes).iterator.map(e => (path, e.name, e.bytes))
      }
      .toDF("shard", "name", "content")
  }

  /** WebDataset read: one row per SAMPLE — (shard, key, files
    * map<ext,binary>, n_files). Grouping is task-local over the shard's
    * own entries (a sample never spans shards by the format's contract),
    * so the whole ingest is still shuffle-free; downstream queries pick
    * payloads with `element_at(files, 'jpg')` and feed them straight to
    * the codec boundary (decodeImages/decodeAudio/decodeVideos). */
  def readWebDataset(spark: SparkSession, dir: String,
                     pattern: String = "*.tar"): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", pattern).load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val samples = LinkedHashMap.empty[String, LinkedHashMap[String, Array[Byte]]]
        parseTar(bytes).foreach { e =>
          val (key, ext) = splitKey(e.name)
          val files = samples.getOrElseUpdate(key, LinkedHashMap.empty)
          require(!files.contains(ext),
            s"webdataset: duplicate extension '$ext' for sample '$key'")
          files(ext) = e.bytes
        }
        samples.iterator.map { case (key, files) =>
          (path, key, files.toMap, files.size)
        }
      }
      .toDF("shard", "key", "files", "n_files")
  }

  /** Deterministic WebDataset WRITE: shard = xxhash64(key) mod nShards
    * (the CorpusIO discipline — membership is a pure function of the
    * key, reproducible across any input partitioning or cluster size),
    * one shuffle to co-locate each shard's samples, samples laid out in
    * sorted-key order, one `shard-NNNNN.tar` per shard. Input: (keyCol,
    * filesCol map<string,binary>). */
  def writeWebDatasetShards(df: DataFrame, dir: String, nShards: Int,
                            keyCol: String = "key",
                            filesCol: String = "files"): Unit = {
    require(nShards > 0, "nShards must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    Files.createDirectories(Paths.get(dir))
    df.select(col(keyCol).cast("string").as("key"), col(filesCol).as("files"))
      .withColumn("shard", pmod(xxhash64(col("key")), lit(nShards.toLong)))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", "key")
      .as[(String, Map[String, Array[Byte]], Long)]
      .foreachPartition { it: Iterator[(String, Map[String, Array[Byte]], Long)] =>
        // a shard's rows are all in one partition (hash-partitioned on
        // the shard value); a partition may carry several shards
        var current = -1L
        var entries = new ArrayBuffer[(String, Array[Byte])]()
        def flush(): Unit = if (current >= 0 && entries.nonEmpty) {
          writeTarFile(
            Paths.get(dir, f"shard-$current%05d.tar").toString, entries.toSeq)
          entries = new ArrayBuffer[(String, Array[Byte])]()
        }
        it.foreach { case (key, files, shard) =>
          // a '.' in the basename would read back as a shorter key +
          // longer ext (splitKey cuts at the FIRST dot after the last
          // slash), silently merging distinct samples — refuse by name
          require(!key.substring(key.lastIndexOf('/') + 1).contains('.'),
            s"webdataset: sample key '$key' has a '.' in its basename " +
              "(would be misread as an extension on read-back)")
          if (shard != current) { flush(); current = shard }
          files.toSeq.sortBy(_._1).foreach { case (ext, bytes) =>
            entries += ((if (ext.isEmpty) key else s"$key.$ext") -> bytes)
          }
        }
        flush()
      }
  }
}
