package graft.sources

import java.util.zip.Inflater
import scala.collection.mutable

/** Pure-JVM reader for the subset of the HDF5 file format that NeXus run
  * files use (reference: parquet.py:45,140-530 reads them through h5py; no
  * HDF5 toolchain exists in this container, so the container format itself
  * is implemented here from the public HDF5 File Format Specification,
  * the same way `graft.multimodal.ImageHeaders`/`AudioHeaders`/
  * `VideoHeaders` implement the PNG/JPEG/WAV/FLAC/MP4 container layouts).
  *
  * Supported subset (errors are loud and name the unsupported feature):
  *   - superblock versions 0/1 (classic) and 2/3 (1.10+ writers)
  *   - object headers v1 (classic) and v2 (`OHDR`), incl. continuation
  *     blocks (v1 plain, v2 `OCHK`)
  *   - groups: classic symbol-table groups (v1 B-tree + local heap +
  *     `SNOD` nodes), compact new-style groups (link messages), and
  *     DENSE link/attribute storage (fractal heaps `FRHP`/`FHDB`/`FHIB`
  *     + name-index v2 b-trees) — managed, TINY (normal and extended
  *     12-bit forms), and HUGE (type-1 huge-object b-tree) heap IDs,
  *     deflate-FILTERED direct blocks, and committed SHARED dense
  *     attributes (shared-message v2 / v3 type 2; SOHM-table residents
  *     refuse by name)
  *   - dataspaces v1/v2 (scalar + simple, any rank)
  *   - datatypes: fixed-point (1/2/4/8 bytes, either sign, LE or BE),
  *     IEEE float (f32/f64, LE or BE), fixed-length strings
  *     (null-terminated / null-padded / space-padded), variable-length
  *     strings (global-heap `GCOL` collections), and compound (struct
  *     arrays, v1/v3 member encodings, decoded column-wise)
  *   - data layouts v3 (compact, contiguous, chunked v1-B-tree index,
  *     any rank, partial edge chunks) and v4 (1.10+: compact,
  *     contiguous, chunked with ALL FIVE chunk indexes — Single Chunk,
  *     Implicit, Fixed Array `FAHD`/`FADB` incl. paged data blocks,
  *     Extensible Array `EAHD`/`EAIB`/`EASB`/`EADB` (the
  *     one-unlimited-dim appendable shape, incl. paged data blocks),
  *     and Version-2 B-tree `BTHD`/`BTIN`/`BTLF` chunk
  *     records, any depth)
  *   - filter pipeline messages v1 and v2 (deflate id 1, shuffle id 2)
  *   - attribute messages v1/v2/v3
  *   - user-block files (superblock at 512/1024/…, base-relative
  *     addressing per spec §II)
  *
  * Scale shape: the reader touches only the byte ranges the walk needs —
  * header blocks, B-tree nodes, and the chunks of datasets actually
  * `read()` — through the [[Hdf5.ByteSource]] abstraction. Distributed
  * ingestion feeds array-backed sources from `binaryFile` rows (one task
  * per run file, executor-side, thousands of runs in parallel — see
  * [[graft.etl.NexusH5]]); a seekable-channel source serves local
  * tooling without loading the file.
  */
object Hdf5 {

  /** Random-access byte window over a file image. */
  trait ByteSource {
    def size: Long
    /** Copy `len` bytes at `pos`. */
    def get(pos: Long, len: Int): Array[Byte]
  }

  final class ArrayByteSource(bytes: Array[Byte]) extends ByteSource {
    def size: Long = bytes.length.toLong
    def get(pos: Long, len: Int): Array[Byte] = {
      require(pos >= 0 && pos + len <= bytes.length,
        s"read [$pos, ${pos + len}) outside file of ${bytes.length} bytes")
      java.util.Arrays.copyOfRange(bytes, pos.toInt, pos.toInt + len)
    }
  }

  /** View of a source shifted by a base address: HDF5 stores every
    * address relative to the superblock offset, so a user-block file
    * (superblock at 512/1024/...) resolves addresses through this view
    * rather than as absolute file offsets.
    */
  final class ShiftedByteSource(under: ByteSource, base: Long)
      extends ByteSource {
    def size: Long = under.size - base
    def get(pos: Long, len: Int): Array[Byte] = under.get(base + pos, len)
  }

  /** Channel-backed source: only the touched ranges are ever read. */
  final class ChannelByteSource(ch: java.nio.channels.SeekableByteChannel)
      extends ByteSource {
    def size: Long = ch.size()
    def get(pos: Long, len: Int): Array[Byte] = {
      val buf = java.nio.ByteBuffer.allocate(len)
      var n = 0
      while (n < len) {
        val r = ch match {
          case fc: java.nio.channels.FileChannel => fc.read(buf, pos + n)
          case other => other.position(pos + n); other.read(buf)
        }
        require(r > 0, s"short read at $pos+$n of $len")
        n += r
      }
      buf.array()
    }
  }

  /** Address value meaning "undefined" (all bits set). */
  final val Undef: Long = -1L

  // ---- decoded values ----------------------------------------------------

  /** A dataset's (or attribute's) decoded elements, flattened row-major —
    * the reference's `read_dataset_value` flattens the same way
    * (parquet.py:104-117). */
  sealed trait H5Value { def length: Int }
  final case class H5Longs(values: Array[Long]) extends H5Value {
    def length: Int = values.length
  }
  final case class H5Doubles(values: Array[Double]) extends H5Value {
    def length: Int = values.length
  }
  final case class H5Strings(values: Array[String]) extends H5Value {
    def length: Int = values.length
  }
  /** A compound-typed dataset decoded column-wise: one named member
    * value per field, all the same length (DASlogs in the wild carry
    * compound time/value tables — parquet.py reads them through h5py
    * struct arrays). */
  final case class H5Compound(members: Seq[(String, H5Value)]) extends H5Value {
    def length: Int = members.headOption.map(_._2.length).getOrElse(0)
    def member(name: String): Option[H5Value] =
      members.find(_._1 == name).map(_._2)
  }

  object H5Value {
    /** Mirror of the reference's scalar collapse (parquet.py:100-123):
      * one element reads as a scalar, empty reads as None. */
    def scalarString(v: H5Value): Option[String] = v match {
      case H5Strings(a) => a.headOption
      case H5Longs(a) => a.headOption.map(_.toString)
      case H5Doubles(a) => a.headOption.map(d =>
        if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15)
          d.toLong.toString else d.toString)
      case _: H5Compound => None // struct has no scalar rendering
    }
    def scalarDouble(v: H5Value): Option[Double] = v match {
      case H5Longs(a) => a.headOption.map(_.toDouble)
      case H5Doubles(a) => a.headOption
      case H5Strings(a) => a.headOption.flatMap(_.toDoubleOption)
      case _: H5Compound => None
    }
    def scalarLong(v: H5Value): Option[Long] = v match {
      case H5Longs(a) => a.headOption
      case H5Doubles(a) => a.headOption.map(_.toLong)
      case H5Strings(a) => a.headOption.flatMap(_.toLongOption)
      case _: H5Compound => None
    }
    def longs(v: H5Value): Array[Long] = v match {
      case H5Longs(a) => a
      case H5Doubles(a) => a.map(_.toLong)
      case H5Strings(a) => a.map(_.toLong)
      case c: H5Compound => sys.error(
        s"compound value has no numeric collapse (members: " +
          s"${c.members.map(_._1).mkString(", ")})")
    }
    def doubles(v: H5Value): Array[Double] = v match {
      case H5Longs(a) => a.map(_.toDouble)
      case H5Doubles(a) => a
      case H5Strings(a) => a.map(_.toDouble)
      case c: H5Compound => sys.error(
        s"compound value has no numeric collapse (members: " +
          s"${c.members.map(_._1).mkString(", ")})")
    }
  }

  // ---- tree nodes --------------------------------------------------------

  sealed trait H5Node {
    def name: String
    def attributes: Map[String, H5Value]
  }

  final case class H5Group(name: String,
                           childrenInOrder: Seq[(String, H5Node)],
                           attributes: Map[String, H5Value]) extends H5Node {
    lazy val children: Map[String, H5Node] = childrenInOrder.toMap
    def get(path: String): Option[H5Node] = {
      val parts = path.split('/').filter(_.nonEmpty)
      parts.foldLeft(Option(this: H5Node)) {
        case (Some(g: H5Group), p) => g.children.get(p)
        case _ => None
      }
    }
    def dataset(path: String): Option[H5Dataset] =
      get(path).collect { case d: H5Dataset => d }
    def group(path: String): Option[H5Group] =
      get(path).collect { case g: H5Group => g }
  }

  /** `read()` decodes lazily — a tree walk that only needs structure and
    * attributes never touches the raw data chunks. */
  final case class H5Dataset(name: String,
                             dims: Array[Long],
                             read: () => H5Value,
                             attributes: Map[String, H5Value]) extends H5Node {
    def elementCount: Long = dims.foldLeft(1L)(_ * _)
  }

  def open(bytes: Array[Byte]): H5Group = open(new ArrayByteSource(bytes))

  /** Dataset reads are lazy, so the channel stays open for the returned
    * tree's lifetime (positional reads, thread-safe). Local-tooling
    * entry point; distributed ingestion uses array sources per file. */
  def open(path: java.nio.file.Path): H5Group =
    open(new ChannelByteSource(java.nio.channels.FileChannel.open(path)))

  def open(src: ByteSource): H5Group = new Parser(src).rootGroup()

  // ---- wire-format parsing ----------------------------------------------

  private val Signature: Array[Byte] =
    Array(0x89, 'H', 'D', 'F', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private final case class Dataspace(dims: Array[Long])

  private sealed trait Datatype { def size: Int }
  private final case class FixedPoint(size: Int, signed: Boolean,
                                      bigEndian: Boolean) extends Datatype
  private final case class Ieee754(size: Int, bigEndian: Boolean) extends Datatype
  /** pad: 0 null-terminate, 1 null-pad, 2 space-pad */
  private final case class FixedString(size: Int, pad: Int) extends Datatype
  private final case class VlenString(size: Int) extends Datatype
  /** members: (name, byte offset within the struct, member type) */
  private final case class CompoundType(
      size: Int, members: Seq[(String, Int, Datatype)]) extends Datatype

  private sealed trait Layout
  private final case class Compact(data: Array[Byte]) extends Layout
  private final case class Contiguous(addr: Long, byteSize: Long) extends Layout
  private final case class Chunked(btreeAddr: Long, chunkDims: Array[Int])
      extends Layout
  /** Data layout message v4 (HDF5 1.10+): `indexType` 1 = Single Chunk,
    * 2 = Implicit, 3 = Fixed Array, 4 = Extensible Array (the
    * one-unlimited-dimension appendable shape — h5py `maxshape=(None,)`
    * event streams), 5 = Version-2 B-tree (multiple unlimited dims).
    * `chunkDims` is stored as encoded; the reader tolerates both the
    * rank and rank+1 (trailing element-size dimension) encodings.
    * `idxParams` carries the index-specific layout-message properties:
    * EA (maxBits, idxBlkElmts, minPtrs, minElmts, pageBits); v2 b-tree
    * (nodeSize, splitPct, mergePct). */
  private final case class ChunkedV4(
      indexType: Int, addr: Long, chunkDims: Array[Int], filtered: Boolean,
      singleChunkSize: Long, idxParams: Array[Int] = Array.empty) extends Layout

  private final case class Filter(id: Int, clientValues: Array[Int])

  private final case class HeaderMessage(typ: Int, data: Array[Byte])

  private final class Parser(src0: ByteSource) {
    // Re-bound to a ShiftedByteSource when the superblock sits after a
    // user block: stored addresses are base-relative (spec §II), so the
    // shifted view makes every src.get below base-correct unchanged.
    private var src: ByteSource = src0

    // little-endian primitive readers over a fetched block
    private def u8(b: Array[Byte], p: Int): Int = b(p) & 0xff
    private def u16(b: Array[Byte], p: Int): Int =
      (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
    private def u32(b: Array[Byte], p: Int): Long =
      (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
        ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
    private def u64(b: Array[Byte], p: Int): Long = {
      var v = 0L; var i = 7
      while (i >= 0) { v = (v << 8) | (b(p + i) & 0xffL); i -= 1 }
      v
    }

    private var sizeOfOffsets = 8
    private var sizeOfLengths = 8
    /** file-level shared-message indexes from the superblock-v2
      * extension (r16): (message-type flags, fractal heap address) —
      * the table SOHM-resident shared messages (v3 type 1) resolve
      * through. Empty when the file has no extension / no 0x000F. */
    private var sohmIndexes: Seq[(Int, Long)] = Nil
    private val sohmHeapCache =
      scala.collection.mutable.HashMap.empty[Long, FractalHeap]
    private def sohmHeapFor(owner: String, typeFlag: Int): FractalHeap = {
      val addr = sohmIndexes.collectFirst {
        case (flags, heapAddr) if (flags & typeFlag) != 0 => heapAddr
      }.getOrElse(sys.error(
        s"$owner: SOHM-resident shared message but no shared-message " +
          s"index covers type flag 0x${typeFlag.toHexString} (file has " +
          s"${sohmIndexes.size} indexes)"))
      sohmHeapCache.getOrElseUpdate(addr, new FractalHeap(owner, addr))
    }

    /** Superblock-v2 EXTENSION (r16): an object header whose 0x000F
      * message names the Shared Object Header Message table (spec
      * III.H) — version(1), table address(O), #indexes(1); each table
      * index: version(1), index type(1), message-type flags(2), min
      * size(4), list cutoff(2), btree cutoff(2), #messages(2), index
      * address(O), fractal heap address(O). Only the type flags and
      * the heap address matter to reads: v3 type-1 shared messages
      * carry a heap ID, never an index lookup. */
    private def parseSohmTable(extAddr: Long): Unit = {
      val msg = parseMessages(extAddr).find(_.typ == 0x000F).getOrElse(return)
      val body = msg.data
      val tableAddr = readOffset(body, 1)
      val nIdx = u8(body, 1 + sizeOfOffsets)
      if (tableAddr == Undef || nIdx == 0) return
      val per = 14 + 2 * sizeOfOffsets
      val tbl = src.get(tableAddr, 4 + nIdx * per + 4)
      require(new String(tbl, 0, 4, "US-ASCII") == "SMTB",
        "bad shared-message table signature")
      sohmIndexes = (0 until nIdx).map { i =>
        val at = 4 + i * per
        val flags = u16(tbl, at + 2)
        val heapAddr = readOffset(tbl, at + 14 + sizeOfOffsets)
        (flags, heapAddr)
      }
    }

    private def readOffset(b: Array[Byte], p: Int): Long = sizeOfOffsets match {
      case 8 => u64(b, p)
      case 4 => { val v = u32(b, p); if (v == 0xffffffffL) Undef else v }
      case n => sys.error(s"unsupported size-of-offsets $n")
    }
    private def readLength(b: Array[Byte], p: Int): Long = sizeOfLengths match {
      case 8 => u64(b, p)
      case 4 => u32(b, p)
      case n => sys.error(s"unsupported size-of-lengths $n")
    }

    /** Superblock location: offset 0, else 512, 1024, ... (spec §II). */
    private def findSuperblock(): Long = {
      def sigAt(pos: Long): Boolean =
        pos + 8 <= src.size && java.util.Arrays.equals(src.get(pos, 8), Signature)
      if (sigAt(0L)) return 0L
      var pos = 512L
      while (pos + 8 <= src.size) {
        if (sigAt(pos)) return pos
        pos *= 2
      }
      sys.error("not an HDF5 file: superblock signature not found")
    }

    def rootGroup(): H5Group = {
      val sbPos = findSuperblock()
      if (sbPos > 0) src = new ShiftedByteSource(src0, sbPos)
      val head = src.get(0L, math.min(160L, src.size).toInt)
      val version = u8(head, 8)
      val root: H5Node = version match {
        case 0 | 1 =>
          sizeOfOffsets = u8(head, 13)
          sizeOfLengths = u8(head, 14)
          var p = 24
          if (version == 1) p += 4 // indexed-storage k + reserved
          // base, free-space, EOF, driver-info addresses
          p += 4 * sizeOfOffsets
          // root group symbol table entry: link name offset, header addr
          val rootHeader = readOffset(head, p + sizeOfOffsets)
          parseNode("/", rootHeader)
        case 2 | 3 =>
          sizeOfOffsets = u8(head, 9)
          sizeOfLengths = u8(head, 10)
          // flags(1), base, extension, EOF, root header address
          val extAddr = readOffset(head, 12 + sizeOfOffsets)
          if (extAddr != Undef) parseSohmTable(extAddr)
          val rootHeader = readOffset(head, 12 + 3 * sizeOfOffsets)
          parseNode("/", rootHeader)
        case v => sys.error(s"unsupported HDF5 superblock version $v")
      }
      root match {
        case g: H5Group => g
        case _ => sys.error("root object is not a group")
      }
    }

    // ---- object headers --------------------------------------------------

    private def parseMessagesV1(addr: Long): Seq[HeaderMessage] = {
      val prefix = src.get(addr, 16)
      require(u8(prefix, 0) == 1, s"object header at $addr: bad version")
      val nMessages = u16(prefix, 2)
      val headerSize = u32(prefix, 8).toInt
      val out = mutable.ArrayBuffer.empty[HeaderMessage]
      // (blockStart, blockLen) list, starting with the header block after
      // the 16-byte prefix (messages are 8-aligned within blocks)
      var blocks = List((addr + 16, headerSize.toLong))
      var remaining = nMessages
      while (remaining > 0 && blocks.nonEmpty) {
        val (bStart, bLen) = blocks.head
        blocks = blocks.tail
        val block = src.get(bStart, bLen.toInt)
        var p = 0
        while (remaining > 0 && p + 8 <= bLen) {
          val typ = u16(block, p)
          val dataSize = u16(block, p + 2)
          val data = java.util.Arrays.copyOfRange(block, p + 8, p + 8 + dataSize)
          if (typ == 0x0010) { // continuation
            blocks = blocks :+ ((readOffset(data, 0), readLength(data, sizeOfOffsets)))
          } else if (typ != 0x0000) {
            out += HeaderMessage(typ, data)
          }
          remaining -= 1
          p += 8 + dataSize
          // v1 messages are 8-byte aligned; sizes are already multiples of 8
          val rem = p % 8
          if (rem != 0) p += 8 - rem
        }
      }
      out.toSeq
    }

    private def parseMessagesV2(addr: Long): Seq[HeaderMessage] = {
      val prefix = src.get(addr, 16)
      require(new String(prefix, 0, 4, "US-ASCII") == "OHDR",
        s"object header v2 at $addr: bad signature")
      require(u8(prefix, 4) == 2, "OHDR version must be 2")
      val flags = u8(prefix, 5)
      var p = 6
      if ((flags & 0x20) != 0) p += 16 // access/mod/change/birth times
      if ((flags & 0x10) != 0) p += 4 // max compact / min dense attrs
      val chunk0SizeBytes = 1 << (flags & 0x3)
      val more = src.get(addr + p, chunk0SizeBytes)
      val chunk0Size = chunk0SizeBytes match {
        case 1 => u8(more, 0).toLong
        case 2 => u16(more, 0).toLong
        case 4 => u32(more, 0)
        case 8 => u64(more, 0)
      }
      val trackOrder = (flags & 0x04) != 0
      val out = mutable.ArrayBuffer.empty[HeaderMessage]
      // (start of messages, gross length incl. trailing checksum? no —
      // chunk size here excludes signature/checksum per spec)
      var blocks = List((addr + p + chunk0SizeBytes, chunk0Size))
      while (blocks.nonEmpty) {
        val (bStart, bLen) = blocks.head
        blocks = blocks.tail
        val block = src.get(bStart, bLen.toInt)
        var q = 0
        val msgHeadLen = if (trackOrder) 6 else 4
        while (q + msgHeadLen <= bLen) {
          val typ = u8(block, q)
          val dataSize = u16(block, q + 1)
          val data = java.util.Arrays.copyOfRange(
            block, q + msgHeadLen, q + msgHeadLen + dataSize)
          if (typ == 0x10) {
            // continuation block: starts with "OCHK", ends with checksum
            val contAddr = readOffset(data, 0)
            val contLen = readLength(data, sizeOfOffsets)
            val sig = new String(src.get(contAddr, 4), "US-ASCII")
            require(sig == "OCHK", s"continuation block at $contAddr: bad signature")
            blocks = blocks :+ ((contAddr + 4, contLen - 8)) // minus sig+checksum
          } else if (typ != 0x00) {
            out += HeaderMessage(typ, data)
          }
          q += msgHeadLen + dataSize
        }
      }
      out.toSeq
    }

    private def parseMessages(addr: Long): Seq[HeaderMessage] = {
      val probe = src.get(addr, 4)
      if (new String(probe, "US-ASCII") == "OHDR") parseMessagesV2(addr)
      else parseMessagesV1(addr)
    }

    // ---- node assembly ---------------------------------------------------

    private def parseNode(name: String, headerAddr: Long): H5Node = {
      val msgs = parseMessages(headerAddr)
      // DENSE attributes (libhdf5 beyond 8 attrs): bodies live as
      // fractal-heap objects behind an Attribute Info message + type-8
      // name-hash v2 b-tree — without this leg a modern file's attrs
      // would read as silently MISSING (not even a refusal)
      val denseAttrs: Map[String, H5Value] =
        msgs.find(_.typ == 0x0015).map { ai =>
          val d = ai.data
          val flags = u8(d, 1)
          var p = 2
          if ((flags & 0x1) != 0) p += 2 // max creation index
          val fheapAddr = readOffset(d, p)
          if (fheapAddr == Undef) Map.empty[String, H5Value]
          else readDenseAttrs(name, fheapAddr,
            readOffset(d, p + sizeOfOffsets))
        }.getOrElse(Map.empty)
      val attrs = msgs.filter(_.typ == 0x000C).map(parseAttribute).toMap ++
        denseAttrs

      val symtab = msgs.find(_.typ == 0x0011)
      val linkInfo = msgs.find(_.typ == 0x0002)
      val links = msgs.filter(_.typ == 0x0006)
      val hasDataspace = msgs.exists(_.typ == 0x0001)

      if (symtab.isDefined) {
        val d = symtab.get.data
        val btreeAddr = readOffset(d, 0)
        val heapAddr = readOffset(d, sizeOfOffsets)
        val entries = readSymbolTable(btreeAddr, heapAddr)
        H5Group(name, entries.map { case (child, a) => child -> parseNode(child, a) },
          attrs)
      } else if (linkInfo.isDefined || links.nonEmpty) {
        // new-style groups: COMPACT links live in 0x0006 messages; DENSE
        // links (libhdf5 switches beyond 8 links) live as link-message
        // bodies in a FRACTAL HEAP indexed by a name-hash v2 b-tree,
        // both addressed from the Link Info message
        val denseEntries: Option[Seq[(String, Long)]] = linkInfo.flatMap { li =>
          val d = li.data
          // version(1), flags(1), [max creation index(8)], fractal heap
          // addr, name-index b-tree addr, [creation-order b-tree addr]
          val flags = u8(d, 1)
          var p = 2
          if ((flags & 0x1) != 0) p += 8
          val fheapAddr = readOffset(d, p)
          if (fheapAddr == Undef) None
          else Some(readDenseLinks(name, fheapAddr,
            readOffset(d, p + sizeOfOffsets)))
        }
        val entries = denseEntries.getOrElse(links.map(parseLink))
        H5Group(name, entries.map { case (child, a) => child -> parseNode(child, a) },
          attrs)
      } else if (hasDataspace) {
        val space = parseDataspace(
          msgs.find(_.typ == 0x0001).get.data)
        val dtype = parseDatatype(
          msgs.find(_.typ == 0x0003)
            .getOrElse(sys.error(s"dataset $name: missing datatype message")).data, 0)._1
        val layout = parseLayout(
          msgs.find(_.typ == 0x0008)
            .getOrElse(sys.error(s"dataset $name: missing layout message")).data)
        val filters = msgs.find(_.typ == 0x000B).map(parseFilters).getOrElse(Nil)
        val dims = space.dims
        H5Dataset(name, dims,
          () => readData(name, dims, dtype, layout, filters), attrs)
      } else {
        // a group with no links at all (possible for empty new-style groups)
        H5Group(name, Nil, attrs)
      }
    }

    /** Parse one link message → (name, object header address). */
    private def parseLink(m: HeaderMessage): (String, Long) = {
      val d = m.data
      require(u8(d, 0) == 1, "link message version must be 1")
      val flags = u8(d, 1)
      var p = 2
      val linkType = if ((flags & 0x08) != 0) { val t = u8(d, p); p += 1; t } else 0
      require(linkType == 0, s"only hard links supported (got type $linkType)")
      if ((flags & 0x04) != 0) p += 8 // creation order
      if ((flags & 0x10) != 0) p += 1 // charset
      val nameLen = (flags & 0x3) match {
        case 0 => val n = u8(d, p); p += 1; n
        case 1 => val n = u16(d, p); p += 2; n
        case 2 => val n = u32(d, p).toInt; p += 4; n
        case 3 => val n = u64(d, p).toInt; p += 8; n
      }
      val nm = new String(d, p, nameLen, "UTF-8")
      p += nameLen
      (nm, readOffset(d, p))
    }

    // ---- dense groups: fractal heap + name-index v2 b-tree ---------------

    /** Dense link storage (spec III.G; libhdf5 1.8+ switches groups to
      * dense beyond 8 links): link-message bodies live as MANAGED
      * objects in a fractal heap; the name-index v2 b-tree's type-5
      * records carry (name hash, 7-byte heap ID) and enumerate every
      * link. Returns (name, object header address) pairs. */
    private def readDenseLinks(name: String, fheapAddr: Long,
                               btAddr: Long): Seq[(String, Long)] = {
      require(btAddr != Undef,
        s"group $name: dense links without a name-index b-tree")
      val heap = new FractalHeap(name, fheapAddr)
      readV2BtreeRecords(name, btAddr, expectType = 5).map { rec =>
        // type-5 record: name hash (4 bytes) + managed heap ID (7 bytes)
        parseLink(HeaderMessage(0x0006, heap.get(rec, 4)))
      }
    }

    /** Dense attribute storage (spec IV.A.2.f Attribute Info): the
      * type-8 name-index records carry (heap ID, message flags,
      * creation order, name hash); each heap object is an attribute
      * message body — or, when the record's SHARED flag is set (r15),
      * a Shared Message encoding resolving to the attribute message in
      * another object's header (the "committed" form; version 2, or
      * version 3 type 2) — or, r16, a SOHM-TABLE-RESIDENT shared
      * message (version 3 type 1) resolving through the file-level
      * shared-message fractal heap the superblock extension names. */
    private def readDenseAttrs(name: String, fheapAddr: Long,
                               btAddr: Long): Map[String, H5Value] = {
      require(btAddr != Undef,
        s"$name: dense attributes without a name-index b-tree")
      val heap = new FractalHeap(name, fheapAddr)
      readV2BtreeRecords(name, btAddr, expectType = 8).map { rec =>
        val body = heap.get(rec, 0)
        if ((rec(heap.idLen) & 1) == 0)
          parseAttribute(HeaderMessage(0x000C, body))
        else if (u8(body, 0) == 3 && u8(body, 1) == 1) {
          // SOHM-TABLE-RESIDENT shared message (v3 type 1, r16 — the
          // last shared-attribute refusal): the field is an 8-byte ID
          // into the file-level shared-message fractal heap named by
          // the superblock-extension table; the heap object is the
          // attribute message body itself
          parseAttribute(HeaderMessage(0x000C,
            sohmHeapFor(name, 0x10).get(body, 2)))
        } else {
          // shared message: {version, type, location}
          val ver = u8(body, 0)
          val addr = ver match {
            case 2 => readOffset(body, 2)
            case 3 =>
              require(u8(body, 1) == 2,
                s"$name: shared-message type ${u8(body, 1)} is out of " +
                  "subset; SOHM-resident (type 1) and committed (type 2) " +
                  "are supported")
              readOffset(body, 2)
            case v =>
              sys.error(s"$name: unsupported shared-message version $v")
          }
          val shared = parseMessages(addr)
          parseAttribute(shared.find(_.typ == 0x000C).getOrElse(sys.error(
            s"$name: shared attribute header at $addr carries no " +
              "attribute message")))
        }
      }.toMap
    }

    /** Fractal heap (spec III.G): doubling-table blocks holding MANAGED
      * objects, plus the three storage classes a modern libhdf5 file
      * can also emit (all supported since r15): TINY objects (data
      * packed into the heap ID itself — normal ≤16-byte form for heap
      * IDs ≤ 18 bytes, the 12-bit extended form beyond), HUGE objects
      * (larger than the max managed size — stored standalone, resolved
      * through the heap's type-1 huge-object v2 b-tree records), and
      * FILTERED heaps (direct blocks deflate-compressed as a whole;
      * per-block stored sizes from the header / indirect-block
      * entries). Root is a single direct block or an indirect block
      * whose rows past maxDirectRows hold NESTED indirect children
      * (each restarting the doubling table — r16). */
    private final class FractalHeap(owner: String, hdrAddr: Long) {
      private val fixed = 4 + 1 + 2 + 2 + 1 + 4
      private val baseLen = fixed + 2 * sizeOfOffsets + 10 * sizeOfLengths +
        2 + 2 * sizeOfLengths + 2 + 2 + sizeOfOffsets + 2
      private val head = src.get(hdrAddr, baseLen + 4)
      require(new String(head, 0, 4, "US-ASCII") == "FRHP",
        s"group $owner: bad fractal heap signature")
      require(u8(head, 4) == 0,
        s"group $owner: unsupported fractal heap version ${u8(head, 4)}")
      /** heap ID length — exposed so record layouts that embed an ID
        * (type-8 attribute records) can find the fields after it. */
      val idLen: Int = u16(head, 5)
      private val heapIdLen = idLen
      private val ioFilterLen = u16(head, 7)
      // flags (bit1 = checksummed direct blocks) only shift free space
      // inside blocks; heap IDs address objects absolutely, so reads
      // are flag-independent
      private var p = fixed // past max-managed-size(4)
      p += sizeOfLengths // next huge object id
      private val hugeBtAddr = readOffset(head, p)
      p += sizeOfOffsets
      p += sizeOfLengths // free space amount
      p += sizeOfOffsets // free-space manager (ignored: reads don't care)
      p += 4 * sizeOfLengths // managed space/alloc/iterator/object count
      p += 4 * sizeOfLengths // huge size/count, tiny size/count
      private val tableWidth = u16(head, p); p += 2
      private val startBlockSize = readLength(head, p); p += sizeOfLengths
      private val maxDirectSize = readLength(head, p); p += sizeOfLengths
      private val maxHeapBits = u16(head, p); p += 2
      p += 2 // starting rows in root indirect block
      private val rootAddr = readOffset(head, p); p += sizeOfOffsets
      private val curRows = u16(head, p)
      private val offsetSize = (maxHeapBits + 7) / 8
      // IDs wider than offset+length carry zero padding (the tiny-ID
      // headroom); length reads cap at 8 bytes
      private val lengthSize = math.min(heapIdLen - 1 - offsetSize, 8)
      require(offsetSize >= 1 && offsetSize <= 8 && lengthSize >= 1,
        s"group $owner: fractal heap ID geometry $heapIdLen/$offsetSize")
      require(rootAddr != Undef, s"group $owner: fractal heap has no blocks")
      // filtered heap: [size of filtered root direct block (L) + filter
      // mask (4) — present only when the ROOT is a direct block] +
      // the encoded filter pipeline message (same body as message 0x000B)
      private val (filteredRootSize, heapFilters) =
        if (ioFilterLen == 0) (0L, List.empty[Filter])
        else {
          val extraFixed = if (curRows == 0) sizeOfLengths + 4 else 0
          val ext = src.get(hdrAddr + baseLen, extraFixed + ioFilterLen)
          val sz = if (curRows == 0) readLength(ext, 0) else 0L
          val msg = java.util.Arrays.copyOfRange(
            ext, extraFixed, extraFixed + ioFilterLen)
          (sz, parseFilters(HeaderMessage(0x000B, msg)))
        }

      /** doubling table: rows 0 and 1 use the starting size, row r ≥ 2
        * doubles — size = start << (r-1). */
      private def rowSize(r: Int): Long =
        if (r < 2) startBlockSize else startBlockSize << (r - 1)
      private val maxDirectRows = {
        var r = 0
        while (rowSize(r) < maxDirectSize) r += 1
        r + 1
      }

      /** nrows of a CHILD indirect block covering `span` bytes of heap
        * space — children RESTART the doubling table, so
        * nrows = log2(span) - log2(start * width) + 1 (spec III.G). */
      private def childIndirectRows(span: Long): Int = {
        def lg(v: Long): Int = 63 - java.lang.Long.numberOfLeadingZeros(v)
        lg(span) - lg(startBlockSize * tableWidth) + 1
      }

      /** DFS over the indirect-block TREE (r16 — retires the
        * nested-indirect refusal): row-major within each block; rows
        * past maxDirectRows hold child INDIRECT blocks, each restarting
        * the doubling table over the span its row assigns it. Entries
        * are VARIABLE width — filtered heaps carry (stored size,
        * filter mask) for DIRECT children only — so the walk keeps a
        * cursor instead of indexing. Emits every allocated direct
        * block in heap order. */
      private def walkIndirect(addr: Long, nrows: Int, baseOff: Long)
          : Seq[(Long, Long, Long, Long)] = {
        val directEntry = sizeOfOffsets +
          (if (ioFilterLen > 0) sizeOfLengths + 4 else 0)
        val nDirect = math.min(nrows, maxDirectRows) * tableWidth
        val nIndirect = nrows * tableWidth - nDirect
        val bodyLen = nDirect * directEntry + nIndirect * sizeOfOffsets
        val ib = src.get(addr,
          4 + 1 + sizeOfOffsets + offsetSize + bodyLen + 4)
        require(new String(ib, 0, 4, "US-ASCII") == "FHIB",
          s"group $owner: bad fractal heap indirect block signature")
        var at = 4 + 1 + sizeOfOffsets + offsetSize
        var off = baseOff
        (0 until nrows * tableWidth).flatMap { i =>
          val row = i / tableWidth
          val span = rowSize(row)
          val here = off
          off += span
          if (row < maxDirectRows) {
            val a = readOffset(ib, at)
            val stored =
              if (ioFilterLen > 0) readLength(ib, at + sizeOfOffsets)
              else span
            at += directEntry
            if (a == Undef) Nil else Seq((here, span, a, stored))
          } else {
            val a = readOffset(ib, at)
            at += sizeOfOffsets
            if (a == Undef) Nil
            else walkIndirect(a, childIndirectRows(span), here)
          }
        }
      }

      /** (heap-space offset, LOGICAL size, file address, STORED size)
        * of every allocated direct block, from the root geometry;
        * stored == logical when the heap is unfiltered. */
      private val blocks: Seq[(Long, Long, Long, Long)] =
        if (curRows == 0)
          Seq((0L, startBlockSize, rootAddr,
            if (ioFilterLen > 0) filteredRootSize else startBlockSize))
        else walkIndirect(rootAddr, curRows, 0L)

      // decompressed-block cache: one inflate per block per heap walk
      private val blockCache =
        scala.collection.mutable.HashMap.empty[Long, Array[Byte]]
      private def blockBytes(b: (Long, Long, Long, Long)): Array[Byte] =
        blockCache.getOrElseUpdate(b._3, {
          val raw = src.get(b._3, b._4.toInt)
          val out =
            if (ioFilterLen > 0) applyFilters(raw, heapFilters, 1) else raw
          require(out.length >= 4 &&
            new String(out, 0, 4, "US-ASCII") == "FHDB",
            s"group $owner: bad fractal heap direct block signature")
          out
        })

      private def leN(b: Array[Byte], at: Int, n: Int): Long = {
        var v = 0L
        var i = 0
        while (i < n) { v |= (b(at + i) & 0xffL) << (8 * i); i += 1 }
        v
      }

      /** Huge-object directory: the heap's v2 b-tree of type-1 records
        * (huge objects indirectly accessed, unfiltered) — id → (file
        * address, length). Loaded lazily, only when a huge ID appears. */
      private lazy val hugeObjects: Map[Long, (Long, Long)] =
        readV2BtreeRecords(owner, hugeBtAddr, expectType = 1).map { rec =>
          val addr = readOffset(rec, 0)
          val len = readLength(rec, sizeOfOffsets)
          val idNum = readLength(rec, sizeOfOffsets + sizeOfLengths)
          idNum -> ((addr, len))
        }.toMap

      /** Resolve a heap ID at `at` inside `id` to the object's bytes:
        * managed (offset+length into the blocks), tiny (data in the ID
        * itself), or huge (standalone via the type-1 b-tree). */
      def get(id: Array[Byte], at: Int): Array[Byte] = {
        val flags = id(at) & 0xff
        require((flags & 0xc0) == 0,
          s"group $owner: unsupported heap ID version ${flags >> 6}")
        ((flags >> 4) & 3) match {
          case 0 => // managed
            val heapOff = leN(id, at + 1, offsetSize)
            val objLen = leN(id, at + 1 + offsetSize, lengthSize).toInt
            val blk = blocks
              .find(b => heapOff >= b._1 && heapOff + objLen <= b._1 + b._2)
              .getOrElse(sys.error(
                s"group $owner: heap offset $heapOff outside allocated blocks"))
            val bytes = blockBytes(blk)
            java.util.Arrays.copyOfRange(bytes,
              (heapOff - blk._1).toInt, (heapOff - blk._1).toInt + objLen)
          case 2 => // tiny: data lives in the ID; two length encodings
            if (heapIdLen > 18) {
              // extended: 12-bit length, high nibble in the flag byte
              val len = (((flags & 0x0f) << 8) | (id(at + 1) & 0xff)) + 1
              java.util.Arrays.copyOfRange(id, at + 2, at + 2 + len)
            } else {
              val len = (flags & 0x0f) + 1
              java.util.Arrays.copyOfRange(id, at + 1, at + 1 + len)
            }
          case 1 => // huge: standalone object via the type-1 b-tree
            require(hugeBtAddr != Undef,
              s"group $owner: huge heap ID but no huge-object b-tree")
            val idNum = leN(id, at + 1, math.min(8, heapIdLen - 1))
            val (addr, len) = hugeObjects.getOrElse(idNum, sys.error(
              s"group $owner: huge object $idNum not in the b-tree"))
            src.get(addr, len.toInt)
          case t => sys.error(s"group $owner: reserved heap ID type $t")
        }
      }
    }

    /** Generic version-2 b-tree record walk (BTHD → BTIN/BTLF, spec
      * III.A.2 capacity arithmetic — the same walk the chunk indexes
      * use, record-agnostic): returns every record's raw bytes in tree
      * order. */
    private def readV2BtreeRecords(name: String, hdrAddr: Long,
                                   expectType: Int): Seq[Array[Byte]] = {
      val head = src.get(hdrAddr,
        12 + 2 + 2 + sizeOfOffsets + 2 + sizeOfLengths + 4)
      require(new String(head, 0, 4, "US-ASCII") == "BTHD",
        s"group $name: bad v2 b-tree header signature")
      require(u8(head, 4) == 0,
        s"group $name: unsupported v2 b-tree version ${u8(head, 4)}")
      require(u8(head, 5) == expectType,
        s"group $name: v2 b-tree record type ${u8(head, 5)}, expected $expectType")
      val nodeSize = u32(head, 6).toInt
      val recordSize = u16(head, 10)
      val depth = u16(head, 12)
      val rootAddr = readOffset(head, 16)
      val rootNrec = u16(head, 16 + sizeOfOffsets)
      if (rootAddr == Undef) return Nil

      def encSize(v: Long): Int = (63 - java.lang.Long.numberOfLeadingZeros(
        math.max(v, 1L))).toInt / 8 + 1
      val maxLeafRec = (nodeSize - 10) / recordSize
      require(maxLeafRec > 0,
        s"group $name: v2 b-tree node size $nodeSize too small")
      val maxNrecSize = encSize(maxLeafRec.toLong)
      val cumMaxNrec = new Array[Long](depth + 1)
      val cumMaxNrecSize = new Array[Int](depth + 1)
      cumMaxNrec(0) = maxLeafRec.toLong
      cumMaxNrecSize(0) = encSize(cumMaxNrec(0))
      var d = 1
      while (d <= depth) {
        val ptrSize = sizeOfOffsets + maxNrecSize + cumMaxNrecSize(d - 1)
        val maxIntRec = (nodeSize - (10 + ptrSize)) / (recordSize + ptrSize)
        cumMaxNrec(d) = (maxIntRec.toLong + 1) * cumMaxNrec(d - 1) +
          maxIntRec.toLong
        cumMaxNrecSize(d) = encSize(cumMaxNrec(d))
        d += 1
      }

      val out = mutable.ArrayBuffer.empty[Array[Byte]]
      def walk(addr: Long, nrec: Int, nodeDepth: Int): Unit = {
        if (addr == Undef) return
        if (nodeDepth == 0) {
          val node = src.get(addr, 6 + nrec * recordSize + 4)
          require(new String(node, 0, 4, "US-ASCII") == "BTLF",
            s"group $name: bad v2 b-tree leaf signature")
          var r = 0
          while (r < nrec) {
            out += java.util.Arrays.copyOfRange(node,
              6 + r * recordSize, 6 + (r + 1) * recordSize)
            r += 1
          }
        } else {
          val childPtrSize = sizeOfOffsets + maxNrecSize +
            (if (nodeDepth > 1) cumMaxNrecSize(nodeDepth - 1) else 0)
          val node = src.get(addr,
            6 + nrec * recordSize + (nrec + 1) * childPtrSize + 4)
          require(new String(node, 0, 4, "US-ASCII") == "BTIN",
            s"group $name: bad v2 b-tree internal signature")
          val ptrBase = 6 + nrec * recordSize
          var c = 0
          while (c <= nrec) {
            val pp = ptrBase + c * childPtrSize
            val childAddr = readOffset(node, pp)
            var childNrec = 0L
            var b = 0
            while (b < maxNrecSize) {
              childNrec |= (node(pp + sizeOfOffsets + b) & 0xffL) << (8 * b)
              b += 1
            }
            walk(childAddr, childNrec.toInt, nodeDepth - 1)
            if (c < nrec)
              out += java.util.Arrays.copyOfRange(node,
                6 + c * recordSize, 6 + (c + 1) * recordSize)
            c += 1
          }
        }
      }
      walk(rootAddr, rootNrec, depth)
      out.toSeq
    }

    // ---- classic groups: B-tree v1 + local heap + SNOD -------------------

    private def heapString(heapDataAddr: Long, offset: Long): String = {
      // names are NUL-terminated; read a bounded window and scan
      val win = math.min(512L, src.size - (heapDataAddr + offset)).toInt
      val b = src.get(heapDataAddr + offset, win)
      var i = 0
      while (i < b.length && b(i) != 0) i += 1
      new String(b, 0, i, "UTF-8")
    }

    private def readSymbolTable(btreeAddr: Long, heapAddr: Long): Seq[(String, Long)] = {
      // local heap header: "HEAP" v0, data segment size, free-list head,
      // data segment address
      val hh = src.get(heapAddr, 8 + 2 * sizeOfLengths + sizeOfOffsets)
      require(new String(hh, 0, 4, "US-ASCII") == "HEAP",
        s"local heap at $heapAddr: bad signature")
      val heapData = readOffset(hh, 8 + 2 * sizeOfLengths)

      val out = mutable.ArrayBuffer.empty[(String, Long)]

      def walkBtree(addr: Long): Unit = {
        val head = src.get(addr, 24)
        require(new String(head, 0, 4, "US-ASCII") == "TREE",
          s"B-tree node at $addr: bad signature")
        require(u8(head, 4) == 0, "B-tree node type must be 0 (group)")
        val level = u8(head, 5)
        val entries = u16(head, 6)
        // keys/children: key(len) child(off) ... key — entries children
        val body = src.get(addr + 8 + 2 * sizeOfOffsets,
          (entries + 1) * sizeOfLengths + entries * sizeOfOffsets)
        var p = sizeOfLengths // skip key 0
        var i = 0
        while (i < entries) {
          val child = readOffset(body, p)
          if (level == 0) walkSnod(child) else walkBtree(child)
          p += sizeOfOffsets + sizeOfLengths
          i += 1
        }
      }

      def walkSnod(addr: Long): Unit = {
        val head = src.get(addr, 8)
        require(new String(head, 0, 4, "US-ASCII") == "SNOD",
          s"symbol node at $addr: bad signature")
        val nSyms = u16(head, 6)
        val entrySize = 2 * sizeOfOffsets + 8 + 16
        val body = src.get(addr + 8, nSyms * entrySize)
        var i = 0
        while (i < nSyms) {
          val base = i * entrySize
          val nameOff = readOffset(body, base)
          val header = readOffset(body, base + sizeOfOffsets)
          out += ((heapString(heapData, nameOff), header))
          i += 1
        }
      }

      walkBtree(btreeAddr)
      out.toSeq
    }

    // ---- messages --------------------------------------------------------

    private def parseDataspace(d: Array[Byte]): Dataspace = {
      val version = u8(d, 0)
      val rank = u8(d, 1)
      val flags = u8(d, 2)
      version match {
        case 1 =>
          val dims = Array.tabulate(rank)(i => readLength(d, 8 + i * sizeOfLengths))
          Dataspace(dims)
        case 2 =>
          val spaceType = u8(d, 3)
          if (spaceType == 2) Dataspace(Array(0L)) // null dataspace
          else Dataspace(Array.tabulate(rank)(i => readLength(d, 4 + i * sizeOfLengths)))
        case v => sys.error(s"unsupported dataspace version $v")
      }
    }

    /** Parse a datatype at offset `p`; returns (datatype, bytes consumed). */
    private def parseDatatype(d: Array[Byte], p: Int): (Datatype, Int) = {
      val classAndVersion = u8(d, p)
      val cls = classAndVersion & 0x0f
      val bits0 = u8(d, p + 1)
      val bits8 = u8(d, p + 2)
      val size = u32(d, p + 4).toInt
      cls match {
        case 0 => // fixed-point
          val bigEndian = (bits0 & 0x1) != 0
          val signed = (bits0 & 0x8) != 0
          (FixedPoint(size, signed, bigEndian), 8 + 4)
        case 1 => // float
          val bigEndian = (bits0 & 0x1) != 0
          require(size == 4 || size == 8, s"unsupported float width $size")
          (Ieee754(size, bigEndian), 8 + 12)
        case 3 => // string
          (FixedString(size, bits0 & 0x0f), 8)
        case 9 => // variable-length
          val vlenType = bits0 & 0x0f
          require(vlenType == 1,
            "only variable-length STRINGS supported (vlen sequences are out of subset)")
          val (_, baseLen) = parseDatatype(d, p + 8)
          (VlenString(size), 8 + baseLen)
        case 6 => // compound (struct arrays — wild DASlogs time/value tables)
          val version = (classAndVersion >> 4) & 0x0f
          val nMembers = bits0 | (bits8 << 8)
          var mp = p + 8
          val members = (0 until nMembers).map { _ =>
            // member name: null-terminated; v1/v2 pad it to 8 bytes,
            // v3 stores it unpadded (spec §IV, compound properties)
            var end = mp
            while (d(end) != 0) end += 1
            val name = new String(d, mp, end - mp, "UTF-8")
            val nameBytes = end - mp + 1
            mp += (if (version >= 3) nameBytes
                   else { val r = nameBytes % 8
                          if (r == 0) nameBytes else nameBytes + (8 - r) })
            // byte offset: v1/v2 fixed 4 bytes; v3 the minimum number
            // of bytes needed to hold the compound's size
            val offset = version match {
              case 3 =>
                val ob = if (size < 256) 1 else if (size < 65536) 2
                         else if (size < (1 << 24)) 3 else 4
                var v = 0L; var b = 0
                while (b < ob) { v |= (d(mp + b) & 0xffL) << (8 * b); b += 1 }
                mp += ob
                v.toInt
              case 1 | 2 =>
                val off = u32(d, mp).toInt
                mp += 4
                if (version == 1) {
                  // v1 carries dimensionality(1)+reserved(3)+perm(4)+
                  // reserved(4)+4 dim sizes(16); array members are out
                  // of this subset
                  require(u8(d, mp) == 0,
                    "compound ARRAY members are out of subset")
                  mp += 28
                }
                off
              case v2 => sys.error(s"unsupported compound datatype version $v2")
            }
            val (mt, consumed) = parseDatatype(d, mp)
            mp += consumed
            (name, offset, mt)
          }
          (CompoundType(size, members), mp - p)
        case c =>
          sys.error(s"unsupported HDF5 datatype class $c " +
            "(supported: fixed-point, float, string, vlen string, compound)")
      }
    }

    private def parseLayout(d: Array[Byte]): Layout = {
      val version = u8(d, 0)
      require(version == 3 || version == 4,
        s"unsupported data layout version $version (v3/v4 supported)")
      if (version == 3) u8(d, 1) match {
        case 0 =>
          val n = u16(d, 2)
          Compact(java.util.Arrays.copyOfRange(d, 4, 4 + n))
        case 1 =>
          Contiguous(readOffset(d, 2), readLength(d, 2 + sizeOfOffsets))
        case 2 =>
          val rankPlus1 = u8(d, 2)
          val btree = readOffset(d, 3)
          val chunkDims = Array.tabulate(rankPlus1 - 1)(i =>
            u32(d, 3 + sizeOfOffsets + i * 4).toInt)
          Chunked(btree, chunkDims)
        case c => sys.error(s"unsupported layout class $c")
      } else u8(d, 1) match { // version 4 (the 1.10+ writer generation)
        case 0 =>
          val n = u16(d, 2)
          Compact(java.util.Arrays.copyOfRange(d, 4, 4 + n))
        case 1 =>
          Contiguous(readOffset(d, 2), readLength(d, 2 + sizeOfOffsets))
        case 2 =>
          var p = 2
          val flags = u8(d, p); p += 1
          val nDims = u8(d, p); p += 1
          val encLen = u8(d, p); p += 1
          require(encLen >= 1 && encLen <= 8,
            s"bad v4 chunk dimension encoding length $encLen")
          val chunkDims = Array.tabulate(nDims) { i =>
            var v = 0L; var b = 0
            while (b < encLen) {
              v |= (d(p + i * encLen + b) & 0xffL) << (8 * b); b += 1
            }
            v.toInt
          }
          p += nDims * encLen
          val indexType = u8(d, p); p += 1
          var singleSize = -1L
          var idxParams = Array.empty[Int]
          indexType match {
            case 1 => // single chunk; filtered variant carries size+mask
              if ((flags & 0x2) != 0) {
                singleSize = readLength(d, p); p += sizeOfLengths
                p += 4 // filter mask (mask-out bits unsupported → whole pipeline)
              }
            case 2 => // implicit: no index info (unfiltered by contract)
            case 3 => p += 1 // fixed array: page bits live in the FAHD too
            case 4 => // extensible array: creation parameters ride the message
              idxParams = Array(u8(d, p), u8(d, p + 1), u8(d, p + 2),
                u8(d, p + 3), u8(d, p + 4))
              p += 5
            case 5 => // v2 b-tree: node size + split/merge percents
              idxParams = Array(u32(d, p).toInt, u8(d, p + 4), u8(d, p + 5))
              p += 6
            case t => sys.error(s"unknown v4 chunk index type $t")
          }
          ChunkedV4(indexType, readOffset(d, p), chunkDims,
            filtered = (flags & 0x2) != 0, singleChunkSize = singleSize,
            idxParams = idxParams)
        case c => sys.error(s"unsupported v4 layout class $c")
      }
    }

    private def parseFilters(m: HeaderMessage): List[Filter] = {
      val d = m.data
      val version = u8(d, 0)
      val nFilters = u8(d, 1)
      var p = version match {
        case 1 => 8
        case 2 => 2
        case v => sys.error(s"unsupported filter pipeline version $v")
      }
      (0 until nFilters).map { _ =>
        val id = u16(d, p)
        // v2 with id < 256 omits the Name Length field ENTIRELY, so
        // Flags / Number of Client Values sit at +2 / +4 and the
        // fixed head is 6 bytes; every other shape carries the
        // 2-byte Name Length at +2 (8-byte head + name bytes).
        val (nameLen, flags, nValues, head) =
          if (version == 2 && id < 256)
            (0, u16(d, p + 2), u16(d, p + 4), 6)
          else
            (u16(d, p + 2), u16(d, p + 4), u16(d, p + 6), 8)
        p += head + (if (version == 1) pad8(nameLen) else nameLen)
        val values = Array.tabulate(nValues)(i => u32(d, p + i * 4).toInt)
        p += nValues * 4
        if (version == 1 && nValues % 2 == 1) p += 4 // pad to 8
        val _ = flags
        Filter(id, values)
      }.toList
    }

    private def pad8(n: Int): Int = if (n % 8 == 0) n else n + (8 - n % 8)

    private def parseAttribute(m: HeaderMessage): (String, H5Value) = {
      val d = m.data
      val version = u8(d, 0)
      val nameSize = u16(d, 2)
      val dtSize = u16(d, 4)
      val dsSize = u16(d, 6)
      version match {
        case 1 =>
          var p = 8
          val nm = cString(d, p, nameSize)
          p += pad8(nameSize)
          val (dtype, _) = parseDatatype(d, p)
          p += pad8(dtSize)
          val space = parseDataspace(java.util.Arrays.copyOfRange(d, p, p + dsSize))
          p += pad8(dsSize)
          val n = space.dims.foldLeft(1L)(_ * _).toInt
          (nm, decodeElements(java.util.Arrays.copyOfRange(d, p, d.length), n, dtype))
        case 2 | 3 =>
          var p = if (version == 3) 9 else 8 // v3 adds a charset byte
          val nm = cString(d, p, nameSize)
          p += nameSize
          val (dtype, _) = parseDatatype(d, p)
          p += dtSize
          val space = parseDataspace(java.util.Arrays.copyOfRange(d, p, p + dsSize))
          p += dsSize
          val n = space.dims.foldLeft(1L)(_ * _).toInt
          (nm, decodeElements(java.util.Arrays.copyOfRange(d, p, d.length), n, dtype))
        case v => sys.error(s"unsupported attribute message version $v")
      }
    }

    private def cString(d: Array[Byte], p: Int, max: Int): String = {
      var i = 0
      while (i < max && d(p + i) != 0) i += 1
      new String(d, p, i, "UTF-8")
    }

    // ---- raw data --------------------------------------------------------

    private def applyFilters(raw: Array[Byte], filters: List[Filter],
                             elementSize: Int): Array[Byte] = {
      // stored order is application order; decoding runs in reverse
      filters.reverse.foldLeft(raw) { (bytes, f) =>
        f.id match {
          case 1 => inflate(bytes)
          case 2 => unshuffle(bytes, elementSize)
          case id => sys.error(s"unsupported HDF5 filter id $id " +
            "(supported: deflate, shuffle)")
        }
      }
    }

    private def inflate(data: Array[Byte]): Array[Byte] = {
      val inf = new Inflater()
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(data.length * 4)
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsInput()) sys.error("truncated deflate stream")
        out.write(buf, 0, n)
      }
      inf.end()
      out.toByteArray
    }

    private def unshuffle(data: Array[Byte], elementSize: Int): Array[Byte] = {
      if (elementSize <= 1) return data
      val n = data.length / elementSize
      val out = new Array[Byte](data.length)
      var b = 0
      while (b < elementSize) {
        var i = 0
        while (i < n) {
          out(i * elementSize + b) = data(b * n + i)
          i += 1
        }
        b += 1
      }
      // trailing bytes (non-multiple remainder) copy through unchanged
      var t = n * elementSize
      while (t < data.length) { out(t) = data(t); t += 1 }
      out
    }

    private def readData(name: String, dims: Array[Long], dtype: Datatype,
                         layout: Layout, filters: List[Filter]): H5Value = {
      val n = dims.foldLeft(1L)(_ * _)
      require(n <= Int.MaxValue, s"dataset $name: $n elements exceed array limit")
      val elems = n.toInt
      val raw: Array[Byte] = layout match {
        case Compact(data) => data
        case Contiguous(addr, byteSize) =>
          if (addr == Undef || elems == 0) new Array[Byte](elems * dtype.size)
          else applyFilters(src.get(addr, byteSize.toInt), filters, dtype.size)
        case Chunked(btreeAddr, chunkDims) =>
          readChunked(dims, chunkDims, dtype.size, btreeAddr, filters)
        case c: ChunkedV4 =>
          readChunkedV4(name, dims, c, dtype.size, filters)
      }
      decodeElements(raw, elems, dtype)
    }

    /** Row-major element-buffer assembly shared by every chunk index:
      * `place` copies one chunk's in-bounds region (any rank, partial
      * edge chunks clipped). */
    private final class ChunkAssembler(dims: Array[Long],
                                       val chunkDims: Array[Int],
                                       elemSize: Int) {
      private val rank = dims.length
      require(chunkDims.length == rank,
        s"chunk rank ${chunkDims.length} != dataspace rank $rank")
      val out = new Array[Byte](dims.foldLeft(1L)(_ * _).toInt * elemSize)
      private val strides = {
        val st = new Array[Long](rank)
        var s = 1L
        var i = rank - 1
        while (i >= 0) { st(i) = s; s *= dims(i); i -= 1 }
        st
      }

      def place(offset: Array[Long], chunkBytes: Array[Byte]): Unit = {
        // copy the chunk's in-bounds region into the output buffer; the
        // chunk itself is row-major over chunkDims
        val copyLens = Array.tabulate(rank)(d =>
          math.min(chunkDims(d).toLong, dims(d) - offset(d)).toInt)
        if (copyLens.exists(_ <= 0)) return
        // iterate over all but the innermost dimension
        val innerLen = copyLens(rank - 1)
        val outerDims = copyLens.take(rank - 1)
        val counters = new Array[Int](math.max(rank - 1, 0))
        var done = false
        while (!done) {
          // compute source and destination offsets for this inner row
          var srcOff = 0L
          var dstOff = 0L
          var d = 0
          while (d < rank - 1) {
            var chunkStride = 1L
            var k = rank - 1
            while (k > d) { chunkStride *= chunkDims(k); k -= 1 }
            srcOff += counters(d) * chunkStride
            dstOff += (offset(d) + counters(d)) * strides(d)
            d += 1
          }
          dstOff += offset(rank - 1) * strides(rank - 1)
          System.arraycopy(chunkBytes, (srcOff * elemSize).toInt,
            out, (dstOff * elemSize).toInt, innerLen * elemSize)
          // increment counters (odometer)
          if (rank == 1) done = true
          else {
            var d2 = rank - 2
            var carry = true
            while (carry && d2 >= 0) {
              counters(d2) += 1
              if (counters(d2) < outerDims(d2)) carry = false
              else { counters(d2) = 0; d2 -= 1 }
            }
            if (carry) done = true
          }
        }
      }

      /** Row-major chunk-grid offsets (the storage order of the
        * implicit index and the fixed-array element list). */
      def gridOffsets: Iterator[Array[Long]] = {
        val nPer = Array.tabulate(rank)(d =>
          ((dims(d) + chunkDims(d) - 1) / chunkDims(d)).toInt)
        val total = nPer.product
        (0 until total).iterator.map { idx =>
          val off = new Array[Long](rank)
          var rem = idx
          var d = rank - 1
          while (d >= 0) {
            off(d) = (rem % nPer(d)).toLong * chunkDims(d)
            rem /= nPer(d)
            d -= 1
          }
          off
        }
      }
    }

    /** Walk the v1 chunk B-tree and assemble the row-major element buffer.
      * Handles any rank and partial edge chunks. */
    private def readChunked(dims: Array[Long], chunkDims: Array[Int],
                            elemSize: Int, btreeAddr: Long,
                            filters: List[Filter]): Array[Byte] = {
      val rank = dims.length
      val asm = new ChunkAssembler(dims, chunkDims, elemSize)

      def walk(addr: Long): Unit = {
        if (addr == Undef) return
        val head = src.get(addr, 8)
        require(new String(head, 0, 4, "US-ASCII") == "TREE",
          s"chunk B-tree node at $addr: bad signature")
        require(u8(head, 4) == 1, "B-tree node type must be 1 (raw data chunks)")
        val level = u8(head, 5)
        val entries = u16(head, 6)
        // key: chunk byte size (4), filter mask (4), rank+1 offsets (8 each)
        val keySize = 8 + (rank + 1) * 8
        val body = src.get(addr + 8 + 2 * sizeOfOffsets,
          (entries + 1) * keySize + entries * sizeOfOffsets)
        var p = 0
        var e = 0
        while (e < entries) {
          val chunkByteSize = u32(body, p).toInt
          val offsets = Array.tabulate(rank)(d => u64(body, p + 8 + d * 8))
          val childAddr = readOffset(body, p + keySize)
          if (level == 0) {
            val raw = src.get(childAddr, chunkByteSize)
            asm.place(offsets, applyFilters(raw, filters, elemSize))
          } else {
            walk(childAddr)
          }
          p += keySize + sizeOfOffsets
          e += 1
        }
      }

      walk(btreeAddr)
      asm.out
    }

    /** Layout v4 chunk indexes (HDF5 1.10+ writers): Single Chunk,
      * Implicit, and Fixed Array (FAHD/FADB, paged or not) — the index
      * shapes a current h5py/libhdf5 writes for fixed-shape chunked
      * datasets. Chunk placement reuses [[ChunkAssembler]]. */
    private def readChunkedV4(name: String, dims: Array[Long], c: ChunkedV4,
                              elemSize: Int,
                              filters: List[Filter]): Array[Byte] = {
      val rank = dims.length
      // tolerate both dimension encodings: rank, or rank+1 with the
      // trailing element-size dimension (the v3 heritage)
      val chunkDims =
        if (c.chunkDims.length == rank + 1) c.chunkDims.dropRight(1)
        else c.chunkDims
      val asm = new ChunkAssembler(dims, chunkDims, elemSize)
      val chunkBytes = chunkDims.foldLeft(1L)(_ * _) * elemSize
      if (c.addr == Undef) return asm.out // never-written dataset → zeros

      c.indexType match {
        case 1 => // single chunk: the address IS the chunk
          val stored =
            if (c.filtered) c.singleChunkSize
            else chunkBytes
          val raw = src.get(c.addr, stored.toInt)
          asm.place(new Array[Long](rank),
            if (c.filtered) applyFilters(raw, filters, elemSize) else raw)
        case 2 => // implicit: full chunks back-to-back in grid order
          require(filters.isEmpty,
            "implicit chunk index cannot carry filters (spec contract)")
          var i = 0L
          asm.gridOffsets.foreach { off =>
            asm.place(off, src.get(c.addr + i * chunkBytes, chunkBytes.toInt))
            i += 1
          }
        case 3 => // fixed array: FAHD header → FADB data block → elements
          val head = src.get(c.addr, 12 + sizeOfLengths + sizeOfOffsets)
          require(new String(head, 0, 4, "US-ASCII") == "FAHD",
            s"dataset $name: bad fixed-array header signature")
          // filtered-ness is the CLIENT ID (the layout's 0x2 flag is the
          // single-chunk signal only — libhdf5 leaves it 0 here)
          val clientId = u8(head, 5)
          require(clientId <= 1,
            s"dataset $name: unsupported fixed-array client $clientId")
          val faFiltered = clientId == 1
          val entrySize = u8(head, 6)
          val pageBits = u8(head, 7)
          val nElmts = readLength(head, 8).toInt
          val dbAddr = readOffset(head, 8 + sizeOfLengths)
          val pageSize = 1 << pageBits
          val nPages = (nElmts + pageSize - 1) / pageSize
          val dbHead = 6 + sizeOfOffsets
          val elems: Array[Byte] =
            if (nPages <= 1) {
              val db = src.get(dbAddr, dbHead + nElmts * entrySize + 4)
              require(new String(db, 0, 4, "US-ASCII") == "FADB",
                s"dataset $name: bad fixed-array data block signature")
              java.util.Arrays.copyOfRange(db, dbHead,
                dbHead + nElmts * entrySize)
            } else {
              // paged: page bitmap (then block checksum), then pages of
              // 2^pageBits elements, each followed by its own checksum
              val bitmapLen = (nPages + 7) / 8
              val lastPage = nElmts - (nPages - 1) * pageSize
              val totalLen = dbHead + bitmapLen + 4 +
                (nPages - 1) * (pageSize * entrySize + 4) +
                lastPage * entrySize + 4
              val db = src.get(dbAddr, totalLen)
              require(new String(db, 0, 4, "US-ASCII") == "FADB",
                s"dataset $name: bad fixed-array data block signature")
              // uninitialized pages (bitmap bit CLEAR — chunks never
              // written) must read as Undef addresses, not whatever
              // bytes occupy the unwritten region
              val out = Array.fill[Byte](nElmts * entrySize)(0xff.toByte)
              var p = dbHead + bitmapLen + 4
              var pg = 0
              while (pg < nPages) {
                val inPage = if (pg == nPages - 1) lastPage else pageSize
                val initialized =
                  (db(dbHead + (pg >> 3)) & (1 << (pg & 7))) != 0
                if (initialized)
                  System.arraycopy(db, p, out, pg * pageSize * entrySize,
                    inPage * entrySize)
                p += inPage * entrySize + 4 // + page checksum
                pg += 1
              }
              out
            }
          var i = 0
          asm.gridOffsets.foreach { off =>
            require(i < nElmts,
              s"dataset $name: chunk grid exceeds fixed-array entries")
            val base = i * entrySize
            val addr = readOffset(elems, base)
            if (addr != Undef) {
              if (faFiltered) {
                val szBytes = entrySize - sizeOfOffsets - 4
                var sz = 0L
                var b = 0
                while (b < szBytes) {
                  sz |= (elems(base + sizeOfOffsets + b) & 0xffL) << (8 * b)
                  b += 1
                }
                asm.place(off,
                  applyFilters(src.get(addr, sz.toInt), filters, elemSize))
              } else {
                asm.place(off, src.get(addr, chunkBytes.toInt))
              }
            }
            i += 1
          }
        case 4 => // extensible array: EAHD → EAIB (+EASB) → EADB chains
          readExtensibleArray(name, c.addr, asm, chunkBytes, elemSize, filters)
        case 5 => // version-2 b-tree: BTHD → BTIN/BTLF record walk
          readV2BtreeChunks(name, c.addr, asm, chunkDims, chunkBytes,
            elemSize, filters)
        case t => sys.error(s"unsupported v4 chunk index type $t")
      }
      asm.out
    }

    /** Extensible-array chunk index (HDF5 1.10+, the index libhdf5 picks
      * for datasets with exactly ONE unlimited dimension — the appendable
      * event-stream shape h5py `maxshape=(None,)` produces). Walks
      * EAHD header → EAIB index block (inline elements + direct
      * data-block pointers + secondary-block pointers) → EASB secondary
      * blocks → EADB data blocks, decoding elements in index order.
      * Super-block geometry per the public spec / H5EA: super block `s`
      * holds `2^(s/2)` data blocks of `minElmts·2^((s+1)/2)` elements;
      * the index block directly addresses the first `2·(minPtrs−1)` data
      * blocks (super blocks `0 … 2·log2(minPtrs)−1`). Element order is
      * the row-major chunk grid — exact when the unlimited dimension is
      * dimension 0 (libhdf5 swizzles the unlimited dim to slot 0, an
      * identity move for that shape; rank-1 event streams trivially
      * qualify). Paged data blocks (> `2^pageBits` elements, reached only
      * past tens of thousands of chunks under library defaults) are out
      * of subset and refuse by name. */
    private def readExtensibleArray(name: String, hdrAddr: Long,
                                    asm: ChunkAssembler, chunkBytes: Long,
                                    elemSize: Int,
                                    filters: List[Filter]): Unit = {
      def log2(v: Int): Int = {
        require(v > 0 && (v & (v - 1)) == 0,
          s"dataset $name: extensible-array parameter $v is not a power of 2")
        java.lang.Integer.numberOfTrailingZeros(v)
      }
      val head = src.get(hdrAddr, 12 + 6 * sizeOfLengths + sizeOfOffsets + 4)
      require(new String(head, 0, 4, "US-ASCII") == "EAHD",
        s"dataset $name: bad extensible-array header signature")
      require(u8(head, 4) == 0,
        s"dataset $name: unsupported extensible-array version ${u8(head, 4)}")
      val clientId = u8(head, 5)
      require(clientId <= 1,
        s"dataset $name: unsupported extensible-array client $clientId")
      val eaFiltered = clientId == 1
      val eaElemSize = u8(head, 6)
      val maxNelmtsBits = u8(head, 7)
      val idxBlkElmts = u8(head, 8)
      val minElmts = u8(head, 9)
      val minPtrs = u8(head, 10)
      val pageBits = u8(head, 11)
      val iblkAddr = readOffset(head, 12 + 6 * sizeOfLengths)
      if (iblkAddr == Undef) return // never-written dataset → zeros
      val blockOffBytes = (maxNelmtsBits + 7) / 8

      // super-block geometry (shared by reader and writer)
      def nDblks(s: Int): Int = 1 << (s / 2)
      def dblkNelmts(s: Int): Int = minElmts << ((s + 1) / 2)
      val iblkSblks = 2 * log2(minPtrs) // super blocks addressed directly
      val nsblksTotal = 1 + (maxNelmtsBits - log2(minElmts))
      val nDblkAddrs = 2 * (minPtrs - 1)
      val nSblkAddrs = math.max(0, nsblksTotal - iblkSblks)

      val iblkLen = 6 + sizeOfOffsets + idxBlkElmts * eaElemSize +
        (nDblkAddrs + nSblkAddrs) * sizeOfOffsets + 4
      val iblk = src.get(iblkAddr, iblkLen)
      require(new String(iblk, 0, 4, "US-ASCII") == "EAIB",
        s"dataset $name: bad extensible-array index block signature")
      val elemsBase = 6 + sizeOfOffsets
      val dblkAddrBase = elemsBase + idxBlkElmts * eaElemSize
      val sblkAddrBase = dblkAddrBase + nDblkAddrs * sizeOfOffsets

      // cache of loaded blocks: secondary-block dblk-address arrays and
      // data-block element payloads (both KB-scale)
      val sblkCache = scala.collection.mutable.Map.empty[Int, Array[Long]]
      val dblkCache = scala.collection.mutable.Map.empty[Long, Array[Byte]]

      def dataBlockElems(addr: Long, nelmts: Int): Array[Byte] =
        dblkCache.getOrElseUpdate(addr, {
          val dbHead = 6 + sizeOfOffsets + blockOffBytes
          val pageSize = 1 << pageBits
          if (nelmts <= pageSize) {
            val db = src.get(addr, dbHead + nelmts * eaElemSize + 4)
            require(new String(db, 0, 4, "US-ASCII") == "EADB",
              s"dataset $name: bad extensible-array data block signature")
            java.util.Arrays.copyOfRange(db, dbHead, dbHead + nelmts * eaElemSize)
          } else {
            // PAGED data block (nelmts > 2^pageBits): header, page-init
            // bitmap, block checksum, then pages of 2^pageBits elements
            // each followed by its own checksum — the large-data-block
            // shape libhdf5 switches to past the page bound (same
            // discipline as the paged fixed-array blocks above)
            val nPages = (nelmts + pageSize - 1) / pageSize
            val bitmapLen = (nPages + 7) / 8
            val lastPage = nelmts - (nPages - 1) * pageSize
            val totalLen = dbHead + bitmapLen + 4 +
              (nPages - 1) * (pageSize * eaElemSize + 4) +
              lastPage * eaElemSize + 4
            val db = src.get(addr, totalLen)
            require(new String(db, 0, 4, "US-ASCII") == "EADB",
              s"dataset $name: bad extensible-array data block signature")
            // uninitialized pages (bitmap bit clear — chunks never
            // written) must read as Undef addresses
            val out = Array.fill[Byte](nelmts * eaElemSize)(0xff.toByte)
            var p = dbHead + bitmapLen + 4
            var pg = 0
            while (pg < nPages) {
              val inPage = if (pg == nPages - 1) lastPage else pageSize
              val initialized =
                (db(dbHead + (pg >> 3)) & (1 << (pg & 7))) != 0
              if (initialized)
                System.arraycopy(db, p, out, pg * pageSize * eaElemSize,
                  inPage * eaElemSize)
              p += inPage * eaElemSize + 4 // + page checksum
              pg += 1
            }
            out
          }
        })

      def sblkDblkAddrs(s: Int): Array[Long] =
        sblkCache.getOrElseUpdate(s, {
          val sAddr = readOffset(iblk,
            sblkAddrBase + (s - iblkSblks) * sizeOfOffsets)
          if (sAddr == Undef) Array.fill(nDblks(s))(Undef)
          else {
            val sbHead = 6 + sizeOfOffsets + blockOffBytes
            val sb = src.get(sAddr, sbHead + nDblks(s) * sizeOfOffsets + 4)
            require(new String(sb, 0, 4, "US-ASCII") == "EASB",
              s"dataset $name: bad extensible-array secondary block signature")
            Array.tabulate(nDblks(s))(i =>
              readOffset(sb, sbHead + i * sizeOfOffsets))
          }
        })

      // prefix sums over super blocks: first element index / first dblk
      val startIdx = new Array[Long](nsblksTotal + 1)
      val startDblk = new Array[Int](nsblksTotal + 1)
      var s = 0
      while (s < nsblksTotal) {
        startIdx(s + 1) = startIdx(s) + nDblks(s).toLong * dblkNelmts(s)
        startDblk(s + 1) = startDblk(s) + nDblks(s)
        s += 1
      }

      // element i (in index order = row-major chunk grid) → raw bytes,
      // or null when its storage was never allocated (chunk unwritten)
      def element(i: Long): Array[Byte] = {
        if (i < idxBlkElmts)
          return java.util.Arrays.copyOfRange(iblk,
            elemsBase + i.toInt * eaElemSize,
            elemsBase + (i.toInt + 1) * eaElemSize)
        val u = i - idxBlkElmts
        var sb = 0
        while (sb + 1 < nsblksTotal && startIdx(sb + 1) <= u) sb += 1
        val blockIdx = ((u - startIdx(sb)) / dblkNelmts(sb)).toInt
        val within = ((u - startIdx(sb)) % dblkNelmts(sb)).toInt
        val dAddr =
          if (sb < iblkSblks)
            readOffset(iblk,
              dblkAddrBase + (startDblk(sb) + blockIdx) * sizeOfOffsets)
          else sblkDblkAddrs(sb)(blockIdx)
        if (dAddr == Undef) return null
        val elems = dataBlockElems(dAddr, dblkNelmts(sb))
        java.util.Arrays.copyOfRange(elems, within * eaElemSize,
          (within + 1) * eaElemSize)
      }

      var i = 0L
      asm.gridOffsets.foreach { off =>
        val e = element(i)
        if (e != null) {
          val addr = readOffset(e, 0)
          if (addr != Undef) {
            if (eaFiltered) {
              val szBytes = eaElemSize - sizeOfOffsets - 4
              var sz = 0L
              var b = 0
              while (b < szBytes) {
                sz |= (e(sizeOfOffsets + b) & 0xffL) << (8 * b); b += 1
              }
              asm.place(off,
                applyFilters(src.get(addr, sz.toInt), filters, elemSize))
            } else {
              asm.place(off, src.get(addr, chunkBytes.toInt))
            }
          }
        }
        i += 1
      }
    }

    /** Version-2 b-tree chunk index (HDF5 1.10+, the index libhdf5 picks
      * for datasets with MORE THAN ONE unlimited dimension). Record type
      * 10 = non-filtered chunks (address + per-dim scaled offsets),
      * type 11 = filtered (address + variable-width chunk size + filter
      * mask + scaled offsets). Internal nodes carry records then
      * `nrec+1` child pointers whose field widths follow the spec's
      * capacity arithmetic: the nrec field is sized for the maximum
      * leaf-record count, the total-records field (present when the
      * child is internal) for the cumulative subtree maximum at the
      * child's depth. Chunk placement = scaled offset × chunk dims. */
    private def readV2BtreeChunks(name: String, hdrAddr: Long,
                                  asm: ChunkAssembler, chunkDims: Array[Int],
                                  chunkBytes: Long, elemSize: Int,
                                  filters: List[Filter]): Unit = {
      val rank = chunkDims.length
      val head = src.get(hdrAddr,
        12 + 2 + 2 + sizeOfOffsets + 2 + sizeOfLengths + 4)
      require(new String(head, 0, 4, "US-ASCII") == "BTHD",
        s"dataset $name: bad v2 b-tree header signature")
      require(u8(head, 4) == 0,
        s"dataset $name: unsupported v2 b-tree version ${u8(head, 4)}")
      val btType = u8(head, 5)
      require(btType == 10 || btType == 11,
        s"dataset $name: v2 b-tree record type $btType is not a chunk index")
      val btFiltered = btType == 11
      val nodeSize = u32(head, 6).toInt
      val recordSize = u16(head, 10)
      val depth = u16(head, 12)
      // split(1) + merge(1) percents at 14/15
      val rootAddr = readOffset(head, 16)
      val rootNrec = u16(head, 16 + sizeOfOffsets)
      if (rootAddr == Undef) return

      // capacity arithmetic (spec III.A.2 / H5B2): sizes of the child
      // pointers' nrec / total-nrec fields
      def encSize(v: Long): Int = (63 - java.lang.Long.numberOfLeadingZeros(
        math.max(v, 1L))).toInt / 8 + 1
      val maxLeafRec = (nodeSize - 10) / recordSize
      require(maxLeafRec > 0,
        s"dataset $name: v2 b-tree node size $nodeSize too small")
      val maxNrecSize = encSize(maxLeafRec.toLong)
      // cumulative subtree maxima per depth
      val cumMaxNrec = new Array[Long](depth + 1)
      val cumMaxNrecSize = new Array[Int](depth + 1)
      cumMaxNrec(0) = maxLeafRec.toLong
      cumMaxNrecSize(0) = encSize(cumMaxNrec(0))
      var d = 1
      while (d <= depth) {
        val ptrSize = sizeOfOffsets + maxNrecSize + cumMaxNrecSize(d - 1)
        val maxIntRec = (nodeSize - (10 + ptrSize)) / (recordSize + ptrSize)
        cumMaxNrec(d) = (maxIntRec.toLong + 1) * cumMaxNrec(d - 1) +
          maxIntRec.toLong
        cumMaxNrecSize(d) = encSize(cumMaxNrec(d))
        d += 1
      }

      val szBytes = recordSize - sizeOfOffsets - 4 - 8 * rank // type 11 only
      if (btFiltered)
        require(szBytes >= 1 && szBytes <= 8,
          s"dataset $name: v2 b-tree filtered record size $recordSize " +
            s"inconsistent with rank $rank")
      else
        require(recordSize == sizeOfOffsets + 8 * rank,
          s"dataset $name: v2 b-tree record size $recordSize " +
            s"inconsistent with rank $rank")

      def placeRecord(rec: Array[Byte], p: Int): Unit = {
        val addr = readOffset(rec, p)
        var q = p + sizeOfOffsets
        var storedSize = chunkBytes
        if (btFiltered) {
          var sz = 0L
          var b = 0
          while (b < szBytes) { sz |= (rec(q + b) & 0xffL) << (8 * b); b += 1 }
          storedSize = sz
          q += szBytes + 4 // + filter mask
        }
        val off = new Array[Long](rank)
        var dd = 0
        while (dd < rank) {
          off(dd) = u64(rec, q + dd * 8) * chunkDims(dd); dd += 1
        }
        if (addr != Undef) {
          val raw = src.get(addr, storedSize.toInt)
          asm.place(off,
            if (btFiltered) applyFilters(raw, filters, elemSize)
            else raw)
        }
      }

      def walk(addr: Long, nrec: Int, nodeDepth: Int): Unit = {
        if (addr == Undef) return
        if (nodeDepth == 0) {
          val node = src.get(addr, 6 + nrec * recordSize + 4)
          require(new String(node, 0, 4, "US-ASCII") == "BTLF",
            s"dataset $name: bad v2 b-tree leaf signature")
          var r = 0
          while (r < nrec) { placeRecord(node, 6 + r * recordSize); r += 1 }
        } else {
          val childPtrSize = sizeOfOffsets + maxNrecSize +
            (if (nodeDepth > 1) cumMaxNrecSize(nodeDepth - 1) else 0)
          val node = src.get(addr,
            6 + nrec * recordSize + (nrec + 1) * childPtrSize + 4)
          require(new String(node, 0, 4, "US-ASCII") == "BTIN",
            s"dataset $name: bad v2 b-tree internal signature")
          var r = 0
          while (r < nrec) { placeRecord(node, 6 + r * recordSize); r += 1 }
          val ptrBase = 6 + nrec * recordSize
          var c = 0
          while (c <= nrec) {
            val p = ptrBase + c * childPtrSize
            val childAddr = readOffset(node, p)
            var childNrec = 0L
            var b = 0
            while (b < maxNrecSize) {
              childNrec |= (node(p + sizeOfOffsets + b) & 0xffL) << (8 * b)
              b += 1
            }
            walk(childAddr, childNrec.toInt, nodeDepth - 1)
            c += 1
          }
        }
      }

      walk(rootAddr, rootNrec, depth)
    }

    // ---- element decoding ------------------------------------------------

    private def decodeElements(raw: Array[Byte], n: Int, dtype: Datatype): H5Value =
      dtype match {
        case FixedPoint(size, signed, be) =>
          val out = new Array[Long](n)
          var i = 0
          while (i < n) {
            var v = 0L
            var b = 0
            while (b < size) {
              val byteIdx = if (be) i * size + (size - 1 - b) else i * size + b
              v |= (raw(byteIdx) & 0xffL) << (8 * b)
              b += 1
            }
            if (signed && size < 8) {
              val shift = 64 - 8 * size
              v = (v << shift) >> shift
            }
            out(i) = v
            i += 1
          }
          H5Longs(out)
        case Ieee754(size, be) =>
          val out = new Array[Double](n)
          var i = 0
          while (i < n) {
            var bits = 0L
            var b = 0
            while (b < size) {
              val byteIdx = if (be) i * size + (size - 1 - b) else i * size + b
              bits |= (raw(byteIdx) & 0xffL) << (8 * b)
              b += 1
            }
            out(i) =
              if (size == 4) java.lang.Float.intBitsToFloat(bits.toInt).toDouble
              else java.lang.Double.longBitsToDouble(bits)
            i += 1
          }
          H5Doubles(out)
        case FixedString(size, pad) =>
          val out = new Array[String](n)
          var i = 0
          while (i < n) {
            val start = i * size
            var end = start
            if (pad == 2) {
              end = start + size
              while (end > start && (raw(end - 1) == ' '.toByte || raw(end - 1) == 0))
                end -= 1
            } else {
              while (end < start + size && raw(end) != 0) end += 1
            }
            out(i) = new String(raw, start, end - start, "UTF-8")
            i += 1
          }
          H5Strings(out)
        case CompoundType(size, members) =>
          // decode column-wise: gather each member's bytes at its
          // struct offset into a contiguous buffer, then recurse
          H5Compound(members.map { case (name, off, mt) =>
            val memberRaw = new Array[Byte](n * mt.size)
            var i = 0
            while (i < n) {
              System.arraycopy(raw, i * size + off, memberRaw, i * mt.size, mt.size)
              i += 1
            }
            name -> decodeElements(memberRaw, n, mt)
          })
        case VlenString(size) =>
          // each element: length(4) + global heap collection address
          // (sizeOfOffsets) + object index(4)
          val out = new Array[String](n)
          var i = 0
          while (i < n) {
            val p = i * size
            val len = u32(raw, p).toInt
            val collAddr = readOffset(raw, p + 4)
            val objIdx = u32(raw, p + 4 + sizeOfOffsets).toInt
            out(i) =
              if (collAddr == Undef || len == 0) ""
              else new String(globalHeapObject(collAddr, objIdx), 0, len, "UTF-8")
            i += 1
          }
          H5Strings(out)
      }

    private val gheapCache = mutable.Map.empty[Long, Map[Int, Array[Byte]]]

    private def globalHeapObject(collAddr: Long, index: Int): Array[Byte] = {
      val coll = gheapCache.getOrElseUpdate(collAddr, {
        val head = src.get(collAddr, 8 + sizeOfLengths)
        require(new String(head, 0, 4, "US-ASCII") == "GCOL",
          s"global heap collection at $collAddr: bad signature")
        val collSize = readLength(head, 8)
        val body = src.get(collAddr, collSize.toInt)
        val objs = mutable.Map.empty[Int, Array[Byte]]
        // object header: index(2) + refcount(2) + reserved(4) +
        // size(sizeOfLengths) — NOT a fixed 16 bytes
        val objHead = 8 + sizeOfLengths
        var p = 8 + sizeOfLengths
        var run = true
        while (run && p + objHead <= collSize) {
          val idx = u16(body, p)
          val objSize = readLength(body, p + 8)
          if (idx == 0) run = false // free space object terminates the scan
          else {
            objs(idx) = java.util.Arrays.copyOfRange(
              body, p + objHead, p + objHead + objSize.toInt)
            var adv = objHead + objSize.toInt
            if (adv % 8 != 0) adv += 8 - adv % 8
            p += adv
          }
        }
        objs.toMap
      })
      coll.getOrElse(index,
        sys.error(s"global heap object $index not found in collection at $collAddr"))
    }
  }
}
