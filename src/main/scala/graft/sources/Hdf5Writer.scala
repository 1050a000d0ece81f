package graft.sources

import java.util.zip.Deflater
import scala.collection.mutable

/** Minimal spec-conformant HDF5 WRITER — the fixture side of [[Hdf5]],
  * playing the role `ImageFixtures`/`AudioFixtures`/`VideoFixtures` play
  * for the multimodal decoders: no HDF5 toolchain exists in this
  * container, so NeXus-shaped `.nxs.h5` test files are built here from
  * the public HDF5 File Format Specification and read back by the
  * independent parser in [[Hdf5]].
  *
  * Emitted format (the classic layout the HDF5 C library writes by
  * default, which is what facility NeXus files use): superblock v0,
  * v1 object headers, symbol-table groups (v1 B-tree + local heap +
  * `SNOD`), contiguous or chunked-v1-B-tree data layouts with optional
  * shuffle+deflate filters, fixed-length (null-padded) and
  * variable-length (global heap) strings, v1 attribute messages.
  *
  * Writer-scope bounds (fixtures, not a general library): one `SNOD` per
  * group (≤ 64 links — superblock leaf-k is set to 32), 1-D or scalar
  * dataspaces, chunking along the single dimension.
  */
object Hdf5Writer {

  sealed trait H5Data { def n: Int }
  /** Fixed-point column; `width` ∈ {1,2,4,8}. */
  final case class LongData(values: Array[Long], width: Int = 8,
                            signed: Boolean = true) extends H5Data {
    def n: Int = values.length
  }
  /** IEEE float column; `width` ∈ {4,8}. */
  final case class DoubleData(values: Array[Double], width: Int = 8) extends H5Data {
    def n: Int = values.length
  }
  /** Fixed-length null-padded strings; `fixedLen` 0 → longest value. */
  final case class StringData(values: Array[String], fixedLen: Int = 0) extends H5Data {
    def n: Int = values.length
  }
  /** Variable-length strings through a global heap collection. */
  final case class VlenStringData(values: Array[String]) extends H5Data {
    def n: Int = values.length
  }
  /** Compound (struct) column set: packed members, datatype message v3
    * (the HDF5 1.8+ writer shape — unpadded member names, minimal-width
    * offsets). Numeric/fixed-string members only. */
  final case class CompoundData(members: Seq[(String, H5Data)]) extends H5Data {
    require(members.nonEmpty && members.map(_._2.n).distinct.size == 1,
      "compound members must be non-empty and equal-length")
    def n: Int = members.head._2.n
  }

  sealed trait Attr
  final case class AttrStr(v: String) extends Attr
  final case class AttrLong(v: Long) extends Attr
  final case class AttrDouble(v: Double) extends Attr

  sealed trait Node { def name: String }
  /** `dense = true` stores the links the libhdf5-1.8+ DENSE way — link
    * messages as managed fractal-heap objects indexed by a name-hash
    * v2 b-tree — instead of a classic SNOD symbol table; it is how a
    * modern writer lays out any group beyond 8 links (banks, DASlogs). */
  final case class Group(name: String, children: Seq[Node],
                         attrs: Seq[(String, Attr)] = Nil,
                         dense: Boolean = false,
                         /** store attributes DENSE (libhdf5 beyond 8
                           * attrs): bodies in a fractal heap behind an
                           * Attribute Info message + type-8 name index */
                         denseAttrs: Boolean = false,
                         /** extra bytes on the dense heaps' ID length
                           * (r15): widening past 18 switches tiny IDs
                           * to the 12-bit extended form; any width lets
                           * small bodies pack into the ID itself —
                           * libhdf5's tiny-object rule. */
                         heapIdExtra: Int = 0,
                         /** deflate-filter the dense heaps' direct
                           * blocks (r15 — the filtered-fractal-heap
                           * shape libhdf5 writes for compressed dense
                           * storage). */
                         heapFiltered: Boolean = false,
                         /** store dense attributes SHARED (r15): each
                           * heap object is a committed Shared Message
                           * (v3 type 2) pointing at a standalone object
                           * header carrying the attribute. */
                         sharedAttrs: Boolean = false,
                         /** store dense attributes in the FILE-LEVEL
                           * SOHM table (r16): each heap object is a
                           * v3 TYPE-1 Shared Message carrying an 8-byte
                           * ID into the shared-message fractal heap the
                           * superblock-v2 extension names — libhdf5's
                           * H5Pset_shared_mesg_* shape. Forces a v2
                           * superblock. */
                         sohmAttrs: Boolean = false) extends Node
  /** `scalar` emits a rank-0 dataspace (reference NeXus metadata fields
    * are scalars); `chunk` > 0 chunks the single dimension with optional
    * shuffle+deflate. */
  final case class Dataset(name: String, data: H5Data,
                           attrs: Seq[(String, Attr)] = Nil,
                           scalar: Boolean = false,
                           chunk: Int = 0,
                           deflate: Boolean = false,
                           shuffle: Boolean = false,
                           pipelineV2: Boolean = false,
                           /** 0 = v3 layout (v1 b-tree); 1/2/3/4/5 = v4
                             * layout with the Single Chunk / Implicit /
                             * Fixed Array / Extensible Array / Version-2
                             * B-tree chunk index (the HDF5 1.10+
                             * writer shapes). */
                           layoutV4: Int = 0,
                           faPageBits: Int = 10,
                           /** Extensible-array creation parameters
                             * (idxBlkElmts, dataBlkMinElmts,
                             * supBlkMinDataPtrs, maxDblkPageNelmtsBits) —
                             * libhdf5's chunk-index defaults; tests
                             * shrink them to reach secondary blocks with
                             * few chunks. */
                           eaParams: (Int, Int, Int, Int) = (4, 16, 4, 10),
                           /** v2 b-tree node size; small values force
                             * depth > 0 with few chunks. */
                           btNodeSize: Int = 2048) extends Node

  def scalarStr(name: String, v: String, attrs: Seq[(String, Attr)] = Nil): Dataset =
    Dataset(name, StringData(Array(v)), attrs, scalar = true)
  def scalarLong(name: String, v: Long, attrs: Seq[(String, Attr)] = Nil): Dataset =
    Dataset(name, LongData(Array(v)), attrs, scalar = true)
  def scalarDouble(name: String, v: Double, attrs: Seq[(String, Attr)] = Nil): Dataset =
    Dataset(name, DoubleData(Array(v)), attrs, scalar = true)

  /** Serialize a file whose root group carries `rootAttrs` and `children`.
    * `userBlock` (0 or a power of two ≥ 512, spec §II) prepends that many
    * zero bytes; stored addresses stay base-relative, as the spec demands.
    */
  def write(children: Seq[Node], rootAttrs: Seq[(String, Attr)] = Nil,
            userBlock: Int = 0): Array[Byte] = {
    require(userBlock == 0 ||
      (userBlock >= 512 && Integer.bitCount(userBlock) == 1),
      s"user block must be 0 or a power of two >= 512, got $userBlock")
    val body = new Writer().write(Group("/", children, rootAttrs))
    if (userBlock == 0) body else new Array[Byte](userBlock) ++ body
  }

  private final val Undef = Array.fill[Byte](8)(0xff.toByte)

  /** Max-element-bits written for extensible-array chunk indexes (fixes
    * the 4-byte block-offset field width; libhdf5 derives it from the
    * dataset's max dims — 32 bits covers every fixture scale). */
  private final val EaMaxBits = 32

  private final class Writer {
    private val buf = mutable.ArrayBuffer.empty[Byte]

    private def pos: Long = buf.length.toLong
    private def put(b: Array[Byte]): Long = { val p = pos; buf ++= b; p }
    private def b1(v: Int): Array[Byte] = Array(v.toByte)
    private def b2(v: Int): Array[Byte] = Array(v.toByte, (v >> 8).toByte)
    private def b4(v: Long): Array[Byte] =
      Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    private def b8(v: Long): Array[Byte] = {
      val a = new Array[Byte](8)
      var i = 0
      while (i < 8) { a(i) = (v >> (8 * i)).toByte; i += 1 }
      a
    }
    private def zeros(n: Int): Array[Byte] = new Array[Byte](n)
    private def pad8(b: Array[Byte]): Array[Byte] =
      if (b.length % 8 == 0) b else b ++ zeros(8 - b.length % 8)

    // file-level shared-message (SOHM) state: the heap is written
    // FIRST (a pre-pass collects every sohmAttrs group's attribute
    // bodies), so traversal-time dense records can embed its IDs;
    // identical bodies share one heap object — the dedup SOHM exists
    // for
    private var sohmHeapAddr = -1L
    private var sohmIdByBody = Map.empty[Seq[Byte], Array[Byte]]
    private var sohmBodies: Seq[Array[Byte]] = Nil

    private def collectSohmBodies(n: Node): Seq[Array[Byte]] = n match {
      case g: Group =>
        val own = if (g.sohmAttrs)
          g.attrs.map { case (nm, a) => encodeAttr(nm, a)._2 }
        else Nil
        own ++ g.children.flatMap(collectSohmBodies)
      case _ => Nil
    }

    def write(root: Group): Array[Byte] = {
      // reserve the 96-byte superblock region (v0, or v2 + padding
      // when a SOHM table forces the extension-capable form)
      put(zeros(96))
      val bodies = collectSohmBodies(root)
        .map(_.toSeq).distinct.map(_.toArray)
      if (bodies.nonEmpty) {
        val (fh, ids) = writeFractalHeap("SOHM", bodies, idLenBytes = 3)
        sohmHeapAddr = fh
        sohmBodies = bodies
        sohmIdByBody = bodies.map(_.toSeq).zip(ids).toMap
      }
      val rootHeader = writeNode(root)
      if (sohmHeapAddr != -1L) {
        val extAddr = writeSohmTable()
        patchSuperblockV2(rootHeader, extAddr)
      } else patchSuperblock(rootHeader)
      buf.toArray
    }

    /** SMLI list + SMTB table + the superblock-extension object header
      * carrying message 0x000F (spec III.H) — returns the extension
      * header address. One index, list form, covering attribute
      * messages (type flag 0x10). */
    private def writeSohmTable(): Long = {
      val n = sohmBodies.length
      val li = mutable.ArrayBuffer.empty[Byte]
      li ++= "SMLI".getBytes("US-ASCII")
      sohmBodies.foreach { body =>
        li ++= b1(0) // location 0: message in the SOHM heap
        li ++= b4(lookup3(body).toLong & 0xffffffffL)
        li ++= b4(1) // reference count (informational)
        li ++= sohmIdByBody(body.toSeq)
      }
      li ++= b4(0) // checksum (reader resolves by heap ID, never here)
      val smliAddr = put(li.toArray)
      val tb = mutable.ArrayBuffer.empty[Byte]
      tb ++= "SMTB".getBytes("US-ASCII")
      tb ++= b1(0) // index version
      tb ++= b1(0) // index type: list
      tb ++= b2(0x10) // message type flags: attribute messages
      tb ++= b4(0) // minimum message size
      tb ++= b2((n + 1).max(50)) // list cutoff (stay in list form)
      tb ++= b2((n + 2).max(60)) // v2 b-tree cutoff
      tb ++= b2(n)
      tb ++= b8(smliAddr)
      tb ++= b8(sohmHeapAddr)
      tb ++= b4(0) // checksum
      val smtbAddr = put(tb.toArray)
      writeHeader(Seq((0x000F, b1(0) ++ b8(smtbAddr) ++ b1(1))))
    }

    /** Superblock VERSION 2 (48 bytes + zero padding to the reserved
      * 96): the extension-capable form SOHM storage requires; the root
      * object header is addressed directly (no symbol-table entry). */
    private def patchSuperblockV2(rootHeader: Long, extAddr: Long): Unit = {
      val sb = mutable.ArrayBuffer.empty[Byte]
      sb ++= Array(0x89, 'H', 'D', 'F', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
      sb ++= b1(2) // superblock version
      sb ++= b1(8) // size of offsets
      sb ++= b1(8) // size of lengths
      sb ++= b1(0) // file consistency flags
      sb ++= b8(0) // base address
      sb ++= b8(extAddr)
      sb ++= b8(pos) // end of file address
      sb ++= b8(rootHeader)
      sb ++= b4(0) // checksum (reader does not verify)
      require(sb.length == 48, s"superblock v2 is ${sb.length} bytes")
      var i = 0
      while (i < 48) { buf(i) = sb(i); i += 1 }
    }

    private def patchSuperblock(rootHeader: Long): Unit = {
      val sb = mutable.ArrayBuffer.empty[Byte]
      sb ++= Array(0x89, 'H', 'D', 'F', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
      sb ++= b1(0) // superblock version
      sb ++= b1(0) // free space version
      sb ++= b1(0) // root group symbol table version
      sb ++= b1(0) // reserved
      sb ++= b1(0) // shared header message version
      sb ++= b1(8) // size of offsets
      sb ++= b1(8) // size of lengths
      sb ++= b1(0) // reserved
      sb ++= b2(32) // group leaf node k (SNOD capacity 64)
      sb ++= b2(16) // group internal node k
      sb ++= b4(0) // file consistency flags
      sb ++= b8(0) // base address
      sb ++= Undef // free space info address
      sb ++= b8(pos) // end of file address
      sb ++= Undef // driver info block address
      // root group symbol table entry
      sb ++= b8(0) // link name offset
      sb ++= b8(rootHeader)
      sb ++= b4(0) // cache type (none — reader re-walks the header)
      sb ++= b4(0) // reserved
      sb ++= zeros(16) // scratch
      require(sb.length == 96, s"superblock is ${sb.length} bytes, expected 96")
      var i = 0
      while (i < 96) { buf(i) = sb(i); i += 1 }
    }

    private def writeNode(node: Node): Long = node match {
      case g: Group => writeGroup(g)
      case d: Dataset => writeDataset(d)
    }

    // ---- object header assembly -----------------------------------------

    /** (type, data) pairs → v1 object header; returns header address. */
    private def writeHeader(messages: Seq[(Int, Array[Byte])]): Long = {
      val body = mutable.ArrayBuffer.empty[Byte]
      for ((typ, data) <- messages) {
        val padded = pad8(data)
        body ++= b2(typ)
        body ++= b2(padded.length)
        body ++= b1(0) // flags
        body ++= zeros(3)
        body ++= padded
      }
      val header = mutable.ArrayBuffer.empty[Byte]
      header ++= b1(1) // version
      header ++= b1(0)
      header ++= b2(messages.length)
      header ++= b4(1) // reference count
      header ++= b4(body.length)
      header ++= zeros(4) // pad so messages start 8-aligned
      put(header.toArray ++ body.toArray)
    }

    // ---- datatype/dataspace/attribute encodings --------------------------

    private def dataspace1d(n: Long): Array[Byte] =
      b1(1) ++ b1(1) ++ b1(0) ++ zeros(5) ++ b8(n)
    private def dataspaceScalar: Array[Byte] =
      b1(1) ++ b1(0) ++ b1(0) ++ zeros(5)

    private def dtFixed(width: Int, signed: Boolean): Array[Byte] =
      b1(0x10) ++ b1(if (signed) 0x08 else 0x00) ++ b2(0) ++ b4(width) ++
        b2(0) ++ b2(8 * width)

    private def dtFloat(width: Int): Array[Byte] = {
      val (prec, expLoc, expSz, manSz, bias, signLoc) =
        if (width == 4) (32, 23, 8, 23, 127L, 31) else (64, 52, 11, 52, 1023L, 63)
      b1(0x11) ++ b1(0x20) ++ b1(signLoc) ++ b1(0) ++ b4(width) ++
        b2(0) ++ b2(prec) ++ b1(expLoc) ++ b1(expSz) ++ b1(0) ++ b1(manSz) ++ b4(bias)
    }

    /** Fixed string, null-padded (pad type 1), ASCII charset;
      * class/version byte = (version 1 << 4) | class 3. */
    private def dtString(len: Int): Array[Byte] =
      b1(0x13) ++ b1(0x01) ++ b2(0) ++ b4(len)

    /** Vlen string: element = 4-byte length + 8-byte collection address +
      * 4-byte heap index; base type is a 1-byte null-terminated string. */
    private def dtVlenString: Array[Byte] =
      b1(0x19) ++ b1(0x01) ++ b2(0) ++ b4(16) ++
        (b1(0x13) ++ b1(0x00) ++ b2(0) ++ b4(1))

    private def encodeAttr(name: String, attr: Attr): (Int, Array[Byte]) = {
      val (dt, space, data) = attr match {
        case AttrStr(v) =>
          val bytes = v.getBytes("UTF-8")
          (dtString(math.max(bytes.length, 1)), dataspaceScalar,
            if (bytes.isEmpty) zeros(1) else bytes)
        case AttrLong(v) => (dtFixed(8, signed = true), dataspaceScalar, b8(v))
        case AttrDouble(v) =>
          (dtFloat(8), dataspaceScalar, b8(java.lang.Double.doubleToLongBits(v)))
      }
      val nameBytes = name.getBytes("UTF-8") ++ zeros(1)
      val msg = mutable.ArrayBuffer.empty[Byte]
      msg ++= b1(1) // version
      msg ++= b1(0)
      msg ++= b2(nameBytes.length)
      msg ++= b2(dt.length)
      msg ++= b2(space.length)
      msg ++= pad8(nameBytes)
      msg ++= pad8(dt)
      msg ++= pad8(space)
      msg ++= data
      (0x000C, msg.toArray)
    }

    // ---- datasets --------------------------------------------------------

    private def elementBytes(data: H5Data): (Array[Byte], Array[Byte], Int) =
      data match {
        case LongData(vs, width, signed) =>
          val out = new Array[Byte](vs.length * width)
          var i = 0
          while (i < vs.length) {
            var b = 0
            while (b < width) { out(i * width + b) = (vs(i) >> (8 * b)).toByte; b += 1 }
            i += 1
          }
          (out, dtFixed(width, signed), width)
        case DoubleData(vs, width) =>
          val out = new Array[Byte](vs.length * width)
          var i = 0
          while (i < vs.length) {
            val bits =
              if (width == 4) java.lang.Float.floatToIntBits(vs(i).toFloat).toLong & 0xffffffffL
              else java.lang.Double.doubleToLongBits(vs(i))
            var b = 0
            while (b < width) { out(i * width + b) = (bits >> (8 * b)).toByte; b += 1 }
            i += 1
          }
          (out, dtFloat(width), width)
        case StringData(vs, fixedLen) =>
          val len = math.max(1,
            if (fixedLen > 0) fixedLen else vs.map(_.getBytes("UTF-8").length).foldLeft(1)(math.max))
          val out = new Array[Byte](vs.length * len)
          var i = 0
          while (i < vs.length) {
            val b = vs(i).getBytes("UTF-8")
            require(b.length <= len, s"string '${vs(i)}' exceeds fixed length $len")
            System.arraycopy(b, 0, out, i * len, b.length)
            i += 1
          }
          (out, dtString(len), len)
        case CompoundData(members) =>
          // pack member columns row-major at cumulative offsets; the
          // datatype is compound v3: name NUL-terminated unpadded, byte
          // offset in the minimum width that holds the struct size
          val encoded = members.map { case (nm, d2) =>
            require(!d2.isInstanceOf[VlenStringData] &&
              !d2.isInstanceOf[CompoundData],
              "compound members must be numeric or fixed strings")
            val (bytes, dt, w) = elementBytes(d2)
            (nm, bytes, dt, w)
          }
          val structSize = encoded.map(_._4).sum
          val offsets = encoded.map(_._4).scanLeft(0)(_ + _)
          val rows = members.head._2.n
          val out = new Array[Byte](rows * structSize)
          encoded.zip(offsets).foreach { case ((_, bytes, _, w), off) =>
            var i = 0
            while (i < rows) {
              System.arraycopy(bytes, i * w, out, i * structSize + off, w)
              i += 1
            }
          }
          val ob = if (structSize < 256) 1 else if (structSize < 65536) 2
                   else if (structSize < (1 << 24)) 3 else 4
          val props = mutable.ArrayBuffer.empty[Byte]
          encoded.zip(offsets).foreach { case ((nm, _, dt, _), off) =>
            props ++= nm.getBytes("UTF-8")
            props ++= b1(0)
            var b = 0
            while (b < ob) { props ++= b1((off >> (8 * b)) & 0xff); b += 1 }
            props ++= dt
          }
          val nMembers = members.size
          val head = b1(0x36) ++ b1(nMembers & 0xff) ++
            b1((nMembers >> 8) & 0xff) ++ b1(0) ++ b4(structSize)
          (out, head ++ props.toArray, structSize)
        case VlenStringData(vs) =>
          // write the global heap collection first, then 16-byte descriptors
          // empty strings get a null descriptor (no heap object), as the
          // C library writes them; non-empty payloads get 1-based indices
          val payloads = vs.map(_.getBytes("UTF-8"))
          val indexed = payloads.filter(_.nonEmpty).zipWithIndex
            .map { case (p, i) => (p, i + 1) }
          val objSizes = indexed.map { case (p, _) => 16 + pad8len(p.length) }
          val collSize = 8 + 8 + objSizes.sum + 16 // header + objects + free-space
          val coll = mutable.ArrayBuffer.empty[Byte]
          coll ++= "GCOL".getBytes("US-ASCII")
          coll ++= b1(1)
          coll ++= zeros(3)
          coll ++= b8(collSize)
          indexed.foreach { case (p, idx) =>
            coll ++= b2(idx)
            coll ++= b2(1) // reference count
            coll ++= zeros(4)
            coll ++= b8(p.length)
            coll ++= pad8(p)
          }
          coll ++= zeros(16) // free-space object (index 0) terminator
          val collAddr = put(coll.toArray)
          val out = mutable.ArrayBuffer.empty[Byte]
          var nextIdx = 1
          payloads.foreach { p =>
            if (p.isEmpty) {
              out ++= b4(0)
              out ++= Undef
              out ++= b4(0)
            } else {
              out ++= b4(p.length)
              out ++= b8(collAddr)
              out ++= b4(nextIdx)
              nextIdx += 1
            }
          }
          (out.toArray, dtVlenString, 16)
      }

    private def pad8len(n: Int): Int = if (n % 8 == 0) n else n + (8 - n % 8)

    private def deflateBytes(data: Array[Byte]): Array[Byte] = {
      val d = new Deflater(Deflater.DEFAULT_COMPRESSION)
      d.setInput(data)
      d.finish()
      val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
      val tmp = new Array[Byte](8192)
      while (!d.finished()) out.write(tmp, 0, d.deflate(tmp))
      d.end()
      out.toByteArray
    }

    private def shuffleBytes(data: Array[Byte], elemSize: Int): Array[Byte] = {
      if (elemSize <= 1) return data
      val n = data.length / elemSize
      val out = new Array[Byte](data.length)
      var b = 0
      while (b < elemSize) {
        var i = 0
        while (i < n) { out(b * n + i) = data(i * elemSize + b); i += 1 }
        b += 1
      }
      var t = n * elemSize
      while (t < data.length) { out(t) = data(t); t += 1 }
      out
    }

    private def writeDataset(ds: Dataset): Long = {
      val (raw, dtype, elemSize) = elementBytes(ds.data)
      val n = ds.data.n
      require(!ds.scalar || n == 1, s"scalar dataset ${ds.name} must have 1 element")
      val space = if (ds.scalar) dataspaceScalar else dataspace1d(n.toLong)

      val msgs = mutable.ArrayBuffer.empty[(Int, Array[Byte])]
      msgs += ((0x0001, space))
      msgs += ((0x0003, dtype))

      if (ds.chunk > 0) {
        require(!ds.scalar, "scalar datasets cannot be chunked")
        require(ds.data.isInstanceOf[LongData] || ds.data.isInstanceOf[DoubleData],
          "chunking supported for numeric data only")
        val filters = mutable.ArrayBuffer.empty[Array[Byte]]
        if (ds.pipelineV2) {
          // v2 description for ids < 256: NO Name Length field — flags
          // and client-value count directly follow the id, values
          // unpadded (the HDF5 1.10+ writer shape).
          if (ds.shuffle) filters += (b2(2) ++ b2(0) ++ b2(1) ++ b4(elemSize))
          if (ds.deflate) filters += (b2(1) ++ b2(0) ++ b2(1) ++ b4(6))
          if (filters.nonEmpty)
            msgs += ((0x000B, b1(2) ++ b1(filters.length) ++ filters.flatten))
        } else {
          if (ds.shuffle)
            filters += (b2(2) ++ b2(0) ++ b2(1) ++ b2(1) ++ b4(elemSize) ++ zeros(4))
          if (ds.deflate)
            filters += (b2(1) ++ b2(0) ++ b2(1) ++ b2(1) ++ b4(6) ++ zeros(4))
          if (filters.nonEmpty) {
            val fp = b1(1) ++ b1(filters.length) ++ zeros(6) ++ filters.flatten
            msgs += ((0x000B, fp))
          }
        }
        // write chunks, then the type-1 B-tree over them
        val chunkElems = ds.chunk
        val chunks = mutable.ArrayBuffer.empty[(Long, Int, Long)] // (offset, nbytes, addr)
        var start = 0
        while (start < n) {
          val len = math.min(chunkElems, n - start)
          // stored chunks are always whole chunkElems long on the last
          // chunk too in HDF5? No — partial edge chunks store only the
          // in-bounds region for v1 B-trees written by the C library when
          // the dataset is not filter-padded; for filtered chunks the
          // full chunk is stored. Store the full chunk (zero-padded) —
          // both forms are legal and the reader clips to the dataspace.
          val full = new Array[Byte](chunkElems * elemSize)
          System.arraycopy(raw, start * elemSize, full, 0, len * elemSize)
          var payload = full
          if (ds.shuffle) payload = shuffleBytes(payload, elemSize)
          if (ds.deflate) payload = deflateBytes(payload)
          val addr = put(payload)
          chunks += ((start.toLong, payload.length, addr))
          start += chunkElems
        }
        if (ds.layoutV4 > 0) {
          // ---- layout message v4 (the 1.10+ writer generation) ----
          val filtered = ds.deflate || ds.shuffle
          // nDims(1) + dim-size encoding length(1) + the one dim (8 LE)
          val dimsV4 = b1(1) ++ b1(8) ++ b8(chunkElems.toLong)
          ds.layoutV4 match {
            case 1 => // single chunk: the whole dataset is one chunk
              require(chunks.length == 1,
                s"single-chunk v4 layout needs chunk >= n (${ds.name})")
              val (_, nbytes, addr) = chunks.head
              val flags = if (filtered) 0x2 else 0x0
              val info =
                if (filtered) b8(nbytes.toLong) ++ b4(0) else Array.empty[Byte]
              msgs += ((0x0008, b1(4) ++ b1(2) ++ b1(flags) ++ dimsV4 ++
                b1(1) ++ info ++ b8(addr)))
            case 2 => // implicit: full chunks back-to-back, no filters
              require(!filtered,
                "implicit chunk index cannot carry filters (spec contract)")
              msgs += ((0x0008, b1(4) ++ b1(2) ++ b1(0) ++ dimsV4 ++
                b1(2) ++ b8(chunks.head._3)))
            case 3 => // fixed array: FAHD header -> FADB data block
              val entrySize = if (filtered) 16 else 8
              val pageBits = ds.faPageBits
              val pageSize = 1 << pageBits
              val nPages = (chunks.length + pageSize - 1) / pageSize
              val fahdAddr = pos
              val dbAddr = fahdAddr + 28
              val fahd = "FAHD".getBytes("US-ASCII") ++ b1(0) ++
                b1(if (filtered) 1 else 0) ++ b1(entrySize) ++ b1(pageBits) ++
                b8(chunks.length.toLong) ++ b8(dbAddr) ++ b4(0)
              require(fahd.length == 28, s"FAHD is ${fahd.length} bytes")
              put(fahd)
              def entry(c: (Long, Int, Long)): Array[Byte] =
                if (filtered) b8(c._3) ++ b4(c._2.toLong) ++ b4(0)
                else b8(c._3)
              val db = mutable.ArrayBuffer.empty[Byte]
              db ++= "FADB".getBytes("US-ASCII")
              db ++= b1(0)
              db ++= b1(if (filtered) 1 else 0)
              db ++= b8(fahdAddr)
              if (nPages <= 1) {
                chunks.foreach(c => db ++= entry(c))
                db ++= b4(0) // checksum (unverified by the reader)
              } else {
                db ++= new Array[Byte]((nPages + 7) / 8)
                  .map(_ => 0xff.toByte) // page bitmap: all pages present
                db ++= b4(0) // data-block checksum
                chunks.grouped(pageSize).foreach { page =>
                  page.foreach(c => db ++= entry(c))
                  db ++= b4(0) // per-page checksum
                }
              }
              put(db.toArray)
              // flags stay 0: bit 1 (index-with-filter) is the SINGLE
              // CHUNK signal only — fixed-array filtered-ness is the
              // FAHD client id, as libhdf5 writes it
              msgs += ((0x0008, b1(4) ++ b1(2) ++ b1(0) ++ dimsV4 ++
                b1(3) ++ b1(pageBits) ++ b8(fahdAddr)))
            case 4 => // extensible array: EADB/EASB/EAIB/EAHD chain
              val eahdAddr = writeExtensibleArray(chunks.toSeq, filtered,
                ds.eaParams)
              val (idxE, minE, minP, pgBits) = ds.eaParams
              msgs += ((0x0008, b1(4) ++ b1(2) ++ b1(0) ++ dimsV4 ++
                b1(4) ++ b1(EaMaxBits) ++ b1(idxE) ++ b1(minP) ++ b1(minE) ++
                b1(pgBits) ++ b8(eahdAddr)))
            case 5 => // v2 b-tree: BTLF leaves (+BTIN root) + BTHD header
              val bthdAddr = writeV2BtreeIndex(chunks.toSeq, filtered,
                ds.btNodeSize, chunkElems)
              msgs += ((0x0008, b1(4) ++ b1(2) ++ b1(0) ++ dimsV4 ++
                b1(5) ++ b4(ds.btNodeSize.toLong) ++ b1(100) ++ b1(40) ++
                b8(bthdAddr)))
            case v => sys.error(s"unknown v4 layout variant $v")
          }
        } else {
          // classic v3 layout: type-1 B-tree over the chunks
          val bt = mutable.ArrayBuffer.empty[Byte]
          bt ++= "TREE".getBytes("US-ASCII")
          bt ++= b1(1) // node type: raw data chunks
          bt ++= b1(0) // level
          bt ++= b2(chunks.length)
          bt ++= Undef // left sibling
          bt ++= Undef // right sibling
          for ((off, nbytes, addr) <- chunks) {
            bt ++= b4(nbytes)
            bt ++= b4(0) // filter mask
            bt ++= b8(off)
            bt ++= b8(0) // element-size dimension offset
            bt ++= b8(addr)
          }
          // final key: one-past-the-end chunk offset
          bt ++= b4(0)
          bt ++= b4(0)
          bt ++= b8(n.toLong)
          bt ++= b8(0)
          val btreeAddr = put(bt.toArray)
          val layout = b1(3) ++ b1(2) ++ b1(2) ++ b8(btreeAddr) ++
            b4(chunkElems.toLong) ++ b4(elemSize.toLong)
          msgs += ((0x0008, layout))
        }
      } else {
        val addr = if (raw.isEmpty) -1L else put(raw)
        val layout = b1(3) ++ b1(1) ++
          (if (raw.isEmpty) Undef else b8(addr)) ++ b8(raw.length.toLong)
        msgs += ((0x0008, layout))
      }

      ds.attrs.foreach { case (nm, a) => msgs += encodeAttr(nm, a) }
      writeHeader(msgs.toSeq)
    }

    /** Emit the extensible-array index chain for `chunks` (already in
      * grid order): data blocks, secondary blocks, index block, header —
      * addresses planned up front so the forward header references are
      * exact. Returns the `EAHD` address. Geometry per the spec / H5EA:
      * super block `s` holds `2^(s/2)` data blocks of
      * `minElmts·2^((s+1)/2)` elements; the index block inlines the
      * first `idxBlkElmts` elements and directly addresses the first
      * `2·(minPtrs−1)` data blocks. */
    private def writeExtensibleArray(chunks: Seq[(Long, Int, Long)],
                                     filtered: Boolean,
                                     params: (Int, Int, Int, Int)): Long = {
      val (idxBlkElmts, minElmts, minPtrs, pageBits) = params
      def log2(v: Int): Int = {
        require(v > 0 && (v & (v - 1)) == 0,
          s"extensible-array parameter $v must be a power of 2")
        Integer.numberOfTrailingZeros(v)
      }
      val elemSize = if (filtered) 16 else 8
      val blockOffBytes = (EaMaxBits + 7) / 8
      def nDblks(s: Int): Int = 1 << (s / 2)
      def dblkNelmts(s: Int): Int = minElmts << ((s + 1) / 2)
      val iblkSblks = 2 * log2(minPtrs)
      val nsblksTotal = 1 + (EaMaxBits - log2(minElmts))
      val nDblkAddrs = 2 * (minPtrs - 1)
      val nSblkAddrs = math.max(0, nsblksTotal - iblkSblks)

      val undefElem = Array.fill[Byte](elemSize)(0xff.toByte)
      def elemBytes(c: (Long, Int, Long)): Array[Byte] =
        if (filtered) b8(c._3) ++ b4(c._2.toLong) ++ b4(0) else b8(c._3)

      val inline = chunks.take(idxBlkElmts)
      var rest = chunks.drop(idxBlkElmts)

      // assign overflow chunks to data blocks per the super-block schedule
      final case class DBlkPlan(s: Int, firstElem: Long,
                                elems: Seq[(Long, Int, Long)])
      val dblkPlans = mutable.ArrayBuffer.empty[DBlkPlan]
      var s = 0
      var elemCursor = idxBlkElmts.toLong
      while (rest.nonEmpty) {
        require(s < nsblksTotal,
          s"extensible array overflow: ${chunks.length} chunks exceed " +
            s"2^$EaMaxBits elements")
        var d = 0
        while (d < nDblks(s) && rest.nonEmpty) {
          val take = math.min(dblkNelmts(s), rest.length)
          dblkPlans += DBlkPlan(s, elemCursor, rest.take(take))
          rest = rest.drop(take)
          elemCursor += dblkNelmts(s)
          d += 1
        }
        // skip the super block's unused data blocks in element space
        elemCursor = idxBlkElmts.toLong + {
          var acc = 0L
          var t = 0
          while (t <= s) { acc += nDblks(t).toLong * dblkNelmts(t); t += 1 }
          acc
        }
        s += 1
      }
      val sblksUsed = dblkPlans.map(_.s).distinct.filter(_ >= iblkSblks)

      // address plan: [data blocks][secondary blocks][index block][EAHD]
      def dblkSize(s0: Int): Long = {
        val nel = dblkNelmts(s0).toLong
        val pageSize = 1L << pageBits
        if (nel <= pageSize) 6L + 8 + blockOffBytes + nel * elemSize + 4
        else {
          // paged: bitmap + block checksum + per-page checksums
          val nPages = nel / pageSize // both powers of two → exact
          6L + 8 + blockOffBytes + (nPages + 7) / 8 + 4 +
            nPages * (pageSize * elemSize + 4)
        }
      }
      def sblkSize(s0: Int): Long =
        6L + 8 + blockOffBytes + nDblks(s0).toLong * 8 + 4
      val iblkSize = 6L + 8 + idxBlkElmts.toLong * elemSize +
        (nDblkAddrs + nSblkAddrs).toLong * 8 + 4
      var cursor = pos
      val dblkAddr = dblkPlans.map { p =>
        val a = cursor; cursor += dblkSize(p.s); (p, a)
      }
      val sblkAddr = sblksUsed.map { s0 =>
        val a = cursor; cursor += sblkSize(s0); (s0, a)
      }.toMap
      val iblkAddr = cursor
      val eahdAddr = iblkAddr + iblkSize

      def bVar(v: Long, n: Int): Array[Byte] =
        Array.tabulate(n)(i => ((v >> (8 * i)) & 0xff).toByte)

      // data blocks: elements at capacity, unwritten slots Undef; a
      // block whose capacity exceeds 2^pageBits elements is PAGED —
      // header, page-init bitmap (a page is initialized iff it holds a
      // real element), block checksum, then pages with page checksums
      for ((p, _) <- dblkAddr) {
        val db = mutable.ArrayBuffer.empty[Byte]
        db ++= "EADB".getBytes("US-ASCII")
        db ++= b1(0)
        db ++= b1(if (filtered) 1 else 0)
        db ++= b8(eahdAddr)
        db ++= bVar(p.firstElem, blockOffBytes)
        val nel = dblkNelmts(p.s)
        val pageSize = 1 << pageBits
        if (nel <= pageSize) {
          p.elems.foreach(c => db ++= elemBytes(c))
          (p.elems.length until nel).foreach(_ => db ++= undefElem)
          db ++= b4(0) // checksum (unverified by the reader)
        } else {
          val nPages = nel / pageSize
          val nReal = p.elems.length
          val bitmap = new Array[Byte]((nPages + 7) / 8)
          (0 until nPages).foreach { pg =>
            if (pg * pageSize < nReal)
              bitmap(pg >> 3) = (bitmap(pg >> 3) | (1 << (pg & 7))).toByte
          }
          db ++= bitmap
          db ++= b4(0) // block checksum
          (0 until nPages).foreach { pg =>
            val pageInit = pg * pageSize < nReal
            (0 until pageSize).foreach { j =>
              val idx = pg * pageSize + j
              if (!pageInit) db ++= zeros(elemSize) // bytes never read
              else if (idx < nReal) db ++= elemBytes(p.elems(idx))
              else db ++= undefElem
            }
            db ++= b4(0) // page checksum
          }
        }
        put(db.toArray)
      }
      // secondary blocks: this super block's data-block addresses
      val plansBySblk = dblkPlans.zip(dblkAddr.map(_._2))
        .groupBy(_._1.s)
      for (s0 <- sblksUsed) {
        val sb = mutable.ArrayBuffer.empty[Byte]
        sb ++= "EASB".getBytes("US-ASCII")
        sb ++= b1(0)
        sb ++= b1(if (filtered) 1 else 0)
        sb ++= b8(eahdAddr)
        sb ++= bVar(plansBySblk(s0).head._1.firstElem, blockOffBytes)
        val addrs = plansBySblk(s0).map(_._2)
        addrs.foreach(a => sb ++= b8(a))
        (addrs.length until nDblks(s0)).foreach(_ => sb ++= Undef)
        sb ++= b4(0)
        put(sb.toArray)
      }
      // index block: inline elements, direct dblk addresses, sblk addresses
      val ib = mutable.ArrayBuffer.empty[Byte]
      ib ++= "EAIB".getBytes("US-ASCII")
      ib ++= b1(0)
      ib ++= b1(if (filtered) 1 else 0)
      ib ++= b8(eahdAddr)
      inline.foreach(c => ib ++= elemBytes(c))
      (inline.length until idxBlkElmts).foreach(_ => ib ++= undefElem)
      val directAddrs = dblkAddr.filter(_._1.s < iblkSblks).map(_._2)
      directAddrs.foreach(a => ib ++= b8(a))
      (directAddrs.length until nDblkAddrs).foreach(_ => ib ++= Undef)
      (0 until nSblkAddrs).foreach { i =>
        val s0 = iblkSblks + i
        if (sblkAddr.contains(s0)) ib ++= b8(sblkAddr(s0)) else ib ++= Undef
      }
      ib ++= b4(0)
      val gotIblk = put(ib.toArray)
      require(gotIblk == iblkAddr, "EA address plan drift (index block)")
      // header
      val hd = mutable.ArrayBuffer.empty[Byte]
      hd ++= "EAHD".getBytes("US-ASCII")
      hd ++= b1(0)
      hd ++= b1(if (filtered) 1 else 0)
      hd ++= b1(elemSize)
      hd ++= b1(EaMaxBits)
      hd ++= b1(idxBlkElmts)
      hd ++= b1(minElmts)
      hd ++= b1(minPtrs)
      hd ++= b1(pageBits)
      hd ++= b8(sblksUsed.length.toLong) // num secondary blocks
      hd ++= b8(if (sblksUsed.nonEmpty) sblkSize(sblksUsed.last) else 0L)
      hd ++= b8(dblkPlans.length.toLong) // num data blocks
      hd ++= b8(if (dblkPlans.nonEmpty) dblkSize(dblkPlans.last.s) else 0L)
      hd ++= b8(chunks.length.toLong) // max index set
      hd ++= b8(chunks.length.toLong) // num elements
      hd ++= b8(iblkAddr)
      hd ++= b4(0)
      val gotHdr = put(hd.toArray)
      require(gotHdr == eahdAddr, "EA address plan drift (header)")
      eahdAddr
    }

    /** Emit a version-2 b-tree chunk index over `chunks` (grid order =
      * ascending scaled offset, the record sort order). The tree is built
      * to the minimal depth whose subtree capacity holds all records, and
      * every node — leaf, internal, root — honors the record capacity its
      * declared `nodeSize` admits (spec III.A.2 pointer-size arithmetic,
      * mirrored from the reader), so small node sizes yield conformant
      * depth-2+ trees instead of an over-full root. Returns the `BTHD`
      * address. */
    private def writeV2BtreeIndex(chunks: Seq[(Long, Int, Long)],
                                  filtered: Boolean, nodeSize: Int,
                                  chunkElems: Int): Long = {
      val btType = if (filtered) 11 else 10
      val recSize = if (filtered) 8 + 4 + 4 + 8 else 8 + 8
      // records carry ONE scaled offset: this writer's chunked layout is
      // rank-1 by construction (`dimsV4` above emits a single dimension),
      // so a rank>1 grid can never reach here; chunkElems>0 guards the
      // scaling division all the same.
      require(chunkElems > 0, "v2 b-tree: chunkElems must be positive")
      def record(c: (Long, Int, Long)): Array[Byte] = {
        val scaled = c._1 / chunkElems
        if (filtered) b8(c._3) ++ b4(c._2.toLong) ++ b4(0) ++ b8(scaled)
        else b8(c._3) ++ b8(scaled)
      }
      writeV2BtreeRecords(chunks.map(record), btType, recSize, nodeSize)
    }

    /** Emit a version-2 b-tree over pre-encoded fixed-size records (in
      * the record type's sort order) — shared by the chunk indexes and
      * the dense-group name index. Returns the `BTHD` address. */
    private def writeV2BtreeRecords(records: Seq[Array[Byte]], btType: Int,
                                    recSize: Int, nodeSize: Int): Long = {
      val maxLeafRec = (nodeSize - 10) / recSize
      require(maxLeafRec >= 2,
        s"v2 b-tree node size $nodeSize too small for record size $recSize")
      def encSize(v: Long): Int =
        (63 - java.lang.Long.numberOfLeadingZeros(math.max(v, 1L))) / 8 + 1
      val maxNrecSize = encSize(maxLeafRec.toLong)
      val n = records.length

      // capacity tables per depth, same arithmetic as the reader's walk:
      // cumMaxNrec(d) = records a depth-d subtree can hold, maxIntRec(d) =
      // record capacity of a depth-d internal node.
      val cumMaxNrec = mutable.ArrayBuffer[Long](maxLeafRec.toLong)
      val cumMaxNrecSize = mutable.ArrayBuffer[Int](encSize(maxLeafRec.toLong))
      val maxIntRec = mutable.ArrayBuffer[Int](0) // depth 0 has no internal
      def growTables(depth: Int): Unit =
        while (cumMaxNrec.length <= depth) {
          val d = cumMaxNrec.length
          val ptrSize = 8 + maxNrecSize + cumMaxNrecSize(d - 1)
          val mir = (nodeSize - (10 + ptrSize)) / (recSize + ptrSize)
          require(mir >= 1,
            s"v2 b-tree node size $nodeSize cannot hold an internal record" +
              s" at depth $d — raise btNodeSize")
          maxIntRec += mir
          cumMaxNrec += (mir.toLong + 1) * cumMaxNrec(d - 1) + mir.toLong
          cumMaxNrecSize += encSize(cumMaxNrec(d))
        }
      var depth = 0
      while (cumMaxNrec(depth) < n) { growTables(depth + 1); depth += 1 }

      // bottom-up: write a depth-d subtree over recs, return (addr, nrec)
      def build(recs: Seq[Array[Byte]], d: Int): (Long, Int) =
        if (d == 0) {
          val leaf = mutable.ArrayBuffer.empty[Byte]
          leaf ++= "BTLF".getBytes("US-ASCII")
          leaf ++= b1(0)
          leaf ++= b1(btType)
          recs.foreach(leaf ++= _)
          leaf ++= b4(0)
          (put(leaf.toArray), recs.length)
        } else {
          val cap = cumMaxNrec(d - 1)
          val m = recs.length
          // minimal child count: (k-1) separators + k subtrees of cap
          val k = math.max(1, ((m + 1) + cap) / (cap + 1)).toInt // ceil
          require(k - 1 <= maxIntRec(d),
            s"v2 b-tree internal overflow at depth $d: ${k - 1} records," +
              s" capacity ${maxIntRec(d)}")
          val childTotal = m - (k - 1)
          val base = childTotal / k
          val extra = childTotal % k
          var idx = 0
          val children = mutable.ArrayBuffer.empty[(Long, Int, Long)]
          val seps = mutable.ArrayBuffer.empty[Array[Byte]]
          (0 until k).foreach { i =>
            val cnt = base + (if (i < extra) 1 else 0)
            val sub = recs.slice(idx, idx + cnt)
            val (addr, nrec) = build(sub, d - 1)
            children += ((addr, nrec, cnt.toLong))
            idx += cnt
            if (i < k - 1) { seps += recs(idx); idx += 1 }
          }
          val node = mutable.ArrayBuffer.empty[Byte]
          node ++= "BTIN".getBytes("US-ASCII")
          node ++= b1(0)
          node ++= b1(btType)
          seps.foreach(node ++= _)
          children.foreach { case (a, nrec, total) =>
            node ++= b8(a)
            (0 until maxNrecSize).foreach(b =>
              node += ((nrec >> (8 * b)) & 0xff).toByte)
            if (d > 1) // child-subtree total, present below internal nodes
              (0 until cumMaxNrecSize(d - 1)).foreach(b =>
                node += ((total >> (8 * b)) & 0xff).toByte)
          }
          node ++= b4(0)
          (put(node.toArray), k - 1)
        }

      val (rootAddr, rootNrec) = build(records, depth)

      val hd = mutable.ArrayBuffer.empty[Byte]
      hd ++= "BTHD".getBytes("US-ASCII")
      hd ++= b1(0)
      hd ++= b1(btType)
      hd ++= b4(nodeSize.toLong)
      hd ++= b2(recSize)
      hd ++= b2(depth)
      hd ++= b1(100) // split percent
      hd ++= b1(40) // merge percent
      hd ++= b8(rootAddr)
      hd ++= b2(rootNrec)
      hd ++= b8(n.toLong)
      hd ++= b4(0)
      put(hd.toArray)
    }

    // ---- groups ----------------------------------------------------------

    /** Jenkins lookup3 (hashlittle, initval 0) — the hash HDF5 uses for
      * dense-link name indexing (and v2-header checksums). Public-domain
      * algorithm per Bob Jenkins' lookup3.c. */
    private def lookup3(key: Array[Byte]): Int = {
      @inline def rot(x: Int, k: Int): Int = (x << k) | (x >>> (32 - k))
      def le32(at: Int, n: Int): Int = {
        var v = 0
        var i = 0
        while (i < n) { v |= (key(at + i) & 0xff) << (8 * i); i += 1 }
        v
      }
      var a = 0xdeadbeef + key.length
      var b = a
      var c = a
      var i = 0
      var len = key.length
      while (len > 12) {
        a += le32(i, 4); b += le32(i + 4, 4); c += le32(i + 8, 4)
        a -= c; a ^= rot(c, 4); c += b
        b -= a; b ^= rot(a, 6); a += c
        c -= b; c ^= rot(b, 8); b += a
        a -= c; a ^= rot(c, 16); c += b
        b -= a; b ^= rot(a, 19); a += c
        c -= b; c ^= rot(b, 4); b += a
        i += 12; len -= 12
      }
      if (len > 0) {
        a += le32(i, math.min(len, 4))
        if (len > 4) b += le32(i + 4, math.min(len - 4, 4))
        if (len > 8) c += le32(i + 8, len - 8)
        c ^= b; c -= rot(b, 14)
        a ^= c; a -= rot(c, 11)
        b ^= a; b -= rot(a, 25)
        c ^= b; c -= rot(b, 16)
        a ^= c; a -= rot(c, 4)
        b ^= a; b -= rot(a, 14)
        c ^= b; c -= rot(b, 24)
      }
      c
    }

    /** Dense-link group (libhdf5 1.8+ beyond 8 links): link-message
      * bodies land as MANAGED objects in a fractal heap (doubling table
      * W=4, 256-byte starting blocks, heap IDs 1+4+2 = the 7-byte
      * link-heap shape), indexed by a type-5 name-hash v2 b-tree; the
      * object header carries a Link Info message naming both. Root is a
      * single direct block when the links fit, else one indirect block
      * of direct children (nested indirects exceed fixture scope and
      * refuse at write time). */
    /** Pack object bodies into a fractal heap (doubling table W=4,
      * 256-byte starting blocks, 4096-byte max direct size; root is a
      * single direct block when the bodies fit, else one indirect block
      * of direct children — nested indirects exceed fixture scope and
      * refuse at write time). `idLenBytes` picks the heap-ID length
      * field width: links use 2 (7-byte IDs), attributes 3 (8-byte);
      * `idExtra` widens it further (past 18 bytes tiny IDs switch to
      * the extended 12-bit form). Storage class per body follows
      * libhdf5's rule: TINY when the data fits in the ID itself, HUGE
      * (standalone + type-1 v2 b-tree record) when it exceeds the max
      * direct-block payload, MANAGED otherwise. `filtered` deflates
      * every direct block as a whole (the filtered-heap layout: stored
      * sizes in the header / indirect-block entries).
      * Returns (FRHP address, heap ID per body, in order). */
    private def writeFractalHeap(owner: String, bodies: Seq[Array[Byte]],
                                 idLenBytes: Int, idExtra: Int = 0,
                                 filtered: Boolean = false)
        : (Long, Seq[Array[Byte]]) = {
      val W = 4
      val S = 256L
      val maxDirect = 4096L
      val hdrSize = 4 + 1 + 8 + 4 // FHDB header (flags 0: no checksum)
      val lenBytes = idLenBytes + idExtra
      val heapIdLen = 1 + 4 + lenBytes
      // tiny capacity: normal form carries ≤ 16 bytes in (idLen-1);
      // the extended form (idLen > 18) has a 12-bit length field
      val tinyCap =
        if (heapIdLen > 18) math.min(heapIdLen - 2, 4096)
        else math.min(heapIdLen - 1, 16)
      def rowSize(r: Int): Long = if (r < 2) S else S << (r - 1)
      val maxDirectRows = {
        var r = 0
        while (rowSize(r) < maxDirect) r += 1
        r + 1
      }
      def bN(v: Long, n: Int): Array[Byte] =
        Array.tabulate(n)(i => ((v >> (8 * i)) & 0xff).toByte)
      def padId(id: Array[Byte]): Array[Byte] =
        id ++ zeros(heapIdLen - id.length)

      // pack MANAGED bodies into doubling-grid direct-block SLOTS,
      // planned over the full indirect TREE (r16 — rows past
      // maxDirectRows hold child indirect blocks, each RESTARTING the
      // doubling table over the span its row assigns; before r16 the
      // plan stopped at one indirect level and refused). Slot order is
      // the DFS heap order the reader walks.
      def lgW(v: Long): Int = 63 - java.lang.Long.numberOfLeadingZeros(v)
      def childRowsOf(span: Long): Int = lgW(span) - lgW(S * W) + 1
      sealed trait PNode
      final case class PDirect(slot: Int, off: Long, size: Long)
          extends PNode
      final case class PIndirect(off: Long, span: Long, nrows: Int,
                                 entries: Seq[PNode]) extends PNode
      var nextSlot = 0
      def planEntries(nrows: Int, base: Long): Seq[PNode] = {
        var off = base
        (0 until nrows).flatMap { r =>
          (0 until W).map { _ =>
            val span = rowSize(r)
            val here = off
            off += span
            if (r < maxDirectRows) {
              val n = PDirect(nextSlot, here, span); nextSlot += 1; n
            } else PIndirect(here, span, childRowsOf(span),
              planEntries(childRowsOf(span), here))
          }
        }
      }
      // 12 root rows plan megabytes of managed space — far above any
      // fixture; the require below stays loud if ever exceeded
      val maxRootRows = 12
      val rootEntries = planEntries(maxRootRows, 0L)
      def directsUnder(n: PNode): Seq[PDirect] = n match {
        case d: PDirect => Seq(d)
        case i: PIndirect => i.entries.flatMap(directsUnder)
      }
      val slotPlan: Vector[PDirect] =
        rootEntries.flatMap(directsUnder).toVector
      final case class Blk(heapOff: Long, size: Long,
                           objs: mutable.ArrayBuffer[(Long, Array[Byte])])
      val blocks = mutable.ArrayBuffer.empty[Blk]
      def newBlock(): Blk = {
        val idx = blocks.length
        require(idx < slotPlan.length,
          s"fractal heap $owner: bodies exceed the $maxRootRows-row plan")
        val sl = slotPlan(idx)
        val blk = Blk(sl.off, sl.size, mutable.ArrayBuffer.empty)
        blocks += blk
        blk
      }
      var cur = newBlock()
      var used = hdrSize.toLong
      // huge objects: (file address, length, huge id), 1-based ids
      val hugeRecs = mutable.ArrayBuffer.empty[(Long, Long, Long)]
      var managedCount = 0L
      var tinyCount = 0L
      var tinySize = 0L
      val heapIds = bodies.map { body =>
        if (body.length <= tinyCap) {
          tinyCount += 1
          tinySize += body.length
          if (heapIdLen > 18)
            padId(b1(0x20 | ((body.length - 1) >> 8)) ++
              b1((body.length - 1) & 0xff) ++ body)
          else padId(b1(0x20 | (body.length - 1)) ++ body)
        } else if (body.length > maxDirect - hdrSize) {
          val addr = put(body)
          val id = hugeRecs.length + 1L
          hugeRecs += ((addr, body.length.toLong, id))
          padId(b1(0x10) ++ bN(id, math.min(8, heapIdLen - 1)))
        } else {
          managedCount += 1
          // grid blocks double by row: advance (skipping runt blocks —
          // they stay allocated and empty, which is valid free space)
          // until the body fits; the slot-plan bound in newBlock keeps
          // this loud if it ever cannot
          while (used + body.length > cur.size) {
            cur = newBlock(); used = hdrSize.toLong
          }
          val objOff = cur.heapOff + used
          cur.objs += ((objOff, body))
          used += body.length
          // length field caps at 8 bytes; wider IDs are zero padding
          padId(b1(0) ++ b4(objOff) ++
            bN(body.length.toLong, math.min(lenBytes, 8)))
        }
      }
      val hugeBtAddr =
        if (hugeRecs.isEmpty) -1L
        else writeV2BtreeRecords(
          hugeRecs.toSeq.map { case (a, l, i) => b8(a) ++ b8(l) ++ b8(i) },
          btType = 1, recSize = 24, nodeSize = 512)
      val singleDirect = blocks.length == 1
      // root rows touched by the last allocated slot (rootEntries is
      // row-major, W entries per row)
      val curRows =
        if (singleDirect) 0
        else {
          var count = 0
          var row = 0
          rootEntries.zipWithIndex.foreach { case (e, i) =>
            val ds = directsUnder(e).size
            if (blocks.length - 1 >= count && blocks.length - 1 < count + ds)
              row = i / W
            count += ds
          }
          row + 1
        }

      // deflate-filter pipeline message (the 0x000B body), v2 encoding
      val pipelineMsg: Array[Byte] =
        if (!filtered) Array.empty
        else b1(2) ++ b1(1) ++ (b2(1) ++ b2(0) ++ b2(1) ++ b4(6))

      // the FRHP header rendered for a given root address + (filtered
      // single-direct) stored size — length is value-independent, so
      // the caller can reserve the header region up front
      def renderFrhpHeader(rootField: Long, singleStored: Long)
          : Array[Byte] = {
        val hd = mutable.ArrayBuffer.empty[Byte]
        hd ++= "FRHP".getBytes("US-ASCII")
        hd ++= b1(0)
        hd ++= b2(heapIdLen)
        hd ++= b2(pipelineMsg.length) // I/O filter info length (0 = none)
        hd ++= b1(0) // flags: direct blocks not checksummed
        hd ++= b4(maxDirect) // max size of managed objects
        hd ++= b8(hugeRecs.length + 1L) // next huge object id
        hd ++= (if (hugeRecs.isEmpty) Undef else b8(hugeBtAddr))
        hd ++= b8(0) // free space
        hd ++= Undef // free-space manager
        val managed = blocks.map(_.size).sum
        hd ++= b8(managed) // managed space
        hd ++= b8(managed) // allocated managed space
        hd ++= b8(managed) // iterator offset
        hd ++= b8(managedCount) // managed object count
        hd ++= b8(hugeRecs.map(_._2).sum) ++ b8(hugeRecs.length.toLong)
        hd ++= b8(tinySize) ++ b8(tinyCount)
        hd ++= b2(W)
        hd ++= b8(S)
        hd ++= b8(maxDirect)
        hd ++= b2(32) // maximum heap size (bits) -> 4-byte offsets
        hd ++= b2(1) // starting rows in root indirect block
        hd ++= b8(rootField)
        hd ++= b2(curRows) // 0 = root is a direct block
        if (filtered) {
          if (singleDirect) hd ++= b8(singleStored) ++ b4(0)
          hd ++= pipelineMsg
        }
        hd ++= b4(0)
        hd.toArray
      }

      // render every direct block (the header address is fixed at base
      // before any block renders — no fixpoint)
      def renderBlock(blk: Blk, frhpAddr: Long): Array[Byte] = {
        val out = mutable.ArrayBuffer.empty[Byte]
        out ++= "FHDB".getBytes("US-ASCII")
        out ++= b1(0)
        out ++= b8(frhpAddr)
        out ++= b4(blk.heapOff)
        blk.objs.foreach { case (objOff, body) =>
          require(blk.heapOff + out.length == objOff, "heap packing drift")
          out ++= body
        }
        while (out.length < blk.size) out += 0
        out.toArray
      }

      // address plan: direct blocks (stored size when filtered), then
      // FHIB (if any), then FRHP. The FHDB embeds the heap-header
      // address, which depends on stored sizes — and stored (deflated)
      // sizes depend on block content. Resolve by fixpoint: deflate
      // with a candidate frhpAddr, recompute, repeat until stable
      // (an 8-byte field change moves sizes by at most a few bytes;
      // two rounds settle in practice, the loop is bounded anyway).
      // child FHIBs to emit: every indirect node covering an allocated
      // slot, POST-ORDER (children before parents — parents embed their
      // addresses); the root FHIB is emitted last, after the children
      val nBlocks = blocks.length
      def usedIndirects(n: PNode): Seq[PIndirect] = n match {
        case _: PDirect => Nil
        case i: PIndirect =>
          if (!directsUnder(i).exists(_.slot < nBlocks)) Nil
          else i.entries.flatMap(usedIndirects) :+ i
      }
      val childIbs: Seq[PIndirect] =
        if (singleDirect) Nil else rootEntries.flatMap(usedIndirects)
      def fhibSizeOf(nrows: Int): Long = {
        val nDirect = math.min(nrows, maxDirectRows) * W
        val nInd = nrows * W - nDirect
        val dEntry = if (filtered) 8 + 8 + 4 else 8
        (4 + 1 + 8 + 4 + nDirect * dEntry + nInd * 8 + 4).toLong
      }
      val childSizes = childIbs.map(i => fhibSizeOf(i.nrows))
      val rootIbSize = if (singleDirect) 0L else fhibSizeOf(curRows)

      // the FRHP header is RESERVED at base and patched at the end, so
      // its address is known before any FHDB renders — the r15 deflate
      // fixpoint (stored sizes depend on the embedded header address,
      // which depends on stored sizes) oscillated once nesting put
      // hundreds of filtered blocks in play; with the header first the
      // plan is single-pass
      val base = pos
      val frhpAddr = base
      val headerLen = renderFrhpHeader(0L, 0L).length
      put(zeros(headerLen))
      val rendered = blocks.toSeq.map(blk => renderBlock(blk, frhpAddr))
      val storedSizes =
        if (filtered) rendered.map(r => deflateBytes(r).length.toLong)
        else blocks.toSeq.map(_.size)
      val blockAddrs = storedSizes.scanLeft(base + headerLen)(_ + _).init
      val childAddrs: Map[Long, Long] = childIbs
        .zip(childSizes.scanLeft(base + headerLen + storedSizes.sum)(_ + _)
          .init)
        .map { case (n, a) => n.off -> a }.toMap
      val rootIbAddr = base + headerLen + storedSizes.sum + childSizes.sum

      rendered.zip(blockAddrs).foreach { case (raw, addr) =>
        val out = if (filtered) deflateBytes(raw) else raw
        require(put(out) == addr, "fractal heap address plan drift (block)")
      }
      // entry renderers: direct entries carry (stored size, mask) when
      // filtered; INDIRECT entries are address-only in either mode
      def renderFhib(off: Long, nrows: Int, entries: Seq[PNode])
          : Array[Byte] = {
        val ib = mutable.ArrayBuffer.empty[Byte]
        ib ++= "FHIB".getBytes("US-ASCII")
        ib ++= b1(0)
        ib ++= b8(frhpAddr)
        ib ++= b4(off)
        entries.take(nrows * W).foreach {
          case PDirect(slot, _, _) =>
            if (slot < nBlocks) {
              ib ++= b8(blockAddrs(slot))
              if (filtered) ib ++= b8(storedSizes(slot)) ++ b4(0)
            } else {
              ib ++= Undef
              if (filtered) ib ++= b8(0) ++ b4(0)
            }
          case pi: PIndirect =>
            childAddrs.get(pi.off) match {
              case Some(a) => ib ++= b8(a)
              case None => ib ++= Undef
            }
        }
        ib ++= b4(0)
        ib.toArray
      }
      childIbs.foreach { ci =>
        require(put(renderFhib(ci.off, ci.nrows, ci.entries)) ==
          childAddrs(ci.off), "fractal heap address plan drift (child FHIB)")
      }
      if (!singleDirect)
        require(put(renderFhib(0L, curRows, rootEntries)) == rootIbAddr,
          "fractal heap address plan drift (FHIB)")
      val hd = renderFrhpHeader(
        if (singleDirect) blockAddrs.head else rootIbAddr,
        if (filtered && singleDirect) storedSizes.head else 0L)
      require(hd.length == headerLen, "FRHP header length drift")
      var hi = 0
      while (hi < hd.length) { buf((base + hi).toInt) = hd(hi); hi += 1 }
      (frhpAddr, heapIds)
    }

    /** DENSE attribute storage (libhdf5 beyond 8 attributes): attribute-
      * message bodies land as managed fractal-heap objects (8-byte heap
      * IDs) indexed by a type-8 name-hash v2 b-tree; returns the
      * Attribute Info message naming both. Without this leg a modern
      * file's attributes would read as silently MISSING, not as a
      * refusal — the worst failure class. */
    private def denseAttrMessage(owner: String, attrs: Seq[(String, Attr)],
                                 idExtra: Int = 0, filtered: Boolean = false,
                                 shared: Boolean = false,
                                 sohm: Boolean = false): (Int, Array[Byte]) = {
      // shared (r15): the heap object is a committed Shared Message
      // (version 3, type 2) naming a standalone object header that
      // carries the real attribute message — the encoding the reader's
      // shared-flag leg resolves. sohm (r16): a v3 TYPE-1 Shared
      // Message instead — an 8-byte ID into the file-level SOHM heap
      // (written up front by write()'s pre-pass)
      val bodies = attrs.map { case (nm, a) =>
        val msg = encodeAttr(nm, a)._2
        if (sohm) nm -> (b1(3) ++ b1(1) ++ sohmIdByBody.getOrElse(msg.toSeq,
          sys.error(s"$owner: attribute $nm missing from the SOHM pre-pass")))
        else if (!shared) nm -> msg
        else nm -> (b1(3) ++ b1(2) ++ b8(writeHeader(Seq((0x000C, msg)))))
      }
      val (frhpAddr, heapIds) = writeFractalHeap(
        s"$owner (attrs)", bodies.map(_._2), idLenBytes = 3, idExtra, filtered)
      val heapIdLen = 1 + 4 + 3 + idExtra
      val flagByte = if (shared || sohm) 1 else 0
      val records = bodies.zip(heapIds).map { case ((nm, _), id) =>
        (lookup3(nm.getBytes("UTF-8")).toLong & 0xffffffffL, id)
      }.sortBy(_._1).map { case (h, id) =>
        id ++ b1(flagByte) ++ b4(0) ++ b4(h) // heap ID, msg flags, corder, hash
      }
      val bthdAddr = writeV2BtreeRecords(records, btType = 8,
        recSize = heapIdLen + 1 + 4 + 4, nodeSize = 512)
      (0x0015, b1(0) ++ b1(0) ++ b8(frhpAddr) ++ b8(bthdAddr))
    }

    private def attrMessages(owner: String, attrs: Seq[(String, Attr)],
                             dense: Boolean, idExtra: Int = 0,
                             filtered: Boolean = false,
                             shared: Boolean = false,
                             sohm: Boolean = false): Seq[(Int, Array[Byte])] =
      if (dense && attrs.nonEmpty)
        Seq(denseAttrMessage(owner, attrs, idExtra, filtered, shared, sohm))
      else attrs.map { case (nm, a) => encodeAttr(nm, a) }

    /** Dense-link group (libhdf5 1.8+ beyond 8 links): link-message
      * bodies land as MANAGED objects in a fractal heap (7-byte heap
      * IDs), indexed by a type-5 name-hash v2 b-tree; the object header
      * carries a Link Info message naming both. */
    private def writeDenseGroup(g: Group): Long = {
      val childAddrs = g.children.map(c => c.name -> writeNode(c))
      val bodies = childAddrs.map { case (nm, addr) =>
        val nb = nm.getBytes("UTF-8")
        require(nb.length <= 255, s"link name too long: $nm")
        nm -> (b1(1) ++ b1(0) ++ b1(nb.length) ++ nb ++ b8(addr))
      }
      val (frhpAddr, heapIdSeq) = writeFractalHeap(
        s"group ${g.name}", bodies.map(_._2), idLenBytes = 2,
        g.heapIdExtra, g.heapFiltered)
      val heapIds = bodies.map(_._1).zip(heapIdSeq).toMap

      // name-index v2 b-tree: type-5 records (hash, heap ID), unsigned
      // hash sort order
      val records = bodies.map { case (nm, _) =>
        (lookup3(nm.getBytes("UTF-8")).toLong & 0xffffffffL, heapIds(nm))
      }.sortBy(_._1).map { case (h, id) => b4(h) ++ id }
      val bthdAddr = writeV2BtreeRecords(records, btType = 5,
        recSize = 4 + 7 + g.heapIdExtra, nodeSize = 512)

      val msgs = mutable.ArrayBuffer.empty[(Int, Array[Byte])]
      msgs += ((0x0002, b1(0) ++ b1(0) ++ b8(frhpAddr) ++ b8(bthdAddr)))
      msgs ++= attrMessages(g.name, g.attrs, g.denseAttrs,
        g.heapIdExtra, g.heapFiltered, g.sharedAttrs, g.sohmAttrs)
      writeHeader(msgs.toSeq)
    }

    private def writeGroup(g: Group): Long = {
      if (g.dense) return writeDenseGroup(g)
      require(g.children.size <= 64,
        s"group ${g.name}: ${g.children.size} links exceed the single-SNOD writer bound")
      // children first (bottom-up addresses)
      val childAddrs = g.children.map(c => c.name -> writeNode(c))

      // local heap: names at offsets; offset 0 byte is NUL (empty string)
      val heapData = mutable.ArrayBuffer.empty[Byte]
      heapData ++= zeros(8)
      val nameOffsets = childAddrs.map { case (nm, _) =>
        val off = heapData.length.toLong
        heapData ++= nm.getBytes("UTF-8")
        heapData ++= zeros(1)
        nm -> off
      }.toMap
      while (heapData.length % 8 != 0) heapData += 0
      val heapDataAddr = put(heapData.toArray)
      val heapHeader = "HEAP".getBytes("US-ASCII") ++ b1(0) ++ zeros(3) ++
        b8(heapData.length.toLong) ++ Undef ++ b8(heapDataAddr)
      val heapAddr = put(heapHeader)

      // one SNOD with name-sorted entries
      val sorted = childAddrs.sortBy(_._1)
      val snod = mutable.ArrayBuffer.empty[Byte]
      snod ++= "SNOD".getBytes("US-ASCII")
      snod ++= b1(1)
      snod ++= b1(0)
      snod ++= b2(sorted.length)
      for ((nm, addr) <- sorted) {
        snod ++= b8(nameOffsets(nm))
        snod ++= b8(addr)
        snod ++= b4(0) // cache type
        snod ++= b4(0)
        snod ++= zeros(16)
      }
      val snodAddr = put(snod.toArray)

      // B-tree: single level-0 node with the one SNOD child
      val bt = mutable.ArrayBuffer.empty[Byte]
      bt ++= "TREE".getBytes("US-ASCII")
      bt ++= b1(0) // node type: group
      bt ++= b1(0) // level
      bt ++= b2(if (sorted.isEmpty) 0 else 1)
      bt ++= Undef
      bt ++= Undef
      if (sorted.nonEmpty) {
        bt ++= b8(nameOffsets(sorted.head._1)) // key 0: first name
        bt ++= b8(snodAddr)
        bt ++= b8(nameOffsets(sorted.last._1)) // key 1: last name
      }
      val btreeAddr = put(bt.toArray)

      val msgs = mutable.ArrayBuffer.empty[(Int, Array[Byte])]
      msgs += ((0x0011, b8(btreeAddr) ++ b8(heapAddr)))
      msgs ++= attrMessages(g.name, g.attrs, g.denseAttrs,
        g.heapIdExtra, g.heapFiltered, g.sharedAttrs, g.sohmAttrs)
      writeHeader(msgs.toSeq)
    }
  }
}
