package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Hdf5, Hdf5Writer => W}
import graft.sources.Hdf5.{H5Group, H5Value}

/** The HDF5 container subset: files emitted by the spec-conformant
  * fixture writer are decoded by the independent parser ([[Hdf5]]'s
  * scaladoc lists the subset; reference parquet.py reads the same
  * structures through h5py). */
class Hdf5Spec extends AnyFunSuite {

  private def L(v: H5Value): Seq[Long] = H5Value.longs(v).toSeq
  private def D(v: H5Value): Seq[Double] = H5Value.doubles(v).toSeq
  private def S(v: H5Value): Seq[String] = v.asInstanceOf[Hdf5.H5Strings].values.toSeq

  private def roundtrip(nodes: Seq[W.Node],
                        rootAttrs: Seq[(String, W.Attr)] = Nil): H5Group =
    Hdf5.open(W.write(nodes, rootAttrs))

  test("superblock signature is the spec's 8 magic bytes") {
    val bytes = W.write(Seq(W.scalarLong("x", 1)))
    assert(bytes.take(8).toSeq ==
      Seq(0x89, 'H', 'D', 'F', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    val ex = intercept[RuntimeException](Hdf5.open("not an hdf5 file".getBytes))
    assert(ex.getMessage.contains("superblock"))
  }

  test("contiguous numeric datasets roundtrip at every width") {
    val root = roundtrip(Seq(
      W.Dataset("i64", W.LongData(Array(-5L, 0L, 1L << 40), 8, signed = true)),
      W.Dataset("i32", W.LongData(Array(-7L, 123456789L), 4, signed = true)),
      W.Dataset("u32", W.LongData(Array(0L, 4000000000L), 4, signed = false)),
      W.Dataset("i16", W.LongData(Array(-300L, 300L), 2, signed = true)),
      W.Dataset("u8", W.LongData(Array(0L, 255L), 1, signed = false)),
      W.Dataset("f64", W.DoubleData(Array(0.5, -2.25, 1e300), 8)),
      W.Dataset("f32", W.DoubleData(Array(1.5, -0.25), 4))))
    assert(L(root.dataset("i64").get.read()) == Seq(-5L, 0L, 1L << 40))
    assert(L(root.dataset("i32").get.read()) == Seq(-7L, 123456789L))
    assert(L(root.dataset("u32").get.read()) == Seq(0L, 4000000000L))
    assert(L(root.dataset("i16").get.read()) == Seq(-300L, 300L))
    assert(L(root.dataset("u8").get.read()) == Seq(0L, 255L))
    assert(D(root.dataset("f64").get.read()) == Seq(0.5, -2.25, 1e300))
    assert(D(root.dataset("f32").get.read()) == Seq(1.5, -0.25))
  }

  test("fixed and variable-length strings roundtrip") {
    val root = roundtrip(Seq(
      W.Dataset("fixed", W.StringData(Array("alpha", "b", ""))),
      W.Dataset("vlen", W.VlenStringData(
        Array("variable", "", "a much longer string value", "x"))),
      W.scalarStr("scalar", "REF_L")))
    assert(S(root.dataset("fixed").get.read()) == Seq("alpha", "b", ""))
    assert(S(root.dataset("vlen").get.read()) ==
      Seq("variable", "", "a much longer string value", "x"))
    val s = root.dataset("scalar").get
    assert(s.dims.isEmpty && S(s.read()) == Seq("REF_L"))
  }

  test("chunked layout with shuffle+deflate filters and a partial edge chunk") {
    val values = Array.tabulate(1000)(i => (i.toLong * 37) % 1013)
    val doubles = Array.tabulate(777)(i => i / 64.0)
    val root = roundtrip(Seq(
      W.Dataset("packed", W.LongData(values, 8, signed = true),
        chunk = 256, deflate = true, shuffle = true),
      W.Dataset("plainchunks", W.DoubleData(doubles, 8), chunk = 100),
      W.Dataset("deflated", W.LongData(values, 4, signed = true),
        chunk = 300, deflate = true)))
    assert(L(root.dataset("packed").get.read()) == values.toSeq)
    assert(D(root.dataset("plainchunks").get.read()) == doubles.toSeq)
    assert(L(root.dataset("deflated").get.read()) == values.toSeq)
  }

  test("v2 filter pipeline message (no Name Length for ids < 256) parses") {
    // HDF5 1.10+ writers emit pipeline message v2, whose filter
    // descriptions for ids < 256 OMIT the Name Length field entirely:
    // flags and client-value count sit at +2/+4, values unpadded.
    val values = Array.tabulate(900)(i => (i.toLong * 41) % 997)
    val root = roundtrip(Seq(
      W.Dataset("v2packed", W.LongData(values, 8, signed = true),
        chunk = 256, deflate = true, shuffle = true, pipelineV2 = true),
      W.Dataset("v2deflate", W.LongData(values, 4, signed = true),
        chunk = 300, deflate = true, pipelineV2 = true)))
    assert(L(root.dataset("v2packed").get.read()) == values.toSeq)
    assert(L(root.dataset("v2deflate").get.read()) == values.toSeq)
  }

  test("user-block file resolves addresses relative to the superblock") {
    // Superblock at 512 (then 1024): every stored address is relative
    // to that base, not an absolute file offset (spec §II).
    for (ub <- Seq(512, 1024)) {
      val values = Array.tabulate(500)(i => i.toLong * 3)
      val bytes = W.write(Seq(
        W.Dataset("d", W.LongData(values, 8, signed = true),
          chunk = 128, deflate = true),
        W.Group("g", Seq(W.scalarStr("name", "blocked")))), userBlock = ub)
      assert(bytes.take(8).forall(_ == 0))
      val root = Hdf5.open(bytes)
      assert(L(root.dataset("d").get.read()) == values.toSeq)
      assert(S(root.group("g").get.dataset("name").get.read()) == Seq("blocked"))
    }
  }

  test("nested symbol-table groups walk by path") {
    val root = roundtrip(Seq(
      W.Group("entry", Seq(
        W.scalarLong("run_number", 218386L),
        W.Group("DASlogs", Seq(
          W.Group("proton_charge", Seq(
            W.Dataset("time", W.DoubleData(Array(0.0, 1.0 / 60))),
            W.Dataset("value", W.DoubleData(Array(12.5, 12.75))))))),
        W.Group("instrument", Seq(W.scalarStr("name", "REF_L")))))))
    assert(Hdf5.H5Value.scalarLong(
      root.dataset("entry/run_number").get.read()) == Some(218386L))
    assert(D(root.dataset("entry/DASlogs/proton_charge/value").get.read()) ==
      Seq(12.5, 12.75))
    assert(Hdf5.H5Value.scalarString(
      root.dataset("entry/instrument/name").get.read()) == Some("REF_L"))
    assert(root.group("entry/DASlogs").get.childrenInOrder.map(_._1) ==
      Seq("proton_charge"))
  }

  test("attributes decode on groups, datasets, and the root") {
    val root = roundtrip(
      Seq(
        W.Group("entry", Seq(
          W.scalarStr("title", "t", attrs = Seq("units" -> W.AttrStr("none")))),
          attrs = Seq("NX_class" -> W.AttrStr("NXentry"),
            "version" -> W.AttrLong(4L),
            "weight" -> W.AttrDouble(2.5)))),
      rootAttrs = Seq("file_name" -> W.AttrStr("run_1.nxs.h5")))
    assert(Hdf5.H5Value.scalarString(root.attributes("file_name")) ==
      Some("run_1.nxs.h5"))
    val entry = root.group("entry").get
    assert(Hdf5.H5Value.scalarString(entry.attributes("NX_class")) == Some("NXentry"))
    assert(Hdf5.H5Value.scalarLong(entry.attributes("version")) == Some(4L))
    assert(Hdf5.H5Value.scalarDouble(entry.attributes("weight")) == Some(2.5))
    assert(Hdf5.H5Value.scalarString(
      entry.dataset("title").get.attributes("units")) == Some("none"))
  }

  test("empty datasets and empty groups are readable") {
    val root = roundtrip(Seq(
      W.Dataset("none", W.LongData(Array.empty[Long], 8, signed = true)),
      W.Group("emptygroup", Nil)))
    assert(L(root.dataset("none").get.read()).isEmpty)
    assert(root.group("emptygroup").get.childrenInOrder.isEmpty)
  }

  test("channel-backed source reads lazily from disk") {
    val values = Array.tabulate(500)(i => i.toLong * 3)
    val bytes = W.write(Seq(
      W.Group("entry", Seq(
        W.Dataset("data", W.LongData(values, 8, signed = true),
          chunk = 128, deflate = true)))))
    val f = java.nio.file.Files.createTempFile("graft_h5_", ".h5")
    try {
      java.nio.file.Files.write(f, bytes)
      val root = Hdf5.open(f)
      assert(L(root.dataset("entry/data").get.read()) == values.toSeq)
    } finally java.nio.file.Files.deleteIfExists(f)
  }

  test("superblock v2 + OHDR root with compact link messages parses") {
    // hand-transcribed from the spec (the 1.10+ writer layout the
    // classic-format fixture writer does not emit): v2 superblock,
    // v2 `OHDR` root group holding one hard-link message to a dataset
    // with a v1 header
    val out = new java.io.ByteArrayOutputStream()
    def b(vs: Int*): Unit = vs.foreach(out.write)
    def le2(v: Int): Unit = b(v & 0xff, (v >> 8) & 0xff)
    def le4(v: Long): Unit = (0 until 4).foreach(i => b(((v >> (8 * i)) & 0xff).toInt))
    def le8(v: Long): Unit = (0 until 8).foreach(i => b(((v >> (8 * i)) & 0xff).toInt))

    out.write(new Array[Byte](48)) // superblock v2 placeholder

    val dataAddr = out.size()
    Seq(11L, 22L, 33L).foreach(le8)

    val dsetAddr = out.size()
    b(1, 0); le2(3); le4(1); le4(80); le4(0) // v1 prefix + pad
    b(0x01, 0x00); le2(16); b(0, 0, 0, 0) // dataspace msg header
    b(1, 1, 0, 0, 0, 0, 0, 0); le8(3) // v1 simple, rank 1, dim 3
    b(0x03, 0x00); le2(16); b(0, 0, 0, 0) // datatype msg header
    b(0x10, 0x08, 0, 0); le4(8); le2(0); le2(64); le4(0) // i64 + pad
    b(0x08, 0x00); le2(24); b(0, 0, 0, 0) // layout msg header
    b(3, 1); le8(dataAddr); le8(24); b(0, 0, 0, 0, 0, 0) // contiguous + pad

    val rootAddr = out.size()
    b('O', 'H', 'D', 'R', 2, 0x00) // version 2, flags: 1-byte chunk0 size
    b(16) // size of chunk 0
    b(0x06); le2(12); b(0x00) // link message, 12 bytes, flags 0
    b(1, 0x00, 1, 'd'); le8(dsetAddr) // v1 hard link "d"
    le4(0) // (unverified) checksum

    val bytes = out.toByteArray
    def patch8(pos: Int, v: Long): Unit =
      (0 until 8).foreach(i => bytes(pos + i) = ((v >> (8 * i)) & 0xff).toByte)
    System.arraycopy(
      Array(0x89, 'H', 'D', 'F', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte),
      0, bytes, 0, 8)
    bytes(8) = 2; bytes(9) = 8; bytes(10) = 8; bytes(11) = 0
    patch8(12, 0L) // base address
    patch8(20, -1L) // superblock extension: undefined
    patch8(28, bytes.length.toLong) // EOF
    patch8(36, rootAddr.toLong) // root object header

    val root = Hdf5.open(bytes)
    assert(root.childrenInOrder.map(_._1) == Seq("d"))
    assert(L(root.dataset("d").get.read()) == Seq(11L, 22L, 33L))
  }

  test("fractal-heap dense groups decode: single direct block") {
    // ≤ 8-ish links still fitting one 256-byte starting block: root
    // block address IS the direct block (current rows = 0)
    val children = (0 until 6).map(i =>
      W.Dataset(s"d$i", W.LongData(Array.tabulate(7)(j => j.toLong * 3 + i))))
    val root = roundtrip(Seq(W.Group("dense", children, dense = true)))
    val g = root.group("dense").get
    assert(g.childrenInOrder.map(_._1).sorted == (0 until 6).map(i => s"d$i"))
    for (i <- 0 until 6)
      assert(L(g.dataset(s"d$i").get.read()) ==
        Array.tabulate(7)(j => j.toLong * 3 + i).toSeq, s"d$i")
  }

  test("fractal-heap dense groups decode: root indirect block, doubling " +
    "rows, deep name b-tree") {
    // 150 links → link bodies overflow rows 0-1 (4×256 + 4×256) into
    // the doubled row-2 blocks, and the 150 type-5 records overflow a
    // single 512-byte b-tree leaf (45 records/leaf → depth 1). This is
    // the modern facility-file shape: a DASlogs group with dozens of
    // devices, written dense by libhdf5.
    val names = (0 until 150).map(i => f"device_log_$i%03d")
    val children = names.zipWithIndex.map { case (nm, i) =>
      W.scalarLong(nm, i.toLong * 17 - 5)
    }
    val root = roundtrip(Seq(W.Group("DASlogs", children, dense = true)))
    val g = root.group("DASlogs").get
    assert(g.childrenInOrder.map(_._1).sorted == names.sorted)
    names.zipWithIndex.foreach { case (nm, i) =>
      assert(L(g.dataset(nm).get.read()) == Seq(i.toLong * 17 - 5), nm)
    }
  }

  test("dense groups nest with classic groups and carry attributes") {
    val inner = (0 until 12).map(i =>
      W.Dataset(s"bank$i", W.LongData(Array(i.toLong, i * 2L))))
    val root = roundtrip(Seq(
      W.Group("entry", Seq(
        W.Group("instrument", inner,
          attrs = Seq("NX_class" -> W.AttrStr("NXinstrument")),
          dense = true),
        W.scalarStr("title", "dense fixture")))))
    val inst = root.group("entry").get.group("instrument").get
    assert(inst.attributes.get("NX_class").map(S(_).head)
      .contains("NXinstrument"))
    assert(inst.childrenInOrder.size == 12)
    assert(L(inst.dataset("bank7").get.read()) == Seq(7L, 14L))
  }

  test("dense ATTRIBUTE storage decodes (libhdf5 beyond 8 attrs)") {
    // the silent-gap class: attrs behind an Attribute Info message +
    // type-8 name index would read as MISSING without this leg. 30
    // attrs of every value kind; enough bodies to exercise heap packing
    // and the hash-sorted record walk; on a CLASSIC group
    val attrs = (0 until 30).flatMap { i =>
      Seq(f"as_$i%02d" -> (W.AttrStr(s"value $i"): W.Attr),
        f"al_$i%02d" -> (W.AttrLong(i.toLong * 31 - 7): W.Attr),
        f"ad_$i%02d" -> (W.AttrDouble(i * 2.5): W.Attr))
    }
    val root = roundtrip(Seq(
      W.Group("entry", Seq(W.scalarLong("n", 1L)),
        attrs = attrs, denseAttrs = true)))
    val g = root.group("entry").get
    assert(g.attributes.size == 90)
    for (i <- 0 until 30) {
      assert(S(g.attributes(f"as_$i%02d")).head == s"value $i")
      assert(L(g.attributes(f"al_$i%02d")).head == i.toLong * 31 - 7)
      assert(D(g.attributes(f"ad_$i%02d")).head == i * 2.5)
    }
  }

  test("dense attributes compose with dense links (the full modern shape)") {
    val children = (0 until 20).map(i =>
      W.scalarLong(f"log_$i%02d", i.toLong * 3))
    val attrs = (0 until 12).map(i =>
      f"meta_$i%02d" -> (W.AttrStr(s"m$i"): W.Attr))
    val root = roundtrip(Seq(
      W.Group("DASlogs", children, attrs = attrs,
        dense = true, denseAttrs = true)))
    val g = root.group("DASlogs").get
    assert(g.childrenInOrder.size == 20)
    assert(g.attributes.size == 12)
    assert(S(g.attributes("meta_05")).head == "m5")
    assert(L(g.dataset("log_13").get.read()) == Seq(39L))
  }

  test("TINY heap IDs decode: link data packed into the ID (normal form)") {
    // heapIdExtra 6 → 13-byte link heap IDs: an 11+1-byte link body
    // (single-char name) packs into the ID itself — libhdf5's tiny-
    // object rule; longer names stay managed, so both classes mix in
    // one heap
    val children = ('a' to 'f').map(c =>
      W.scalarLong(c.toString, c.toLong)) ++
      (0 until 4).map(i => W.scalarLong(f"managed_name_$i%02d", i * 7L))
    val root = roundtrip(Seq(
      W.Group("mix", children, dense = true, heapIdExtra = 6)))
    val g = root.group("mix").get
    assert(g.childrenInOrder.size == 10)
    ('a' to 'f').foreach(c =>
      assert(L(g.dataset(c.toString).get.read()) == Seq(c.toLong), c))
    (0 until 4).foreach(i =>
      assert(L(g.dataset(f"managed_name_$i%02d").get.read()) == Seq(i * 7L)))
  }

  test("TINY heap IDs decode: extended 12-bit form for wide IDs (attrs)") {
    // heapIdExtra 56 → 64-byte attribute heap IDs (> 18 → the extended
    // tiny encoding); whole attribute bodies ride inside the IDs
    val attrs = (0 until 10).flatMap { i =>
      Seq(f"t_$i%02d" -> (W.AttrLong(i.toLong * 13 - 4): W.Attr),
        f"s_$i%02d" -> (W.AttrStr(s"v$i"): W.Attr))
    }
    val root = roundtrip(Seq(
      W.Group("entry", Seq(W.scalarLong("n", 1L)),
        attrs = attrs, denseAttrs = true, heapIdExtra = 56)))
    val g = root.group("entry").get
    assert(g.attributes.size == 20)
    for (i <- 0 until 10) {
      assert(L(g.attributes(f"t_$i%02d")).head == i.toLong * 13 - 4)
      assert(S(g.attributes(f"s_$i%02d")).head == s"v$i")
    }
  }

  test("HUGE heap objects decode through the type-1 v2 b-tree") {
    // an attribute body beyond the 4 KiB max direct-block payload goes
    // standalone, resolved via the heap's huge-object b-tree — plus
    // ordinary managed attrs in the same heap
    val big1 = "A" * 6000
    val big2 = (0 until 5000).map(i => ('a' + i % 26).toChar).mkString
    val attrs = Seq(
      "huge_a" -> (W.AttrStr(big1): W.Attr),
      "huge_b" -> (W.AttrStr(big2): W.Attr),
      "small" -> (W.AttrLong(42L): W.Attr))
    val root = roundtrip(Seq(
      W.Group("entry", Seq(W.scalarLong("n", 1L)),
        attrs = attrs, denseAttrs = true)))
    val g = root.group("entry").get
    assert(S(g.attributes("huge_a")).head == big1)
    assert(S(g.attributes("huge_b")).head == big2)
    assert(L(g.attributes("small")).head == 42L)
  }

  test("FILTERED fractal heaps decode: deflated direct blocks, both roots") {
    // single-direct-block root (stored size in the heap header)…
    val few = (0 until 6).map(i => W.scalarLong(s"d$i", i.toLong * 3))
    val r1 = roundtrip(Seq(
      W.Group("small", few, dense = true, heapFiltered = true)))
    val g1 = r1.group("small").get
    (0 until 6).foreach(i =>
      assert(L(g1.dataset(s"d$i").get.read()) == Seq(i.toLong * 3)))
    // …and an indirect root (per-child stored sizes in the FHIB)
    val names = (0 until 150).map(i => f"device_log_$i%03d")
    val many = names.zipWithIndex.map { case (nm, i) =>
      W.scalarLong(nm, i.toLong * 17 - 5)
    }
    val r2 = roundtrip(Seq(
      W.Group("DASlogs", many, dense = true, heapFiltered = true)))
    val g2 = r2.group("DASlogs").get
    assert(g2.childrenInOrder.map(_._1).sorted == names.sorted)
    names.zipWithIndex.foreach { case (nm, i) =>
      assert(L(g2.dataset(nm).get.read()) == Seq(i.toLong * 17 - 5), nm)
    }
    // filtered attr heap too (shares the same block machinery)
    val attrs = (0 until 20).map(i =>
      f"m_$i%02d" -> (W.AttrStr(s"val $i"): W.Attr))
    val r3 = roundtrip(Seq(
      W.Group("entry", Seq(W.scalarLong("n", 1L)),
        attrs = attrs, denseAttrs = true, heapFiltered = true)))
    (0 until 20).foreach(i =>
      assert(S(r3.group("entry").get.attributes(f"m_$i%02d")).head == s"val $i"))
  }

  test("mid-size managed bodies advance to a doubled block (regression)") {
    // a body too big for the 256-byte starting blocks but under the
    // huge threshold must keep advancing through the doubling grid —
    // the r15 packing loop (a single advance corrupted the address
    // plan; before r15 this shape refused)
    val mid1 = "M" * 3000 // needs a row-5 (4096) block
    val mid2 = "N" * 600  // needs a row-2 (512) block
    val attrs = Seq(
      "mid1" -> (W.AttrStr(mid1): W.Attr),
      "mid2" -> (W.AttrStr(mid2): W.Attr),
      "small" -> (W.AttrLong(5L): W.Attr))
    val root = roundtrip(Seq(
      W.Group("entry", Seq(W.scalarLong("n", 1L)),
        attrs = attrs, denseAttrs = true)))
    val g = root.group("entry").get
    assert(S(g.attributes("mid1")).head == mid1)
    assert(S(g.attributes("mid2")).head == mid2)
    assert(L(g.attributes("small")).head == 5L)
  }

  test("NESTED indirect fractal-heap blocks roundtrip (r16: beyond one level)") {
    // ~700 managed bodies (~40 KB) overflow the 32 KB the direct rows
    // of a W=4/S=256/maxDirect=4096 heap cover — rows >= 6 of the root
    // indirect block then hold CHILD indirect blocks that restart the
    // doubling table; before r16 this shape refused by name
    val attrs = (0 until 700).map(i =>
      f"an_$i%04d" -> (W.AttrStr(s"payload value number $i"): W.Attr))
    val root = roundtrip(Seq(
      W.Group("entry", Seq(W.scalarLong("n", 1L)),
        attrs = attrs, denseAttrs = true)))
    val g = root.group("entry").get
    assert(g.attributes.size == 700)
    for (i <- Seq(0, 95, 367, 511, 699)) {
      assert(S(g.attributes(f"an_$i%04d")).head == s"payload value number $i")
    }
  }

  test("NESTED indirect blocks compose with FILTERED heaps") {
    // same overflow with deflate-filtered direct blocks: child FHIB
    // entries carry (stored size, mask) for DIRECT children only —
    // the variable-width entry walk is what this pins
    val attrs = (0 until 650).map(i =>
      f"zf_$i%04d" -> (W.AttrStr(s"compressible body $i " + "x" * 16): W.Attr))
    val root = roundtrip(Seq(
      W.Group("entry", Seq(W.scalarLong("n", 1L)),
        attrs = attrs, denseAttrs = true, heapFiltered = true)))
    val g = root.group("entry").get
    assert(g.attributes.size == 650)
    for (i <- Seq(1, 333, 649)) {
      assert(S(g.attributes(f"zf_$i%04d")).head ==
        s"compressible body $i " + "x" * 16)
    }
  }

  test("SOHM-TABLE-RESIDENT shared attributes roundtrip (r16: v3 type 1)") {
    // the file-level shared-message form: a v2 superblock's extension
    // names an SMTB whose index points at the shared-message fractal
    // heap; each dense record's heap object is a v3 TYPE-1 shared
    // message carrying an 8-byte ID into that heap. Two groups SHARE
    // identical attribute bodies — the dedup SOHM exists for — and one
    // carries non-shared values too.
    val shared = (0 until 10).map(i =>
      f"c_$i%02d" -> (W.AttrStr(s"common $i"): W.Attr))
    val own = Seq("mine" -> (W.AttrLong(42L): W.Attr))
    val root = roundtrip(Seq(
      W.Group("a", Seq(W.scalarLong("n", 1L)),
        attrs = shared ++ own, denseAttrs = true, sohmAttrs = true),
      W.Group("b", Seq(W.scalarLong("m", 2L)),
        attrs = shared, denseAttrs = true, sohmAttrs = true)))
    val ga = root.group("a").get
    val gb = root.group("b").get
    assert(ga.attributes.size == 11)
    assert(gb.attributes.size == 10)
    for (i <- 0 until 10) {
      assert(S(ga.attributes(f"c_$i%02d")).head == s"common $i")
      assert(S(gb.attributes(f"c_$i%02d")).head == s"common $i")
    }
    assert(L(ga.attributes("mine")).head == 42L)
  }

  test("SHARED dense attributes resolve through committed shared messages") {
    val attrs = (0 until 12).flatMap { i =>
      Seq(f"sa_$i%02d" -> (W.AttrStr(s"shared $i"): W.Attr),
        f"sl_$i%02d" -> (W.AttrLong(i.toLong * 5): W.Attr))
    }
    val root = roundtrip(Seq(
      W.Group("entry", Seq(W.scalarLong("n", 1L)),
        attrs = attrs, denseAttrs = true, sharedAttrs = true)))
    val g = root.group("entry").get
    assert(g.attributes.size == 24)
    for (i <- 0 until 12) {
      assert(S(g.attributes(f"sa_$i%02d")).head == s"shared $i")
      assert(L(g.attributes(f"sl_$i%02d")).head == i.toLong * 5)
    }
  }

  test("tiny + huge + filtered compose in one heap") {
    val attrs = Seq(
      "huge" -> (W.AttrStr("Z" * 5000): W.Attr),
      "mid" -> (W.AttrStr("m" * 100): W.Attr),
      "x" -> (W.AttrLong(7L): W.Attr))
    val root = roundtrip(Seq(
      W.Group("entry", Seq(W.scalarLong("n", 1L)),
        attrs = attrs, denseAttrs = true, heapIdExtra = 56,
        heapFiltered = true)))
    val g = root.group("entry").get
    assert(S(g.attributes("huge")).head == "Z" * 5000)
    assert(S(g.attributes("mid")).head == "m" * 100)
    assert(L(g.attributes("x")).head == 7L)
  }

  test("dense-link refusals stay loud: missing name index") {
    // a Link Info message with a DEFINED fractal heap but an UNDEFINED
    // name-index b-tree cannot enumerate links — named refusal
    val out = new java.io.ByteArrayOutputStream()
    def b(vs: Int*): Unit = vs.foreach(out.write)
    def le2(v: Int): Unit = b(v & 0xff, (v >> 8) & 0xff)
    def le8(v: Long): Unit = (0 until 8).foreach(i => b(((v >> (8 * i)) & 0xff).toInt))
    out.write(new Array[Byte](48)) // superblock v2 placeholder
    val rootAddr = out.size()
    b('O', 'H', 'D', 'R', 2, 0x00)
    b(22) // size of chunk 0
    b(0x02); le2(18); b(0x00) // link info message
    b(0, 0) // version, flags (no creation index)
    le8(0x1000L) // fractal heap address: DEFINED → dense storage
    le8(-1L) // name-index b-tree: UNDEFINED
    le8(0) // (unverified) checksum + slack
    val bytes = out.toByteArray
    def patch8(pos: Int, v: Long): Unit =
      (0 until 8).foreach(i => bytes(pos + i) = ((v >> (8 * i)) & 0xff).toByte)
    System.arraycopy(
      Array(0x89, 'H', 'D', 'F', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte),
      0, bytes, 0, 8)
    bytes(8) = 2; bytes(9) = 8; bytes(10) = 8; bytes(11) = 0
    patch8(12, 0L); patch8(20, -1L)
    patch8(28, bytes.length.toLong)
    patch8(36, rootAddr.toLong)
    val ex = intercept[RuntimeException](Hdf5.open(bytes))
    assert(ex.getMessage.contains("name-index b-tree"))
  }

  test("big-endian integers decode via the datatype byte-order bit") {
    // hand-patch a writer file: flip the byte-order bit of the i32
    // datatype and byte-swap the stored values — the decoded longs must
    // come out identical
    val values = Array(0x01020304L, -2L)
    val le = W.write(Seq(
      W.Dataset("d", W.LongData(values, 4, signed = true))))
    val leRoot = Hdf5.open(le.clone())
    // find the 8 raw data bytes (the values as LE) and swap each word
    val raw = Array(0x04, 0x03, 0x02, 0x01, 0xfe, 0xff, 0xff, 0xff)
      .map(_.toByte)
    val at = le.indexOfSlice(raw)
    assert(at > 0, "raw data not found")
    for (w <- 0 until 2; b <- 0 until 2) {
      val i = at + w * 4
      val tmp = le(i + b); le(i + b) = le(i + 3 - b); le(i + 3 - b) = tmp
    }
    // datatype: class/version 0x10, bits0 0x08 (signed LE) -> 0x09 (BE)
    val dt = le.indexOfSlice(Array(0x10, 0x08, 0, 0, 4, 0, 0, 0).map(_.toByte))
    assert(dt > 0, "datatype not found")
    le(dt + 1) = 0x09.toByte
    assert(L(Hdf5.open(le).dataset("d").get.read()) ==
      L(leRoot.dataset("d").get.read()))
  }

  test("compound datatype (struct array) decodes column-wise") {
    val times = Array.tabulate(200)(i => i.toLong * 100)
    val vals = Array.tabulate(200)(i => i / 64.0)
    val flags = Array.tabulate(200)(i => (i % 3).toLong)
    val root = roundtrip(Seq(
      W.Dataset("tv", W.CompoundData(Seq(
        "time" -> W.LongData(times, 8, signed = true),
        "value" -> W.DoubleData(vals, 8),
        "flag" -> W.LongData(flags, 2, signed = false)))),
      W.Dataset("mixed", W.CompoundData(Seq(
        "name" -> W.StringData(Array("a", "bb", "ccc")),
        "k" -> W.LongData(Array(1L, 2L, 3L), 4, signed = true))))))
    val tv = root.dataset("tv").get.read().asInstanceOf[Hdf5.H5Compound]
    assert(tv.members.map(_._1) == Seq("time", "value", "flag"))
    assert(L(tv.member("time").get) == times.toSeq)
    assert(D(tv.member("value").get) == vals.toSeq)
    assert(L(tv.member("flag").get) == flags.toSeq)
    val mx = root.dataset("mixed").get.read().asInstanceOf[Hdf5.H5Compound]
    assert(S(mx.member("name").get) == Seq("a", "bb", "ccc"))
    assert(L(mx.member("k").get) == Seq(1L, 2L, 3L))
  }

  test("layout v4 chunk indexes: single chunk, implicit, fixed array") {
    val values = Array.tabulate(1000)(i => (i.toLong * 37) % 1013)
    val root = roundtrip(Seq(
      W.Dataset("single", W.LongData(values, 8), chunk = 1000, layoutV4 = 1),
      W.Dataset("single_z", W.LongData(values, 8), chunk = 1000,
        deflate = true, shuffle = true, layoutV4 = 1),
      W.Dataset("implicit", W.LongData(values, 8), chunk = 128, layoutV4 = 2),
      W.Dataset("fixedarr", W.LongData(values, 8), chunk = 100, layoutV4 = 3),
      W.Dataset("fixedarr_z", W.LongData(values, 4), chunk = 100,
        deflate = true, layoutV4 = 3)))
    for (n <- Seq("single", "single_z", "implicit", "fixedarr", "fixedarr_z"))
      assert(L(root.dataset(n).get.read()) == values.toSeq, n)
  }

  test("layout v4 fixed array pages when entries exceed the page size") {
    // 40 chunks at pageBits=3 (8 entries/page) → 5 pages with bitmap +
    // per-page checksums — the wide-dataset shape of the 1.10 index
    val values = Array.tabulate(640)(i => i.toLong * 7 - 100)
    val root = roundtrip(Seq(
      W.Dataset("paged", W.LongData(values, 8), chunk = 16, layoutV4 = 3,
        faPageBits = 3),
      W.Dataset("paged_z", W.LongData(values, 8), chunk = 16, layoutV4 = 3,
        faPageBits = 3, deflate = true)))
    assert(L(root.dataset("paged").get.read()) == values.toSeq)
    assert(L(root.dataset("paged_z").get.read()) == values.toSeq)
  }

  test("layout v4 extensible array: inline, direct and secondary blocks") {
    val values = Array.tabulate(3000)(i => (i.toLong * 41) % 2027 - 500)
    val root = roundtrip(Seq(
      // 4 chunks → all elements inline in the index block
      W.Dataset("ea_inline", W.LongData(values, 8), chunk = 750, layoutV4 = 4),
      // 30 chunks at library defaults (idx 4, min 16) → index block +
      // two direct data blocks (super blocks 0 and 1)
      W.Dataset("ea_direct", W.LongData(values, 8), chunk = 100, layoutV4 = 4),
      W.Dataset("ea_direct_z", W.LongData(values, 4), chunk = 100,
        deflate = true, shuffle = true, layoutV4 = 4),
      // tiny creation parameters (idx 2, min 2, ptrs 2) → the index
      // block covers super blocks 0-1 only; 60 chunks reach SECONDARY
      // blocks several super-block generations deep
      W.Dataset("ea_sblk", W.LongData(values, 8), chunk = 50, layoutV4 = 4,
        eaParams = (2, 2, 2, 10)),
      W.Dataset("ea_sblk_z", W.LongData(values, 8), chunk = 50,
        deflate = true, layoutV4 = 4, eaParams = (2, 2, 2, 10)),
      // partial trailing chunk
      W.Dataset("ea_edge", W.LongData(values, 8), chunk = 77, layoutV4 = 4),
      // PAGED data blocks: page bound 2^2 = 4 elements, min block 16 →
      // every data block past the index block is paged (bitmap + page
      // checksums); 60 chunks also leave trailing pages uninitialized
      // in the last block (bitmap-clear bits must read as Undef)
      W.Dataset("ea_paged", W.LongData(values, 8), chunk = 50, layoutV4 = 4,
        eaParams = (4, 16, 4, 2)),
      W.Dataset("ea_paged_z", W.LongData(values, 4), chunk = 50,
        deflate = true, shuffle = true, layoutV4 = 4,
        eaParams = (4, 16, 4, 2))))
    for (n <- Seq("ea_inline", "ea_direct", "ea_direct_z", "ea_sblk",
      "ea_sblk_z", "ea_edge", "ea_paged", "ea_paged_z"))
      assert(L(root.dataset(n).get.read()) == values.toSeq, n)
  }

  test("layout v4 version-2 b-tree: depth 0 and depth 1 trees") {
    val values = Array.tabulate(2000)(i => (i.toLong * 53) % 3001 - 700)
    val root = roundtrip(Seq(
      // 4 records fit one leaf → depth 0 (root is the leaf)
      W.Dataset("bt_leaf", W.LongData(values, 8), chunk = 500, layoutV4 = 5),
      W.Dataset("bt_leaf_z", W.LongData(values, 8), chunk = 500,
        deflate = true, layoutV4 = 5),
      // node size 128 → 7 records/leaf, 4 records/internal (type 10) —
      // a depth-1 subtree caps at 39 records, so 40 chunks force a
      // depth-2 tree: BTIN root → BTIN internals (child pointers carry
      // the subtree-total field) → BTLF leaves; bt_edge (26 chunks)
      // stays depth 1
      W.Dataset("bt_deep", W.LongData(values, 8), chunk = 50, layoutV4 = 5,
        btNodeSize = 128),
      W.Dataset("bt_deep_z", W.LongData(values, 4), chunk = 50,
        deflate = true, shuffle = true, layoutV4 = 5, btNodeSize = 128),
      // partial trailing chunk through the deep tree
      W.Dataset("bt_edge", W.LongData(values, 8), chunk = 77, layoutV4 = 5,
        btNodeSize = 128)))
    for (n <- Seq("bt_leaf", "bt_leaf_z", "bt_deep", "bt_deep_z", "bt_edge"))
      assert(L(root.dataset(n).get.read()) == values.toSeq, n)
  }

  test("out-of-subset chunk indexes fail loudly by name") {
    // flip a fixed-array layout's index-type byte to 6 (unknown) and
    // expect the named refusal, not garbage
    val bytes = W.write(Seq(W.Dataset("d",
      W.LongData(Array.tabulate(64)(_.toLong), 8), chunk = 16, layoutV4 = 3)))
    // v4 chunked layout message data: [4, 2, flags, 1, 8, dim…, type]
    val idx = bytes.sliding(5).indexWhere(w =>
      w(0) == 4.toByte && w(1) == 2.toByte && w(2) == 0.toByte &&
        w(3) == 1.toByte && w(4) == 8.toByte)
    assert(idx >= 0)
    val typeAt = idx + 5 + 8
    assert(bytes(typeAt) == 3.toByte)
    bytes(typeAt) = 6.toByte
    val ex = intercept[RuntimeException](
      Hdf5.open(bytes).dataset("d").get.read())
    assert(ex.getMessage.contains("unknown v4 chunk index type 6"))
  }

  test("unsupported features fail loudly by name") {
    // a reference datatype (class 7) in a hand-corrupted message: take a
    // valid file and flip the datatype class byte of the lone dataset
    val bytes = W.write(Seq(W.Dataset("d", W.LongData(Array(1L, 2L), 8))))
    // find the fixed-point datatype encoding (0x10 version/class byte,
    // bit-field 0x08, size 8) and rewrite the class nibble to 7
    val idx = bytes.sliding(8).indexWhere(w =>
      w(0) == 0x10.toByte && w(1) == 0x08.toByte && w(4) == 8.toByte)
    assert(idx >= 0)
    bytes(idx) = 0x17.toByte
    val ex = intercept[RuntimeException](
      Hdf5.open(bytes).dataset("d").get.read())
    assert(ex.getMessage.contains("datatype class 7"))
  }
}
