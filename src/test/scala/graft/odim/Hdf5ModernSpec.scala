package graft.odim

import org.scalatest.funsuite.AnyFunSuite
import MiniHdf5Writer.{WDataset, WGroup}

/** Modern-HDF5 surface: the reference fixtures (written with libhdf5's
  * oldest format: superblock v0, v1 headers, symbol-table groups) are
  * structure-round-tripped through MiniHdf5Writer into the LATEST format
  * (superblock v3, 'OHDR' v2 headers, v3 attributes, compact + dense
  * new-style groups) and must parse back to identical attributes, datasets,
  * and — for VP files — identical decoded profile rows.
  */
class Hdf5ModernSpec extends AnyFunSuite {

  private val vpFixture =
    "/root/reference/tests/data/vp/bejab/2022/11/11/bejab_vp_20221111T233000Z_0x9.h5"

  /** Walk a parsed file into a writer tree (ints widened to 8 bytes: the
    * writer emits signed fixed-point, and decode semantics only consume
    * int-ness, not width; float widths are preserved — f32 matters).
    */
  private def toTree(f: Hdf5File, addr: Long): MiniHdf5Writer.Node = {
    val attrs = f.attributes(addr).toSeq.sortBy(_._1)
    if (f.objectHeader(addr).exists(_.typ == 0x0008)) {
      val dd = f.dataset(addr)
      WDataset(attrs, dd.dims, dd.values, dd.isInteger,
        if (dd.isInteger) 8 else dd.elemSize)
    } else {
      WGroup(attrs, f.groupChildren(addr).toSeq.sortBy(_._1)
        .map { case (n, a) => n -> toTree(f, a) })
    }
  }

  /** Canonical nested structure for comparison. */
  private def canon(f: Hdf5File, addr: Long): Any = {
    val attrs = f.attributes(addr)
    if (f.objectHeader(addr).exists(_.typ == 0x0008)) {
      val dd = f.dataset(addr)
      (attrs, dd.dims.toSeq, dd.values.toSeq, dd.isInteger)
    } else {
      (attrs, f.groupChildren(addr).toSeq.sortBy(_._1)
        .map { case (n, a) => n -> canon(f, a) })
    }
  }

  private def rewriteModern(path: String): (Hdf5File, Hdf5File) = {
    val orig = Hdf5File.read(path)
    val tree = toTree(orig, orig.rootHeaderAddr).asInstanceOf[WGroup]
    val modern = Hdf5File(MiniHdf5Writer.write(tree))
    (orig, modern)
  }

  test("v3 superblock + OHDR v2 rewrite parses to identical structure") {
    val (orig, modern) = rewriteModern(vpFixture)
    // dataset1 has 17 children -> exercises the DENSE group path; root and
    // the what/where/how groups are compact
    assert(modern.groupChildren(modern.resolve("dataset1").get).size ==
      orig.groupChildren(orig.resolve("dataset1").get).size)
    // `how` carries >8 attributes -> the writer stores them DENSELY
    // (attribute-info message + fractal heap + type-8 v2 B-tree) and the
    // reader must still see every one of them
    val howAddr = modern.resolve("how").get
    assert(modern.objectHeader(howAddr).exists(_.typ == 0x0015),
      "expected dense attribute storage on the how group")
    assert(modern.objectHeader(howAddr).forall(_.typ != 0x000C))
    assert(modern.attributes(howAddr) == orig.attributes(orig.resolve("how").get))
    assert(canon(modern, modern.rootHeaderAddr) == canon(orig, orig.rootHeaderAddr))
  }

  test("decoded VP profile rows are identical across formats") {
    val name = vpFixture.substring(vpFixture.lastIndexOf('/') + 1)
    val origBytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(vpFixture))
    val origRows = graft.vpts.VptsCsvV1.rows(
      graft.vpts.BirdProfile.fromOdim(
        OdimReader.checkVpOdim(OdimReader(origBytes, name)), name))
    val tree = toTree(Hdf5File(origBytes), Hdf5File(origBytes).rootHeaderAddr)
      .asInstanceOf[WGroup]
    val modernBytes = MiniHdf5Writer.write(tree)
    val modernRows = graft.vpts.VptsCsvV1.rows(
      graft.vpts.BirdProfile.fromOdim(
        OdimReader.checkVpOdim(OdimReader(modernBytes, name)), name))
    assert(modernRows == origRows)
  }

  test("all reference fixtures survive the modern rewrite") {
    val dir = java.nio.file.Paths.get("/root/reference/tests/data/vp")
    val files = java.nio.file.Files.walk(dir).iterator()
    var n = 0
    files.forEachRemaining { p =>
      if (p.toString.endsWith(".h5")) {
        val (orig, modern) = rewriteModern(p.toString)
        assert(canon(modern, modern.rootHeaderAddr) == canon(orig, orig.rootHeaderAddr),
          s"mismatch for $p")
        n += 1
      }
    }
    assert(n >= 6)
  }

  test("multi-block fractal heaps: large dense attr sets and 40-link groups round-trip") {
    // ~40 x 90B attr bodies exceed several 512-byte starting blocks, so the
    // heap takes the indirect-root doubling-table path on both dense links
    // and dense attributes
    val attrs = (0 until 40).map(i => f"attr_$i%02d" -> ("value-" * 12 + i): (String, Any))
    val children = (0 until 40).map { i =>
      f"leaf_$i%02d" -> (WDataset(Seq("tag" -> i.toLong), Array(3L),
        Array(i.toDouble, i + 0.5, i + 0.75), isInt = false, elemSize = 8): MiniHdf5Writer.Node)
    }
    val f = Hdf5File(MiniHdf5Writer.write(WGroup(attrs, children)))
    val root = f.rootHeaderAddr
    assert(f.groupChildren(root).size == 40)
    assert(f.attributes(root).size == 40)
    assert(f.attributes(root)("attr_07") == "value-" * 12 + 7)
    val leaf = f.resolve("leaf_39").get
    assert(f.dataset(leaf).values.toSeq == Seq(39.0, 39.5, 39.75))
    assert(f.attributes(leaf)("tag") == 39L)
  }

  test("NESTED indirect fractal heap: links beyond the direct rows resolve") {
    // heapMaxDirect = 1024 caps direct rows at 3 (4 x (512+512+1024) = 8 KB
    // of direct space); 120 links with ~180-byte names overflow into child
    // indirect blocks hanging off root rows >= 3
    val children = (0 until 120).map { i =>
      val name = f"leaf_$i%03d_" + "x" * 170
      name -> (WDataset(Seq("tag" -> i.toLong), Array(2L),
        Array(i.toDouble, i + 0.5), isInt = false, elemSize = 8): MiniHdf5Writer.Node)
    }
    val f = Hdf5File(MiniHdf5Writer.write(
      WGroup(Nil, children, heapMaxDirect = 1024L)))
    val got = f.groupChildren(f.rootHeaderAddr)
    assert(got.size == 120)
    val name77 = f"leaf_077_" + "x" * 170
    val leaf = f.resolve(name77).get
    assert(f.dataset(leaf).values.toSeq == Seq(77.0, 77.5))
    assert(f.attributes(leaf)("tag") == 77L)
  }

  test("FILTERED fractal heap: single deflated root direct block") {
    // few links -> the root IS a direct block; filtered heap deflates it
    // whole, stored size + mask live in the FRHP header
    val children = (0 until 9).map { i =>
      f"d_$i" -> (WDataset(Nil, Array(1L), Array(i * 3.0), isInt = false,
        elemSize = 8): MiniHdf5Writer.Node)
    }
    val f = Hdf5File(MiniHdf5Writer.write(
      WGroup(Nil, children, heapFiltered = true)))
    assert(f.groupChildren(f.rootHeaderAddr).size == 9)
    assert(f.dataset(f.resolve("d_4").get).values.toSeq == Seq(12.0))
  }

  test("FILTERED fractal heap: multi-block indirect root, all blocks deflated") {
    // 40 links with long names overflow the root block -> indirect root
    // whose direct-block entries carry (addr, stored size, mask) triplets
    val children = (0 until 40).map { i =>
      val name = f"node_$i%02d_" + "y" * 60
      name -> (WDataset(Nil, Array(1L), Array(i + 0.25), isInt = false,
        elemSize = 8): MiniHdf5Writer.Node)
    }
    val f = Hdf5File(MiniHdf5Writer.write(
      WGroup(Nil, children, heapFiltered = true)))
    assert(f.groupChildren(f.rootHeaderAddr).size == 40)
    val nm = f"node_23_" + "y" * 60
    assert(f.dataset(f.resolve(nm).get).values.toSeq == Seq(23.25))
  }

  test("FILTERED + NESTED fractal heap: deflated blocks behind child indirects") {
    val children = (0 until 120).map { i =>
      val name = f"n_$i%03d_" + "z" * 170
      name -> (WDataset(Nil, Array(1L), Array(i - 0.5), isInt = false,
        elemSize = 8): MiniHdf5Writer.Node)
    }
    val f = Hdf5File(MiniHdf5Writer.write(
      WGroup(Nil, children, heapMaxDirect = 1024L, heapFiltered = true)))
    assert(f.groupChildren(f.rootHeaderAddr).size == 120)
    val nm = f"n_099_" + "z" * 170
    assert(f.dataset(f.resolve(nm).get).values.toSeq == Seq(98.5))
  }

  test("TINY heap objects: short link bodies stored inline in wide heap IDs") {
    // heapIdLen = 18 -> payloads <= 17 bytes go tiny (libhdf5's default
    // insert rule); link bodies are 11 + nameLen, so 1-6-char names fit.
    // Mix tiny and managed links so both ID types coexist in one heap.
    val children =
      (0 until 6).map(i => s"t$i" ->
        (WDataset(Nil, Array(1L), Array(i * 2.0), isInt = false,
          elemSize = 8): MiniHdf5Writer.Node)) ++
      (0 until 6).map(i => f"managed_link_with_a_long_name_$i%02d" ->
        (WDataset(Nil, Array(1L), Array(i + 100.0), isInt = false,
          elemSize = 8): MiniHdf5Writer.Node))
    val f = Hdf5File(MiniHdf5Writer.write(
      WGroup(Nil, children, heapIdLen = 18)))
    assert(f.groupChildren(f.rootHeaderAddr).size == 12)
    assert(f.dataset(f.resolve("t3").get).values.toSeq == Seq(6.0))
    assert(f.dataset(f.resolve("managed_link_with_a_long_name_05").get)
      .values.toSeq == Seq(105.0))
  }

  test("TINY-only heap: no direct blocks at all (undef root, curRows 0)") {
    val children = (0 until 9).map(i => s"x$i" ->
      (WDataset(Nil, Array(1L), Array(i - 4.0), isInt = false,
        elemSize = 8): MiniHdf5Writer.Node))
    val f = Hdf5File(MiniHdf5Writer.write(
      WGroup(Nil, children, heapIdLen = 18)))
    assert(f.groupChildren(f.rootHeaderAddr).size == 9)
    assert(f.dataset(f.resolve("x8").get).values.toSeq == Seq(4.0))
  }

  test("HUGE heap objects: oversized link bodies via the type-1 huge btree") {
    // heapMaxManaged = 64 -> bodies over 64 bytes (names > 53 chars) are
    // huge: raw bytes at their own address, (addr, len, id) in the heap's
    // type-1 v2 B-tree, the heap ID carrying the huge id
    val children =
      (0 until 5).map(i => f"huge_$i%d_" + "n" * 70 ->
        (WDataset(Nil, Array(1L), Array(i * 7.0), isInt = false,
          elemSize = 8): MiniHdf5Writer.Node)) ++
      (0 until 5).map(i => s"small_$i" ->
        (WDataset(Nil, Array(1L), Array(i + 50.0), isInt = false,
          elemSize = 8): MiniHdf5Writer.Node))
    val f = Hdf5File(MiniHdf5Writer.write(
      WGroup(Nil, children, heapMaxManaged = 64)))
    assert(f.groupChildren(f.rootHeaderAddr).size == 10)
    assert(f.dataset(f.resolve("huge_2_" + "n" * 70).get).values.toSeq == Seq(14.0))
    assert(f.dataset(f.resolve("small_4").get).values.toSeq == Seq(54.0))
  }

  test("FILTERED huge heap objects: deflated bodies via type-2 btree records") {
    // filtered heap + maxManaged 64 -> oversized link bodies are
    // individually deflated; (addr, filtered len, mask, memory size, id)
    // ride the type-2 v2 B-tree and the reader inflates on access
    val children =
      (0 until 5).map(i => f"huge_$i%d_" + "n" * 70 ->
        (WDataset(Nil, Array(1L), Array(i * 7.0), isInt = false,
          elemSize = 8): MiniHdf5Writer.Node)) ++
      (0 until 5).map(i => s"small_$i" ->
        (WDataset(Nil, Array(1L), Array(i + 50.0), isInt = false,
          elemSize = 8): MiniHdf5Writer.Node))
    val f = Hdf5File(MiniHdf5Writer.write(
      WGroup(Nil, children, heapMaxManaged = 64, heapFiltered = true)))
    assert(f.groupChildren(f.rootHeaderAddr).size == 10)
    assert(f.dataset(f.resolve("huge_2_" + "n" * 70).get).values.toSeq == Seq(14.0))
    assert(f.dataset(f.resolve("huge_4_" + "n" * 70).get).values.toSeq == Seq(28.0))
    assert(f.dataset(f.resolve("small_4").get).values.toSeq == Seq(54.0))
  }

  test("DIRECT huge heap ids embed the object location, no btree") {
    // idLen 18 (payload 17 >= addr 8 + size 8): libhdf5 stores huge
    // objects' locations in the id itself and writes no huge btree
    val children =
      (0 until 3).map(i => f"huge_$i%d_" + "n" * 70 ->
        (WDataset(Nil, Array(1L), Array(i * 3.0), isInt = false,
          elemSize = 8): MiniHdf5Writer.Node)) ++
      (0 until 7).map(i => s"small_$i" ->
        (WDataset(Nil, Array(1L), Array(i + 9.0), isInt = false,
          elemSize = 8): MiniHdf5Writer.Node))
    val f = Hdf5File(MiniHdf5Writer.write(
      WGroup(Nil, children, heapMaxManaged = 64, heapIdLen = 18)))
    assert(f.groupChildren(f.rootHeaderAddr).size == 10)
    assert(f.dataset(f.resolve("huge_1_" + "n" * 70).get).values.toSeq == Seq(3.0))
    assert(f.dataset(f.resolve("small_6").get).values.toSeq == Seq(15.0))
  }

  test("SHARED attribute datatype/dataspace resolve through committed headers") {
    // v3 attributes with flag bits 0/1: the dt/ds fields hold 10-byte
    // shared-message pointers at committed object headers instead of the
    // inline messages
    val g = WGroup(Seq(
      "plain" -> 7L,
      "shared_dt" -> MiniHdf5Writer.SharedAttr(3.5, shareDt = true),
      "shared_both" -> MiniHdf5Writer.SharedAttr(Vector(1L, 2L, 3L),
        shareDt = true, shareDs = true),
      "shared_ds_str" -> MiniHdf5Writer.SharedAttr("hello", shareDt = false,
        shareDs = true)), Nil)
    val f = Hdf5File(MiniHdf5Writer.write(g))
    val attrs = f.attributes(f.rootHeaderAddr)
    assert(attrs("plain") == 7L)
    assert(attrs("shared_dt") == 3.5)
    assert(attrs("shared_both") == Vector(1L, 2L, 3L))
    assert(attrs("shared_ds_str") == "hello")
  }

  test("2-D chunk grids with multiple columns reassemble correctly") {
    // 6x8 dataset cut into 3x4 chunks -> 2x2 chunk grid: a max()-based
    // linear offset would collapse the (0,4) and (3,0) chunks onto the same
    // position; the row-major placement must not
    val dims = Array(6L, 8L)
    val values = Array.tabulate(48)(_.toDouble)
    val ds = WDataset(Seq(("q", 1L)), dims, values, isInt = false, elemSize = 8,
      chunkDims = Some(Array(3L, 4L)))
    val f = Hdf5File(MiniHdf5Writer.write(WGroup(Nil, Seq("d" -> ds))))
    val back = f.dataset(f.resolve("d").get)
    assert(back.dims.toSeq == dims.toSeq)
    assert(back.values.toSeq == values.toSeq)
  }

  test("edge chunks are clipped to dataset bounds") {
    // 5x7 dataset with 3x4 chunks: right/bottom chunks are partial
    val dims = Array(5L, 7L)
    val values = Array.tabulate(35)(i => (i * 3 + 1).toDouble)
    val ds = WDataset(Nil, dims, values, isInt = true, elemSize = 4,
      chunkDims = Some(Array(3L, 4L)))
    val f = Hdf5File(MiniHdf5Writer.write(WGroup(Nil, Seq("d" -> ds))))
    val back = f.dataset(f.resolve("d").get)
    assert(back.values.toSeq == values.toSeq)
    assert(back.isInteger)
  }

  test("v4 layout: single-chunk index round-trips") {
    val dims = Array(5L, 7L)
    val values = Array.tabulate(35)(i => (i * 2 + 1).toDouble)
    val ds = WDataset(Nil, dims, values, isInt = false, elemSize = 8,
      chunkDims = Some(Array(5L, 7L)), layoutV4 = Some(1))
    val f = Hdf5File(MiniHdf5Writer.write(WGroup(Nil, Seq("d" -> ds))))
    assert(f.dataset(f.resolve("d").get).values.toSeq == values.toSeq)
  }

  test("v4 layout: implicit index reassembles a 2-D chunk grid") {
    val dims = Array(6L, 8L)
    val values = Array.tabulate(48)(_.toDouble)
    val ds = WDataset(Nil, dims, values, isInt = false, elemSize = 8,
      chunkDims = Some(Array(3L, 4L)), layoutV4 = Some(2))
    val f = Hdf5File(MiniHdf5Writer.write(WGroup(Nil, Seq("d" -> ds))))
    assert(f.dataset(f.resolve("d").get).values.toSeq == values.toSeq)
  }

  test("v4 layout: fixed-array index with edge-clipped chunks") {
    val dims = Array(5L, 7L)
    val values = Array.tabulate(35)(i => (100 - i).toDouble)
    val ds = WDataset(Nil, dims, values, isInt = true, elemSize = 4,
      chunkDims = Some(Array(2L, 3L)), layoutV4 = Some(3))
    val f = Hdf5File(MiniHdf5Writer.write(WGroup(Nil, Seq("d" -> ds))))
    val back = f.dataset(f.resolve("d").get)
    assert(back.values.toSeq == values.toSeq)
    assert(back.isInteger)
  }

  test("v4 layout: PAGED fixed-array index (>1024 chunks) reads across pages") {
    // 1500 chunks of 2 elements: 2 pages (1024 + 476 entries) with a
    // page-init bitmap and per-page checksums between the entry runs
    val dims = Array(3000L)
    val values = Array.tabulate(3000)(i => ((i * 17) % 509 - 254).toDouble)
    val ds = WDataset(Nil, dims, values, isInt = true, elemSize = 4,
      chunkDims = Some(Array(2L)), layoutV4 = Some(3))
    val f = Hdf5File(MiniHdf5Writer.write(WGroup(Nil, Seq("d" -> ds))))
    val back = f.dataset(f.resolve("d").get)
    assert(back.values.toSeq == values.toSeq)
    assert(back.isInteger)
  }

  test("v4 layout: extensible-array index, all elements inline in the index block") {
    // 4 chunks = libhdf5's default idx_blk_elmts, so no data blocks exist
    val dims = Array(8L, 4L)
    val values = Array.tabulate(32)(i => (i * 7 + 2).toDouble)
    val ds = WDataset(Nil, dims, values, isInt = false, elemSize = 8,
      chunkDims = Some(Array(2L, 4L)), layoutV4 = Some(4))
    val f = Hdf5File(MiniHdf5Writer.write(WGroup(Nil, Seq("d" -> ds))))
    assert(f.dataset(f.resolve("d").get).values.toSeq == values.toSeq)
  }

  test("v4 layout: extensible-array index spills into doubling data blocks") {
    // 60 chunks: 4 inline + data blocks of 16, 32, then 8 of the first
    // 32-capacity block of super block 2 — exercises the doubling pattern
    // and partially-filled blocks
    val dims = Array(120L)
    val values = Array.tabulate(120)(i => (i * 3 - 50).toDouble)
    val ds = WDataset(Nil, dims, values, isInt = true, elemSize = 4,
      chunkDims = Some(Array(2L)), layoutV4 = Some(4))
    val f = Hdf5File(MiniHdf5Writer.write(WGroup(Nil, Seq("d" -> ds))))
    val back = f.dataset(f.resolve("d").get)
    assert(back.values.toSeq == values.toSeq)
    assert(back.isInteger)
  }

  test("v4 layout: extensible-array index with 2-D edge-clipped chunks") {
    val dims = Array(9L, 7L)
    val values = Array.tabulate(63)(i => (200 - i * 2).toDouble)
    val ds = WDataset(Nil, dims, values, isInt = true, elemSize = 4,
      chunkDims = Some(Array(2L, 3L)), layoutV4 = Some(4))
    val f = Hdf5File(MiniHdf5Writer.write(WGroup(Nil, Seq("d" -> ds))))
    // 5x3 = 15 chunks: 4 inline + 11 in the first data block
    assert(f.dataset(f.resolve("d").get).values.toSeq == values.toSeq)
  }

  test("v4 layout: extensible-array index overflows into SECONDARY blocks") {
    // direct capacity at default cparams = 4 inline + (16+32+32+32+64+64) =
    // 244 chunks; 300 chunks push 56 elements into super block 4's first
    // 64-element data block behind an EASB secondary block
    val dims = Array(600L)
    val values = Array.tabulate(600)(i => ((i * 11) % 251 - 125).toDouble)
    val ds = WDataset(Nil, dims, values, isInt = true, elemSize = 4,
      chunkDims = Some(Array(2L)), layoutV4 = Some(4))
    val f = Hdf5File(MiniHdf5Writer.write(WGroup(Nil, Seq("d" -> ds))))
    val back = f.dataset(f.resolve("d").get)
    assert(back.values.toSeq == values.toSeq)
    assert(back.isInteger)
  }

  test("v4 layout: extensible array spanning MULTIPLE secondary blocks, filtered") {
    // 800 chunks = 244 direct + 256 in super block 4 (4 x 64) + 300 into
    // super block 5 (3 of 4 x 128-element blocks), every chunk deflated
    val dims = Array(1600L)
    val values = Array.tabulate(1600)(i => ((i * 7) % 193).toDouble)
    val ds = WDataset(Nil, dims, values, isInt = true, elemSize = 4,
      chunkDims = Some(Array(2L)), layoutV4 = Some(4), gzip = true)
    val f = Hdf5File(MiniHdf5Writer.write(WGroup(Nil, Seq("d" -> ds))))
    val back = f.dataset(f.resolve("d").get)
    assert(back.values.toSeq == values.toSeq)
    assert(back.isInteger)
  }

  test("v4 layout: PAGED extensible-array data blocks (cap > 2^pageBits)") {
    // shrunken cparams (idxElmts=2, minElmts=4, minPtrs=2, pageBits=2) make
    // every data block beyond the first exceed the 4-element page size:
    // prefix-checksummed EADB with elements in checksum-tailed pages. 40
    // chunks = 2 inline + 4 + 8(paged, 2 pages) + secondary blocks u=2
    // (2 x 8-cap paged) and u=3 (16-cap, 4 pages, partially filled)
    val dims = Array(80L)
    val values = Array.tabulate(80)(i => ((i * 17) % 211 - 100).toDouble)
    val ds = WDataset(Nil, dims, values, isInt = true, elemSize = 4,
      chunkDims = Some(Array(2L)), layoutV4 = Some(4),
      eaCparams = (2, 4, 2, 2))
    val f = Hdf5File(MiniHdf5Writer.write(WGroup(Nil, Seq("d" -> ds))))
    val back = f.dataset(f.resolve("d").get)
    assert(back.values.toSeq == values.toSeq)
    assert(back.isInteger)
  }

  test("v4 layout: PAGED + FILTERED extensible-array data blocks") {
    // same shrunken geometry with the deflate client: 16-byte elements
    // (addr + stored size + mask) inside checksum-tailed pages
    val dims = Array(60L)
    val values = Array.tabulate(60)(i => ((i * 29) % 127).toDouble)
    val ds = WDataset(Nil, dims, values, isInt = true, elemSize = 4,
      chunkDims = Some(Array(2L)), layoutV4 = Some(4), gzip = true,
      eaCparams = (2, 4, 2, 2))
    val f = Hdf5File(MiniHdf5Writer.write(WGroup(Nil, Seq("d" -> ds))))
    val back = f.dataset(f.resolve("d").get)
    assert(back.values.toSeq == values.toSeq)
    assert(back.isInteger)
  }

  test("v4 layout: FILTERED extensible-array chunks inflate correctly") {
    // 30 chunks (4 inline + 16 + 10 of the next block), gzip'd per chunk:
    // client-1 elements carry address + stored size + filter mask
    val dims = Array(60L)
    val values = Array.tabulate(60)(i => ((i * 13) % 97).toDouble)
    val ds = WDataset(Nil, dims, values, isInt = true, elemSize = 4,
      chunkDims = Some(Array(2L)), layoutV4 = Some(4), gzip = true)
    val f = Hdf5File(MiniHdf5Writer.write(WGroup(Nil, Seq("d" -> ds))))
    val back = f.dataset(f.resolve("d").get)
    assert(back.values.toSeq == values.toSeq)
    assert(back.isInteger)
  }

  test("v4 layout: v2 B-tree chunk index places chunks by scaled offsets") {
    val dims = Array(7L, 9L)
    val values = Array.tabulate(63)(i => (i * 5 + 3).toDouble)
    val ds = WDataset(Nil, dims, values, isInt = true, elemSize = 4,
      chunkDims = Some(Array(3L, 4L)), layoutV4 = Some(5))
    val f = Hdf5File(MiniHdf5Writer.write(WGroup(Nil, Seq("d" -> ds))))
    val back = f.dataset(f.resolve("d").get)
    assert(back.values.toSeq == values.toSeq)
    assert(back.isInteger)
  }

  test("v4 layout: FILTERED v2-btree chunk index (type-11 records) inflates correctly") {
    // deflate pipeline + v2-btree index: records are type 11 (address +
    // variable-width stored size + filter mask + scaled offsets); the
    // reader derives the size-field width from the header's record size
    val dims = Array(7L, 9L)
    val values = Array.tabulate(63)(i => ((i * 11) % 89).toDouble)
    val ds = WDataset(Nil, dims, values, isInt = true, elemSize = 4,
      chunkDims = Some(Array(3L, 4L)), layoutV4 = Some(5), gzip = true)
    val f = Hdf5File(MiniHdf5Writer.write(WGroup(Nil, Seq("d" -> ds))))
    val back = f.dataset(f.resolve("d").get)
    assert(back.values.toSeq == values.toSeq)
    assert(back.isInteger)
  }

  test("v4 layout: DEPTH-1 v2-btree chunk index walks BTIN -> BTLF leaves") {
    // 30 chunks split across several leaves under one internal node; chunks
    // place by recorded scaled offsets, so leaf order must not matter
    val dims = Array(60L)
    val values = Array.tabulate(60)(i => (i * 7 - 23).toDouble)
    val ds = WDataset(Nil, dims, values, isInt = true, elemSize = 4,
      chunkDims = Some(Array(2L)), layoutV4 = Some(5), btreeDepth = 1)
    val f = Hdf5File(MiniHdf5Writer.write(WGroup(Nil, Seq("d" -> ds))))
    val back = f.dataset(f.resolve("d").get)
    assert(back.values.toSeq == values.toSeq)
    assert(back.isInteger)
  }

  test("v4 layout: depth-1 v2-btree chunk index with FILTERED records") {
    // both round-4 additions composed: BTIN walk over type-11 records
    val dims = Array(11L, 8L)
    val values = Array.tabulate(88)(i => ((i * 17) % 101).toDouble)
    val ds = WDataset(Nil, dims, values, isInt = true, elemSize = 4,
      chunkDims = Some(Array(2L, 3L)), layoutV4 = Some(5),
      gzip = true, btreeDepth = 1)
    val f = Hdf5File(MiniHdf5Writer.write(WGroup(Nil, Seq("d" -> ds))))
    val back = f.dataset(f.resolve("d").get)
    assert(back.values.toSeq == values.toSeq)
    assert(back.isInteger)
  }

  test("v4 layout: DEPTH-2 v2-btree chunk index walks BTIN -> BTIN -> BTLF") {
    // 50 chunks under two internal levels: the walker must recurse and the
    // depth-2 pointer decode must skip the subtree-total field that appears
    // only on pointers to internal children
    val dims = Array(100L)
    val values = Array.tabulate(100)(i => (i * 13 - 57).toDouble)
    val ds = WDataset(Nil, dims, values, isInt = true, elemSize = 4,
      chunkDims = Some(Array(2L)), layoutV4 = Some(5), btreeDepth = 2)
    val f = Hdf5File(MiniHdf5Writer.write(WGroup(Nil, Seq("d" -> ds))))
    val back = f.dataset(f.resolve("d").get)
    assert(back.values.toSeq == values.toSeq)
    assert(back.isInteger)
  }

  test("v4 layout: depth-2 v2-btree chunk index with FILTERED records") {
    val dims = Array(25L, 8L)
    val values = Array.tabulate(200)(i => ((i * 19) % 103).toDouble)
    val ds = WDataset(Nil, dims, values, isInt = true, elemSize = 4,
      chunkDims = Some(Array(2L, 3L)), layoutV4 = Some(5),
      gzip = true, btreeDepth = 2)
    val f = Hdf5File(MiniHdf5Writer.write(WGroup(Nil, Seq("d" -> ds))))
    val back = f.dataset(f.resolve("d").get)
    assert(back.values.toSeq == values.toSeq)
    assert(back.isInteger)
  }

  test("dense group indexed by a DEPTH-2 v2 B-tree resolves every link") {
    val children = (0 until 64).map { i =>
      f"ds_$i%02d" -> (WDataset(Seq("tag" -> i.toLong), Array(2L),
        Array(i.toDouble, i + 0.75), isInt = false,
        elemSize = 8): MiniHdf5Writer.Node)
    }
    val f = Hdf5File(MiniHdf5Writer.write(WGroup(Nil, children, denseDepth = 2)))
    val got = f.groupChildren(f.rootHeaderAddr)
    assert(got.size == 64, s"resolved ${got.size} of 64 links")
    (0 until 64).foreach { i =>
      val a = f.resolve(f"ds_$i%02d").get
      assert(f.dataset(a).values.toSeq == Seq(i.toDouble, i + 0.75), s"link $i")
      assert(f.attributes(a)("tag") == i.toLong)
    }
  }

  test("dense group indexed by a DEPTH-1 v2 B-tree resolves every link") {
    // 30 links under a BTIN-rooted link index: the dense-group walker must
    // collect records from every leaf AND the internal node itself
    val children = (0 until 30).map { i =>
      f"ds_$i%02d" -> (WDataset(Seq("tag" -> i.toLong), Array(2L),
        Array(i.toDouble, i + 0.25), isInt = false,
        elemSize = 8): MiniHdf5Writer.Node)
    }
    val f = Hdf5File(MiniHdf5Writer.write(WGroup(Nil, children, denseDepth = 1)))
    val got = f.groupChildren(f.rootHeaderAddr)
    assert(got.size == 30, s"resolved ${got.size} of 30 links")
    (0 until 30).foreach { i =>
      val a = f.resolve(f"ds_$i%02d").get
      assert(f.dataset(a).values.toSeq == Seq(i.toDouble, i + 0.25), s"link $i")
      assert(f.attributes(a)("tag") == i.toLong)
    }
  }

  test("3-D chunked dataset places chunks by full coordinates") {
    val dims = Array(4L, 3L, 5L)
    val values = Array.tabulate(60)(i => (100 - i).toDouble)
    val ds = WDataset(Nil, dims, values, isInt = false, elemSize = 8,
      chunkDims = Some(Array(2L, 2L, 2L)))
    val f = Hdf5File(MiniHdf5Writer.write(WGroup(Nil, Seq("d" -> ds))))
    assert(f.dataset(f.resolve("d").get).values.toSeq == values.toSeq)
  }
}
