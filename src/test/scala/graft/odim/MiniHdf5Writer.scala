package graft.odim

import java.nio.{ByteBuffer, ByteOrder}

/** Test-side writer of MODERN-format HDF5 files (superblock v3, version-2
  * 'OHDR' object headers, v3 attribute messages, new-style groups — compact
  * link messages or dense fractal-heap + v2 B-tree). No h5py exists in this
  * environment, so this is how Hdf5ModernSpec synthesizes the fixtures that
  * prove the reader's modern-file surface: a structure round-trip of the real
  * ODIM fixtures (written with libhdf5's oldest format) through this writer
  * must parse to identical attributes, datasets, and profiles.
  *
  * Layout choices mirror what libhdf5 `libver='latest'` emits for ODIM-sized
  * content: groups with more than 8 links go dense (root direct block only),
  * smaller ones compact. Checksums are written as zeros (the reader does not
  * validate them).
  */
object MiniHdf5Writer {

  sealed trait Node

  /** Attribute-value wrapper: store the datatype and/or dataspace as
    * Shared Messages (v3, sub-type 2 = "message in another object's
    * header") — each shared field becomes a 10-byte pointer at a committed
    * object header written before the attribute, and the attribute's flag
    * bits 0/1 are set. The shape libhdf5 emits for attributes of committed
    * datatypes.
    */
  final case class SharedAttr(value: Any, shareDt: Boolean = true,
      shareDs: Boolean = false)
  /** denseDepth: when the link set goes dense (> 8 links), index it with a
    * v2 B-tree of this depth (0 = single leaf; 1-2 = BTIN levels, the shape
    * libhdf5 produces for groups with hundreds/thousands of links).
    */
  final case class WGroup(attrs: Seq[(String, Any)],
      children: Seq[(String, Node)],
      denseDepth: Int = 0,
      // dense-link fractal-heap knobs: shrink heapMaxDirect to force
      // NESTED indirect blocks with small fixtures; heapFiltered deflates
      // every direct block whole; widen heapIdLen so short link bodies go
      // TINY (inline in the ID); shrink heapMaxManaged so long link
      // bodies go HUGE (btree-tracked)
      heapMaxDirect: Long = 65536L,
      heapFiltered: Boolean = false,
      heapIdLen: Int = 7,
      heapMaxManaged: Int = 4096) extends Node
  /** layoutV4: None = v3 (contiguous, or v1-btree chunked when chunkDims
    * set); Some(1..5) = v4 chunked with that chunk-index type (single
    * chunk / implicit / fixed array / extensible array / v2 btree) —
    * requires chunkDims. gzip deflates chunk data and emits a filter
    * pipeline message (supported by the extensible-array writer path).
    */
  /** btreeDepth: for layoutV4 = Some(5), emit the chunk index as a v2
    * B-tree of this depth (the heavily-appended shape) instead of a single
    * leaf.
    */
  final case class WDataset(attrs: Seq[(String, Any)], dims: Array[Long],
      values: Array[Double], isInt: Boolean, elemSize: Int,
      chunkDims: Option[Array[Long]] = None,
      layoutV4: Option[Int] = None,
      gzip: Boolean = false,
      btreeDepth: Int = 0,
      // extensible-array creation params (idxElmts, minElmts, minPtrs,
      // pageBits); the libhdf5 defaults unless a test shrinks them to
      // reach deep EA shapes (secondary blocks, paged data blocks) with
      // small fixtures
      eaCparams: (Int, Int, Int, Int) = (4, 16, 4, 10)) extends Node

  private val Undef = -1L

  private final class Out {
    private var buf = ByteBuffer.allocate(1 << 20).order(ByteOrder.LITTLE_ENDIAN)
    private def ensure(n: Int): Unit =
      if (buf.position() + n > buf.capacity()) {
        val nb = ByteBuffer.allocate(buf.capacity() * 2).order(ByteOrder.LITTLE_ENDIAN)
        buf.flip(); nb.put(buf); buf = nb
      }
    def pos: Int = buf.position()
    def u8(v: Int): Unit = { ensure(1); buf.put(v.toByte) }
    def u16(v: Int): Unit = { ensure(2); buf.putShort(v.toShort) }
    def u32(v: Long): Unit = { ensure(4); buf.putInt(v.toInt) }
    def u64(v: Long): Unit = { ensure(8); buf.putLong(v) }
    def bytes(b: Array[Byte]): Unit = { ensure(b.length); buf.put(b) }
    def ascii(s: String): Unit = bytes(s.getBytes("ASCII"))
    def patch64(at: Int, v: Long): Unit = buf.putLong(at, v)
    def result(): Array[Byte] = java.util.Arrays.copyOf(buf.array(), buf.position())
  }

  def write(root: WGroup): Array[Byte] = {
    val o = new Out
    // superblock v3: sig, version, sizes, flags, 4 addresses, checksum
    o.bytes(Array(0x89, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n').map(_.toByte))
    o.u8(3); o.u8(8); o.u8(8); o.u8(0)
    o.u64(0)      // base address
    o.u64(Undef)  // superblock extension
    o.u64(0)      // EOF (patched at end)
    val rootAddrPos = o.pos
    o.u64(0)      // root object header address (patched)
    o.u32(0)      // checksum
    val rootAddr = writeNode(o, root)
    o.patch64(rootAddrPos, rootAddr)
    val res = o.result()
    // EOF address field (sig 8 + ver/sizes/flags 4 + base 8 + extension 8)
    ByteBuffer.wrap(res).order(ByteOrder.LITTLE_ENDIAN).putLong(28, res.length.toLong)
    res
  }

  private def writeNode(o: Out, node: Node): Long = node match {
    case g: WGroup => writeGroup(o, g)
    case d: WDataset => writeDataset(o, d)
  }

  // ---- message bodies ----

  private def dtInt(size: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    b.put(0x10.toByte); b.put(0x08.toByte); b.put(0.toByte); b.put(0.toByte)
    b.putInt(size); b.array()
  }
  private def dtFloat(size: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    b.put(0x11.toByte); b.put(0.toByte); b.put(0.toByte); b.put(0.toByte)
    b.putInt(size); b.array()
  }
  private def dtString(size: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    b.put(0x13.toByte); b.put(0.toByte); b.put(0.toByte); b.put(0.toByte)
    b.putInt(size); b.array()
  }
  private def dataspace(dims: Array[Long]): Array[Byte] = {
    val b = ByteBuffer.allocate(4 + 8 * dims.length).order(ByteOrder.LITTLE_ENDIAN)
    b.put(2.toByte); b.put(dims.length.toByte); b.put(0.toByte); b.put(1.toByte)
    dims.foreach(b.putLong)
    b.array()
  }

  /** v3 attribute message body (unpadded, with name-encoding byte).
    * A [[SharedAttr]] value stores its datatype/dataspace as committed
    * object headers written to `o` first, referenced by 10-byte v3
    * sub-type-2 Shared Message records, with the attribute flag bits set.
    */
  private def attrMsg(o: Out, name: String, value0: Any): Array[Byte] = {
    val (value, shareDt, shareDs) = value0 match {
      case SharedAttr(v, sdt, sds) => (v, sdt, sds)
      case v => (v, false, false)
    }
    val nameB = name.getBytes("UTF-8") :+ 0.toByte
    val (dt0, ds0, data) = value match {
      case v: Long =>
        val d = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(v).array()
        (dtInt(8), dataspace(Array.empty), d)
      case v: Double =>
        val d = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(v).array()
        (dtFloat(8), dataspace(Array.empty), d)
      case v: String =>
        val sb = v.getBytes("UTF-8") :+ 0.toByte
        (dtString(sb.length), dataspace(Array.empty), sb)
      case v: Vector[_] if v.nonEmpty && v.head.isInstanceOf[Long] =>
        val b = ByteBuffer.allocate(8 * v.length).order(ByteOrder.LITTLE_ENDIAN)
        v.foreach(x => b.putLong(x.asInstanceOf[Long]))
        (dtInt(8), dataspace(Array(v.length.toLong)), b.array())
      case v: Vector[_] if v.nonEmpty && v.head.isInstanceOf[Double] =>
        val b = ByteBuffer.allocate(8 * v.length).order(ByteOrder.LITTLE_ENDIAN)
        v.foreach(x => b.putDouble(x.asInstanceOf[Double]))
        (dtFloat(8), dataspace(Array(v.length.toLong)), b.array())
      case v => sys.error(s"unsupported attribute value $v (${v.getClass})")
    }
    def sharedPtr(msgType: Int, body: Array[Byte]): Array[Byte] = {
      val addr = writeHeader(o, Seq(msgType -> body))
      val b = ByteBuffer.allocate(10).order(ByteOrder.LITTLE_ENDIAN)
      b.put(3.toByte); b.put(2.toByte); b.putLong(addr) // v3, in-header
      b.array()
    }
    val dt = if (shareDt) sharedPtr(0x0003, dt0) else dt0
    val ds = if (shareDs) sharedPtr(0x0001, ds0) else ds0
    val flags = (if (shareDt) 1 else 0) | (if (shareDs) 2 else 0)
    val b = ByteBuffer.allocate(9 + nameB.length + dt.length + ds.length + data.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.put(3.toByte); b.put(flags.toByte)
    b.putShort(nameB.length.toShort); b.putShort(dt.length.toShort); b.putShort(ds.length.toShort)
    b.put(0.toByte) // name encoding: ASCII
    b.put(nameB); b.put(dt); b.put(ds); b.put(data)
    b.array()
  }

  /** Link message body (hard link, 1-byte name length). */
  private def linkBody(name: String, addr: Long): Array[Byte] = {
    val nameB = name.getBytes("UTF-8")
    require(nameB.length < 256)
    val b = ByteBuffer.allocate(3 + nameB.length + 8).order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte); b.put(0.toByte); b.put(nameB.length.toByte)
    b.put(nameB); b.putLong(addr)
    b.array()
  }

  /** OHDR v2 object header from a list of (type, body) messages. */
  private def writeHeader(o: Out, msgs: Seq[(Int, Array[Byte])]): Long = {
    val addr = o.pos.toLong
    val chunk0 = msgs.map(4 + _._2.length).sum
    o.ascii("OHDR"); o.u8(2); o.u8(0x02) // flags: 4-byte chunk-0 size field
    o.u32(chunk0.toLong)
    msgs.foreach { case (t, body) =>
      o.u8(t); o.u16(body.length); o.u8(0); o.bytes(body)
    }
    o.u32(0) // checksum
    addr
  }

  // ---- dense-storage building blocks (fractal heap + v2 B-tree) ----

  /** Fractal heap holding `bodies`; returns the FRHP address and each
    * object's heap offset. When everything fits in one starting-size block
    * the root IS that direct block (curRows = 0, as libhdf5 does); larger
    * payloads get an indirect root whose direct-block rows follow the
    * doubling table (rows 0-1 at 512, row i at 512 * 2^(i-1), width 4) —
    * the layout real dense attribute sets (> ~500 bytes) occupy. Rows at
    * or past maxDirectRows (log2(maxDirect/start) + 2) hold NESTED child
    * indirect blocks, each covering that row's block size with
    * log2(size) - log2(start*width) + 1 internal rows — shrink
    * `maxDirect` to reach nesting with small fixtures. `filtered = true`
    * deflates every direct block whole (stored size + mask ride the
    * indirect entries, or the header for a filtered direct root) and
    * carries an I/O-filter pipeline description in the header.
    */
  private val HeapWidth = 4
  private val HeapStartBlock = 512L
  private val DbHeaderLen = 4 + 1 + 8 + 4 // sig + ver + hdr addr + 4-byte block offset

  private def writeFractalHeap(o: Out, bodies: Seq[Array[Byte]],
      maxDirect: Long = 65536L, filtered: Boolean = false,
      idLen: Int = 7, maxManaged: Int = 4096): (Long, Seq[Array[Byte]]) = {
    def log2(v: Long): Int = 63 - java.lang.Long.numberOfLeadingZeros(v)
    // body classification, mirroring libhdf5's insert rules: payloads that
    // fit inside the heap ID go TINY (normal sub-format, idLen <= 18);
    // payloads over the max managed size go HUGE (indirectly accessed —
    // raw bytes anywhere + a type-1 v2 B-tree of (addr, len, id) records);
    // the rest are managed (packed into direct blocks)
    val Tiny = 0; val Huge = 1; val Managed = 2
    // libhdf5's tiny sub-format split: idLen <= 17 -> normal (4-bit
    // length, max idLen-1); idLen >= 18 -> extended (12-bit length across
    // two bytes, max idLen-2)
    val tinyExtended = idLen >= 18
    val tinyMax = if (tinyExtended) idLen - 2 else idLen - 1
    val bodyKind = bodies.map(b =>
      if (b.length <= tinyMax) Tiny
      else if (b.length > maxManaged) Huge
      else Managed)
    // huge objects in a filtered heap are individually deflated and
    // tracked by type-2 btree records (addr + filtered len + mask +
    // memory size + id) instead of type-1 (addr + len + id)
    val maxDirectRows = log2(maxDirect) - log2(HeapStartBlock) + 2
    val firstRowBits = log2(HeapStartBlock) + log2(HeapWidth.toLong)
    def slotSize(row: Int): Long =
      if (row <= 1) HeapStartBlock else HeapStartBlock << (row - 1)

    // the heap-space tree: direct-block leaves in heap-offset order, with
    // the indirect path (list of (indirect node id, entry index)) recorded
    // so used children can be wired bottom-up
    final case class Leaf(startOff: Long, size: Long, owner: Int, entry: Int,
        items: scala.collection.mutable.ArrayBuffer[(Int, Int)]) // (bodyIdx, offInBlock)
    final case class INode(id: Int, startOff: Long, rows: Int, owner: Int,
        entry: Int) // owner = parent INode id (-1 for root), entry index there
    val inodes = scala.collection.mutable.ArrayBuffer.empty[INode]
    val leaves = scala.collection.mutable.ArrayBuffer.empty[Leaf]
    // root is INode 0 with a generous row budget; unused rows trim later
    val RootRowCap = 12
    def buildIndirect(id: Int, baseOff: Long, nrows: Int): Long = {
      var off = baseOff
      var entry = 0
      for (row <- 0 until nrows; _ <- 0 until HeapWidth) {
        val sz = slotSize(row)
        if (row < maxDirectRows) {
          leaves += Leaf(off, sz, id, entry, scala.collection.mutable.ArrayBuffer.empty)
        } else {
          val childId = inodes.length
          inodes += INode(childId, off, log2(sz) - firstRowBits + 1, id, entry)
          buildIndirect(childId, off, inodes(childId).rows): Unit
        }
        off += sz
        entry += 1
      }
      off
    }
    inodes += INode(0, 0L, RootRowCap, -1, 0)
    buildIndirect(0, 0L, RootRowCap): Unit

    // first-fit packing of MANAGED bodies over the leaves in heap-offset
    // order; tiny/huge bodies never touch the direct blocks
    var li = 0
    var cursor = DbHeaderLen
    val heapOffsets = new Array[Int](bodies.length)
    bodies.zipWithIndex.foreach { case (b, i) =>
      if (bodyKind(i) == Managed) {
        while (cursor + b.length > leaves(li).size.toInt) { li += 1; cursor = DbHeaderLen }
        leaves(li).items += ((i, cursor))
        heapOffsets(i) = (leaves(li).startOff + cursor).toInt
        cursor += b.length
      }
    }
    // huge bodies: bytes (deflated when the heap is filtered) at their own
    // addresses. DIRECT regime (libhdf5's rule: id payload fits
    // addr + size (+ mask + memsize when filtered)) embeds the location in
    // the heap ID itself and writes no btree; otherwise (addr, len[, mask,
    // memsize], id) records ride the type-1 (type-2 when filtered) btree.
    val hugeDirect = idLen - 1 >= 8 + 8 + (if (filtered) 4 + 8 else 0)
    val hugeIds = scala.collection.mutable.Map.empty[Int, Long]
    val hugeLoc = scala.collection.mutable.Map.empty[Int, (Long, Long, Long)]
    val hugeRecords = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    bodies.zipWithIndex.foreach { case (b, i) =>
      if (bodyKind(i) == Huge) {
        val stored = if (filtered) deflate(b) else b
        val addr = o.pos.toLong
        o.bytes(stored)
        hugeLoc(i) = (addr, stored.length.toLong, b.length.toLong)
        if (!hugeDirect) {
          val id = hugeIds.size + 1L
          hugeIds(i) = id
          val rec =
            if (filtered) {
              val r = ByteBuffer.allocate(36).order(ByteOrder.LITTLE_ENDIAN)
              r.putLong(addr); r.putLong(stored.length.toLong)
              r.putInt(0) // filter mask
              r.putLong(b.length.toLong) // memory (inflated) size
              r.putLong(id)
              r
            } else {
              val r = ByteBuffer.allocate(24).order(ByteOrder.LITTLE_ENDIAN)
              r.putLong(addr); r.putLong(b.length.toLong); r.putLong(id)
              r
            }
          hugeRecords += rec.array()
        }
      }
    }
    val used = leaves.filter(_.items.nonEmpty)
    val single = used.length == 1 && used.head.startOff == 0L &&
      used.head.owner == 0
    val hdrPatches = scala.collection.mutable.ArrayBuffer.empty[Int]

    // write used direct blocks; filtered blocks are padded to their full
    // size and deflated whole, like libhdf5's filtered-dblock pipeline
    final case class WrittenLeaf(addr: Long, storedSize: Int)
    val writtenLeaves = scala.collection.mutable.Map.empty[(Int, Int), WrittenLeaf]
    var rootDirectStored = 0
    used.foreach { s =>
      val addr = o.pos.toLong
      if (!filtered) {
        o.ascii("FHDB"); o.u8(0)
        hdrPatches += o.pos
        o.u64(0)          // heap header address (patched; 0 pre-deflate for filtered)
        o.u32(s.startOff)
        var at = DbHeaderLen
        s.items.foreach { case (i, off) =>
          require(off == at, "non-contiguous packing")
          o.bytes(bodies(i)); at += bodies(i).length
        }
        writtenLeaves((s.owner, s.entry)) = WrittenLeaf(addr, 0)
      } else {
        val blk = ByteBuffer.allocate(s.size.toInt).order(ByteOrder.LITTLE_ENDIAN)
        blk.put("FHDB".getBytes("ASCII")); blk.put(0.toByte)
        blk.putLong(0L)   // heap header address (unpatchable post-deflate; reader ignores)
        blk.putInt(s.startOff.toInt)
        s.items.foreach { case (i, off) => blk.position(off); blk.put(bodies(i)) }
        val deflated = deflate(blk.array())
        o.bytes(deflated)
        writtenLeaves((s.owner, s.entry)) = WrittenLeaf(addr, deflated.length)
        if (s.startOff == 0L && s.owner == 0) rootDirectStored = deflated.length
      }
    }

    // wire indirect blocks bottom-up: a node is written iff it owns a used
    // leaf or a written child
    val writtenNodes = scala.collection.mutable.Map.empty[Int, Long]
    val nodeRowsUsed = scala.collection.mutable.Map.empty[Int, Int]
    used.foreach { s =>
      val r = s.entry / HeapWidth
      nodeRowsUsed(s.owner) = math.max(nodeRowsUsed.getOrElse(s.owner, 0), r + 1)
    }
    def writeNode(id: Int): Long = writtenNodes.getOrElseUpdate(id, {
      val children = inodes.filter(_.owner == id)
      // children written first (addresses needed in this node's entries)
      val childAddrs = children.flatMap { c =>
        if (subtreeUsed(c.id)) Some(c.entry -> writeNode(c.id)) else None
      }.toMap
      val node = inodes(id)
      val nrows =
        if (id == 0) nodeRowsUsed.getOrElse(0, 1)
          .max(childAddrs.keys.map(_ / HeapWidth + 1).maxOption.getOrElse(0)).max(1)
        else node.rows
      val ib = o.pos.toLong
      o.ascii("FHIB"); o.u8(0)
      hdrPatches += o.pos
      o.u64(0)                 // heap header address (patched)
      o.u32(node.startOff)     // block offset
      for (row <- 0 until nrows; col <- 0 until HeapWidth) {
        val entry = row * HeapWidth + col
        if (row < maxDirectRows) {
          writtenLeaves.get((id, entry)) match {
            case Some(w) =>
              o.u64(w.addr)
              if (filtered) { o.u64(w.storedSize.toLong); o.u32(0) }
            case None =>
              o.u64(Undef)
              if (filtered) { o.u64(0); o.u32(0) }
          }
        } else {
          o.u64(childAddrs.getOrElse(entry, Undef))
        }
      }
      o.u32(0)                 // checksum
      ib
    })
    def subtreeUsed(id: Int): Boolean =
      leaves.exists(l => l.owner == id && l.items.nonEmpty) ||
        inodes.exists(n => n.owner == id && subtreeUsed(n.id))

    // all-tiny/all-huge heaps have NO direct blocks at all: undef root
    // with curRows 0, like libhdf5
    val noManaged = used.isEmpty
    val curRows =
      if (single || noManaged) 0
      else nodeRowsUsed.getOrElse(0, 0)
        .max(inodes.filter(n => n.owner == 0 && subtreeUsed(n.id))
          .map(_.entry / HeapWidth + 1).maxOption.getOrElse(0)).max(1)
    val rootAddr: Long =
      if (noManaged) Undef
      else if (single) writtenLeaves((0, 0)).addr
      else writeNode(0)
    // huge btree (after the objects, before the header)
    val hugeBtreeAddr: Long =
      if (hugeRecords.isEmpty) Undef
      else writeBtreeV2(o, if (filtered) 2 else 1, hugeRecords.toSeq)
    val managed = leaves.map(l => l.startOff + l.size).maxOption.getOrElse(0L)
    // deflate filter pipeline description (version 2, one filter: id 1
    // deflate, no flags, one client value) — the reader records its length
    // and skips the bytes
    val filterInfo: Array[Byte] =
      if (!filtered) Array.emptyByteArray
      else {
        val b = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
        b.put(2.toByte); b.put(1.toByte)       // version, nfilters
        b.putShort(1); b.putShort(0); b.putShort(1) // id=deflate, flags, nvalues
        b.putInt(6)                            // aggression
        b.array()
      }
    val nTiny = bodyKind.count(_ == Tiny)
    val tinyBytes = bodies.zipWithIndex.collect {
      case (b, i) if bodyKind(i) == Tiny => b.length.toLong }.sum
    val hugeBytes = bodies.zipWithIndex.collect {
      case (b, i) if bodyKind(i) == Huge => b.length.toLong }.sum
    val frhpAddr = o.pos.toLong
    o.ascii("FRHP"); o.u8(0)
    o.u16(idLen)  // heap ID length (7 default: 1 flag + 4 offset + 2 length)
    o.u16(filterInfo.length) // I/O filter encoded length
    o.u8(0)       // flags (no checksummed blocks)
    o.u32(maxManaged.toLong) // max managed object size
    o.u64(hugeIds.size + 1L) // next huge id
    o.u64(hugeBtreeAddr)
    o.u64(0)      // free space
    o.u64(Undef)  // free-space manager addr
    o.u64(managed)             // managed space
    o.u64(managed)             // allocated managed space
    o.u64(managed)             // direct block iterator offset
    o.u64(bodyKind.count(_ == Managed).toLong) // managed object count
    o.u64(hugeBytes); o.u64(hugeIds.size.toLong) // huge size / count
    o.u64(tinyBytes); o.u64(nTiny.toLong)        // tiny size / count
    o.u16(HeapWidth)
    o.u64(HeapStartBlock)
    o.u64(maxDirect) // max direct block size
    o.u16(32)     // max heap size (bits) -> heapOffSize 4
    o.u16(1)      // starting rows
    o.u64(rootAddr)
    o.u16(curRows)
    if (filtered && curRows == 0 && !noManaged) {
      o.u64(rootDirectStored.toLong); o.u32(0)
    }
    o.bytes(filterInfo)
    o.u32(0)      // checksum
    hdrPatches.foreach(o.patch64(_, frhpAddr))

    // assemble the heap IDs (idLen bytes each) per body kind
    val ids: Seq[Array[Byte]] = bodies.zipWithIndex.map { case (b, i) =>
      val id = new Array[Byte](idLen)
      bodyKind(i) match {
        case Tiny =>
          if (!tinyExtended) {
            id(0) = (0x20 | (b.length - 1)).toByte
            System.arraycopy(b, 0, id, 1, b.length)
          } else {
            id(0) = (0x20 | ((b.length - 1) >> 8)).toByte
            id(1) = ((b.length - 1) & 0xff).toByte
            System.arraycopy(b, 0, id, 2, b.length)
          }
        case Huge =>
          id(0) = 0x10.toByte
          if (hugeDirect) {
            val (addr, storedLen, memLen) = hugeLoc(i)
            val bb = ByteBuffer.wrap(id).order(ByteOrder.LITTLE_ENDIAN)
            bb.position(1)
            bb.putLong(addr); bb.putLong(storedLen)
            if (filtered) { bb.putInt(0); bb.putLong(memLen) }
          } else {
            var v = hugeIds(i)
            var k = 0
            while (k < idLen - 1) { id(k + 1) = (v & 0xff).toByte; v >>= 8; k += 1 }
          }
        case Managed =>
          val bb = ByteBuffer.wrap(id).order(ByteOrder.LITTLE_ENDIAN)
          bb.put(0.toByte); bb.putInt(heapOffsets(i)); bb.putShort(b.length.toShort)
      }
      id
    }
    (frhpAddr, ids)
  }

  /** v2 B-tree over fixed-size records; returns the BTHD address.
    *
    * depth = 0 writes the single-leaf form; depth ≥ 1 splits the records
    * across subtrees under BTIN internal nodes (records interleaved
    * B-tree-style: child0, sep0, child1, sep1, …, childN). Each child
    * pointer = child address + a variable-width in-node record count sized
    * by limit-enc-size of the LEAF capacity ((nodeSize − 10) / recordSize;
    * leaves hold the most records of any node, which is why the field's
    * width is depth-independent) + — only when the child is itself internal
    * — a variable-width subtree-total sized by limit-enc-size of the
    * cumulative capacity cum(childDepth). These are exactly the widths the
    * reader re-derives from the header.
    */
  private def writeBtreeV2(o: Out, recType: Int, records: Seq[Array[Byte]],
      depth: Int = 0, nodeSize: Int = 512): Long = {
    val recordSize = records.head.length
    require(records.forall(_.length == recordSize))

    val maxLeafRecs = (nodeSize - 10) / recordSize
    def encSize(limit: Long): Int =
      (63 - java.lang.Long.numberOfLeadingZeros(math.max(limit, 1L))) / 8 + 1
    val nrecSize = encSize(maxLeafRecs.toLong)
    // cumulative subtree capacity per depth (sizes the subtree-total field
    // AND drives auto-depth below)
    def cumAt(levels: Int): Array[Long] = {
      val c = new Array[Long](math.max(levels, 1))
      c(0) = maxLeafRecs.toLong
      for (d <- 1 until levels) {
        val ps = 8 + nrecSize + (if (d - 1 >= 1) encSize(c(d - 1)) else 0)
        val maxRec = (nodeSize - 10 - ps) / (recordSize + ps)
        c(d) = maxRec.toLong + (maxRec.toLong + 1) * c(d - 1)
      }
      c
    }
    // auto-depth: a record set larger than the requested depth's capacity
    // gets a taller tree (exactly what libhdf5 does as a tree fills) — a
    // 40-record dense-attr index cannot be a single 29-record leaf
    var depth0 = depth
    while ({ val c = cumAt(depth0 + 1); c(depth0) < records.length }) depth0 += 1
    val effDepth = depth0
    val cum = cumAt(math.max(effDepth, 1))
    /** Fewest records a depth-d subtree can hold (leaf ≥ 1; internal ≥ two
      * minimal children + one separator).
      */
    def minRecs(d: Int): Int = (1 << (d + 1)) - 1

    def writeLeaf(recs: Seq[Array[Byte]]): Long = {
      require(recs.length <= maxLeafRecs, "leaf overflow")
      val a = o.pos.toLong
      o.ascii("BTLF"); o.u8(0); o.u8(recType)
      recs.foreach(o.bytes)
      o.u32(0) // checksum
      a
    }

    /** Writes the subtree bottom-up; returns (node address, records IN the
      * node, records in the whole subtree).
      */
    def build(recs: Seq[Array[Byte]], d: Int): (Long, Int, Long) =
      if (d == 0) (writeLeaf(recs), recs.length, recs.length.toLong)
      else {
        val minChild = minRecs(d - 1)
        require(recs.length >= minRecs(d), s"depth-$d btree needs >= ${minRecs(d)} records")
        val capChild = (math.min(if (d == 1) maxLeafRecs.toLong else cum(d - 1),
          Int.MaxValue.toLong)).toInt
        // B-tree split: child, separator record, child, …, child — N
        // separators REQUIRE N+1 children. Pick the child count so an EVEN
        // spread provably fits: c >= ceil((len+1)/(cap+1)) keeps every child
        // within capacity, c <= (len+1)/(minChild+1) keeps every child at or
        // above minChild; prefer ~3 children for shape richness.
        val len = recs.length
        val cFit = ((len + 1) + capChild) / (capChild + 1) // ceil((len+1)/(cap+1))
        val cKeep = (len + 1) / (minChild + 1)
        val c = math.min(math.max(math.max(2, cFit), math.min(3, cKeep)), cKeep)
        require(c >= cFit && c >= 2 && c <= cKeep, s"no valid split: $len recs, cap $capChild, min $minChild")
        val nChildRecs = len - (c - 1)
        val base = nChildRecs / c
        val extra = nChildRecs % c // first `extra` children take base+1
        val groups = scala.collection.mutable.ArrayBuffer[Seq[Array[Byte]]]()
        val seps = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
        var i = 0
        var g = 0
        while (g < c) {
          val take = base + (if (g < extra) 1 else 0)
          groups += recs.slice(i, i + take)
          i += take
          if (g < c - 1) { seps += recs(i); i += 1 }
          g += 1
        }
        require(i == len && seps.length == groups.length - 1, "split invariant broken")
        require(groups.forall(gr => gr.length >= minChild && gr.length <= capChild),
          s"child size out of bounds: ${groups.map(_.length)} cap=$capChild min=$minChild")
        val children = groups.map(g => build(g, d - 1))
        val btinAddr = o.pos.toLong
        o.ascii("BTIN"); o.u8(0); o.u8(recType)
        seps.foreach(o.bytes)
        children.foreach { case (addr, nRec, total) =>
          o.u64(addr)
          (0 until nrecSize).foreach(b => o.u8((nRec >> (8 * b)) & 0xff))
          if (d - 1 >= 1) {
            val ts = encSize(cum(d - 1))
            (0 until ts).foreach(b => o.u8(((total >> (8 * b)) & 0xff).toInt))
          }
        }
        o.u32(0) // checksum
        (btinAddr, seps.length, recs.length.toLong)
      }

    val (rootAddr, rootNRecs, _) = build(records, effDepth)

    val bthdAddr = o.pos.toLong
    o.ascii("BTHD"); o.u8(0); o.u8(recType)
    o.u32(nodeSize.toLong)
    o.u16(recordSize)
    o.u16(effDepth)
    o.u8(100); o.u8(40)          // split / merge percent
    o.u64(rootAddr)
    o.u16(rootNRecs)             // records in root node
    o.u64(records.length.toLong) // total records
    o.u32(0)                     // checksum
    bthdAddr
  }

  /** Attribute messages for a header: compact 0x000C messages for up to 8
    * attributes; above that, DENSE storage (libhdf5's max_compact default):
    * serialized v3 attribute bodies in a fractal heap + a type-8 v2 B-tree
    * (record: heap ID padded to 8 + message flags + creation order + hash),
    * referenced by one attribute-info (0x0015) message.
    */
  private def attrMessages(o: Out, attrs: Seq[(String, Any)]): Seq[(Int, Array[Byte])] =
    if (attrs.length <= 8) attrs.map(a => 0x000C -> attrMsg(o, a._1, a._2))
    else {
      val bodies = attrs.map(a => attrMsg(o, a._1, a._2))
      val (frhpAddr, heapIds) = writeFractalHeap(o, bodies)
      val records = bodies.indices.map { i =>
        val b = ByteBuffer.allocate(8 + 1 + 4 + 4).order(ByteOrder.LITTLE_ENDIAN)
        b.put(heapIds(i)); b.put(0.toByte) // 7-byte ID padded to 8
        b.put(0.toByte)   // message flags
        b.putInt(i)       // creation order
        b.putInt(0)       // name hash (reader enumerates, ignores)
        b.array()
      }
      val bthdAddr = writeBtreeV2(o, 8, records)
      val ai = ByteBuffer.allocate(18).order(ByteOrder.LITTLE_ENDIAN)
      ai.put(0.toByte); ai.put(0.toByte); ai.putLong(frhpAddr); ai.putLong(bthdAddr)
      Seq(0x0015 -> ai.array())
    }

  // ---- groups ----

  private def writeGroup(o: Out, g: WGroup): Long = {
    val links = g.children.map { case (n, c) => (n, writeNode(o, c)) }
    val attrMsgs = attrMessages(o, g.attrs)
    if (links.length <= 8) {
      // compact: link-info with undefined heap/btree + one link message each
      val li = ByteBuffer.allocate(18).order(ByteOrder.LITTLE_ENDIAN)
      li.put(0.toByte); li.put(0.toByte); li.putLong(Undef); li.putLong(Undef)
      val msgs = Seq(0x0002 -> li.array(), 0x000A -> Array[Byte](0, 0)) ++
        links.map(l => 0x0006 -> linkBody(l._1, l._2)) ++ attrMsgs
      writeHeader(o, msgs)
    } else {
      // dense links: serialized link bodies in a fractal heap + a type-5
      // v2 B-tree (record: hash + heap ID of the group's id length)
      val bodies = links.map(l => linkBody(l._1, l._2))
      val (frhpAddr, heapIds) = writeFractalHeap(o, bodies,
        g.heapMaxDirect, g.heapFiltered, g.heapIdLen, g.heapMaxManaged)
      val records = bodies.indices.map { i =>
        val b = ByteBuffer.allocate(4 + g.heapIdLen).order(ByteOrder.LITTLE_ENDIAN)
        b.putInt(0) // name hash (reader enumerates, ignores)
        b.put(heapIds(i))
        b.array()
      }
      val bthdAddr = writeBtreeV2(o, 5, records, depth = g.denseDepth)
      val li = ByteBuffer.allocate(18).order(ByteOrder.LITTLE_ENDIAN)
      li.put(0.toByte); li.put(0.toByte); li.putLong(frhpAddr); li.putLong(bthdAddr)
      writeHeader(o, Seq(0x0002 -> li.array(), 0x000A -> Array[Byte](0, 0)) ++ attrMsgs)
    }
  }

  // ---- datasets ----

  private def encodeValues(d: WDataset, from: Int, count: Int, stride: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(count * d.elemSize).order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < count) {
      val idx = from + i * stride
      val v = if (idx < d.values.length) d.values(idx) else 0.0
      if (d.isInt) d.elemSize match {
        case 1 => b.put(v.toLong.toByte)
        case 2 => b.putShort(v.toLong.toShort)
        case 4 => b.putInt(v.toLong.toInt)
        case 8 => b.putLong(v.toLong)
      } else d.elemSize match {
        case 4 => b.putFloat(v.toFloat)
        case 8 => b.putDouble(v)
      }
      i += 1
    }
    b.array()
  }

  private def writeDataset(o: Out, d: WDataset): Long = {
    require(!d.gzip || d.layoutV4.exists(t => t == 4 || t == 5),
      "writer: gzip only implemented for the extensible-array and v2-btree paths")
    val n = d.dims.product.toInt
    val layout: Array[Byte] = (d.chunkDims, d.layoutV4) match {
      case (None, None) =>
        val dataAddr = o.pos.toLong
        o.bytes(encodeValues(d, 0, n, 1))
        val b = ByteBuffer.allocate(18).order(ByteOrder.LITTLE_ENDIAN)
        b.put(3.toByte); b.put(1.toByte); b.putLong(dataAddr)
        b.putLong(n.toLong * d.elemSize)
        b.array()
      case (Some(cd), None) =>
        val btreeAddr = writeChunked(o, d, cd)
        val b = ByteBuffer.allocate(3 + 8 + 4 * (cd.length + 1))
          .order(ByteOrder.LITTLE_ENDIAN)
        b.put(3.toByte); b.put(2.toByte); b.put((cd.length + 1).toByte)
        b.putLong(btreeAddr)
        cd.foreach(c => b.putInt(c.toInt))
        b.putInt(d.elemSize)
        b.array()
      case (Some(cd), Some(idxType)) =>
        writeLayoutV4(o, d, cd, idxType)
      case (None, Some(_)) => sys.error("layoutV4 requires chunkDims")
    }
    val dt = if (d.isInt) dtInt(d.elemSize) else dtFloat(d.elemSize)
    val filterMsg: Seq[(Int, Array[Byte])] = if (d.gzip) {
      // filter pipeline v1: version, nfilters, 6 reserved; then one deflate
      // filter desc (id=1, no name, 1 client value = level, pad to 8)
      val b = ByteBuffer.allocate(24).order(ByteOrder.LITTLE_ENDIAN)
      b.put(1.toByte); b.put(1.toByte); b.put(new Array[Byte](6))
      b.putShort(1); b.putShort(0); b.putShort(0); b.putShort(1)
      b.putInt(6); b.putInt(0)
      Seq(0x000B -> b.array())
    } else Seq.empty
    val msgs = Seq(
      0x0003 -> dt,
      0x0001 -> dataspace(d.dims),
      0x0008 -> layout) ++ filterMsg ++ attrMessages(o, d.attrs)
    writeHeader(o, msgs)
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val df = new java.util.zip.Deflater()
    df.setInput(data); df.finish()
    val buf = new Array[Byte](data.length + 64)
    val bos = new java.io.ByteArrayOutputStream()
    while (!df.finished()) bos.write(buf, 0, df.deflate(buf))
    df.end()
    bos.toByteArray
  }

  /** Serialize one full (zero-padded) chunk at grid offset `off`, row-major. */
  private def chunkBlock(d: WDataset, cd: Array[Long], off: Array[Int]): Array[Byte] = {
    val rank = d.dims.length
    val stride = new Array[Long](rank)
    var acc = 1L
    for (i <- (rank - 1) to 0 by -1) { stride(i) = acc; acc *= d.dims(i) }
    val cn = cd.product.toInt
    val b = ByteBuffer.allocate(cn * d.elemSize).order(ByteOrder.LITTLE_ENDIAN)
    val cidx = new Array[Int](rank)
    var more = true
    while (more) {
      val inBounds = (0 until rank).forall(i => off(i) + cidx(i) < d.dims(i))
      val src = (0 until rank).map(i => (off(i) + cidx(i)) * stride(i)).sum.toInt
      val v = if (inBounds) d.values(src) else 0.0
      if (d.isInt) d.elemSize match {
        case 1 => b.put(v.toLong.toByte)
        case 2 => b.putShort(v.toLong.toShort)
        case 4 => b.putInt(v.toLong.toInt)
        case 8 => b.putLong(v.toLong)
      } else d.elemSize match {
        case 4 => b.putFloat(v.toFloat)
        case 8 => b.putDouble(v)
      }
      var c = rank - 1
      var carry = true
      while (carry && c >= 0) {
        cidx(c) += 1
        if (cidx(c) < cd(c)) carry = false else { cidx(c) = 0; c -= 1 }
      }
      if (carry) more = false
    }
    b.array()
  }

  /** Row-major chunk-grid offsets for a dataset cut by `cd`. */
  private def gridOffsets(d: WDataset, cd: Array[Long]): Seq[Array[Int]] = {
    val rank = d.dims.length
    val gridDims = Array.tabulate(rank)(i => ((d.dims(i) + cd(i) - 1) / cd(i)).toInt)
    gridDims.foldLeft(Seq(Seq.empty[Int]))((a, g) =>
      a.flatMap(pre => (0 until g).map(pre :+ _)))
      .map(cc => Array.tabulate(rank)(i => cc(i) * cd(i).toInt))
  }

  /** v4 data-layout message with the requested chunk index (1 = single
    * chunk, 2 = implicit, 3 = fixed array, all unfiltered).
    */
  private def writeLayoutV4(o: Out, d: WDataset, cd: Array[Long], idxType: Int): Array[Byte] = {
    val rank = d.dims.length
    val offsets = gridOffsets(d, cd)
    val addrField: Long = idxType match {
      case 1 => // single chunk: the chunk IS the dataset extent
        require(offsets.length == 1, "single-chunk index needs chunkDims >= dims")
        val addr = o.pos.toLong
        o.bytes(chunkBlock(d, cd, offsets.head))
        addr
      case 2 => // implicit: equal-size chunks back-to-back in grid order
        val base = o.pos.toLong
        offsets.foreach(off => o.bytes(chunkBlock(d, cd, off)))
        base
      case 3 => // fixed array: chunks, then FADB entries, then FAHD.
        // > 2^pageBits entries -> PAGED data block: page-init bitmap after
        // the header, elements in 1024-entry pages each tailed by a checksum
        val chunkAddrs = offsets.map { off =>
          val a = o.pos.toLong
          o.bytes(chunkBlock(d, cd, off))
          a
        }
        val pageBits = 10
        val pageNelmts = 1 << pageBits
        val paged = chunkAddrs.length > pageNelmts
        val fadbAddr = o.pos.toLong
        o.ascii("FADB"); o.u8(0); o.u8(0) // version, client 0 (unfiltered)
        val fahdPatch = o.pos
        o.u64(0) // header address (patched)
        if (!paged) {
          chunkAddrs.foreach(o.u64)
          o.u32(0) // data-block checksum
        } else {
          val nPages = (chunkAddrs.length + pageNelmts - 1) / pageNelmts
          (0 until (nPages + 7) / 8).foreach(_ => o.u8(0xff)) // page-init bitmap
          o.u32(0) // data-block checksum (covers header + bitmap)
          chunkAddrs.grouped(pageNelmts).foreach { page =>
            page.foreach(o.u64)
            o.u32(0) // per-page checksum
          }
        }
        val fahdAddr = o.pos.toLong
        o.ascii("FAHD"); o.u8(0); o.u8(0) // version, client 0
        o.u8(8)  // entry size (one 8-byte address)
        o.u8(pageBits)
        o.u64(chunkAddrs.length.toLong) // max entries
        o.u64(fadbAddr)
        o.u32(0) // checksum
        o.patch64(fahdPatch, fahdAddr)
        fahdAddr
      case 4 => // extensible array: chunks -> EADB data blocks -> EAIB -> EAHD
        val maxBits = 32
        val (idxElmts, minElmts, minPtrs, pageBits) = d.eaCparams
        val client = if (d.gzip) 1 else 0
        val entrySize = if (d.gzip) 16 else 8 // addr [+ size(4) + mask(4)]
        // (addr, stored byte size) per chunk; filtered chunks are deflated
        val chunkAddrs = offsets.map { off =>
          val a = o.pos.toLong
          val raw = chunkBlock(d, cd, off)
          val data = if (d.gzip) deflate(raw) else raw
          o.bytes(data)
          (a, data.length)
        }
        def writeElem(e: (Long, Int)): Unit = {
          o.u64(e._1)
          if (d.gzip) { o.u32(e._2.toLong); o.u32(0) } // size + filter mask
        }
        def writeUndefElem(): Unit = {
          o.u64(Undef)
          if (d.gzip) { o.u32(0); o.u32(0) }
        }
        val inline = chunkAddrs.take(idxElmts)
        val rest = chunkAddrs.drop(idxElmts)
        // directly-addressed data blocks: super block u holds 2^(u/2)
        // blocks of minElmts*2^((u+1)/2) elements, u < 2*log2(minPtrs);
        // later super blocks go through EASB secondary blocks
        val nsblksDirect = 2 * (31 - Integer.numberOfLeadingZeros(minPtrs))
        val dblkCaps = (0 until nsblksDirect).flatMap(u =>
          Seq.fill(1 << (u / 2))(minElmts << ((u + 1) / 2)))
        val hdrPatches = Seq.newBuilder[Int]
        def writeDataBlock(take: Seq[(Long, Int)], cap: Int, blockOff: Int): Long = {
          val addr = o.pos.toLong
          o.ascii("EADB"); o.u8(0); o.u8(client)
          hdrPatches += o.pos
          o.u64(0)               // header address (patched)
          o.u32(blockOff.toLong) // block offset, maxBits/8 = 4 bytes
          if (cap <= (1 << pageBits)) {
            take.foreach(writeElem)
            (take.length until cap).foreach(_ => writeUndefElem()) // unallocated
            o.u32(0)             // checksum
          } else {
            // PAGED data block (capacity > 2^pageBits elements): the
            // prefix carries its own checksum, then each page is
            // 2^pageBits elements tailed by a page checksum — no elements
            // inline in the prefix (H5EAcache serialize layout)
            o.u32(0)             // prefix checksum
            val pageNelmts = 1 << pageBits
            var i = 0
            while (i < cap) {
              if (i < take.length) writeElem(take(i)) else writeUndefElem()
              i += 1
              if (i % pageNelmts == 0) o.u32(0) // page checksum
            }
          }
          addr
        }
        var consumed = 0
        val dblkAddrs = Seq.newBuilder[Long]
        var slot = 0
        while (consumed < rest.length && slot < dblkCaps.length) {
          val cap = dblkCaps(slot)
          val take = rest.slice(consumed, consumed + cap)
          dblkAddrs += writeDataBlock(take, cap, idxElmts + consumed)
          consumed += take.length
          slot += 1
        }
        // overflow into secondary blocks: super block u = nsblksDirect + s
        val sblkAddrs = Seq.newBuilder[Long]
        var sblk = 0
        // element offset where the NEXT super block's range starts —
        // advances by each super block's full capacity (ndblks * cap),
        // so every EASB writes its own correct block-offset field
        var sblkElemOff = idxElmts + dblkCaps.sum
        while (consumed < rest.length) {
          val u = nsblksDirect + sblk
          val ndblks = 1 << (u / 2)
          val cap = minElmts << ((u + 1) / 2)
          val sbDblks = Seq.newBuilder[Long]
          var dbI = 0
          while (dbI < ndblks && consumed < rest.length) {
            val take = rest.slice(consumed, consumed + cap)
            sbDblks += writeDataBlock(take, cap, idxElmts + consumed)
            consumed += take.length
            dbI += 1
          }
          val addr = o.pos.toLong
          o.ascii("EASB"); o.u8(0); o.u8(client)
          hdrPatches += o.pos
          o.u64(0)                 // header address (patched)
          o.u32(sblkElemOff.toLong) // block offset of THIS super block
          val written = sbDblks.result()
          written.foreach(o.u64)
          (written.length until ndblks).foreach(_ => o.u64(Undef))
          o.u32(0)                            // checksum
          sblkAddrs += addr
          sblkElemOff += ndblks * cap
          sblk += 1
        }
        val eaibAddr = o.pos.toLong
        o.ascii("EAIB"); o.u8(0); o.u8(client)
        hdrPatches += o.pos
        o.u64(0) // header address (patched)
        inline.foreach(writeElem)
        (inline.length until idxElmts).foreach(_ => writeUndefElem())
        val dblks = dblkAddrs.result()
        dblks.foreach(o.u64)
        (dblks.length until dblkCaps.length).foreach(_ => o.u64(Undef))
        sblkAddrs.result().foreach(o.u64) // secondary pointers after direct area
        o.u32(0) // checksum
        val eahdAddr = o.pos.toLong
        o.ascii("EAHD"); o.u8(0); o.u8(client)
        o.u8(entrySize)
        o.u8(maxBits); o.u8(idxElmts); o.u8(minElmts); o.u8(minPtrs); o.u8(pageBits)
        (0 until 6).foreach(_ => o.u64(0)) // stats
        o.u64(eaibAddr)
        o.u32(0) // checksum
        hdrPatches.result().foreach(p => o.patch64(p, eahdAddr))
        eahdAddr
      case 5 => // v2 B-tree: chunks, then BTLF/BTHD with type-10 records
        // (unfiltered) or type-11 (deflate: addr + variable-width stored
        // size + filter mask + scaled offsets; size-field width = the
        // spec's enc-size of the worst-case stored chunk size, +1 headroom
        // for incompressible chunks, as libhdf5 allows)
        val chunkBytes = (cd.product * d.elemSize).toInt
        val szBytes =
          if (!d.gzip) 0
          else math.min(8,
            (63 - java.lang.Long.numberOfLeadingZeros(chunkBytes.toLong)) / 8 + 2)
        val records = offsets.map { off =>
          val addr = o.pos.toLong
          val raw = chunkBlock(d, cd, off)
          val data = if (d.gzip) deflate(raw) else raw
          o.bytes(data)
          val b = ByteBuffer.allocate(8 + szBytes + (if (d.gzip) 4 else 0) + 8 * rank)
            .order(ByteOrder.LITTLE_ENDIAN)
          b.putLong(addr)
          if (d.gzip) {
            (0 until szBytes).foreach(k => b.put(((data.length >> (8 * k)) & 0xff).toByte))
            b.putInt(0) // filter mask
          }
          (0 until rank).foreach(i => b.putLong(off(i) / cd(i))) // scaled offsets
          b.array()
        }
        writeBtreeV2(o, if (d.gzip) 11 else 10, records, depth = d.btreeDepth)
      case t => sys.error(s"writer: unsupported v4 index type $t")
    }
    val extra = idxType match { case 3 => 1; case 4 => 5; case 5 => 6; case _ => 0 }
    val b = ByteBuffer.allocate(5 + 4 * rank + 1 + extra + 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.put(4.toByte); b.put(2.toByte) // version 4, chunked
    b.put(0.toByte)                  // flags
    b.put(rank.toByte)
    b.put(4.toByte)                  // dim size encoded length
    cd.foreach(c => b.putInt(c.toInt))
    b.put(idxType.toByte)
    if (idxType == 3) b.put(10.toByte) // page bits
    if (idxType == 4) { // cparams: maxBits, idxElmts, minPtrs, minElmts, pageBits
      val (idxElmts, minElmts, minPtrs, pageBits) = d.eaCparams
      b.put(32.toByte); b.put(idxElmts.toByte); b.put(minPtrs.toByte)
      b.put(minElmts.toByte); b.put(pageBits.toByte)
    }
    if (idxType == 5) { // node size (4), split percent, merge percent
      b.putInt(512); b.put(100.toByte); b.put(40.toByte)
    }
    b.putLong(addrField)
    b.array()
  }

  /** Write raw (unfiltered) chunks + a flat v1 chunk B-tree (level 0). */
  private def writeChunked(o: Out, d: WDataset, cd: Array[Long]): Long = {
    val rank = d.dims.length
    require(cd.length == rank)
    val gridDims = Array.tabulate(rank)(i => ((d.dims(i) + cd(i) - 1) / cd(i)).toInt)
    // dataset strides
    val stride = new Array[Long](rank)
    var acc = 1L
    for (i <- (rank - 1) to 0 by -1) { stride(i) = acc; acc *= d.dims(i) }
    // enumerate chunks in row-major grid order
    val chunkCoords = gridDims.foldLeft(Seq(Seq.empty[Int]))((a, g) =>
      a.flatMap(pre => (0 until g).map(pre :+ _)))
    val written = chunkCoords.map { cc =>
      val off = Array.tabulate(rank)(i => cc(i) * cd(i))
      // serialize the FULL chunk (edge chunks zero-padded), row-major
      val cn = cd.product.toInt
      val b = ByteBuffer.allocate(cn * d.elemSize).order(ByteOrder.LITTLE_ENDIAN)
      val cidx = new Array[Int](rank)
      var more = true
      while (more) {
        val inBounds = (0 until rank).forall(i => off(i) + cidx(i) < d.dims(i))
        val src = (0 until rank).map(i => (off(i) + cidx(i)) * stride(i)).sum.toInt
        val v = if (inBounds) d.values(src) else 0.0
        if (d.isInt) d.elemSize match {
          case 1 => b.put(v.toLong.toByte)
          case 2 => b.putShort(v.toLong.toShort)
          case 4 => b.putInt(v.toLong.toInt)
          case 8 => b.putLong(v.toLong)
        } else d.elemSize match {
          case 4 => b.putFloat(v.toFloat)
          case 8 => b.putDouble(v)
        }
        var c = rank - 1
        var carry = true
        while (carry && c >= 0) {
          cidx(c) += 1
          if (cidx(c) < cd(c)) carry = false else { cidx(c) = 0; c -= 1 }
        }
        if (carry) more = false
      }
      val addr = o.pos.toLong
      val bytes = b.array()
      o.bytes(bytes)
      (off, addr, bytes.length)
    }
    val btreeAddr = o.pos.toLong
    o.ascii("TREE"); o.u8(1); o.u8(0)
    o.u16(written.length)
    o.u64(Undef); o.u64(Undef) // siblings
    written.foreach { case (off, addr, size) =>
      o.u32(size.toLong); o.u32(0)
      off.foreach(x => o.u64(x.toLong))
      o.u64(0) // element-size coordinate
      o.u64(addr)
    }
    // final key
    o.u32(0); o.u32(0)
    d.dims.foreach(x => o.u64(x))
    o.u64(0)
    btreeAddr
  }
}
