package graft.odim

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.Inflater

/** Minimal pure-JVM HDF5 reader for the ODIM subset.
  *
  * Spark ships no HDF5 source and the build is offline, so this implements
  * exactly the features ODIM VP/PVOL files use (verified against the
  * reference fixtures, cf. /root/reference/src/vptstools/odimh5.py:16-138 for
  * the consumed surface), plus the structures modern writers (libhdf5
  * `libver='latest'`) emit for the same content:
  *
  *   - superblock v0/v1 AND v2/v3, 4- or 8-byte offsets
  *   - version-1 object headers (+ continuations) AND version-2 'OHDR'
  *     headers (+ 'OCHK' continuation blocks)
  *   - old-style symbol-table groups (B-tree v1 + local heap + SNOD) AND
  *     new-style groups: compact (link messages in the header) and dense
  *     (fractal heap + v2 B-tree name index at any depth; heaps with a
  *     direct root, indirect roots, NESTED indirect blocks, and FILTERED
  *     heaps whose deflated direct blocks inflate into an extension
  *     address space)
  *   - attribute messages v1 AND v2/v3 (fixed/variable-length strings via
  *     global heap, ints, floats)
  *   - N-D datasets with contiguous or gzip-chunked (B-tree v1 chunk index)
  *     layout; chunks are placed by full row-major coordinates, so 2-D chunk
  *     grids with more than one column reassemble correctly
  *
  * Byte-parsing only — no JNI, no dependencies — so it can run inside Spark
  * executors in a mapPartitions decode of binaryFile rows.
  */
final class Hdf5File(bytes: Array[Byte]) {

  private val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)

  // Extension address space: positions >= fileLen address `ext` — scratch
  // holding INFLATED filtered fractal-heap direct blocks, so heap-object
  // parsing (links, attributes) reads decompressed bytes through the same
  // position-typed primitives as the rest of the file. Grown only at
  // FractalHeap construction; reads never straddle the boundary because a
  // parsed structure lives entirely in one space.
  private val fileLen = bytes.length
  private var ext: Array[Byte] = Array.emptyByteArray
  private var extBuf: ByteBuffer = ByteBuffer.wrap(ext).order(ByteOrder.LITTLE_ENDIAN)
  private def addScratch(data: Array[Byte]): Int = {
    val base = fileLen + ext.length
    ext = java.util.Arrays.copyOf(ext, ext.length + data.length)
    System.arraycopy(data, 0, ext, base - fileLen, data.length)
    extBuf = ByteBuffer.wrap(ext).order(ByteOrder.LITTLE_ENDIAN)
    base
  }

  private def u8(p: Int): Int =
    (if (p < fileLen) bytes(p) else ext(p - fileLen)) & 0xff
  private def u16(p: Int): Int =
    if (p < fileLen) buf.getShort(p) & 0xffff else extBuf.getShort(p - fileLen) & 0xffff
  private def u32(p: Int): Long =
    if (p < fileLen) buf.getInt(p) & 0xffffffffL else extBuf.getInt(p - fileLen) & 0xffffffffL
  private def u64(p: Int): Long =
    if (p < fileLen) buf.getLong(p) else extBuf.getLong(p - fileLen)
  private def i32(p: Int): Int =
    if (p < fileLen) buf.getInt(p) else extBuf.getInt(p - fileLen)
  private def f32(p: Int): Float =
    if (p < fileLen) buf.getFloat(p) else extBuf.getFloat(p - fileLen)
  private def f64(p: Int): Double =
    if (p < fileLen) buf.getDouble(p) else extBuf.getDouble(p - fileLen)
  private def strAt(p: Int, n: Int, cs: String): String =
    if (p < fileLen) new String(bytes, p, n, cs) else new String(ext, p - fileLen, n, cs)

  // --- superblock ---
  private val sigOk = bytes.length > 8 &&
    bytes.slice(0, 8).sameElements(Array(0x89, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n').map(_.toByte))
  require(sigOk, "not an HDF5 file (bad signature)")

  private val sbVersion = u8(8)
  require(sbVersion <= 3, s"unsupported superblock version $sbVersion")
  val offsetSize: Int = if (sbVersion >= 2) u8(9) else u8(13)
  val lengthSize: Int = if (sbVersion >= 2) u8(10) else u8(14)
  require(offsetSize == 4 || offsetSize == 8, s"unsupported offset size $offsetSize")

  private def offAt(p: Int): Long = if (offsetSize == 4) u32(p) else u64(p)
  private def lenAt(p: Int): Long = if (lengthSize == 4) u32(p) else u64(p)
  private def undef(v: Long): Boolean =
    v == (if (offsetSize == 4) 0xffffffffL else -1L)

  val rootHeaderAddr: Long =
    if (sbVersion >= 2) {
      // v2/v3: sig(8) ver(1) sizes(2) flags(1), then base / extension / EOF /
      // root-object-header addresses + checksum
      val baseAddr = offAt(12)
      require(baseAddr == 0, s"nonzero base address $baseAddr unsupported")
      offAt(12 + 3 * offsetSize)
    } else {
      // v0: offsets start at 24; v1 adds 4 bytes (indexed-storage k + reserved)
      val sbFixed = if (sbVersion == 0) 24 else 28
      val baseAddr = offAt(sbFixed)
      require(baseAddr == 0, s"nonzero base address $baseAddr unsupported")
      // root group symbol-table entry follows the 4 superblock addresses
      val rootEntryPos = sbFixed + 4 * offsetSize
      offAt(rootEntryPos + offsetSize)
    }

  // --- object headers (version 1, and version 2 'OHDR') ---
  final case class Message(typ: Int, pos: Int, size: Int)

  // per-file memo: groupChildren + attributes + dataset each re-walk the
  // same header (2-3x per node, ~20 nodes per ODIM file) — parsing is
  // pure, so cache per address
  private val headerCache = new java.util.HashMap[Long, Seq[Message]]()

  def objectHeader(addr: Long): Seq[Message] = {
    val cached = headerCache.get(addr)
    if (cached != null) return cached
    val p0 = addr.toInt
    val parsed =
      if (ascii(p0, 4) == "OHDR") objectHeaderV2(p0)
      else {
        require(u8(p0) == 1, s"unsupported object header version ${u8(p0)} @ $addr")
        objectHeaderV1(p0)
      }
    headerCache.put(addr, parsed)
    parsed
  }

  private def objectHeaderV1(p0: Int): Seq[Message] = {
    val totalMsgs = u16(p0 + 2)
    var remaining = totalMsgs
    val out = Vector.newBuilder[Message]
    // (blockPos, blockEnd); first body starts at +16 (12 rounded to 8)
    var blocks = List((p0 + 16, p0 + 16 + u32(p0 + 8).toInt))
    while (remaining > 0 && blocks.nonEmpty) {
      var (p, end) = blocks.head
      blocks = blocks.tail
      while (remaining > 0 && p + 8 <= end) {
        val typ = u16(p); val size = u16(p + 2)
        if (typ == 0x0010) { // continuation
          val contOff = offAt(p + 8); val contLen = lenAt(p + 8 + offsetSize)
          blocks = (contOff.toInt, (contOff + contLen).toInt) :: blocks
        } else {
          out += Message(typ, p + 8, size)
        }
        remaining -= 1
        p += 8 + size
      }
    }
    out.result()
  }

  /** Version-2 object header: 'OHDR' + flags-dependent prefix, then
    * 1-byte-type messages; continuations (type 0x10) point at 'OCHK' blocks
    * (signature + messages + trailing 4-byte checksum).
    */
  private def objectHeaderV2(p0: Int): Seq[Message] = {
    require(u8(p0 + 4) == 2, s"unsupported OHDR version ${u8(p0 + 4)}")
    val flags = u8(p0 + 5)
    var p = p0 + 6
    if ((flags & 0x20) != 0) p += 16 // access/mod/change/birth times
    if ((flags & 0x10) != 0) p += 4  // max-compact / min-dense attr counts
    val chunk0FieldSize = 1 << (flags & 0x03)
    val chunk0Size = (chunk0FieldSize match {
      case 1 => u8(p).toLong
      case 2 => u16(p).toLong
      case 4 => u32(p)
      case 8 => u64(p)
    }).toInt
    p += chunk0FieldSize
    val msgHeadLen = if ((flags & 0x04) != 0) 6 else 4 // +2 creation order
    val out = Vector.newBuilder[Message]
    // (start, end) of message regions; chunk 0 excludes its trailing checksum
    var blocks = List((p, p + chunk0Size))
    while (blocks.nonEmpty) {
      var (q, end) = blocks.head
      blocks = blocks.tail
      while (q + msgHeadLen <= end) {
        val typ = u8(q); val size = u16(q + 1) // msg flags at q+3 ignored
        if (typ == 0x10) { // continuation -> OCHK block
          val contOff = offAt(q + msgHeadLen)
          val contLen = lenAt(q + msgHeadLen + offsetSize)
          val cp = contOff.toInt
          require(ascii(cp, 4) == "OCHK", s"expected OCHK @ $contOff")
          blocks = (cp + 4, (contOff + contLen).toInt - 4) :: blocks
        } else if (typ != 0x00) { // NIL messages carry no payload of interest
          out += Message(typ, q + msgHeadLen, size)
        }
        q += msgHeadLen + size
      }
    }
    out.result()
  }

  // --- groups ---
  // old style: symbol table message (0x0011) -> B-tree v1 + local heap
  // new style: compact = link messages (0x0006) in the header;
  //            dense   = link-info message (0x0002) -> fractal heap + v2 B-tree
  def groupChildren(headerAddr: Long): Map[String, Long] = {
    val msgs = objectHeader(headerAddr)
    msgs.find(_.typ == 0x0011) match {
      case Some(m) => symbolTableChildren(m)
      case None =>
        val compact = msgs.filter(_.typ == 0x0006).map(m => parseLink(m.pos))
        if (compact.nonEmpty) compact.toMap
        else msgs.find(_.typ == 0x0002).map(denseChildren).getOrElse(Map.empty)
    }
  }

  private def symbolTableChildren(m: Message): Map[String, Long] = {
    val btreeAddr = offAt(m.pos)
    val heapAddr = offAt(m.pos + offsetSize)
    val heapData = localHeapData(heapAddr)
    val out = Map.newBuilder[String, Long]
    def walkBtree(addr: Long): Unit = {
      val p = addr.toInt
      require(ascii(p, 4) == "TREE", s"expected TREE @ $addr")
      val level = u8(p + 5); val entries = u16(p + 6)
      var cp = p + 8 + 2 * offsetSize + lengthSize // skip siblings + key0
      var i = 0
      while (i < entries) {
        val child = offAt(cp)
        if (level == 0) walkSnod(child) else walkBtree(child)
        cp += offsetSize + lengthSize // child + next key
        i += 1
      }
    }
    def walkSnod(addr: Long): Unit = {
      val p = addr.toInt
      require(ascii(p, 4) == "SNOD", s"expected SNOD @ $addr")
      val nsyms = u16(p + 6)
      var sp = p + 8
      var i = 0
      while (i < nsyms) {
        val nameOff = offAt(sp)
        val objAddr = offAt(sp + offsetSize)
        out += cstring(heapData + nameOff.toInt) -> objAddr
        sp += 2 * offsetSize + 8 + 16
        i += 1
      }
    }
    walkBtree(btreeAddr)
    out.result()
  }

  /** Link message (type 0x0006) body -> (name, object header address). */
  private def parseLink(p: Int): (String, Long) = {
    require(u8(p) == 1, s"unsupported link message version ${u8(p)}")
    val flags = u8(p + 1)
    var q = p + 2
    val linkType = if ((flags & 0x08) != 0) { val t = u8(q); q += 1; t } else 0
    require(linkType == 0, s"only hard links supported (type $linkType)")
    if ((flags & 0x04) != 0) q += 8 // creation order
    if ((flags & 0x10) != 0) q += 1 // name character set
    val lenFieldSize = 1 << (flags & 0x03)
    val nameLen = (lenFieldSize match {
      case 1 => u8(q).toLong
      case 2 => u16(q).toLong
      case 4 => u32(q)
      case 8 => u64(q)
    }).toInt
    q += lenFieldSize
    val name = strAt(q, nameLen, "UTF-8")
    name -> offAt(q + nameLen)
  }

  /** Parsed fractal-heap geometry: resolve a managed heap ID (found at
    * `idPos` in the file) to the position of its object. Supports a single
    * root direct block, an indirect root whose direct-block rows follow
    * the doubling table (rows 0-1 at the starting block size, row i at
    * startingSize * 2^(i-1)), NESTED indirect blocks (rows at or past
    * maxDirectRows hold child indirect blocks covering that row's block
    * size, recursively — a child covering size S has
    * log2(S) - log2(startSize * width) + 1 rows), and FILTERED heaps:
    * whole direct blocks are deflated on disk (sizes ride the
    * indirect-block entries, or the header for a filtered direct root),
    * inflated once into the extension address space, and parsed there
    * through the same primitives.
    */
  private final class FractalHeap(heapAddr: Long) {
    private val h = heapAddr.toInt
    require(ascii(h, 4) == "FRHP", s"expected FRHP @ $heapAddr")
    private val heapIdLen = u16(h + 5)
    private val ioFilterLen = u16(h + 7)
    private val filtered = ioFilterLen > 0
    // fixed fields: maxManagedObjSize(4) then 12 length-sized + 2
    // offset-sized fields interleaved; walk them positionally
    private var f = h + 10 + 4
    f += lengthSize          // next huge object id
    private val hugeBtreeAddr = offAt(f); f += offsetSize
    f += lengthSize          // free space
    f += offsetSize          // free-space manager addr
    f += lengthSize * 6      // managed space, allocated, iterator, nmanaged, huge size, nhuge
    f += lengthSize * 2      // tiny size, ntiny
    private val tableWidth = u16(f); f += 2
    private val startBlockSize = lenAt(f); f += lengthSize
    private val maxDirectSize = lenAt(f); f += lengthSize
    private val maxHeapSizeBits = u16(f); f += 2
    f += 2                   // starting # rows
    private val rootBlockAddr = offAt(f); f += offsetSize
    private val curRows = u16(f); f += 2
    // filtered heap + direct root: the root block's stored size + mask
    // precede the filter info (absent when the root is undefined — an
    // all-tiny/all-huge heap has no direct blocks at all)
    private val rootFilteredSize: Long =
      if (filtered && curRows == 0 && !undef(rootBlockAddr)) {
        val s = lenAt(f); f += lengthSize + 4; s
      } else 0L
    val heapOffSize: Int = (maxHeapSizeBits + 7) / 8
    require(heapIdLen - 1 - heapOffSize >= 1,
      s"implausible heap id layout $heapIdLen/$heapOffSize")

    private def log2(v: Long): Int = 63 - java.lang.Long.numberOfLeadingZeros(v)
    private val maxDirectRows = log2(maxDirectSize) - log2(startBlockSize) + 2
    private val firstRowBits = log2(startBlockSize) + log2(tableWidth)
    private def rowBlockSize(row: Int): Long =
      if (row <= 1) startBlockSize else startBlockSize << (row - 1)

    /** Verify an FHDB block (inflating a filtered one into the extension
      * space) and return its readable position.
      */
    private def directBlockPos(addr: Long, size: Long, storedSize: Long): Long = {
      val pos: Long =
        if (filtered)
          addScratch(inflate(bytes, addr.toInt, storedSize.toInt,
            maxOut = size.toInt)).toLong
        else addr
      require(ascii(pos.toInt, 4) == "FHDB", s"expected FHDB @ $addr")
      pos
    }

    /** (heap-space start offset, size, readable position) per direct
      * block, in heap-offset order.
      */
    private val blocks: Seq[(Long, Long, Long)] =
      if (curRows == 0) {
        if (undef(rootBlockAddr)) Seq.empty // all-tiny/all-huge heap
        else if (filtered)
          Seq((0L, maxDirectSize,
            directBlockPos(rootBlockAddr, maxDirectSize, rootFilteredSize)))
        else
          Seq((0L, Long.MaxValue, directBlockPos(rootBlockAddr, 0, 0)))
      } else {
        val out = Seq.newBuilder[(Long, Long, Long)]
        def walkIndirect(addr: Long, baseOff: Long, nrows: Int): Unit = {
          val ib = addr.toInt
          require(ascii(ib, 4) == "FHIB", s"expected FHIB @ $addr")
          // child entries follow sig + version + heap hdr addr + block offset
          var p = ib + 5 + offsetSize + heapOffSize
          var heapOff = baseOff
          var row = 0
          while (row < nrows) {
            val sz = rowBlockSize(row)
            var col = 0
            while (col < tableWidth) {
              if (row < maxDirectRows) {
                // direct entry: address (+ stored size and filter mask in
                // filtered heaps)
                val a = offAt(p); p += offsetSize
                var fsz = 0L
                if (filtered) { fsz = lenAt(p); p += lengthSize + 4 }
                if (!undef(a)) out += ((heapOff, sz, directBlockPos(a, sz, fsz)))
              } else {
                // indirect entry: a child covering this row's block size
                val a = offAt(p); p += offsetSize
                if (!undef(a))
                  walkIndirect(a, heapOff, log2(sz) - firstRowBits + 1)
              }
              heapOff += sz
              col += 1
            }
            row += 1
          }
        }
        walkIndirect(rootBlockAddr, 0L, curRows)
        out.result()
      }

    /** Indirectly-accessed huge objects: (huge id -> (address, length))
      * from the heap's type-1 v2 B-tree (address + length + id, all
      * recorded at heap-insert time). Built lazily — most heaps have no
      * huge objects and an undefined btree address.
      */
    private lazy val hugeObjects: Map[Long, (Long, Long, Long)] = {
      if (undef(hugeBtreeAddr)) Map.empty
      else if (filtered)
        // type-2 records (filtered huge, indirectly accessed): address +
        // filtered length + filter mask (4) + memory size + id
        btreeV2Walk(hugeBtreeAddr, 2).recs.map { r =>
          val addr = offAt(r)
          val flen = lenAt(r + offsetSize)
          val memSize = lenAt(r + offsetSize + lengthSize + 4)
          val id = lenAt(r + offsetSize + 2 * lengthSize + 4)
          id -> ((addr, flen, memSize))
        }.toMap
      else
        btreeV2Walk(hugeBtreeAddr, 1).recs.map { r =>
          val addr = offAt(r)
          val len = lenAt(r + offsetSize)
          val id = lenAt(r + offsetSize + lengthSize)
          id -> ((addr, len, len))
        }.toMap
    }

    /** Readable position of the object whose heap ID starts at idPos.
      * Handles all three ID types: managed (resolved through the
      * direct-block geometry), TINY (payload inline in the ID — copied to
      * the extension space so callers parse it like any other position),
      * and HUGE (indirectly accessed via the heap's type-1/type-2 v2
      * B-tree; the directly-embedded variant only exists for IDs wide
      * enough to hold address+length, which standard 7-byte
      * group/attribute heaps never are).
      *
      * Memoized per ID position: TINY (and filtered-huge) resolution
      * appends to the extension scratch, so re-enumerating the same group
      * would otherwise copy the scratch array per call (quadratic growth).
      */
    private val objPosCache = new java.util.HashMap[Integer, Integer]()
    def objPos(idPos: Int): Int = {
      val cached = objPosCache.get(idPos)
      if (cached != null) return cached
      val r = objPosUncached(idPos)
      objPosCache.put(idPos, r)
      r
    }

    private def objPosUncached(idPos: Int): Int = {
      val idFlags = u8(idPos)
      ((idFlags >> 4) & 0x3) match {
        case 0 => // managed
          var off = 0L
          var b = 0
          while (b < heapOffSize) { off |= (u8(idPos + 1 + b).toLong << (8 * b)); b += 1 }
          val blk = blocks.find(bk => off >= bk._1 && off < bk._1 + bk._2)
            .getOrElse(sys.error(s"heap offset $off outside known direct blocks"))
          // heap offsets count from each block's start (header included)
          (blk._3 + (off - blk._1)).toInt
        case 2 => // tiny: length rides the ID. Normal sub-format (heap id
          // len <= 17): 4-bit length in the flag byte, payload at +1.
          // Extended (len >= 18): 12-bit length — high nibble in the flag
          // byte, low byte next — payload at +2 (libhdf5's exact split).
          val (len, at) =
            if (heapIdLen <= 17) ((idFlags & 0x0f) + 1, idPos + 1)
            else ((((idFlags & 0x0f) << 8) | u8(idPos + 1)) + 1, idPos + 2)
          val payload = new Array[Byte](len)
          var i = 0
          while (i < len) { payload(i) = u8(at + i).toByte; i += 1 }
          addScratch(payload)
        case 1 => // huge. Sub-variant decided exactly as libhdf5 does: the
          // id is DIRECT (location embedded in the id itself) when the
          // id's payload width fits address + length (+ mask + memory size
          // when filtered); otherwise it is a key into the heap's huge
          // btree (type-1 records; type-2 with the filtered extras). A
          // filtered huge object is individually deflated either way and
          // inflates on first access.
          val directWidth =
            offsetSize + lengthSize + (if (filtered) 4 + lengthSize else 0)
          if (heapIdLen - 1 >= directWidth) {
            val addr = offAt(idPos + 1)
            val len = lenAt(idPos + 1 + offsetSize)
            if (filtered) {
              val memSize = lenAt(idPos + 1 + offsetSize + lengthSize + 4)
              addScratch(inflate(bytes, addr.toInt, len.toInt, maxOut = memSize.toInt))
            } else addr.toInt
          } else {
            var id = 0L
            var b = 0
            // the id occupies the remaining heapIdLen - 1 bytes
            while (b < heapIdLen - 1) { id |= (u8(idPos + 1 + b).toLong << (8 * b)); b += 1 }
            val (addr, len, memSize) = hugeObjects.getOrElse(id,
              sys.error(s"huge heap object $id not in the huge btree"))
            if (filtered)
              addScratch(inflate(bytes, addr.toInt, len.toInt, maxOut = memSize.toInt))
            else addr.toInt
          }
        case t => sys.error(s"unsupported heap id type $t")
      }
    }
  }

  /** A walked v2 B-tree: the header's record size (callers of variable-width
    * record types — filtered chunks — derive field widths from it) plus each
    * record's file position in tree order.
    */
  private final case class BtreeV2(recordSize: Int, recs: Seq[Int])

  /** Minimum bytes to represent values up to `limit` — the spec's
    * H5VM_limit_enc_size (floor(log2(limit))/8 + 1), which sizes the
    * variable-width "number of records" fields in internal-node child
    * pointers.
    */
  private def limitEncSize(limit: Long): Int =
    (63 - java.lang.Long.numberOfLeadingZeros(math.max(limit, 1L))) / 8 + 1

  /** Enumerate a v2 B-tree's records (any depth), yielding each record's
    * file position in tree order (callers know the per-type record layout).
    *
    * An internal (BTIN) node at depth d holds N records followed by N+1
    * pointers to depth-(d−1) children. Each pointer is the child address
    * plus two variable-width counts whose widths the reader must re-derive
    * from the header alone:
    *   - records IN the child node — width = [[limitEncSize]] of the LEAF
    *     capacity ((nodeSize − 10) / recordSize; 10 = signature + version +
    *     type + checksum), at every depth, because leaves hold the most
    *     records of any node type;
    *   - total records in the child's whole subtree — present only when the
    *     child is itself internal (d ≥ 2), width = limitEncSize of the
    *     cumulative capacity cum(d−1), where cum(0) = leaf capacity and
    *     cum(d) = maxRec(d) + (maxRec(d)+1)·cum(d−1) with maxRec(d) the
    *     internal capacity ((nodeSize − 10 − ptrSize(d)) / (recordSize +
    *     ptrSize(d))).
    * Only the in-node count steers the walk; the subtree totals exist for
    * libhdf5's insertion balancing and are skipped here.
    */
  private def btreeV2Walk(btAddr: Long, expectType: Int): BtreeV2 = {
    val bt = btAddr.toInt
    require(ascii(bt, 4) == "BTHD", s"expected BTHD @ $btAddr")
    require(u8(bt + 5) == expectType,
      s"unexpected v2 btree record type ${u8(bt + 5)} (want $expectType)")
    val nodeSize = u32(bt + 6).toInt
    val recordSize = u16(bt + 10)
    val depth = u16(bt + 12)
    val rootNodeAddr = offAt(bt + 16)
    val rootNRecs = u16(bt + 16 + offsetSize)

    val maxLeafRecs = (nodeSize - 10) / recordSize
    val nrecSize = limitEncSize(maxLeafRecs.toLong)
    // cumulative subtree capacity per depth → sizes the optional
    // subtree-total pointer field (cumSize(d) applies to pointers whose
    // CHILD sits at depth d ≥ 1)
    val cum = new Array[Long](depth + 1)
    cum(0) = maxLeafRecs.toLong
    def ptrSize(childDepth: Int): Int =
      offsetSize + nrecSize + (if (childDepth >= 1) limitEncSize(cum(childDepth)) else 0)
    for (d <- 1 to depth) {
      val ps = ptrSize(d - 1)
      val maxRec = (nodeSize - 10 - ps) / (recordSize + ps)
      cum(d) = maxRec.toLong + (maxRec.toLong + 1) * cum(d - 1)
    }

    def varUint(p: Int, n: Int): Int = {
      var v = 0L
      var b = 0
      while (b < n) { v |= u8(p + b).toLong << (8 * b); b += 1 }
      v.toInt
    }

    def walk(addr: Int, nRecs: Int, d: Int): Seq[Int] =
      if (d == 0) {
        require(ascii(addr, 4) == "BTLF", s"expected BTLF @ $addr")
        require(u8(addr + 5) == expectType,
          s"leaf record type ${u8(addr + 5)} != $expectType")
        (0 until nRecs).map(i => addr + 6 + i * recordSize)
      } else {
        require(ascii(addr, 4) == "BTIN", s"expected BTIN @ $addr")
        require(u8(addr + 5) == expectType,
          s"internal record type ${u8(addr + 5)} != $expectType")
        val recsAt = addr + 6
        val ptrsAt = recsAt + nRecs * recordSize
        val ps = ptrSize(d - 1)
        // tree order: child0, rec0, child1, rec1, …, rec(N−1), childN
        (0 to nRecs).flatMap { i =>
          val p = ptrsAt + i * ps
          val child = walk(offAt(p).toInt, varUint(p + offsetSize, nrecSize), d - 1)
          if (i < nRecs) child :+ (recsAt + i * recordSize) else child
        }
      }

    BtreeV2(recordSize, walk(rootNodeAddr.toInt, rootNRecs, depth))
  }

  private def btreeV2Records(btAddr: Long, expectType: Int): Seq[Int] =
    btreeV2Walk(btAddr, expectType).recs

  /** Dense new-style group: the link-info message points at a fractal heap
    * holding serialized link-message bodies and a v2 B-tree (record type 5:
    * hash(4) + heap ID) indexing them by name hash.
    */
  private def denseChildren(m: Message): Map[String, Long] = {
    val p = m.pos
    require(u8(p) == 0, s"unsupported link-info version ${u8(p)}")
    val liFlags = u8(p + 1)
    var q = p + 2
    if ((liFlags & 0x01) != 0) q += 8 // max creation index
    val heapAddr = offAt(q)
    val nameBtreeAddr = offAt(q + offsetSize)
    if (undef(heapAddr)) return Map.empty // compact group with zero links
    val heap = new FractalHeap(heapAddr)
    btreeV2Records(nameBtreeAddr, 5)
      .map(rp => parseLink(heap.objPos(rp + 4))) // record: hash(4) + heap ID
      .toMap
  }

  private def localHeapData(addr: Long): Int = {
    val p = addr.toInt
    require(ascii(p, 4) == "HEAP", s"expected HEAP @ $addr")
    offAt(p + 8 + 2 * lengthSize).toInt
  }

  private def ascii(p: Int, n: Int): String = strAt(p, n, "ASCII")

  private def cstring(p: Int): String = {
    var e = p
    while (u8(e) != 0) e += 1
    strAt(p, e - p, "UTF-8")
  }

  // --- datatype ---
  private final case class Dtype(clazz: Int, size: Int, signed: Boolean)

  private def parseDatatype(p: Int): Dtype = {
    val classAndVersion = u8(p)
    val clazz = classAndVersion & 0x0f
    val bits0 = u8(p + 1)
    val size = u32(p + 4).toInt
    Dtype(clazz, size, (bits0 & 0x08) != 0)
  }

  // --- dataspace (version 1 or 2) ---
  private def parseDataspace(p: Int): Array[Long] = {
    val version = u8(p)
    val rank = u8(p + 1)
    val hp = if (version == 1) p + 8 else p + 4
    // dimension sizes are "Length"-sized
    Array.tabulate(rank)(i => lenAt(hp + i * lengthSize))
  }

  // --- attributes (message 0x000C, versions 1-3; dense storage via the
  // attribute-info message 0x0015 -> fractal heap + v2 B-tree type 8) ---
  def attributes(headerAddr: Long): Map[String, Any] = {
    val msgs = objectHeader(headerAddr)
    val compact = msgs.filter(_.typ == 0x000C).map(m => parseAttrMessage(m.pos))
    val dense = msgs.filter(_.typ == 0x0015).flatMap(denseAttributes)
    (compact ++ dense).toMap
  }

  /** Dense attribute storage: serialized v3 attribute messages live in a
    * fractal heap, indexed by a v2 B-tree whose type-8 records lead with
    * the 8-byte heap ID.
    */
  private def denseAttributes(m: Message): Seq[(String, Any)] = {
    val p = m.pos
    require(u8(p) == 0, s"unsupported attribute-info version ${u8(p)}")
    val aiFlags = u8(p + 1)
    var q = p + 2
    if ((aiFlags & 0x01) != 0) q += 2 // max creation index
    val heapAddr = offAt(q)
    val nameBtreeAddr = offAt(q + offsetSize)
    if (undef(heapAddr)) return Seq.empty
    val heap = new FractalHeap(heapAddr)
    btreeV2Records(nameBtreeAddr, 8)
      .map(rp => parseAttrMessage(heap.objPos(rp))) // heap ID leads the record
  }

  private def parseAttrMessage(p: Int): (String, Any) = {
    {
      val version = u8(p)
      val nameSize = u16(p + 2)
      val dtSize = u16(p + 4)
      val dsSize = u16(p + 6)
      val (namePos, dtPos, dsPos, dataPos, dtShared, dsShared) = version match {
        case 1 =>
          // v1: fields padded to 8-byte multiples; no flags byte (libhdf5
          // bumps the attribute version when it shares a field)
          val np = p + 8
          val dt = np + pad8(nameSize)
          val ds = dt + pad8(dtSize)
          (np, dt, ds, ds + pad8(dsSize), false, false)
        case 2 | 3 =>
          // v2/v3: unpadded; v2 has a flags byte at +1, v3 adds a name
          // character-set byte before the name. Flag bits 0/1: the
          // datatype/dataspace field holds a Shared Message record
          // instead of the inline message (committed datatypes / SOHM).
          val flags = u8(p + 1)
          require((flags & ~0x03) == 0, s"unsupported attribute flags $flags")
          val np = if (version == 3) p + 9 else p + 8
          val dt = np + nameSize
          val ds = dt + dtSize
          (np, dt, ds, ds + dsSize, (flags & 0x01) != 0, (flags & 0x02) != 0)
        case v => sys.error(s"unsupported attribute message version $v")
      }
      val name = cstring(namePos)
      val dt = parseDatatype(
        if (dtShared) sharedMessagePos(dtPos, 0x0003) else dtPos)
      val dims = parseDataspace(
        if (dsShared) sharedMessagePos(dsPos, 0x0001) else dsPos)
      val nL = dims.product.max(1L)
      require(nL <= 65536, s"implausible attribute cardinality $nL")
      name -> readScalarOrArray(dt, dataPos, nL.toInt)
    }
  }

  private def pad8(n: Int): Int = (n + 7) & ~7

  /** Resolve a Shared Message field (spec IV.A "Shared Message" storage,
    * reached from attribute flag bits 0/1) to the position of the target
    * message body. Version 1: version + type + 6 reserved + address;
    * version 2: version + type + address; version 3: version + type, then
    * for type 2 ("message in another object's header" — committed
    * datatypes) the target header address. Type 1 (SOHM fractal heap)
    * requires file-creation-time SOHM config no ODIM writer enables —
    * fail fast by name.
    */
  private def sharedMessagePos(fieldPos: Int, wantType: Int): Int = {
    val ver = u8(fieldPos)
    val addr = ver match {
      case 1 => offAt(fieldPos + 8)
      case 2 => offAt(fieldPos + 2)
      case 3 =>
        val st = u8(fieldPos + 1)
        require(st == 2, s"SOHM-heap shared message (sub-type $st) unsupported")
        offAt(fieldPos + 2)
      case v => sys.error(s"unsupported shared message version $v")
    }
    objectHeader(addr).find(_.typ == wantType).map(_.pos).getOrElse(
      sys.error(f"shared message target @$addr has no message of type 0x$wantType%04x"))
  }

  private def readScalarOrArray(dt: Dtype, p: Int, n: Int): Any = {
    def one(q: Int): Any = dt.clazz match {
      case 0 => // fixed-point
        val v = dt.size match {
          case 1 => u8(q).toLong
          case 2 => u16(q).toLong
          case 4 => i32(q).toLong
          case 8 => u64(q)
          case s => sys.error(s"unsupported int size $s")
        }
        v
      case 1 => // float
        if (dt.size == 4) f32(q).toDouble else f64(q)
      case 3 => // fixed-size string (null-terminated/padded)
        val raw = strAt(q, dt.size, "UTF-8")
        val z = raw.indexOf('\u0000')
        if (z >= 0) raw.substring(0, z) else raw
      case 9 => // variable-length (string): length(4) + global heap id
        val heapAddr = offAt(q + 4)
        val heapIdx = u32(q + 4 + offsetSize).toInt
        globalHeapString(heapAddr, heapIdx)
      case c => sys.error(s"unsupported attribute datatype class $c")
    }
    if (n == 1) one(p)
    else (0 until n).map(i => one(p + i * dt.size)).toVector
  }

  private def globalHeapString(addr: Long, idx: Int): String = {
    val p = addr.toInt
    require(ascii(p, 4) == "GCOL", s"expected GCOL @ $addr")
    var q = p + 8 + lengthSize
    var guard = 0
    while (guard < 65536) {
      val objIdx = u16(q)
      val objSize = lenAt(q + 8).toInt
      if (objIdx == idx) return new String(bytes, q + 8 + lengthSize, objSize, "UTF-8")
      if (objIdx == 0) sys.error(s"global heap object $idx not found @ $addr")
      q += 8 + lengthSize + pad8(objSize)
      guard += 1
    }
    sys.error("global heap scan overflow")
  }

  // --- datasets ---
  /** A decoded 2-D (or 1-D) numeric dataset, in doubles plus an
    * integer-dtype flag (ODIM decode must preserve int-ness).
    */
  final case class DatasetData(dims: Array[Long], values: Array[Double],
      isInteger: Boolean, elemSize: Int)

  def dataset(headerAddr: Long): DatasetData = {
    val msgs = objectHeader(headerAddr)
    val dtMsg = msgs.find(_.typ == 0x0003).getOrElse(sys.error("dataset missing datatype"))
    val dsMsg = msgs.find(_.typ == 0x0001).getOrElse(sys.error("dataset missing dataspace"))
    val dlMsg = msgs.find(_.typ == 0x0008).getOrElse(sys.error("dataset missing layout"))
    val dt = parseDatatype(dtMsg.pos)
    val dims = parseDataspace(dsMsg.pos)
    val nL = dims.product
    // plausibility guard: a corrupted dimension must fail fast, not allocate
    // gigabytes (uncompressed data can't exceed a generous multiple of the
    // file size; ODIM profiles are tiny)
    require(nL >= 0 && nL * dt.size <= bytes.length.toLong * 256,
      s"implausible dataset size $nL x ${dt.size}B in ${bytes.length}B file")
    val n = nL.toInt
    val gzip = msgs.find(_.typ == 0x000B).exists { m =>
      // filter pipeline v1: version(1), nfilters(1), reserved(6), filters
      val nf = u8(m.pos + 1)
      var q = m.pos + 8
      var found = false
      for (_ <- 0 until nf) {
        val id = u16(q); val nameLen = u16(q + 2); val ncdv = u16(q + 6)
        if (id == 1) found = true // deflate
        // filter desc: 8-byte head + 8-padded name + 4*ncdv client data,
        // padded with 4 zero bytes when ncdv is odd
        q += 8 + pad8(nameLen) + 4 * ncdv + (if (ncdv % 2 == 1) 4 else 0)
      }
      found
    }
    val raw = layoutBytes(dlMsg.pos, dt.size, n, gzip, dims)
    val values = new Array[Double](n)
    var i = 0
    val b = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
    while (i < n) {
      values(i) = dt.clazz match {
        case 0 =>
          (dt.size match {
            case 1 => if (dt.signed) raw(i).toLong else (raw(i) & 0xff).toLong
            case 2 => if (dt.signed) b.getShort(i * 2).toLong else (b.getShort(i * 2) & 0xffff).toLong
            case 4 => if (dt.signed) b.getInt(i * 4).toLong else b.getInt(i * 4) & 0xffffffffL
            case 8 => b.getLong(i * 8)
          }).toDouble
        case 1 => if (dt.size == 4) b.getFloat(i * 4).toDouble else b.getDouble(i * 8)
        case c => sys.error(s"unsupported dataset datatype class $c")
      }
      i += 1
    }
    DatasetData(dims, values, dt.clazz == 0, dt.size)
  }

  private def layoutBytes(p: Int, elemSize: Int, n: Int, gzip: Boolean,
      dims: Array[Long]): Array[Byte] = {
    val version = u8(p)
    require(version == 3 || version == 4, s"unsupported data layout version $version")
    if (version == 4) return layoutV4Bytes(p, elemSize, n, gzip, dims)
    u8(p + 1) match {
      case 1 => // contiguous: address + size
        val addr = offAt(p + 2)
        bytes.slice(addr.toInt, addr.toInt + n * elemSize)
      case 2 => // chunked: dimensionality (= rank+1), btree address, dim sizes
        val ndimsPlus1 = u8(p + 2)
        val btreeAddr = offAt(p + 3)
        // chunk dimension sizes (4 bytes each; last entry = element size)
        val chunkDims = Array.tabulate(ndimsPlus1 - 1)(d =>
          u32(p + 3 + offsetSize + 4 * d))
        val out = new Array[Byte](n * elemSize)
        collectChunks(btreeAddr, dims, chunkDims, elemSize, gzip, out)
        out
      case 0 => // compact: size(2) + data
        val size = u16(p + 2)
        bytes.slice(p + 4, p + 4 + size)
      case c => sys.error(s"unsupported layout class $c")
    }
  }

  /** Data layout message VERSION 4 — what libhdf5 `libver='latest'` writes.
    * Contiguous/compact match v3 field-for-field; chunked drops the extra
    * element-size dimension, encodes chunk dims with a declared width, and
    * replaces the v1 B-tree with one of five chunk indexes. Supported:
    * Single Chunk (1, filtered or not), Implicit (2, contiguous equal-size
    * unfiltered chunks in row-major grid order), Fixed Array (3,
    * single-page, unfiltered or filtered client), Extensible Array (4,
    * unfiltered client; elements reachable from the index block — inline
    * plus directly-addressed data blocks — which covers hundreds of chunks
    * at libhdf5's default cparams; secondary blocks and paged data blocks
    * fail fast), v2 B-tree (5, any depth, unfiltered type-10 or
    * filtered type-11 records placing chunks by their recorded scaled
    * offsets).
    */
  private def layoutV4Bytes(p: Int, elemSize: Int, n: Int, gzip: Boolean,
      dims: Array[Long]): Array[Byte] = {
    u8(p + 1) match {
      case 1 => // contiguous: address + size (same as v3)
        val addr = offAt(p + 2)
        bytes.slice(addr.toInt, addr.toInt + n * elemSize)
      case 0 => // compact: size(2) + data (same as v3)
        val size = u16(p + 2)
        bytes.slice(p + 4, p + 4 + size)
      case 2 =>
        var q = p + 2
        /* flags */ q += 1
        val rank = u8(q); q += 1
        val encLen = u8(q); q += 1
        def enc(at: Int): Long = encLen match {
          case 1 => u8(at).toLong
          case 2 => u16(at).toLong
          case 4 => u32(at)
          case 8 => u64(at)
        }
        val chunkDims = Array.tabulate(rank)(d => enc(q + d * encLen))
        q += rank * encLen
        require(chunkDims.length == dims.length,
          s"v4 chunk rank ${chunkDims.length} != dataset rank ${dims.length}")
        val indexType = u8(q); q += 1
        val out = new Array[Byte](n * elemSize)
        val stride = new Array[Long](dims.length)
        var acc = 1L
        var d = dims.length - 1
        while (d >= 0) { stride(d) = acc; acc *= dims(d); d -= 1 }
        val chunkBytes = (chunkDims.product * elemSize).toInt
        // row-major chunk-grid coordinates for linear chunk index i
        val gridDims = Array.tabulate(dims.length)(i =>
          ((dims(i) + chunkDims(i) - 1) / chunkDims(i)).toInt)
        def gridCoord(i: Int): Array[Long] = {
          val off = new Array[Long](dims.length)
          var rem = i
          var k = dims.length - 1
          while (k >= 0) { off(k) = (rem % gridDims(k)).toLong * chunkDims(k); rem /= gridDims(k); k -= 1 }
          off
        }
        def place(data: Array[Byte], chunkIdx: Int): Unit =
          placeChunk(data, dims, chunkDims, gridCoord(chunkIdx), stride, elemSize, out)
        indexType match {
          case 1 => // single chunk; filtered variant carries size + mask
            val (dataSize, addrPos) =
              if (gzip) (lenAt(q).toInt, q + lengthSize + 4)
              else (chunkBytes, q)
            val addr = offAt(addrPos)
            val data =
              if (gzip) inflate(bytes, addr.toInt, dataSize, maxOut = out.length)
              else bytes.slice(addr.toInt, addr.toInt + dataSize)
            place(data, 0)
          case 2 => // implicit: equal-size unfiltered chunks back-to-back
            require(!gzip, "implicit chunk index cannot carry filters")
            val base = offAt(q)
            val nChunks = gridDims.product
            var i = 0
            while (i < nChunks) {
              place(bytes.slice(base.toInt + i * chunkBytes,
                base.toInt + (i + 1) * chunkBytes), i)
              i += 1
            }
          case 3 => // fixed array: FAHD header -> FADB data block of entries.
            // When maxEntries > 2^pageBits the data block is PAGED: a
            // page-init bitmap follows the FADB header and elements live in
            // contiguous pages of 2^pageBits entries, each page followed by
            // its own 4-byte checksum (the >1024-chunk shape of big fixed
            // volume scans).
            val fahd = offAt(q + 1).toInt // +1: page-bits byte precedes addr
            require(ascii(fahd, 4) == "FAHD", s"expected FAHD @ $fahd")
            val clientId = u8(fahd + 5)
            val entrySize = u8(fahd + 6)
            val pageBits = u8(fahd + 7)
            val maxEntries = lenAt(fahd + 8)
            val fadb = offAt(fahd + 8 + lengthSize).toInt
            require(ascii(fadb, 4) == "FADB", s"expected FADB @ $fadb")
            val hdrEnd = fadb + 6 + offsetSize // sig + ver + clientId + header addr
            val paged = maxEntries > (1L << pageBits)
            val pageNelmts = 1 << pageBits
            val nPages = ((maxEntries + pageNelmts - 1) / pageNelmts).toInt
            // paged: header + page-init bitmap + data-block checksum, THEN
            // the element pages (each tailed by its own checksum)
            val elems = if (paged) hdrEnd + (nPages + 7) / 8 + 4 else hdrEnd
            def entryAt(i: Int): Int =
              if (!paged) elems + i * entrySize
              else elems + (i >> pageBits) * (pageNelmts * entrySize + 4) +
                (i & (pageNelmts - 1)) * entrySize
            val nChunks = gridDims.product
            var i = 0
            while (i < nChunks) {
              val e = entryAt(i)
              val addr = offAt(e)
              val data = clientId match {
                case 0 =>
                  require(!gzip, "unfiltered fixed-array entries but filter pipeline present")
                  bytes.slice(addr.toInt, addr.toInt + chunkBytes)
                case 1 =>
                  // filtered: address + chunk size (entrySize-offsetSize-4) + mask(4)
                  val szBytes = entrySize - offsetSize - 4
                  var sz = 0L
                  var b = 0
                  while (b < szBytes) { sz |= (u8(e + offsetSize + b).toLong << (8 * b)); b += 1 }
                  if (gzip) inflate(bytes, addr.toInt, sz.toInt, maxOut = out.length)
                  else bytes.slice(addr.toInt, addr.toInt + sz.toInt)
                case c => sys.error(s"unsupported fixed-array client $c")
              }
              place(data, i)
              i += 1
            }
          case 4 =>
            // extensible array (resizable datasets): EAHD header -> EAIB
            // index block; element i = chunk i in row-major grid order.
            // The first idxBlkElmts elements are inline in the index block;
            // the rest live in data blocks, with the published doubling
            // pattern (super block u holds 2^(u/2) blocks of
            // minElmts*2^((u+1)/2) elements). Super blocks 0 until
            // 2*log2(minPtrs) have their data blocks addressed DIRECTLY
            // from the index block; later super blocks are reached through
            // EASB secondary blocks whose pointers follow the direct area.
            // Data blocks with capacity > 2^pageBits elements are PAGED:
            // a checksummed prefix with no inline elements, then
            // 2^pageBits-element pages each tailed by a checksum.
            val eahd = offAt(q + 5).toInt // 5 cparam bytes precede the addr
            require(ascii(eahd, 4) == "EAHD", s"expected EAHD @ $eahd")
            val clientId = u8(eahd + 5)
            val entrySize = u8(eahd + 6)
            // client 0 = raw chunk addresses; client 1 = filtered elements
            // (address + chunk byte size + 4-byte filter mask), mirroring
            // the fixed-array clients
            clientId match {
              case 0 =>
                require(!gzip, "unfiltered EA client but filter pipeline present")
                require(entrySize == offsetSize,
                  s"EA element size $entrySize != offset size $offsetSize")
              case 1 =>
                require(gzip, "filtered EA client but no deflate pipeline")
                require(entrySize > offsetSize + 4,
                  s"filtered EA element size $entrySize too small")
              case c => sys.error(s"unsupported extensible-array client $c")
            }
            val maxBits = u8(eahd + 7)
            val idxBlkElmts = u8(eahd + 8)
            val minElmts = u8(eahd + 9)
            val minPtrs = u8(eahd + 10)
            val pageBits = u8(eahd + 11)
            val eaib = offAt(eahd + 12 + 6 * lengthSize).toInt // after 6 stats
            require(ascii(eaib, 4) == "EAIB", s"expected EAIB @ $eaib")
            val inlineAt = eaib + 6 + offsetSize // sig + ver + client + hdr addr
            val nChunks = gridDims.product
            def placeElem(at: Int, chunkIdx: Int): Unit = {
              val addr = offAt(at)
              require(!undef(addr), s"EA element $chunkIdx unallocated")
              val data = clientId match {
                case 0 => bytes.slice(addr.toInt, addr.toInt + chunkBytes)
                case 1 =>
                  val szBytes = entrySize - offsetSize - 4
                  var sz = 0L
                  var b = 0
                  while (b < szBytes) { sz |= (u8(at + offsetSize + b).toLong << (8 * b)); b += 1 }
                  inflate(bytes, addr.toInt, sz.toInt, maxOut = out.length)
              }
              place(data, chunkIdx)
            }
            var next = 0
            while (next < math.min(idxBlkElmts, nChunks)) {
              placeElem(inlineAt + next * entrySize, next)
              next += 1
            }
            // directly-addressed data blocks: capacity sequence from cparams
            val nsblksDirect = 2 * (31 - Integer.numberOfLeadingZeros(minPtrs))
            val dblkCaps = (0 until nsblksDirect).flatMap { u =>
              Seq.fill(1 << (u / 2))(minElmts << ((u + 1) / 2))
            }
            val dblkAddrAt = inlineAt + idxBlkElmts * entrySize
            val blockOffSize = (maxBits + 7) / 8
            def walkDataBlock(dblkAddr: Long, cap: Int, what: String): Unit = {
              require(!undef(dblkAddr), s"EA $what unallocated but chunks remain")
              val db = dblkAddr.toInt
              require(ascii(db, 4) == "EADB", s"expected EADB @ $db")
              if (cap <= (1 << pageBits)) {
                val elemAt = db + 6 + offsetSize + blockOffSize
                var i = 0
                while (i < cap && next < nChunks) {
                  placeElem(elemAt + i * entrySize, next)
                  i += 1
                  next += 1
                }
              } else {
                // PAGED data block (capacity > 2^pageBits): the prefix
                // carries its own checksum and holds NO elements; pages of
                // 2^pageBits elements follow back-to-back, each tailed by
                // a 4-byte page checksum (H5EAcache serialize layout)
                val pageNelmts = 1 << pageBits
                val pageSize = pageNelmts * entrySize + 4
                val base = db + 6 + offsetSize + blockOffSize + 4
                var i = 0
                while (i < cap && next < nChunks) {
                  val at = base + (i / pageNelmts) * pageSize +
                    (i % pageNelmts) * entrySize
                  placeElem(at, next)
                  i += 1
                  next += 1
                }
              }
            }
            var slot = 0
            while (next < nChunks && slot < dblkCaps.length) {
              walkDataBlock(offAt(dblkAddrAt + slot * offsetSize),
                dblkCaps(slot), s"data block $slot")
              slot += 1
            }
            // secondary blocks: pointer s (super block u = nsblksDirect + s)
            // sits after the direct data-block pointer area; each EASB holds
            // 2^(u/2) data-block pointers of minElmts*2^((u+1)/2) elements
            var sblk = 0
            while (next < nChunks) {
              val u = nsblksDirect + sblk
              val sblkAddr = offAt(dblkAddrAt + (dblkCaps.length + sblk) * offsetSize)
              require(!undef(sblkAddr),
                s"EA secondary block $sblk unallocated but chunks remain")
              val sb = sblkAddr.toInt
              require(ascii(sb, 4) == "EASB", s"expected EASB @ $sb")
              val ndblks = 1 << (u / 2)
              val cap = minElmts << ((u + 1) / 2)
              val ptrAt = sb + 6 + offsetSize + blockOffSize
              var dbI = 0
              while (dbI < ndblks && next < nChunks) {
                walkDataBlock(offAt(ptrAt + dbI * offsetSize), cap,
                  s"data block $dbI of secondary block $sblk")
                dbI += 1
              }
              sblk += 1
            }
          case 5 =>
            // v2 B-tree chunk index (heavily-appended resizable datasets),
            // any depth. Unfiltered = type-10 records (chunk address +
            // per-dim SCALED offsets, u64 each); a deflate pipeline =
            // type-11 records (address + variable-width stored byte size +
            // filter mask(4) + scaled offsets — the size-field width is
            // whatever the header's record size leaves over, mirroring the
            // spec's writer-chosen enc size). Chunks are placed by their
            // recorded coordinates, so record order never matters.
            val btAddr = offAt(q + 6) // node size(4) + split(1) + merge(1)
            val tree = btreeV2Walk(btAddr, if (gzip) 11 else 10)
            val szBytes = tree.recordSize - offsetSize - 4 - 8 * dims.length
            if (gzip) require(szBytes >= 1,
              s"type-11 record size ${tree.recordSize} too small for rank ${dims.length}")
            tree.recs.foreach { r =>
              val addr = offAt(r)
              val (data, offPos) =
                if (gzip) {
                  var sz = 0L
                  var b = 0
                  while (b < szBytes) { sz |= u8(r + offsetSize + b).toLong << (8 * b); b += 1 }
                  (inflate(bytes, addr.toInt, sz.toInt, maxOut = chunkBytes),
                    r + offsetSize + szBytes + 4) // skip filter mask
                } else {
                  (bytes.slice(addr.toInt, addr.toInt + chunkBytes), r + offsetSize)
                }
              val off = Array.tabulate(dims.length)(dd =>
                u64(offPos + 8 * dd) * chunkDims(dd))
              placeChunk(data, dims, chunkDims, off, stride, elemSize, out)
            }
          case t => sys.error(s"unsupported v4 chunk index type $t")
        }
        out
      case c => sys.error(s"unsupported layout class $c")
    }
  }

  /** Walk the v1 B-tree (node type 1) of chunk records and lay each chunk
    * into `out` by its full row-major coordinates: for every chunk row (all
    * leading dimensions), the run along the last dimension is copied to
    * `sum(coord_d * stride_d)` with dataset strides — correct for any chunk
    * grid shape, including 2-D grids with more than one column (a max() of
    * the offsets, as previously used, silently misplaced those).
    */
  private def collectChunks(addr: Long, dims: Array[Long], chunkDims: Array[Long],
      elemSize: Int, gzip: Boolean, out: Array[Byte]): Unit = {
    val rank = dims.length
    require(chunkDims.length == rank,
      s"chunk rank ${chunkDims.length} != dataset rank $rank")
    // dataset strides (elements), row-major
    val stride = new Array[Long](rank)
    var acc = 1L
    var d = rank - 1
    while (d >= 0) { stride(d) = acc; acc *= dims(d); d -= 1 }
    val p = addr.toInt
    require(ascii(p, 4) == "TREE", s"expected TREE @ $addr")
    require(u8(p + 4) == 1, "expected chunk btree (type 1)")
    val level = u8(p + 5); val entries = u16(p + 6)
    // key: chunk size (4) + filter mask (4) + (rank+1) 64-bit offsets
    // (the layout message's dimensionality field already counts rank+1)
    val keySize = 8 + 8 * (rank + 1)
    var cp = p + 8 + 2 * offsetSize
    var i = 0
    while (i < entries) {
      val chunkSize = u32(cp).toInt
      val chunkOff = Array.tabulate(rank)(d => u64(cp + 8 + 8 * d))
      val child = offAt(cp + keySize)
      if (level > 0) collectChunks(child, dims, chunkDims, elemSize, gzip, out)
      else {
        val data =
          if (gzip) inflate(bytes, child.toInt, chunkSize, maxOut = out.length)
          else bytes.slice(child.toInt, child.toInt + chunkSize)
        placeChunk(data, dims, chunkDims, chunkOff, stride, elemSize, out)
      }
      cp += keySize + offsetSize
      i += 1
    }
  }

  /** Copy one chunk's rows into the row-major output, clipping edge chunks
    * to the dataset bounds.
    */
  private def placeChunk(data: Array[Byte], dims: Array[Long], chunkDims: Array[Long],
      chunkOff: Array[Long], stride: Array[Long], elemSize: Int,
      out: Array[Byte]): Unit = {
    val rank = dims.length
    val last = rank - 1
    val runElems = math.min(chunkDims(last), dims(last) - chunkOff(last)).max(0).toInt
    if (runElems == 0) return
    // extents of the leading dimensions within this chunk (clipped)
    val lead = Array.tabulate(math.max(last, 0))(d =>
      math.min(chunkDims(d), dims(d) - chunkOff(d)).max(0).toInt)
    if (lead.exists(_ == 0)) return
    // chunk-internal strides (elements), row-major over chunkDims
    val cstride = new Array[Long](rank)
    var acc = 1L
    var d = last
    while (d >= 0) { cstride(d) = acc; acc *= chunkDims(d); d -= 1 }
    val idx = new Array[Int](math.max(last, 0))
    var more = true
    while (more) {
      var src = 0L; var dst = chunkOff(last) * stride(last)
      var k = 0
      while (k < last) {
        src += idx(k) * cstride(k)
        dst += (chunkOff(k) + idx(k)) * stride(k)
        k += 1
      }
      val srcByte = (src * elemSize).toInt
      val dstByte = (dst * elemSize).toInt
      val len = math.min(runElems * elemSize,
        math.min(data.length - srcByte, out.length - dstByte))
      if (len > 0) System.arraycopy(data, srcByte, out, dstByte, len)
      // odometer over the leading dims
      if (last == 0) more = false
      else {
        var c = last - 1
        var carry = true
        while (carry && c >= 0) {
          idx(c) += 1
          if (idx(c) < lead(c)) carry = false
          else { idx(c) = 0; c -= 1 }
        }
        if (carry) more = false
      }
    }
  }

  private def inflate(src: Array[Byte], off: Int, len: Int, maxOut: Int): Array[Byte] = {
    // reuse one native Inflater per thread (allocating + end()-ing one per
    // ~1 KB chunk dominates small-file decode otherwise)
    val inf = Hdf5File.threadInflater.get()
    inf.reset()
    inf.setInput(src, off, len)
    val outBuf = new java.io.ByteArrayOutputStream(math.min(len * 4, maxOut))
    val tmp = new Array[Byte](8192)
    while (!inf.finished() && !inf.needsInput() && outBuf.size <= maxOut) {
      val k = inf.inflate(tmp)
      if (k > 0) outBuf.write(tmp, 0, k)
      else if (k == 0 && inf.needsDictionary()) sys.error("deflate dictionary unsupported")
    }
    outBuf.toByteArray
  }

  // --- convenience traversal ---
  /** Resolve a path like "dataset1/data1/what" to its object header addr. */
  def resolve(path: String): Option[Long] = {
    var addr = rootHeaderAddr
    for (part <- path.split("/").filter(_.nonEmpty)) {
      groupChildren(addr).get(part) match {
        case Some(a) => addr = a
        case None => return None
      }
    }
    Some(addr)
  }

  def rootChildren: Map[String, Long] = groupChildren(rootHeaderAddr)
}

object Hdf5File {
  def apply(bytes: Array[Byte]): Hdf5File = new Hdf5File(bytes)
  def read(path: String): Hdf5File =
    new Hdf5File(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))

  private[odim] val threadInflater: ThreadLocal[Inflater] =
    ThreadLocal.withInitial(() => new Inflater())
}
