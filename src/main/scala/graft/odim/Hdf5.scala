package graft.odim

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.Inflater

/** Minimal pure-JVM HDF5 reader for the ODIM subset.
  *
  * Spark ships no HDF5 source and the build is offline, so this implements
  * exactly the features ODIM VP/PVOL files use (verified against the
  * reference fixtures, cf. /root/reference/src/vptstools/odimh5.py:16-138 for
  * the consumed surface): superblock v0/v1 with 4- or 8-byte offsets, version-1
  * object headers (+ continuations), symbol-table groups (B-tree v1 + local
  * heap + SNOD), attribute messages (fixed/variable-length strings via global
  * heap, ints, floats), and 2-D datasets with contiguous or gzip-chunked
  * (B-tree v1 chunk index) layout.
  *
  * Byte-parsing only — no JNI, no dependencies — so it can run inside Spark
  * executors in a mapPartitions decode of binaryFile rows.
  */
final class Hdf5File(bytes: Array[Byte]) {

  private val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)

  private def u8(p: Int): Int = bytes(p) & 0xff
  private def u16(p: Int): Int = buf.getShort(p) & 0xffff
  private def u32(p: Int): Long = buf.getInt(p) & 0xffffffffL
  private def u64(p: Int): Long = buf.getLong(p)

  // --- superblock ---
  private val sigOk = bytes.length > 8 &&
    bytes.slice(0, 8).sameElements(Array(0x89, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n').map(_.toByte))
  require(sigOk, "not an HDF5 file (bad signature)")

  private val sbVersion = u8(8)
  require(sbVersion <= 1, s"unsupported superblock version $sbVersion")
  val offsetSize: Int = u8(13)
  val lengthSize: Int = u8(14)
  require(offsetSize == 4 || offsetSize == 8, s"unsupported offset size $offsetSize")

  private def offAt(p: Int): Long = if (offsetSize == 4) u32(p) else u64(p)
  private def lenAt(p: Int): Long = if (lengthSize == 4) u32(p) else u64(p)
  private def undef(v: Long): Boolean =
    v == (if (offsetSize == 4) 0xffffffffL else -1L)

  // v0: offsets start at 24; v1 adds 4 bytes (indexed-storage k + reserved)
  private val sbFixed = if (sbVersion == 0) 24 else 28
  private val baseAddr = offAt(sbFixed)
  require(baseAddr == 0, s"nonzero base address $baseAddr unsupported")
  // root group symbol-table entry follows the 4 superblock addresses
  private val rootEntryPos = sbFixed + 4 * offsetSize
  val rootHeaderAddr: Long = offAt(rootEntryPos + offsetSize)

  // --- object header (version 1) ---
  final case class Message(typ: Int, pos: Int, size: Int)

  def objectHeader(addr: Long): Seq[Message] = {
    val p0 = addr.toInt
    require(u8(p0) == 1, s"unsupported object header version ${u8(p0)} @ $addr")
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

  // --- groups: symbol table message (0x0011) -> B-tree v1 + local heap ---
  def groupChildren(headerAddr: Long): Map[String, Long] = {
    objectHeader(headerAddr).find(_.typ == 0x0011) match {
      case None => Map.empty
      case Some(m) =>
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
  }

  private def localHeapData(addr: Long): Int = {
    val p = addr.toInt
    require(ascii(p, 4) == "HEAP", s"expected HEAP @ $addr")
    offAt(p + 8 + 2 * lengthSize).toInt
  }

  private def ascii(p: Int, n: Int): String = new String(bytes, p, n, "ASCII")

  private def cstring(p: Int): String = {
    var e = p
    while (bytes(e) != 0) e += 1
    new String(bytes, p, e - p, "UTF-8")
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

  // --- attributes (message 0x000C, version 1) ---
  def attributes(headerAddr: Long): Map[String, Any] = {
    objectHeader(headerAddr).filter(_.typ == 0x000C).map { m =>
      val p = m.pos
      require(u8(p) == 1, s"unsupported attribute message version ${u8(p)}")
      val nameSize = u16(p + 2)
      val dtSize = u16(p + 4)
      val dsSize = u16(p + 6)
      val namePos = p + 8
      val name = cstring(namePos)
      val dtPos = namePos + pad8(nameSize)
      val dsPos = dtPos + pad8(dtSize)
      val dataPos = dsPos + pad8(dsSize)
      val dt = parseDatatype(dtPos)
      val dims = parseDataspace(dsPos)
      val nL = dims.product.max(1L)
      require(nL <= 65536, s"implausible attribute cardinality $nL")
      name -> readScalarOrArray(dt, dataPos, nL.toInt)
    }.toMap
  }

  private def pad8(n: Int): Int = (n + 7) & ~7

  private def readScalarOrArray(dt: Dtype, p: Int, n: Int): Any = {
    def one(q: Int): Any = dt.clazz match {
      case 0 => // fixed-point
        val v = dt.size match {
          case 1 => u8(q).toLong
          case 2 => u16(q).toLong
          case 4 => buf.getInt(q).toLong
          case 8 => u64(q)
          case s => sys.error(s"unsupported int size $s")
        }
        v
      case 1 => // float
        if (dt.size == 4) buf.getFloat(q).toDouble else buf.getDouble(q)
      case 3 => // fixed-size string (null-terminated/padded)
        val raw = new String(bytes, q, dt.size, "UTF-8")
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
    val raw = layoutBytes(dlMsg.pos, dt.size, n, gzip)
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

  private def layoutBytes(p: Int, elemSize: Int, n: Int, gzip: Boolean): Array[Byte] = {
    require(u8(p) == 3, s"unsupported data layout version ${u8(p)}")
    u8(p + 1) match {
      case 1 => // contiguous: address + size
        val addr = offAt(p + 2)
        bytes.slice(addr.toInt, addr.toInt + n * elemSize)
      case 2 => // chunked: dimensionality (= rank+1), btree address, dim sizes
        val ndimsPlus1 = u8(p + 2)
        val btreeAddr = offAt(p + 3)
        val out = new Array[Byte](n * elemSize)
        collectChunks(btreeAddr, ndimsPlus1, elemSize, gzip, out)
        out
      case 0 => // compact: size(2) + data
        val size = u16(p + 2)
        bytes.slice(p + 4, p + 4 + size)
      case c => sys.error(s"unsupported layout class $c")
    }
  }

  /** Walk the v1 B-tree (node type 1) of chunk records; chunks are laid into
    * `out` at their linear offset. ODIM VP chunks are (levels,1)-shaped so the
    * first chunk-offset coordinate fixes the linear position.
    */
  private def collectChunks(addr: Long, ndimsPlus1: Int, elemSize: Int,
      gzip: Boolean, out: Array[Byte]): Unit = {
    val p = addr.toInt
    require(ascii(p, 4) == "TREE", s"expected TREE @ $addr")
    require(u8(p + 4) == 1, "expected chunk btree (type 1)")
    val level = u8(p + 5); val entries = u16(p + 6)
    // key: chunk size (4) + filter mask (4) + ndimsPlus1 64-bit offsets
    // (the layout message's dimensionality field already counts rank+1)
    val keySize = 8 + 8 * ndimsPlus1
    var cp = p + 8 + 2 * offsetSize
    var i = 0
    while (i < entries) {
      val chunkSize = u32(cp).toInt
      val chunkOffsets = Array.tabulate(ndimsPlus1)(d => u64(cp + 8 + 8 * d))
      val child = offAt(cp + keySize)
      if (level > 0) collectChunks(child, ndimsPlus1, elemSize, gzip, out)
      else {
        val data =
          if (gzip) inflate(bytes, child.toInt, chunkSize, maxOut = out.length)
          else bytes.slice(child.toInt, child.toInt + chunkSize)
        // linear element offset of this chunk (row-major over chunk grid)
        val linearElem = chunkOffsets.dropRight(1).foldLeft(0L)((acc, o) => acc.max(o)) // VP: Nx1, only one dim > 0
        val bytePos = (linearElem * elemSize).toInt
        val len = math.min(data.length, out.length - bytePos)
        System.arraycopy(data, 0, out, bytePos, len)
      }
      cp += keySize + offsetSize
      i += 1
    }
  }

  private def inflate(src: Array[Byte], off: Int, len: Int, maxOut: Int): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(src, off, len)
    val outBuf = new java.io.ByteArrayOutputStream(math.min(len * 4, maxOut))
    val tmp = new Array[Byte](8192)
    while (!inf.finished() && !inf.needsInput() && outBuf.size <= maxOut) {
      val k = inf.inflate(tmp)
      if (k > 0) outBuf.write(tmp, 0, k)
      else if (k == 0 && inf.needsDictionary()) sys.error("deflate dictionary unsupported")
    }
    inf.end()
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
}
