package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native consecutive w-word segmentation: equivalent to
  * `transform(sequence(0, ceil(n/w)-1), i -> array_join(slice(ws, i*w+1, w), ' '))`
  * but one compiled pass over the text instead of an interpreted
  * higher-order chain that re-slices and re-joins per segment — measured
  * 2.2x on the whole segment-dedup query at sf1. The last segment keeps
  * the (possibly < w) trailing words, exactly like the declarative form
  * and the DuckDB twin's clamped list slice.
  *
  * Codegen: direct `compute(value)` call on the expression object, same
  * pattern as [[ShingleSetExpr]].
  */
case class SegmentsExpr(child: Expression, w: Int = 3)
    extends UnaryExpression {
  require(w >= 1, s"bad segment width $w")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_segments"

  def compute(input: UTF8String): ArrayData = {
    val words = Tokenize.words(input.toString)
    val n = words.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val nSegs = (n + w - 1) / w
    val out = new Array[Any](nSegs)
    var s = 0
    while (s < nSegs) {
      val from = s * w
      val until = math.min(from + w, n)
      val sb = new java.lang.StringBuilder()
      var i = from
      while (i < until) {
        if (i > from) sb.append(' ')
        sb.append(words(i))
        i += 1
      }
      out(s) = UTF8String.fromString(sb.toString)
      s += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("segments", this, classOf[SegmentsExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Byte-range identity + seeded xxh64 shared by the two segment-hash
  * expressions, which MUST agree bit-for-bit: because [[Tokenize.words]]
  * splits on the exact single-space delimiter (keeping empties) and
  * segments re-join with the same single space, every segment's string is
  * EXACTLY a byte range of the original UTF-8 text (split+join on the same
  * delimiter is an identity, and 0x20 can never be a UTF-8 continuation
  * byte). So segment hashing needs no word strings, no StringBuilder and
  * no MessageDigest at all — one byte scan for boundaries, one xxh64 per
  * range. Replacing the per-segment MD5 ([[Hash60]]) cut the segment-dedup
  * hot loop ~2x at sf1; the hash is purely internal (the oracle compares
  * reassembled STRINGS), so only collision quality matters, and 64-bit
  * xxh64 keeps collisions negligible below ~2^32 distinct segments.
  */
private[plans] object SegHash {
  val Seed = 42L
  def range(bytes: Array[Byte], from: Int, until: Int): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + from,
      until - from, Seed)
}

/** [[SegmentsExpr]]'s shuffle-friendly twin: the seeded xxh64 ([[SegHash]])
  * of each consecutive w-word segment, computed as one compiled pass over
  * the raw UTF-8 bytes (segment = byte range, see [[SegHash]] — boundaries
  * can never diverge from [[SegmentsExpr]]'s split+join because they ARE
  * the same bytes). Lets the segment-dedup operator shuffle
  * `(doc_id, pos, hash)` longs (~24 B/row) through its occurrence-count and
  * boilerplate-mark exchanges instead of the segment STRINGS — at corpus
  * scale the exploded string stream is the whole corpus plus offsets, and
  * shuffling it twice was the dominant cost of the r5 implementation
  * (17.9x DuckDB at sf1).
  */
case class SegmentHashesExpr(child: Expression, w: Int = 3)
    extends UnaryExpression {
  require(w >= 1, s"bad segment width $w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_segment_hashes"

  def compute(input: UTF8String): ArrayData = {
    val bytes = input.getBytes
    val len = bytes.length
    var spaces = 0
    var i = 0
    while (i < len) { if (bytes(i) == ' ') spaces += 1; i += 1 }
    val n = spaces + 1 // split(" ", -1) never yields zero words ("" -> [""])
    val nSegs = (n + w - 1) / w
    val out = new Array[Long](nSegs) // primitive: no per-segment boxing
    var segStart = 0
    var inSeg = 0
    var s = 0
    i = 0
    while (i < len) {
      if (bytes(i) == ' ') {
        inSeg += 1
        if (inSeg == w) {
          out(s) = SegHash.range(bytes, segStart, i); s += 1
          inSeg = 0; segStart = i + 1
        }
      }
      i += 1
    }
    out(s) = SegHash.range(bytes, segStart, len) // trailing (possibly short) segment
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("segmentHashes", this, classOf[SegmentHashesExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Seeded xxh64 ([[SegHash]]) of every OVERLAPPING k-word shingle, in
  * order, with repeats — element i is the window starting at word i
  * (contrast [[ShingleSetExpr]], which emits the sorted DISTINCT set for
  * Jaccard). Feeds the repeated-substring-span and suffix-LRS operators:
  * window occurrence counting shuffles `(doc_id, pos, hash)` longs, never
  * the window strings. Hashing is over raw UTF-8 byte ranges (the
  * [[SegHash]] split+join identity: window i spans from the start of word
  * i to the end of word i+k-1), so the per-window MD5 + StringBuilder the
  * r4 form paid — the dominant cost of both explode passes at sf1 — is
  * gone; the hash is internal-only (both oracles group window STRINGS).
  */
case class ShingleHashesExpr(child: Expression, k: Int = 5)
    extends UnaryExpression {
  require(k >= 1, s"bad shingle width $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  def compute(input: UTF8String): ArrayData = {
    val bytes = input.getBytes
    val len = bytes.length
    var spaces = 0
    var i = 0
    while (i < len) { if (bytes(i) == ' ') spaces += 1; i += 1 }
    val n = spaces + 1
    if (n < k) return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(Array.emptyLongArray)
    // wordStart(j) for j in [0, n): 0 or one past each space
    val starts = new Array[Int](n)
    starts(0) = 0
    var w = 1
    i = 0
    while (i < len) {
      if (bytes(i) == ' ') { starts(w) = i + 1; w += 1 }
      i += 1
    }
    val out = new Array[Long](n - k + 1) // primitive: no per-window boxing
    var s = 0
    while (s <= n - k) {
      // window [s, s+k): from start of word s to end of word s+k-1 (the
      // byte before word s+k's separator, or end of text)
      val until = if (s + k < n) starts(s + k) - 1 else len
      out(s) = SegHash.range(bytes, starts(s), until)
      s += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleHashes", this, classOf[ShingleHashesExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Single-pass segment-dedup reassembly against a broadcast boilerplate
  * set: segment the raw UTF-8 bytes (same [[SegHash]] byte-range identity
  * as [[SegmentHashesExpr]] so boundaries and hashes can never diverge),
  * drop the ranges whose hash is in the broadcast sorted array, copy the
  * survivors into the output buffer, and emit
  * `struct(n_segs, n_kept, clean_text)` — the whole per-doc side of
  * segment dedup in ONE codegen'd projection with zero joins and zero
  * String materialization. The boilerplate set rides a `Broadcast` handle
  * (executors fetch it once; the expression serializes as a pointer, not
  * the array), and membership is binary search on the sorted longs.
  */
case class SegmentCleanExpr(
    child: Expression,
    boiler: org.apache.spark.broadcast.Broadcast[Array[Long]],
    w: Int = 3)
    extends UnaryExpression {
  require(w >= 1, s"bad segment width $w")

  override def dataType: DataType = StructType(Seq(
    StructField("n_segs", LongType, nullable = false),
    StructField("n_kept", LongType, nullable = false),
    StructField("clean_text", StringType, nullable = false)))
  override def prettyName: String = "segment_clean"

  def compute(input: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val sorted = boiler.value
    val bytes = input.getBytes
    val len = bytes.length
    val out = new Array[Byte](len)
    var outLen = 0
    var nSegs = 0L
    var kept = 0L
    def emit(from: Int, until: Int): Unit = {
      nSegs += 1
      if (java.util.Arrays.binarySearch(sorted, SegHash.range(bytes, from, until)) < 0) {
        if (kept > 0) { out(outLen) = ' '; outLen += 1 }
        System.arraycopy(bytes, from, out, outLen, until - from)
        outLen += until - from
        kept += 1
      }
    }
    var segStart = 0
    var inSeg = 0
    var i = 0
    while (i < len) {
      if (bytes(i) == ' ') {
        inSeg += 1
        if (inSeg == w) { emit(segStart, i); inSeg = 0; segStart = i + 1 }
      }
      i += 1
    }
    emit(segStart, len) // trailing (possibly short) segment
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nSegs, kept, UTF8String.fromBytes(out, 0, outLen)))
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("segmentClean", this, classOf[SegmentCleanExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SegmentsExpr {
  import org.apache.spark.sql.GraftSqlBridge

  /** Column API: consecutive w-word segments of a text column. */
  def segments(text: Column, w: Int = 3): Column =
    GraftSqlBridge.column(SegmentsExpr(GraftSqlBridge.expression(text), w))

  /** Column API: 60-bit hashes of the consecutive w-word segments. */
  def segmentHashes(text: Column, w: Int = 3): Column =
    GraftSqlBridge.column(SegmentHashesExpr(GraftSqlBridge.expression(text), w))

  /** Column API: 60-bit hashes of every overlapping k-word shingle. */
  def shingleHashes(text: Column, k: Int = 5): Column =
    GraftSqlBridge.column(ShingleHashesExpr(GraftSqlBridge.expression(text), k))

  /** Column API: one-pass reassembly against a broadcast boilerplate set. */
  def segmentClean(text: Column,
      boiler: org.apache.spark.broadcast.Broadcast[Array[Long]],
      w: Int = 3): Column =
    GraftSqlBridge.column(SegmentCleanExpr(GraftSqlBridge.expression(text), boiler, w))
}
