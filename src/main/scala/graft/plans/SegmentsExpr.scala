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

/** [[SegmentsExpr]]'s shuffle-friendly twin: the 60-bit [[Hash60]] of each
  * consecutive w-word segment, computed in the same compiled pass (same
  * tokenizer, same segment assembly — the two expressions can never emit
  * different segment boundaries). Lets the segment-dedup operator shuffle
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
    val words = Tokenize.words(input.toString)
    val n = words.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val nSegs = (n + w - 1) / w
    val out = new Array[Any](nSegs)
    val sb = new java.lang.StringBuilder()
    var s = 0
    while (s < nSegs) {
      val from = s * w
      val until = math.min(from + w, n)
      sb.setLength(0)
      var i = from
      while (i < until) {
        if (i > from) sb.append(' ')
        sb.append(words(i))
        i += 1
      }
      out(s) = Hash60.of(sb.toString)
      s += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("segmentHashes", this, classOf[SegmentHashesExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 60-bit [[Hash60]] of every OVERLAPPING k-word shingle, in order, with
  * repeats — element i is the window starting at word i (contrast
  * [[ShingleSetExpr]], which emits the sorted DISTINCT set for Jaccard).
  * Feeds the repeated-substring-span operator: window occurrence counting
  * shuffles `(doc_id, pos, hash60)` longs, never the window strings. Same
  * [[Tokenize]] + assembly as every other text expression, so window
  * boundaries can never diverge across operators.
  */
case class ShingleHashesExpr(child: Expression, k: Int = 5)
    extends UnaryExpression {
  require(k >= 1, s"bad shingle width $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  def compute(input: UTF8String): ArrayData = {
    val words = Tokenize.words(input.toString)
    if (words.length < k) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](words.length - k + 1)
    var i = 0
    Tokenize.eachShingle(words, k) { s =>
      out(i) = Hash60.of(s)
      i += 1
    }
    new GenericArrayData(out)
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
  * set: tokenize, segment (same [[Tokenize]] + assembly loop as
  * [[SegmentsExpr]]/[[SegmentHashesExpr]] so boundaries can never diverge),
  * hash each segment, drop the ones whose [[Hash60]] is in the broadcast
  * sorted array, and emit `struct(n_segs, n_kept, clean_text)` — the whole
  * per-doc side of segment dedup in ONE codegen'd projection with zero
  * joins. The boilerplate set rides a `Broadcast` handle (executors fetch
  * it once; the expression serializes as a pointer, not the array), and
  * membership is binary search on the sorted longs.
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
    val words = Tokenize.words(input.toString)
    val n = words.length
    val nSegs = if (n == 0) 0 else (n + w - 1) / w
    val sb = new java.lang.StringBuilder()
    val outSb = new java.lang.StringBuilder()
    var kept = 0L
    var s = 0
    while (s < nSegs) {
      val from = s * w
      val until = math.min(from + w, n)
      sb.setLength(0)
      var i = from
      while (i < until) {
        if (i > from) sb.append(' ')
        sb.append(words(i))
        i += 1
      }
      val seg = sb.toString
      if (java.util.Arrays.binarySearch(sorted, Hash60.of(seg)) < 0) {
        if (kept > 0) outSb.append(' ')
        outSb.append(seg)
        kept += 1
      }
      s += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nSegs.toLong, kept, UTF8String.fromString(outSb.toString)))
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
