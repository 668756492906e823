package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Delta+varint posting-list codec (VERDICT r7 #6) — the on-disk shape of a
  * 100 TB term index. A posting block of (doc_id, tf, dl) entries sorted by
  * doc_id packs into ONE binary cell: doc_ids as zigzag(first) + plain
  * unsigned LEB128 deltas (sorted ⇒ deltas ≥ 0), tf and dl as plain
  * unsigned LEB128 (counts ≥ 0). Dense doc-id runs cost ~1 byte/entry for
  * the id instead of 8 — the standard inverted-index compression (Lucene's
  * doc-delta VInt layout is the public reference point).
  *
  * Both directions are native expressions with the direct-call codegen
  * pattern ([[IntersectSizeExpr]]): pack runs once per block at index-build
  * time; unpack runs inside the PROBE's codegen'd projection, so decoding
  * stays in the whole-stage-codegen span that feeds the BM25 aggregation.
  */
object PostingsCodec {
  import org.apache.spark.sql.GraftSqlBridge

  /** array<struct<doc_id:long, tf:long, dl:long>> (ascending doc_id) -> binary. */
  def pack(entries: Column): Column =
    GraftSqlBridge.column(PostingsPackExpr(GraftSqlBridge.expression(entries)))

  /** binary -> array<struct<doc_id:long, tf:long, dl:long>> (ascending doc_id). */
  def unpack(blob: Column): Column =
    GraftSqlBridge.column(PostingsUnpackExpr(GraftSqlBridge.expression(blob)))

  val entryType: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("tf", LongType, nullable = false),
    StructField("dl", LongType, nullable = false)))

  private[plans] def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)
  private[plans] def unzigzag(v: Long): Long = (v >>> 1) ^ -(v & 1)

  private[plans] def writeVarint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0L) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }
}

/** Pack a sorted posting block; see [[PostingsCodec]]. Runs at index-BUILD
  * time (once per block), immediately downstream of
  * `sort_array(collect_list(...))`, so its input contract — ascending
  * doc_id — is the producer's struct ordering, not a per-row check.
  */
case class PostingsPackExpr(child: Expression) extends UnaryExpression {
  import PostingsCodec._

  override def dataType: DataType = BinaryType
  override def prettyName: String = "postings_pack"

  def compute(a: ArrayData): Array[Byte] = {
    val n = a.numElements()
    val out = new java.io.ByteArrayOutputStream(n * 4)
    var prev = 0L
    var i = 0
    while (i < n) {
      val e = a.getStruct(i, 3)
      val id = e.getLong(0)
      if (i == 0) writeVarint(out, zigzag(id))
      else writeVarint(out, id - prev) // sorted ⇒ non-negative
      prev = id
      writeVarint(out, e.getLong(1))
      writeVarint(out, e.getLong(2))
      i += 1
    }
    out.toByteArray
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("postingsPack", this, classOf[PostingsPackExpr].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unpack a posting block; see [[PostingsCodec]]. Runs in the probe's hot
  * projection — one tight byte walk, no intermediate collections.
  */
case class PostingsUnpackExpr(child: Expression) extends UnaryExpression {
  import PostingsCodec._

  override def dataType: DataType = ArrayType(entryType, containsNull = false)
  override def prettyName: String = "postings_unpack"

  def compute(bytes: Array[Byte]): ArrayData = {
    var pos = 0
    def readVarint(): Long = {
      var v = 0L
      var shift = 0
      var b = bytes(pos); pos += 1
      while ((b & 0x80) != 0) {
        v |= (b & 0x7fL) << shift
        shift += 7
        b = bytes(pos); pos += 1
      }
      v | ((b & 0x7fL) << shift)
    }
    val buf = scala.collection.mutable.ArrayBuffer.empty[Any]
    var prev = 0L
    var first = true
    while (pos < bytes.length) {
      val id = if (first) { first = false; unzigzag(readVarint()) }
      else prev + readVarint()
      prev = id
      val tf = readVarint()
      val dl = readVarint()
      buf += new GenericInternalRow(Array[Any](id, tf, dl)): Unit
    }
    new GenericArrayData(buf.toArray)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("postingsUnpack", this, classOf[PostingsUnpackExpr].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
