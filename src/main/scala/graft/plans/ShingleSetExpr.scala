package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native DISTINCT k-word shingle set: equivalent to
  * `array_distinct(shingles(words(text), k))` (TextFunctions) but one
  * compiled loop instead of four interpreted higher-order functions — the
  * declarative chain is ~10x slower per corpus pass and dominates every
  * operator that needs exact shingle sets at scale (n-gram Jaccard,
  * decontamination). Output order is first occurrence; the consumers are
  * order-insensitive (sizes, intersections, explode-then-aggregate), and
  * the DuckDB twins' list_distinct has the same first-occurrence order
  * anyway.
  *
  * `hashed = true` emits the 60-bit md5-prefix hash of each distinct
  * shingle instead of its text: value = first 15 hex chars of md5(shingle)
  * parsed base-16 (= the md5's leading 8 bytes big-endian >>> 4), which
  * fits a SIGNED 64-bit integer so both engines agree on the type. The
  * DuckDB twin is
  * `list_distinct(list_transform(sh, s -> ('0x'||substring(md5(s),1,15))::BIGINT))`
  * — the hash is computed identically on both sides, so results match even
  * in the (2^-60-scale) event of a collision. Shuffling 8-byte longs
  * instead of ~20-byte shingle strings shrinks the Jaccard join payload
  * ~3x and turns every intersection comparison into a long equality.
  *
  * Codegen: direct `compute(value)` call on the expression object (no
  * CodegenFallback row materialization), same pattern as
  * [[MinhashSigExpr]].
  */
case class ShingleSetExpr(child: Expression, k: Int = 3, hashed: Boolean = false,
    sorted: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(if (hashed) LongType else StringType, containsNull = false)
  override def prettyName: String = "shingle_set"

  /** md5(s) leading 60 bits as a non-negative long (15 hex chars base-16);
    * shared ThreadLocal-digest implementation in [[Hash60]].
    */
  private def hash60(s: String): Long = Hash60.of(s)

  def compute(input: UTF8String): ArrayData = {
    val words = Tokenize.words(input.toString)
    if (words.length < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    Tokenize.eachShingle(words, k) { s => seen.add(s): Unit }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    if (hashed && sorted) {
      // ascending-long emission: the set is distinct, so order is free to
      // choose, and sorted arrays let IntersectSizeExpr merge-walk the
      // exact-Jaccard probe in O(na+nb) with no per-pair hash table
      val longs = new Array[Long](seen.size)
      while (it.hasNext) { longs(j) = hash60(it.next()); j += 1 }
      java.util.Arrays.sort(longs)
      j = 0
      while (j < longs.length) { out(j) = longs(j); j += 1 }
    } else if (hashed) {
      while (it.hasNext) { out(j) = hash60(it.next()); j += 1 }
    } else {
      while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleSet", this, classOf[ShingleSetExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleSetExpr {
  import org.apache.spark.sql.GraftSqlBridge

  /** Column API: distinct k-word shingle set of a text column. */
  def shingleSet(text: Column, k: Int = 3): Column =
    GraftSqlBridge.column(ShingleSetExpr(GraftSqlBridge.expression(text), k))

  /** Column API: distinct 60-bit shingle hashes (see class doc). */
  def shingleHashSet(text: Column, k: Int = 3): Column =
    GraftSqlBridge.column(
      ShingleSetExpr(GraftSqlBridge.expression(text), k, hashed = true))

  /** [[shingleHashSet]] emitted in ascending order, for merge-walk
    * intersection via [[IntersectSizeExpr]]. Same SET (size/membership
    * consumers see no difference); only element order changes.
    */
  def shingleHashSetSorted(text: Column, k: Int = 3): Column =
    GraftSqlBridge.column(
      ShingleSetExpr(GraftSqlBridge.expression(text), k, hashed = true, sorted = true))

  /** DuckDB twin of [[shingleHashSet]]'s per-shingle hash. */
  def hash60Sql(s: String): String =
    s"('0x' || substring(md5($s), 1, 15))::BIGINT"
}
