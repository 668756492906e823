package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
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

object SegmentsExpr {
  import org.apache.spark.sql.GraftSqlBridge

  /** Column API: consecutive w-word segments of a text column. */
  def segments(text: Column, w: Int = 3): Column =
    GraftSqlBridge.column(SegmentsExpr(GraftSqlBridge.expression(text), w))
}
