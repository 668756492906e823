package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Apply a learned BPE merge table to text — the tokenizer-application hot
  * path (every training-data pipeline runs this over the whole corpus, so
  * it must be a narrow compiled projection, not a 2N-deep HOF chain).
  *
  * Semantics: each word becomes its character symbols + the `</w>` end
  * marker, then the merges apply IN RANK ORDER, each as a greedy
  * left-to-right non-overlapping adjacent merge — exactly
  * [[graft.operators.Bpe]]'s learn-side merge, and provably equal to the
  * classic priority-queue apply (a merge can only create symbols whose
  * pairs were learned LATER, so rank order never misses an earlier merge).
  * Output is every word's tokens joined by single spaces (tokens never
  * contain a space, so the join is lossless).
  *
  * The merge table is a bounded expression constant (vocabulary-induction
  * output, thousands of rows at most — collected control-plane, like a
  * broadcast codebook). Codegen is the direct-call pattern
  * ([[IntersectSizeExpr]]).
  */
case class BpeEncodeExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "bpe_encode"

  @transient private lazy val mergeArr: Array[(String, String)] = merges.toArray

  private def encodeWord(word: String, out: StringBuilder): Unit = {
    var syms = new Array[String](word.length + 1)
    var i = 0
    while (i < word.length) { syms(i) = String.valueOf(word.charAt(i)); i += 1 }
    syms(word.length) = graft.operators.Bpe.EndMark
    var n = syms.length
    var m = 0
    while (m < mergeArr.length && n > 1) {
      val (l, r) = mergeArr(m)
      // greedy left-to-right scan-skip merge of (l, r) -> l+r, in place
      var w = 0
      var rd = 0
      while (rd < n) {
        if (rd < n - 1 && syms(rd) == l && syms(rd + 1) == r) {
          syms(w) = l + r; rd += 2
        } else { syms(w) = syms(rd); rd += 1 }
        w += 1
      }
      n = w
      m += 1
    }
    i = 0
    while (i < n) {
      if (out.nonEmpty) out.append(' ')
      out.append(syms(i)): Unit
      i += 1
    }
  }

  def compute(text: UTF8String): UTF8String = {
    val s = text.toString
    val out = new StringBuilder(s.length * 2)
    var start = 0
    var i = 0
    val len = s.length
    while (i <= len) {
      if (i == len || s.charAt(i) == ' ') {
        if (i > start) encodeWord(s.substring(start, i), out)
        start = i + 1
      }
      i += 1
    }
    UTF8String.fromString(out.toString)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncode", this, classOf[BpeEncodeExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeEncodeExpr {
  import org.apache.spark.sql.GraftSqlBridge

  def bpeEncode(text: Column, merges: Seq[(String, String)]): Column =
    GraftSqlBridge.column(
      BpeEncodeExpr(GraftSqlBridge.expression(text), merges))
}
