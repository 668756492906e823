package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for per-document term statistics: one
  * compiled tokenizer pass returning `[dl, tf(terms(0)), tf(terms(1)), …]`
  * — doc length plus the term frequency of each query term.
  *
  * Semantically identical to the declarative
  * `size(split(text,' '))` + per-term `size(filter(split(text,' '), _ === t))`
  * it replaces in the BM25/TF-IDF scoring scan (ExprSpec pins the
  * equivalence). Why native: `filter` is a higher-order function —
  * CodegenFallback, interpreted per row — and the declarative form
  * re-materializes the split array once per term per row. Here the text is
  * walked ONCE with zero intermediate arrays, and `doGenCode` emits a
  * direct `compute(value)` call so the scoring projection stays inside the
  * WholeStageCodegen span.
  */
case class TermStatsExpr(child: Expression, terms: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "term_stats"

  def compute(input: UTF8String): ArrayData = {
    val text = input.toString
    val out = new Array[Int](terms.length + 1)
    var start = 0
    val n = text.length
    var i = 0
    while (i <= n) {
      if (i == n || text.charAt(i) == ' ') {
        out(0) += 1 // split(text, " ", -1) semantics: empty tokens count
        var t = 0
        while (t < terms.length) {
          val term = terms(t)
          if (i - start == term.length && text.startsWith(term, start))
            out(t + 1) += 1
          t += 1
        }
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("termStats", this, classOf[TermStatsExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TermStatsExpr {
  import org.apache.spark.sql.GraftSqlBridge

  /** Column API: `[dl, tf1, tf2, …]` for a text column and fixed terms. */
  def termStats(text: Column, terms: Seq[String]): Column =
    GraftSqlBridge.column(TermStatsExpr(GraftSqlBridge.expression(text), terms))
}
