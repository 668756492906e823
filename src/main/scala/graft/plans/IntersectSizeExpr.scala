package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Native intersection SIZE of two ascending long arrays — equivalent to
  * `size(array_intersect(a, b))` on distinct inputs, but a single O(na+nb)
  * merge walk instead of Spark's per-row hash-set build + probe. This is the
  * exact-Jaccard hot probe: it runs once per LSH candidate pair, and
  * array_intersect's OpenHashSet allocation per invocation dominated the
  * pair-verification stage of `Dedup.jaccardPairsOf` at sf1.
  *
  * Contract: both inputs are ascending and duplicate-free (the
  * [[ShingleSetExpr]] `sorted = true` form). On unsorted input the count
  * would under-report — so the producers are pinned, not checked per row.
  *
  * Codegen: direct `compute(a, b)` call on the expression object, same
  * pattern as [[CosineExpr]].
  */
case class IntersectSizeExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "intersect_size_sorted"

  def compute(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("intersectSize", this, classOf[IntersectSizeExpr].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object IntersectSizeExpr {
  import org.apache.spark.sql.GraftSqlBridge

  /** Column API: |a ∩ b| for two ascending duplicate-free long arrays. */
  def intersectSize(a: Column, b: Column): Column =
    GraftSqlBridge.column(IntersectSizeExpr(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
