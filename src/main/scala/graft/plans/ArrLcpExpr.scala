package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native longest-common-prefix length of two string arrays — the
  * suffix-LRS neighbor-LCP hot loop. Bit-identical to the declarative
  * `coalesce(nullif(array_position(zip_with(a, b, (x,y) => x <=> y),
  * false), 0) - 1, least(size(a), size(b)))` (ExprSpec-pinned), but one
  * compiled element walk instead of a CodegenFallback higher-order chain
  * that materializes a boolean array per comparison — at sf1 the window
  * stage evaluates this twice (lag + lead) per candidate position.
  *
  * Semantics: walk to the first index where the elements differ under
  * null-safe equality and return it; equal through min(len) returns
  * min(len) (zip_with's null padding makes any length overhang a
  * mismatch at index min(len)+1, so the two forms agree there too).
  */
case class ArrLcpExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "arr_lcp"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(StringType, _) => true
      case _                        => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<string> columns, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  def compute(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    while (i < n) {
      val an = a.isNullAt(i); val bn = b.isNullAt(i)
      if (an || bn) {
        if (!(an && bn)) return i.toLong // null-safe: null == null only
      } else if (!a.getUTF8String(i).equals(b.getUTF8String(i))) {
        return i.toLong
      }
      i += 1
    }
    n.toLong
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("arrLcp", this, classOf[ArrLcpExpr].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object ArrLcpExpr {
  import org.apache.spark.sql.GraftSqlBridge

  /** Column API: LCP length of two array<string> columns. */
  def arrLcp(a: Column, b: Column): Column =
    GraftSqlBridge.column(ArrLcpExpr(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
