package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native nearest-centroid step: given a vector (array<double>) and a
  * broadcast centroid table (array<struct<c_id: bigint, cv: array<double>>>),
  * return struct(dist, c_id) of the squared-L2-nearest centroid (ties ->
  * smaller id). Equivalent to the declarative
  * `array_min(transform(cents, c -> struct(aggregate(zip_with(...)), id)))`
  * but one compiled loop — the interpreted lambda chain costs ~K*dim
  * closure calls per row and dominated the K-means assign pass (measured
  * ~5x on the whole query at sf1). Accumulation order matches the
  * declarative form (index order, left fold), so results are bit-identical.
  */
case class ArgminL2Expr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("dist", DoubleType, nullable = false),
    StructField("c_id", LongType, nullable = false)))
  override def prettyName: String = "argmin_l2"

  def compute(v: ArrayData, cents: ArrayData): InternalRow = {
    val n = v.numElements()
    var bestDist = Double.PositiveInfinity
    var bestId = Long.MaxValue
    var ci = 0
    val nc = cents.numElements()
    while (ci < nc) {
      val c = cents.getStruct(ci, 2)
      val cid = c.getLong(0)
      val cv = c.getArray(1)
      var d = 0.0
      var i = 0
      while (i < n) {
        // a null vector/centroid element would read as 0 through getDouble;
        // the declarative twin nulls the whole distance — propagate null
        if (v.isNullAt(i) || cv.isNullAt(i)) return null
        val t = v.getDouble(i) - cv.getDouble(i)
        d += t * t
        i += 1
      }
      if (d < bestDist || (d == bestDist && cid < bestId)) {
        bestDist = d
        bestId = cid
      }
      ci += 1
    }
    new GenericInternalRow(Array[Any](bestDist, bestId))
  }

  override def nullSafeEval(v: Any, c: Any): Any =
    compute(v.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData])

  override def nullable: Boolean = true

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("argminL2", this, classOf[ArgminL2Expr].getName)
    val r = ctx.freshName("argminRes")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""org.apache.spark.sql.catalyst.InternalRow $r = $ref.compute($a, $b);
         |${ev.isNull} = $r == null;
         |${ev.value} = $r;""".stripMargin)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object ArgminL2Expr {
  import org.apache.spark.sql.GraftSqlBridge

  /** Column API: struct(dist, c_id) of the nearest centroid. */
  def argminL2(v: Column, cents: Column): Column =
    GraftSqlBridge.column(ArgminL2Expr(
      GraftSqlBridge.expression(v), GraftSqlBridge.expression(cents)))
}
