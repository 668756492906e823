package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native scaled-int cosine similarity — bit-identical to the declarative
  * `dotScaled/sqrt` chain in [[graft.functions.EmbeddingFunctions]] but one
  * compiled loop. Spark's higher-order functions (zip_with / aggregate) are
  * CodegenFallback: each of the three dot products paid ~dim interpreted
  * closure calls per row, which made brute-force cosine ranking ~20x slower
  * than the equivalent vectorized scan at sf1.
  *
  * Determinism contract (same as the declarative form): components are
  * rounded half-away-from-zero to exact integers after a double cast
  * (floor(v+0.5) / ceil(v-0.5) — exactly Spark's HALF_UP Round for inputs
  * of float32 precision, whose 24-bit mantissas cannot produce the
  * pathological near-tie doubles where the formulas differ); products and
  * sums stay below 2^53 so IEEE addition is exact in any order; one final
  * division.
  */
case class CosineExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_scaled"

  private val Scale = graft.functions.EmbeddingFunctions.Scale

  @transient private lazy val leftIsFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val rightIsFloat =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private def rnd(v: Double): Double =
    if (v >= 0) math.floor(v + 0.5) else math.ceil(v - 0.5)

  def compute(a: ArrayData, b: ArrayData): Any = {
    val n = a.numElements()
    if (b.numElements() != n) return null // declarative zip_with null semantics
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      // declarative twin propagates a null element through aggregate() to a
      // null sum; getFloat on a null slot would silently read 0 instead
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val av = if (leftIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val bv = if (rightIsFloat) b.getFloat(i).toDouble else b.getDouble(i)
      val x = rnd(av * Scale)
      val y = rnd(bv * Scale)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cosineExpr", this, classOf[CosineExpr].getName)
    val r = ctx.freshName("cosRes") // fixed name would collide when two
    // instances land in one generated function
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""Object $r = $ref.compute($a, $b);
         |${ev.isNull} = $r == null;
         |${ev.value} = ${ev.isNull} ? -1.0 : ((Double) $r).doubleValue();""".stripMargin)
  }

  override def nullable: Boolean = true

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object CosineExpr {
  import org.apache.spark.sql.GraftSqlBridge

  /** Column API: scaled-int cosine of two float/double array columns. */
  def cosine(a: Column, b: Column): Column =
    GraftSqlBridge.column(CosineExpr(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
