package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native negated squared-L2 distance over scaled-int embeddings — the
  * batched k-NN join's per-pair hot loop. Takes the two RAW float/double
  * vectors and applies the 2^20 scaling inside the compiled loop, so the
  * join pays neither an interpreted `transform(round(cast))` scaling pass
  * nor the `zip_with`/`aggregate` CodegenFallback chain (~2*dim interpreted
  * closure calls per joined pair — at |Q| queries against a corpus the
  * closure overhead IS the job; same trap [[CosineExpr]] was built to kill).
  *
  * Determinism contract (bit-identical to the declarative
  * `-aggregate(zip_with(scaled(a), scaled(b), (x,y) => (x-y)*(x-y)), ...)`):
  * components round half-away-from-zero to exact integers (floor(v+0.5) /
  * ceil(v-0.5) — exactly Spark's HALF_UP Round for float32-precision
  * inputs); each (x-y)^2 <= 2^44 and the 64-dim sum stays below 2^53, so
  * IEEE double addition is exact in any order and the final long cast is
  * lossless. Returned NEGATED so a value-DESC top-k means nearest-first.
  */
case class NegSqDistExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "neg_sq_dist_scaled"

  /** Analysis-time gate: only float32 arrays. The determinism contract
    * above (floor(v+0.5) == Spark HALF_UP round, exact double sums) is
    * proven only for float32-precision inputs, so double arrays are
    * rejected too rather than silently diverging on ties just below .5.
    */
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> columns (float32 determinism " +
        s"contract), got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  private val Scale = graft.functions.EmbeddingFunctions.Scale

  private def rnd(v: Double): Double =
    if (v >= 0) math.floor(v + 0.5) else math.ceil(v - 0.5)

  def compute(a: ArrayData, b: ArrayData): Any = {
    val n = a.numElements()
    if (b.numElements() != n) return null // declarative zip_with null semantics
    var d = 0.0
    var i = 0
    while (i < n) {
      // declarative twin propagates a null element through aggregate() to a
      // null sum; getFloat on a null slot would silently read 0 instead
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val t = rnd(a.getFloat(i).toDouble * Scale) - rnd(b.getFloat(i).toDouble * Scale)
      d += t * t
      i += 1
    }
    java.lang.Long.valueOf((-d).toLong)
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def nullable: Boolean = true

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("negSqDist", this, classOf[NegSqDistExpr].getName)
    val r = ctx.freshName("nsdRes")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""Object $r = $ref.compute($a, $b);
         |${ev.isNull} = $r == null;
         |${ev.value} = ${ev.isNull} ? -1L : ((Long) $r).longValue();""".stripMargin)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object NegSqDistExpr {
  import org.apache.spark.sql.GraftSqlBridge

  /** Column API: negated scaled-int squared-L2 of two raw vector columns. */
  def negSqDist(a: Column, b: Column): Column =
    GraftSqlBridge.column(NegSqDistExpr(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
