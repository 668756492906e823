package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native random-hyperplane LSH signature over a float embedding column.
  *
  * Semantics identical to Similarity.qAnnLshSignature's declarative form
  * (verified by the same DuckDB oracle): hyperplane j's component i is ±1
  * from md5("j|i")'s first hex digit; bit j of the signature = sign of the
  * exact scaled-integer projection sum(±round(double(e_i)·2^20)).
  *
  * The declarative version is a 512-term interpreted expression tree; this
  * is one compiled loop with a precomputed sign matrix. `doGenCode` emits a
  * direct `compute(array)` call so the expression joins the surrounding
  * WholeStageCodegen span (no CodegenFallback row materialization).
  */
case class LshSigExpr(child: Expression, nPlanes: Int = 8, dim: Int = 64)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_sig"

  @transient private lazy val signs: Array[Array[Double]] =
    LshSigExpr.signMatrix(nPlanes, dim)

  def compute(arr: ArrayData): Long = {
    val n = math.min(arr.numElements(), dim)
    var sig = 0L
    var j = 0
    while (j < nPlanes) {
      val row = signs(j)
      var proj = 0.0
      var i = 0
      while (i < n) {
        // round half-away-from-zero: matches Spark/DuckDB round(double),
        // NOT math.rint (half-even) — float*2^20 can land exactly on .5
        val v = arr.getFloat(i).toDouble * 1048576
        proj += row(i) * (if (v >= 0) math.floor(v + 0.5) else math.ceil(v - 0.5))
        i += 1
      }
      if (proj > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshSig", this, classOf[LshSigExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshSigExpr {
  import org.apache.spark.sql.GraftSqlBridge

  /** ±1 per (plane j, 1-based component i) from md5("j|i"). */
  private[graft] def signMatrix(nPlanes: Int, dim: Int): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(nPlanes, dim) { (j, i0) =>
      md.reset()
      val digest = md.digest(s"$j|${i0 + 1}".getBytes("UTF-8"))
      // first hex digit >= '8' <=> high bit of first byte set
      if ((digest(0) & 0x80) != 0) 1.0 else -1.0
    }
  }

  def lshSigNative(embedding: Column, nPlanes: Int = 8, dim: Int = 64): Column =
    GraftSqlBridge.column(LshSigExpr(GraftSqlBridge.expression(embedding), nPlanes, dim))
}
