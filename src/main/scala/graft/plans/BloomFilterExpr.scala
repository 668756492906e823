package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native bloom-filter membership probe over a pre-built
  * `org.apache.spark.util.sketch.BloomFilter` (the sketch Spark's own
  * runtime row-level filtering uses). The filter rides into the task as a
  * plan reference object (serialized once per executor, not per row), and
  * the probe is a codegen'd primitive call — no UDF boxing, no broadcast
  * variable plumbing in user code.
  *
  * Use through [[graft.functions.ScalePatterns.bloomPrejoin]]: probe the
  * big fact side BEFORE its shuffle so only candidate rows pay exchange
  * cost. False positives are filtered by the exact join that follows; false
  * negatives cannot occur, so results are exactly the plain join's.
  *
  * Supports long and string keys (the two key shapes every table here
  * uses); anything else fails at bind time rather than silently hashing
  * boxed objects.
  */
case class BloomMightContainExpr(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_might_contain supports BIGINT and STRING keys, got $other")
    }

  override def nullSafeEval(input: Any): Any = child.dataType match {
    case LongType => bloom.mightContainLong(input.asInstanceOf[Long])
    case _ => bloom.mightContainString(input.asInstanceOf[UTF8String].toString)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    child.dataType match {
      case LongType =>
        nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContainLong($c);")
      case _ =>
        nullSafeCodeGen(ctx, ev, c =>
          s"${ev.value} = $ref.mightContainString($c.toString());")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContainExpr {
  import org.apache.spark.sql.GraftSqlBridge

  def mightContain(key: Column, bloom: BloomFilter): Column =
    GraftSqlBridge.column(
      BloomMightContainExpr(GraftSqlBridge.expression(key), bloom))
}
