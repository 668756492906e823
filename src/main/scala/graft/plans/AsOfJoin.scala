package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Whole-operator extension: a native AS-OF join (for each left row, the
  * single right row with equal key and the greatest right-time <= left-time).
  *
  * This is the (c)-level extension path from the build guidance — a custom
  * LogicalPlan + SparkStrategy + SparkPlan — for semantics Spark's built-in
  * joins can't express without a window-over-union rewrite. The physical
  * operator requires hash clustering on the key and (key, time) ordering
  * from both children (Catalyst inserts the exchanges/sorts), then runs a
  * streaming one-pass merge per partition: O(n_left + n_right) with one
  * buffered right row — no per-row range scan, no blowup, 100 TB-safe.
  */
final case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lkB = BindReferences.bindReference(leftKey, left.output)
    val ltB = BindReferences.bindReference(leftTime, left.output)
    val rkB = BindReferences.bindReference(rightKey, right.output)
    val rtB = BindReferences.bindReference(rightTime, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val rightArity = right.output.size

    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val rBuf = rIt.buffered
      val nullRight = new GenericInternalRow(rightArity)
      val joined = new JoinedRow
      var matchKey: Any = null
      var matchRow: InternalRow = null
      lIt.map { lRow =>
        val lk = lkB.eval(lRow)
        val lt = ltB.eval(lRow)
        if (lk == null || lt == null) {
          // null key/time can match nothing: emit null-extended without
          // advancing (nulls sort first, so no right rows are skipped early)
          joined(lRow, nullRight)
        } else {
          // advance the right side up to (key, time)
          var advance = true
          while (advance && rBuf.hasNext) {
            val h = rBuf.head
            val rk = rkB.eval(h)
            if (rk == null) {
              rBuf.next() // null right key never matches; sorted first
            } else {
              val c = keyOrd.compare(rk.asInstanceOf[AnyRef], lk.asInstanceOf[AnyRef])
              if (c < 0) {
                rBuf.next() // right key behind: discard
              } else if (c == 0) {
                val rt = rtB.eval(h)
                if (rt == null) {
                  rBuf.next() // null right time never matches; sorted first in key group
                } else if (timeOrd.lteq(rt.asInstanceOf[AnyRef], lt.asInstanceOf[AnyRef])) {
                  matchKey = rk
                  matchRow = rBuf.next().copy() // candidate; later ones may supersede
                } else {
                  advance = false
                }
              } else {
                advance = false
              }
            }
          }
          val hit = matchRow != null && keyOrd.compare(
            matchKey.asInstanceOf[AnyRef], lk.asInstanceOf[AnyRef]) == 0
          joined(lRow, if (hit) matchRow else nullRight)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {

  /** Register the planner strategy once per session. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val strategies = spark.experimental.extraStrategies
    if (!strategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies = strategies :+ AsOfJoinStrategy
  }

  /** DataFrame API: for every left row, append the right row with equal key
    * and greatest rightTime <= leftTime (nulls when none).
    */
  def asof(leftDf: DataFrame, rightDf: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column): DataFrame = {
    val spark = leftDf.sparkSession
    ensureRegistered(spark)
    GraftSqlBridge.dataFrame(spark, AsOfJoinPlan(
      GraftSqlBridge.plan(leftDf), GraftSqlBridge.plan(rightDf),
      GraftSqlBridge.expression(leftKey), GraftSqlBridge.expression(rightKey),
      GraftSqlBridge.expression(leftTime), GraftSqlBridge.expression(rightTime)))
  }
}
