package graft.operators

import graft.vpts.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guards: the scale properties the round-2 rework
  * bought (no all-pairs joins, shuffle-free argmin, broadcast dims) are
  * asserted on the physical plans so a future edit can't silently
  * reintroduce a quadratic join or an n-row exchange.
  */
class PlanShapeSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def count(hay: String, needle: String): Int =
    hay.sliding(needle.length).count(_ == needle)

  test("no query plan contains a cartesian product or nested-loop join on big sides") {
    // BroadcastNestedLoopJoin with a one-row build side is fine (the ivf
    // argmin); CartesianProduct is never fine
    graft.Registry.all.foreach { q =>
      val p = plan(q.fn(spark, sfDir))
      assert(!p.contains("CartesianProduct"), s"${q.name} plans a cartesian product:\n$p")
    }
  }

  test("ivf assign has no exchange on the n-row path") {
    val p = plan(Similarity.qAnnIvfAssign(spark, sfDir))
    // allowed exchanges: the three tiny centroid-aggregation exchanges +
    // the final presentation sort; the n-row side goes scan -> project ->
    // broadcast join with nothing keyed on vec_id until the output sort
    assert(count(p, "Exchange") - count(p, "BroadcastExchange") <= 4, p)
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Exchange hashpartitioning(vec_id"),
      s"n-row shuffle reappeared:\n$p")
    assert(!p.contains("Window"), s"row_number window reappeared:\n$p")
  }

  test("embedding near-dup joins on bucketed candidates, not label") {
    val p = plan(Dedup.qEmbeddingNearDup(spark, sfDir))
    assert(!p.toLowerCase.contains("label"), s"label-keyed operation reappeared:\n$p")
  }

  test("jaccard pairs have no shingle-explode self-join") {
    val p = plan(Dedup.qJaccardPairs(spark, sfDir))
    // exactly the candidate bucket-collect + two id-keyed joins back to the
    // shingle arrays; a shingle self-join would show a join keyed on the
    // exploded gram column
    assert(!p.contains("SortMergeJoin") || !p.contains(" g#"), p)
    assert(p.contains("array_intersect"), p)
  }

  test("decontamination broadcasts the benchmark gram set") {
    val p = plan(PipelineOps.qDecontaminate(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("star joins broadcast their dimension sides") {
    val p3 = plan(Relational.q3ShippingPriority(spark, sfDir))
    assert(p3.contains("BroadcastHashJoin"), p3)
    assert(p3.contains("TakeOrderedAndProject"), p3)
  }

  test("q1 aggregates partially before its exchange and prunes the scan") {
    val p = plan(Relational.q1PricingSummary(spark, sfDir))
    assert(p.contains("partial_"), p)
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p)
  }
}
