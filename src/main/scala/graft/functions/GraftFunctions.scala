package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.udaf

/** One-call SQL surface: registers every custom expression and sketch
  * aggregator as a session temp function, so a pure-`spark.sql` user (BI
  * tool, notebook, thrift server) reaches the whole library without the
  * Column API:
  *
  *   graft.functions.GraftFunctions.registerAll(spark)
  *   spark.sql("SELECT tdigest_quartiles(value), kmv_distinct(user_id)
  *              FROM events GROUP BY event_type")
  *
  * Expressions register through the Catalyst function registry (they stay
  * codegen'd native expressions, not UDF wrappers); aggregators register
  * as typed UDAFs (ObjectHashAggregate with map-side partials, exactly as
  * from the Column API).
  */
object GraftFunctions {

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    // native expressions
    graft.plans.MinhashSigExpr.register(spark)
    reg.createOrReplaceTempFunction("simhash64",
      exprs => graft.plans.SimhashExpr(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("shingle_set",
      exprs => graft.plans.ShingleSetExpr(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("shingle_hash_set",
      exprs => graft.plans.ShingleSetExpr(exprs.head, hashed = true), "scala_udf")
    reg.createOrReplaceTempFunction("cosine_scaled",
      exprs => graft.plans.CosineExpr(exprs(0), exprs(1)), "scala_udf")
    // term_stats(text, 'term1', 'term2', ...) -> [dl, tf1, tf2, ...];
    // the term arguments must be string literals (folded at plan time)
    reg.createOrReplaceTempFunction("term_stats",
      exprs => graft.plans.TermStatsExpr(exprs.head,
        exprs.tail.map(e => e.eval().toString)), "scala_udf")
    reg.createOrReplaceTempFunction("token_counts",
      exprs => graft.plans.TokenCountsExpr(exprs.head), "scala_udf")

    // sketch aggregators (fixed, documented parameterizations — SQL temp
    // functions can't take constructor args; use the Column API to tune)
    spark.udf.register("tdigest_quartiles",
      udaf(new graft.plans.TDigestAggregator(200.0, Seq(0.25, 0.5, 0.75)),
        org.apache.spark.sql.Encoders.scalaDouble))
    spark.udf.register("kmv_distinct",
      udaf(new graft.plans.KmvDistinctAggregator(4096),
        org.apache.spark.sql.Encoders.STRING))
    spark.udf.register("kmv_set",
      udaf(new graft.plans.KmvSetAggregator(4096),
        org.apache.spark.sql.Encoders.STRING))
    spark.udf.register("topk3_by",
      udaf(new graft.plans.TopKAggregator(3),
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Long)]()))
    spark.udf.register("topk_words",
      udaf(new graft.plans.TopKWordsAggregator(k = 5, capacity = 4096),
        org.apache.spark.sql.Encoders.STRING))
    spark.udf.register("cms_total",
      udaf(new graft.plans.CmsFreqAggregator(4, 1024, Seq.empty),
        org.apache.spark.sql.Encoders.STRING))
    spark.udf.register("heavy_keys",
      udaf(new graft.plans.HeavyKeysAggregator(256),
        org.apache.spark.sql.Encoders.STRING))
  }
}
