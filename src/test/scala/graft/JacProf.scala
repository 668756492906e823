package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the n-gram Jaccard pipeline (round-8 perf work). */
object JacProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/tmp/sf1"
    val docs = Tables.documents(spark, dir)
    def noop(df: org.apache.spark.sql.DataFrame) = df.write.mode("overwrite").format("noop").save()
    def t(name: String)(f: => Unit): Unit = {
      f
      val runs = (1 to 3).map { _ => val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }.sorted
      println(f"PROF $name%-28s ${runs(1)}%.3f s")
    }
    noop(docs)
    t("scan_only") { noop(docs) }
    t("full_jaccard") { noop(graft.operators.Dedup.qJaccardPairs(spark, dir)) }
    t("candidates_only") { noop(graft.operators.Dedup.lshCandidatePairs(docs, "doc_id", "text")) }
    // shingle the FULL corpus (upper bound on the member-shingle stage)
    t("full_shingle_sets") {
      noop(docs.select(col("doc_id"),
        graft.plans.ShingleSetExpr.shingleHashSetSorted(col("text"), 3).as("sh")))
    }
    // staged decomposition: eager candidate materialization, then the rest
    t("staged_total") {
      val cand = graft.operators.Dedup.lshCandidatePairs(docs, "doc_id", "text")
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
        .localCheckpoint(eager = true)
      val t1 = System.nanoTime()
      val members = cand.select(col("doc_a").as("doc_id"))
        .union(cand.select(col("doc_b").as("doc_id"))).distinct()
      val d = docs.join(members, Seq("doc_id"), "left_semi")
        .select(col("doc_id"),
          graft.plans.ShingleSetExpr.shingleHashSetSorted(col("text"), 3).as("sh"))
        .localCheckpoint(eager = true)
      val t2 = System.nanoTime()
      val out = cand
        .join(d.select(col("doc_id").as("doc_a"), col("sh").as("sha")), "doc_a")
        .join(d.select(col("doc_id").as("doc_b"), col("sh").as("shb")), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          graft.plans.IntersectSizeExpr.intersectSize(col("sha"), col("shb")).as("inter"),
          size(col("sha")).as("na"), size(col("shb")).as("nb"))
        .select(col("doc_a"), col("doc_b"), col("inter"),
          (col("inter") / (col("na") + col("nb") - col("inter"))).as("jaccard"))
        .filter(col("inter") >= 2)
        .orderBy(col("doc_a"), col("doc_b"))
      noop(out)
      val t3 = System.nanoTime()
      println(f"  member_shingle ${(t2 - t1) / 1e9}%.3f s  probe_joins ${(t3 - t2) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
