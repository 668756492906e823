package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the segment-dedup pipeline (round-6 perf work). */
object SegProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, "/tmp/sf1")
    def noop(df: org.apache.spark.sql.DataFrame) = df.write.mode("overwrite").format("noop").save()
    def t(name: String)(f: => Unit): Unit = {
      f
      val runs = (1 to 3).map { _ => val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }.sorted
      println(f"PROF $name%-28s ${runs(1)}%.3f s")
    }
    t("bcast_no_order") { noop(graft.operators.Dedup.segmentDedup(docs)) }
    t("bcast_order_nockpt") { noop(graft.operators.Dedup.segmentDedup(docs).orderBy(col("doc_id"))) }
    t("bcast_order_ckpt") { noop(graft.operators.Dedup.segmentDedup(docs).localCheckpoint(eager = false).orderBy(col("doc_id"))) }
    t("join_no_order") { noop(graft.operators.Dedup.segmentDedup(docs, broadcastMaxSet = 0)) }
    t("join_order_ckpt") { noop(graft.operators.Dedup.segmentDedup(docs, broadcastMaxSet = 0).localCheckpoint(eager = false).orderBy(col("doc_id"))) }
    spark.stop()
  }
}
