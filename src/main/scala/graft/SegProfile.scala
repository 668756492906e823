package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiling aid for the segment-dedup stages (not part of the surface). */
object SegProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Any): Unit = {
      val rs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name: ${rs.sorted.apply(1)}%.3f s (${rs.map(r => f"$r%.2f").mkString(",")})")
    }

    val d = Tables.documents(spark, sfDir)
    d.write.mode("overwrite").format("noop").save() // warm scan

    time("scan only") { d.write.mode("overwrite").format("noop").save() }

    val hashed = d.select(col("doc_id"),
      posexplode(graft.plans.SegmentsExpr.segmentHashes(col("text"), 3))
        .as(Seq("pos", "h")))
    time("hash+explode only") {
      hashed.write.mode("overwrite").format("noop").save()
    }
    val boiler = hashed.groupBy(col("h")).agg(count(lit(1)).as("occ"))
      .filter(col("occ") > 2).select(col("h"))
    time("occ-count job (collect)") {
      boiler.limit((4 << 20) + 1).collect().length
    }
    val hOnly = d.select(explode(
      graft.plans.SegmentsExpr.segmentHashes(col("text"), 3)).as("h"))
    val boiler2 = hOnly.groupBy(col("h")).agg(count(lit(1)).as("occ"))
      .filter(col("occ") > 2).select(col("h"))
    time("occ-count explode-no-pos (collect)") {
      boiler2.limit((4 << 20) + 1).collect().length
    }
    time("occ-count explode-no-pos no-limit (collect)") {
      boiler2.collect().length
    }
    val arr = boiler.limit((4 << 20) + 1).collect().map(_.getLong(0))
    java.util.Arrays.sort(arr)
    val bc = spark.sparkContext.broadcast(arr)
    val cleaned = d.select(col("doc_id"),
        graft.plans.SegmentsExpr.segmentClean(col("text"), bc, 3).as("c"))
      .select(col("doc_id"), col("c.n_segs"), col("c.n_kept"), col("c.clean_text"))
    time("clean projection (noop)") {
      cleaned.write.mode("overwrite").format("noop").save()
    }
    time("full q (with orderBy + checkpoint)") {
      graft.operators.Dedup.segmentDedup(d).localCheckpoint(eager = false)
        .orderBy(col("doc_id")).write.mode("overwrite").format("noop").save()
    }
    time("full q (no checkpoint)") {
      graft.operators.Dedup.segmentDedup(d)
        .orderBy(col("doc_id")).write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
