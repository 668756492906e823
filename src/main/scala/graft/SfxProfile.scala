package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiling aid for the suffix-LRS stages (not part of the surface). */
object SfxProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(f: => Any): Unit = {
      val rs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name: ${rs.sorted.apply(1)}%.3f s (${rs.map(r => f"$r%.2f").mkString(",")})")
    }

    val d = Tables.documents(spark, sfDir)
    d.write.mode("overwrite").format("noop").save()

    val minLen = 5; val cap = 32
    val wins = d.select(col("doc_id"),
      posexplode(graft.plans.SegmentsExpr.shingleHashes(col("text"), minLen))
        .as(Seq("pos", "h")))
    time("wins explode only") { wins.write.mode("overwrite").format("noop").save() }
    val rep = wins.groupBy(col("h")).agg(count(lit(1)).as("occ"))
      .filter(col("occ") > 1).select(col("h"))
    val cand = wins.join(rep, Seq("h"), "left_semi")
    time("cand (explode+agg+semijoin)") { cand.write.mode("overwrite").format("noop").save() }
    val toks = d.select(col("doc_id"), split(col("text"), " ").as("w"))
    val suff = cand.hint("shuffle_hash").join(toks, Seq("doc_id"))
      .select(col("doc_id"), col("pos"), col("h"),
        slice(col("w"), col("pos") + 1, lit(cap)).as("sfx"))
    time("suff (join+slice)") { suff.write.mode("overwrite").format("noop").save() }
    val grp = org.apache.spark.sql.expressions.Window
      .partitionBy(col("h")).orderBy(col("sfx"))
    def lcp(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      when(b.isNull, lit(0L)).otherwise(
        coalesce(
          nullif(array_position(zip_with(a, b, (x, y) => x <=> y), lit(false)), lit(0L)) - 1L,
          least(size(a), size(b)).cast("long")))
    val out = suff.select(col("doc_id"), col("pos").cast("long").as("pos"),
      greatest(lcp(col("sfx"), lag(col("sfx"), 1).over(grp)),
        lcp(col("sfx"), lead(col("sfx"), 1).over(grp))).as("match_len"))
    time("window+lcp (no orderBy)") { out.write.mode("overwrite").format("noop").save() }
    time("full q") {
      graft.operators.Dedup.suffixMatchLens(d).orderBy(col("doc_id"), col("pos"))
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
