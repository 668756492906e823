package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Profiling tool (SegProf pattern): the index-layout WRITE-amplification
  * pair behind BASELINE.md's round-11 row — append a 1% doc batch to a
  * 99% prebuilt index in both layouts and report wall seconds + how many
  * partition directories the append touched (the term layout fans a
  * batch across up to 256 term buckets; the doc layout lands it in ≤16
  * shard partitions).
  */
object DsProf {
  private def walk(f: java.io.File): Seq[java.io.File] =
    if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)

  private def parts(dir: String): Set[String] =
    walk(new java.io.File(s"$dir/postings")).filter(_.getName.endsWith(".parquet"))
      .map(f => f.getParentFile.getName -> f.getName).map(_.toString()).toSet

  private def partDirs(files: Set[String]): Set[String] =
    files.map(_.split(",")(0))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val base = docs.filter(col("doc_id") % 100 =!= 0)
    val batch = docs.filter(col("doc_id") % 100 === 0)
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val term = java.nio.file.Files.createTempDirectory("dsprof-term").toString
    operators.TextOps.writeTermIndex(base, term)
    val tBefore = parts(term)
    val tSec = timed(operators.TextOps.appendTermIndex(batch, term))
    val tNew = parts(term) -- tBefore
    val ds = java.nio.file.Files.createTempDirectory("dsprof-ds").toString
    operators.TextOps.writeDocShardedIndex(base, ds)
    val dBefore = parts(ds)
    val dSec = timed(operators.TextOps.appendDocShardedIndex(batch, ds))
    val dNew = parts(ds) -- dBefore
    println(s"""{"metric":"ds_write_amp","sf":"$sfDir",""" +
      s""""term_append_sec":$tSec,"term_new_files":${tNew.size},""" +
      s""""term_touched_partdirs":${partDirs(tNew).size},""" +
      s""""ds_append_sec":$dSec,"ds_new_files":${dNew.size},""" +
      s""""ds_touched_partdirs":${partDirs(dNew).size}}""")
    spark.stop()
  }
}
