package graft.operators

import graft.vpts.SparkTestSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted band index (VERDICT r6 #1): [[Dedup.incrementalKeptIndexed]]
  * must equal [[Dedup.incrementalKept]] on the same data while reading the
  * corpus TEXT zero times per batch — the probe touches only partition-pruned
  * (\_\_id, ak, band, key) index slices. Also pins the append protocol
  * (accepted batch becomes existing corpus for the next batch) and the
  * id-range fail-fast guard.
  */
class IncrementalIndexSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.001"

  private def demoSplit() = {
    val docs = graft.Tables.documents(spark, sfDir)
    (docs.filter(col("doc_id") % 5 =!= 0).select(col("doc_id"), col("text")),
      docs.filter(col("doc_id") % 5 === 0).select(col("doc_id"), col("text")))
  }

  test("indexed probe equals the direct incrementalKept on the demo split") {
    val (existing, incoming) = demoSplit()
    val dir = java.nio.file.Files.createTempDirectory("band-index").toString
    Dedup.writeBandIndex(existing, dir, "doc_id", "text")
    val direct = Dedup.incrementalKept(existing, incoming, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val indexed = Dedup.incrementalKeptIndexed(spark, dir, incoming, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(direct == indexed)
    assert(indexed.nonEmpty, "demo split accepted nothing — fixture too small")
  }

  test("probe reads zero corpus text: only pruned index slices are scanned") {
    import spark.implicits._
    val (existing, _) = demoSplit()
    val dir = java.nio.file.Files.createTempDirectory("band-index-scan").toString
    Dedup.writeBandIndex(existing, dir, "doc_id", "text")
    val totalFiles = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(dir)).count(_.getName.endsWith(".parquet"))
    }
    // in-memory batch: every FileSourceScan in the probe plan is an index
    // read. One row duplicates a corpus doc (so the probe path is exercised
    // for real — an all-fresh batch lets AQE's empty-relation propagation
    // erase the scans), one is fresh.
    val dupText = existing.orderBy(col("doc_id")).select("text").head().getString(0)
    val batch = Seq((1000001L, dupText),
      (1000002L, "another fresh incoming document nothing like the corpus"))
      .toDF("doc_id", "text")
    val kept = Dedup.incrementalKeptIndexed(spark, dir, batch, "doc_id", "text")
    assert(kept.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1000002L),
      "expected the duplicate row dropped and the fresh row kept")
    // AQE wraps the join plan: descend through adaptive/query-stage leaves
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def allScans(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case f: FileSourceScanExec => Seq(f)
      case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
      case s: QueryStageExec => allScans(s.plan)
    }.flatten
    val scans = allScans(kept.queryExecution.executedPlan)
    assert(scans.nonEmpty, "no file scan — expected index reads")
    scans.foreach { f =>
      val fields = f.schema.fieldNames.toSet ++ f.relation.partitionSchema.fieldNames
      assert(!fields.contains("text"),
        s"a file scan reads a text column: ${f.schema.catalogString}")
      assert(fields.subsetOf(Set("__id", "ak", "band", "key", "kp", "seg")),
        s"unexpected scan columns: $fields")
    }
    // partition pruning: a 2-doc batch touches at most 8 (band, kp) buckets
    val scanned = scans.map(_.metrics("numFiles").value).sum
    assert(scanned <= 8L && scanned < totalFiles,
      s"scanned $scanned of $totalFiles index files — pruning not effective")
  }

  test("appendBandIndex makes an accepted batch existing corpus for the next") {
    val (existing, incoming) = demoSplit()
    val b1 = incoming.filter(col("doc_id") % 2 === 0)
    val b2 = incoming.filter(col("doc_id") % 2 =!= 0)
    val dir = java.nio.file.Files.createTempDirectory("band-index-append").toString
    Dedup.writeBandIndex(existing, dir, "doc_id", "text")
    val kept1 = Dedup.incrementalKeptIndexed(spark, dir, b1, "doc_id", "text")
    Dedup.appendBandIndex(kept1, dir, "doc_id", "text")
    val got = Dedup.incrementalKeptIndexed(spark, dir, b2, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val want = Dedup.incrementalKept(existing.unionByName(kept1), b2, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want)
  }

  test("out-of-range ids fail fast instead of silently mis-ranking") {
    import spark.implicits._
    val (existing, _) = demoSplit()
    val bad = Seq((-1L, "a document with a negative id")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Dedup.incrementalKept(existing, bad, "doc_id", "text").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("id must be in [0, 2^62)")),
      s"unexpected error: ${messages(e).mkString(" | ")}")
  }
}
