package graft.lake

import graft.functions.OdimPaths
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S3-inventory analytics (`s3.py:156-384`): inventory CSV scan, h5 filter,
  * coverage counts, and the modified-window incremental subset.
  *
  * Scale: the inventory for a 100 TB lake is ~10^9 rows of small strings —
  * one schema'd gzip-CSV scan (Spark splits per file; the reference's 50k-row
  * chunking is partitioning for free), a narrow regex projection, and a
  * partial-agg'd groupBy on a low-cardinality derived key.
  */
object Inventory {

  /** Headerless inventory chunk schema `repo,file,size,modified`
    * (s3.py:346-348).
    */
  val schema: StructType = StructType(Seq(
    StructField("repo", StringType),
    StructField("file", StringType),
    StructField("size", LongType),
    StructField("modified", StringType)))

  def read(spark: SparkSession, paths: String*): DataFrame =
    spark.read.schema(schema).csv(paths: _*)

  /** S5 manifest scan (`list_manifest_file_keys`, s3.py:156-174): parse the
    * S3-inventory manifest JSON and yield the inventory chunk keys.
    */
  def manifestKeys(spark: SparkSession, manifestPath: String): Seq[String] =
    spark.read.option("multiLine", "true").json(manifestPath)
      .select(explode(col("files")).as("f"))
      .select(col("f.key"))
      .collect().map(_.getString(0)).toSeq

  /** Full manifest-driven read: manifest JSON -> chunk files -> inventory
    * frame (chunk keys are resolved against the manifest's directory, the
    * local-FS stand-in for the source bucket).
    */
  def readFromManifest(spark: SparkSession, manifestPath: String): DataFrame = {
    val base = manifestPath.substring(0, manifestPath.lastIndexOf('/'))
    val keys = manifestKeys(spark, manifestPath)
      .map(k => s"$base/${k.substring(k.lastIndexOf('/') + 1)}")
    read(spark, keys: _*)
  }

  /** Derived columns: parsed modified ts, path parts, ODIM name parts
    * (P8/P10/P12 in SURVEY.md §2.2).
    */
  def withDerived(inv: DataFrame): DataFrame = {
    val f = col("file")
    inv
      .withColumn("modified_ts",
        to_timestamp(col("modified"), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"))
      .withColumn("suffix",
        element_at(split(element_at(split(f, "/"), -1), "\\."), -1))
      .withColumn("source", element_at(split(f, "/"), 1))
      .withColumn("file_type", element_at(split(f, "/"), 2))
      .withColumn("radar", OdimPaths.radarCode(f))
      .withColumn("yyyy", OdimPaths.year(f))
      .withColumn("mm", OdimPaths.month(f))
      .withColumn("dd", OdimPaths.day(f))
  }

  /** F1: keep only .h5 rows (s3.py:296). */
  def h5Only(inv: DataFrame): DataFrame = inv.filter(col("suffix") === "h5")

  /** A1/A2 coverage: file counts per radar-day group, keyed by the FILE NAME
    * date (not the folder) exactly like `extract_daily_group_from_inventory`
    * (s3.py:177-200); output matches coverage.csv (directory, file_count).
    */
  def coverage(inv: DataFrame): DataFrame =
    h5Only(withDerived(inv))
      .groupBy(concat_ws("/", col("source"), col("file_type"), col("radar"),
        col("yyyy"), col("mm"), col("dd")).as("directory"))
      .agg(count(lit(1)).as("file_count"))
      .orderBy(col("directory"))

  /** F2 + A3: radar-days with files modified in the look-back window
    * (`_last_modified_from_inventory` + `_handle_inventory`, s3.py:228-303).
    * `now` is injected for reproducibility (the reference freezes
    * pd.Timestamp.now in tests the same way).
    *
    * `modifiedDaysAgo == 0` expands to the full bucket age — "rebuild
    * everything, this will take a while" (`vph5_to_vpts.py:132-138`): the
    * window filter is dropped entirely, so every radar-day present in the
    * inventory is returned.
    */
  def daysToRebuild(inv: DataFrame, modifiedDaysAgo: Int,
      now: java.time.Instant): DataFrame = {
    val derived = h5Only(withDerived(inv))
    val windowed =
      if (modifiedDaysAgo == 0) derived
      else {
        val cutoff = java.sql.Timestamp.from(
          now.minus(java.time.Duration.ofDays(modifiedDaysAgo)))
        derived.filter(col("modified_ts") > lit(cutoff))
      }
    windowed
      .groupBy(col("source"), col("file_type"), col("radar"),
        col("yyyy"), col("mm"), col("dd"))
      .agg(count(lit(1)).as("file_count"))
      .orderBy(col("source"), col("radar"), col("yyyy"), col("mm"), col("dd"))
  }

  /** A4: strip day -> distinct months (vph5_to_vpts.py:206-212). */
  def monthsToRebuild(days: DataFrame): DataFrame =
    days.groupBy(col("source"), col("file_type"), col("radar"),
        col("yyyy"), col("mm"))
      .agg(count(lit(1)).as("n_days"))
      .orderBy(col("source"), col("radar"), col("yyyy"), col("mm"))
}
