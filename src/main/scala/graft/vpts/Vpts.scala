package graft.vpts

import graft.odim.OdimReader
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** The core VPTS transforms, Spark-first (`vpts.py:180-275`):
  *
  *   binaryFile scan -> mapPartitions ODIM decode -> per-level explode ->
  *   26-column string projection -> canonical total sort
  *
  * The reference's multiprocessing.Pool becomes Spark task parallelism over
  * the file scan; its pd.concat + sort becomes one range-partitioned total
  * sort. Duplicate (radar, datetime, height) rows from different source
  * files are preserved by contract (tests/test_vpts.py:84-91).
  *
  * Scale notes: ODIM files are ~25 KB (small-file regime) — the binaryFile
  * source packs many files per task (`spark.sql.files.maxPartitionBytes` /
  * `openCostInBytes`); decode is executor-side and embarrassingly parallel;
  * the only shuffle is the final sort, whose key (radar, datetime) matches
  * the day-partitioned output layout so each output partition is written by
  * one task.
  */
object Vpts {

  val schemaV1: StructType =
    StructType(VptsCsvV1.columns.map(StructField(_, StringType, nullable = false)))

  /** Many ODIM VP files -> canonical VPTS DataFrame (reference `vpts()`).
    * Scans through the DSv2 `odim` source (parallel listing + small-file
    * bin-packing; ~2x the binaryFile path on many-file lakes), then applies
    * the canonical total sort.
    */
  def vpts(spark: SparkSession, paths: Seq[String], version: String = "v1.0",
      failFast: Boolean = true): DataFrame = {
    val df = spark.read.format("odim")
      .option("version", version)
      .option("failFast", failFast.toString)
      .load(paths: _*)
    sortCanonical(df)
  }

  /** binaryFile + mapPartitions variant of [[vpts]] (kept for comparison and
    * as the no-custom-source fallback).
    */
  def vptsViaBinaryFile(spark: SparkSession, paths: Seq[String], version: String = "v1.0",
      failFast: Boolean = true): DataFrame = {
    val ruleset = VptsCsvVersion(version)
    import spark.implicits._
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.h5")
      .option("recursiveFileLookup", "true")
      .load(paths: _*)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
    val rows: Dataset[Seq[String]] = bin.mapPartitions { it =>
      it.flatMap { case (path, bytes) =>
        val name = path.substring(path.lastIndexOf('/') + 1)
        try {
          val reader = OdimReader.checkVpOdim(OdimReader(bytes, name))
          ruleset.rows(BirdProfile.fromOdim(reader, name))
        } catch {
          case e: Exception if !failFast =>
            System.err.println(s"[vpts] skipping $name: ${e.getMessage}")
            Seq.empty
        }
      }
    }
    val df = rows.select(
      ruleset.columns.zipWithIndex.map { case (c, i) =>
        element_at(col("value"), i + 1).as(c)
      }: _*)
    sortCanonical(df)
  }

  /** One file -> VP DataFrame (reference `vp()`). */
  def vp(spark: SparkSession, path: String, version: String = "v1.0"): DataFrame =
    vpts(spark, Seq(path), version)

  /** Canonical VPTS sort: radar (str), datetime (str), height (int),
    * source_file (str) (`vpts_csv.py:253-256`, applied `vpts.py:129-134`).
    * Range-partitioned total sort in Spark.
    */
  def sortCanonical(df: DataFrame): DataFrame =
    df.orderBy(col("radar"), col("datetime"),
      col("height").cast("int"), col("source_file"))

  /** Single ordered CSV file sink (reference `vpts_to_csv`, vpts.py:278-294):
    * the VPTS exchange contract is ONE sorted CSV, so this is a driver-side
    * ordered write (toLocalIterator — partitions stream in sort order without
    * collecting the whole result).
    */
  def vptsToCsv(df: DataFrame, filePath: String): Unit = {
    val path = java.nio.file.Paths.get(filePath)
    Option(path.getParent).foreach(java.nio.file.Files.createDirectories(_))
    val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
      java.nio.file.Files.newOutputStream(path), java.nio.charset.StandardCharsets.UTF_8))
    try {
      out.write(df.columns.mkString(","))
      out.write("\n")
      val it = df.toLocalIterator()
      while (it.hasNext) {
        val row = it.next()
        var i = 0
        val n = row.length
        val sb = new StringBuilder
        while (i < n) {
          if (i > 0) sb.append(',')
          sb.append(csvQuote(if (row.isNullAt(i)) "" else row.get(i).toString))
          i += 1
        }
        out.write(sb.toString)
        out.write("\n")
      }
    } finally out.close()
  }

  /** String-preserving VPTS CSV scan (reference S7, `vph5_to_vpts.py:
    * 230-240`): all 26 columns as raw strings, no NA inference — "" and
    * "NaN" sentinels survive the round-trip.
    */
  def readVptsCsv(spark: SparkSession, paths: String*): DataFrame =
    spark.read
      .schema(schemaV1)
      .option("header", "true")
      .option("emptyValue", "")
      .csv(paths: _*)
      // univocity yields null for unquoted empty fields no matter the
      // options; the reference's keep_default_na=False semantics are ""
      .na.fill("")

  /** Frictionless resource-descriptor sink next to a VPTS CSV (reference
    * `_write_resource_descriptor`, vpts.py:320-343): same fields, 4-space
    * indent, sorted keys.
    */
  def writeResourceDescriptor(vptsCsvPath: String, schemaVersion: String = "v1.0"): Unit = {
    val p = java.nio.file.Paths.get(vptsCsvPath)
    val json =
      s"""{
         |    "dialect": {
         |        "delimiter": ","
         |    },
         |    "encoding": "utf8",
         |    "format": "csv",
         |    "mediatype": "text/csv",
         |    "name": "vpts",
         |    "path": "${p.getFileName}",
         |    "schema": "https://raw.githubusercontent.com/aloftdata/vpts-csv/$schemaVersion/vpts-csv-table-schema.json"
         |}""".stripMargin
    val dir = Option(p.getParent).getOrElse(java.nio.file.Paths.get("."))
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.writeString(dir.resolve("vpts.resource.json"), json)
  }

  /** pandas to_csv minimal quoting. */
  private def csvQuote(s: String): String =
    if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s
}
