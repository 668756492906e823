package graft.streaming

import graft.odim.OdimReader
import graft.vpts.{BirdProfile, VptsCsvVersion, Vpts}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming ODIM ingestion: the Structured Streaming twin of `Vpts.vpts`.
  * New h5 files landing in the lake become micro-batches (file stream over
  * binaryFile); each batch decodes to VPTS rows. With Trigger.AvailableNow
  * this is exactly the reference's incremental-batch model — a cron run
  * drains whatever arrived — but with checkpointed exactly-once bookkeeping
  * instead of the modified-window heuristic.
  */
object OdimStream {

  /** Streaming DataFrame of VPTS v1 rows from a lake prefix. */
  def vptsStream(spark: SparkSession, dir: String,
      version: String = "v1.0", failFast: Boolean = false): DataFrame = {
    val ruleset = VptsCsvVersion(version)
    import spark.implicits._
    val binarySchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content", org.apache.spark.sql.types.BinaryType)))
    val bin = spark.readStream
      .format("binaryFile")
      .schema(binarySchema)
      .option("pathGlobFilter", "*.h5")
      .option("recursiveFileLookup", "true")
      .load(dir)
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
            System.err.println(s"[odim-stream] skipping $name: ${e.getMessage}")
            Seq.empty
        }
      }
    }
    rows.select(ruleset.columns.zipWithIndex.map { case (c, i) =>
      element_at(col("value"), i + 1).as(c)
    }: _*)
  }

  /** Streaming lake materialization: each micro-batch of decoded profiles is
    * written to the partitioned parquet lake with dynamic partition
    * overwrite — late files for an old radar-day rewrite exactly that day's
    * partition, the streaming version of the reference's whole-day rebuild
    * (SURVEY.md §2.8).
    */
  def writeToLake(spark: SparkSession, inDir: String, lakeDir: String,
      checkpoint: String): Unit = {
    val q = vptsStream(spark, inDir).writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty)
          graft.lake.VptsLakeWriter.writePartitioned(
            Vpts.sortCanonical(batch.toDF()), lakeDir)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Drain all currently-available files into an in-memory table (test/cron
    * helper).
    */
  def drainAvailable(spark: SparkSession, dir: String, queryName: String): DataFrame = {
    val q = vptsStream(spark, dir).writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
