package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming surface. The reference is incremental batch (SURVEY.md
  * §2.8) — its streaming analog is a file-source stream with
  * Trigger.AvailableNow: each run drains newly-arrived files, aggregates by
  * event time, and stops; watermarks bound state exactly like the reference's
  * modified-days-ago look-back bounds recomputation.
  */
object EventStream {

  /** Streaming source over the events table (file stream; new files = new
    * micro-batches). A file stream needs its schema declared up front, and
    * events.ts has shipped as both TIMESTAMP(NANOS) and TIMESTAMP(MICROS)
    * across testdata generations — so peek at the on-disk footer via the
    * batch reader (driver-side, one footer) and declare the stream schema
    * to match, normalizing ts to session-time TIMESTAMP either way.
    */
  def source(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val onDisk = graft.Tables(spark, dir, "events").schema
    val reader = spark.readStream
      .schema(onDisk)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    onDisk("ts").dataType match {
      case LongType => reader.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => reader
      case _ => reader.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  /** Tumbling 5-minute aggregation with a 10-minute watermark — the
    * streaming twin of Analytics.qStreamTumbling (same plan modulo the
    * watermark node).
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 100)) / 100.0).as("sum_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("wstart"),
        col("event_type"), col("n"), col("sum_value"))

  /** Stream-stream interval join: each purchase joined to the same user's
    * clicks from the preceding hour. Watermarks on both sides bound the
    * join state (Spark drops buffered rows older than watermark - interval),
    * which is what makes this viable over an unbounded stream.
    */
  def purchasesWithRecentClicks(purchases: DataFrame, clicks: DataFrame): DataFrame = {
    val p = purchases.withWatermark("ts", "10 minutes")
    val c = clicks
      .withColumnRenamed("ts", "c_ts").withColumnRenamed("user_id", "c_user")
      .withWatermark("c_ts", "10 minutes")
    p.join(c,
      expr("""user_id = c_user AND
              c_ts >= ts - INTERVAL 1 HOUR AND
              c_ts <= ts"""))
  }

  /** Streaming exact dedup: drop events whose `event_id` was already seen,
    * with dedup state bounded by the watermark
    * (dropDuplicatesWithinWatermark) — the streaming twin of the exact
    * content-hash dedup. Unbounded `dropDuplicates` state would grow
    * forever on an endless stream; the watermark bound is what makes exact
    * dedup viable there (duplicates arriving later than the delay are the
    * documented trade-off, exactly like late rows in the windowed aggs).
    */
  def dedupByEventId(events: DataFrame, delay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", delay).dropDuplicatesWithinWatermark("event_id")

  /** Drain everything currently in the source into an in-memory table and
    * return the result (Trigger.AvailableNow + complete mode: every window,
    * exactly the batch answer — used by tests for batch/stream parity).
    */
  def runAvailableNow(spark: SparkSession, dir: String, queryName: String): DataFrame = {
    val q: StreamingQuery = tumblingCounts(source(spark, dir))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
