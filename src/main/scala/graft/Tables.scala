package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated synthetic tables (TESTDATA.md).
  * Parquet scans: schema comes from the files; Catalyst prunes columns and
  * pushes filters down to the scan, so loaders stay bare.
  */
object Tables {
  // Cache the analyzed reader plan per (session, path): repeated queries in
  // one process (Verify/Bench run 40+) otherwise re-list and re-read parquet
  // footers on every call.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.computeIfAbsent((spark, s"$dir/$name.parquet"),
      { case (s, p) => s.read.parquet(p) })

  /** Cached reader for a STAGED artifact path (band/posting/graph
    * indexes): a serving process holds its index open, so the partition
    * listing is paid once per (session, path), not once per probe — for a
    * 1024-dir partitioned index the re-list is a real per-query tax.
    * Only safe for immutable staged dirs (the [[graft.operators.Staging]]
    * atomic-rename protocol); a mutating index (append/compact/delete)
    * must invalidate via [[dropCached]].
    */
  def at(spark: SparkSession, path: String): DataFrame =
    cache.computeIfAbsent((spark, path), { case (s, p) => s.read.parquet(p) })

  /** Invalidate a cached reader after its path's content changed. */
  def dropCached(spark: SparkSession, path: String): Unit =
    cache.remove((spark, path)): Unit

  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  /** events.ts has shipped as both TIMESTAMP(NANOS) and TIMESTAMP(MICROS)
    * across testdata generations; adapt to whichever is on disk. NANOS is
    * read as raw longs (vectorized reader rejects it otherwise) and
    * floor-divided to micros — exact integer arithmetic, matching DuckDB's
    * ns->us truncation. MICROS arrives as TIMESTAMP_NTZ (inferTimestampNTZ)
    * and is cast to session-time TIMESTAMP — value-preserving under the
    * UTC session timezone every entry point sets.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    val raw = apply(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
