package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Storage-layout operators: Z-order (Morton) clustering for
  * multi-dimensional scan pruning.
  *
  * Parquet prunes at row-group granularity from column min/max stats, and a
  * row group's stats are only tight for columns the data is clustered on. A
  * single-column sort gives perfect pruning on that column and none on any
  * other; interleaving the bits of two (or more) key columns gives every
  * row group a tight bounding BOX, so a conjunctive range query prunes on
  * the PRODUCT of the selectivities instead of one factor. At 100 TB the
  * difference is reading the few row groups a (user, day) dashboard query
  * touches versus scanning every file that matches one dimension.
  *
  * This is the layout trick Delta/Iceberg `OPTIMIZE ZORDER BY` applies; here
  * it is a plain column expression + range-partitioned write, so it works on
  * bare parquet. (Cite: reference stores its lake keyed by one dimension
  * only — `vptstools` S3 layout `radar/yyyy/mm/dd`; Z-order is the
  * generalization its coverage queries would want at scale.)
  */
object Layout {

  /** Morton/Z-value: interleave the low `bits` bits of two non-negative
    * integer columns (x gets odd positions, y even). Codegen'd bit
    * arithmetic, no UDF. Callers normalize to non-negative ints first
    * (rank, bucket, or offset — e.g. datediff from an epoch).
    */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, b) =>
      acc
        .bitwiseOR(shiftleft(x.cast("long").bitwiseAND(lit(1L << b)), b + 1))
        .bitwiseOR(shiftleft(y.cast("long").bitwiseAND(lit(1L << b)), b))
    }
  }

  /** Write `df` as parquet clustered by the Z-value of (x, y):
    * range-partition on z (each output file owns a contiguous z range = a
    * bounding box), sort within partitions (tight row-group stats inside
    * each file), drop the helper column. `numFiles` sizes the layout — at
    * 100 TB pick it so files land near the FS block size.
    */
  def writeZOrdered(df: DataFrame, path: String, x: Column, y: Column,
      numFiles: Int, bits: Int = 16): Unit =
    df.withColumn("__z", zValue(x, y, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
