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

  /** Morton/Z-value of N ≥ 2 non-negative integer columns: bit b of
    * column i lands at position b·N + (N−1−i), i.e. bits interleave
    * round-robin with the FIRST column taking the most significant slot of
    * each round. Codegen'd bit arithmetic, no UDF. Callers normalize to
    * non-negative ints first (rank, bucket, or offset — e.g. datediff from
    * an epoch). N·bits must fit a long's 63 value bits.
    */
  def zValueN(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 2, s"need >= 2 columns, got $n")
    require(bits >= 1 && n * bits <= 63, s"$n cols x $bits bits exceeds a long")
    (0 until bits).foldLeft(lit(0L)) { (acc, b) =>
      cols.zipWithIndex.foldLeft(acc) { case (a, (c, i)) =>
        a.bitwiseOR(shiftleft(c.cast("long").bitwiseAND(lit(1L << b)),
          b * (n - 1) + (n - 1 - i)))
      }
    }
  }

  /** Two-column Morton (x odd positions, y even) — the common case. */
  def zValue(x: Column, y: Column, bits: Int = 16): Column =
    zValueN(Seq(x, y), bits)

  /** Write `df` as parquet clustered by the Z-value of `cols`:
    * range-partition on z (each output file owns a contiguous z range = a
    * bounding box), sort within partitions (tight row-group stats inside
    * each file), drop the helper column. `numFiles` sizes the layout — at
    * 100 TB pick it so files land near the FS block size.
    */
  def writeZOrdered(df: DataFrame, path: String, cols: Seq[Column],
      numFiles: Int, bits: Int = 16): Unit =
    df.withColumn("__z", zValueN(cols, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  def writeZOrdered(df: DataFrame, path: String, x: Column, y: Column,
      numFiles: Int, bits: Int): Unit =
    writeZOrdered(df, path, Seq(x, y), numFiles, bits)
}
