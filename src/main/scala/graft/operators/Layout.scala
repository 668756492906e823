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

  final case class CompactStats(filesBefore: Int, filesAfter: Int,
      bytes: Long, partitions: Int)

  /** Small-file compaction — OPTIMIZE for bare parquet. Streaming ingest
    * and per-day jobs leave lakes with thousands of KB-scale files per
    * partition; at 100 TB the resulting task-per-file scheduling and
    * footer-read overhead dominate scans long before data volume does.
    * Rewrites `path` so every Hive partition holds
    * ceil(partitionBytes / targetBytes) files.
    *
    * Mechanics: one driver-side listing (control-plane, like
    * `LakeController`'s day listing) sizes each partition; rows get a salt
    * `pmod(hash(*), nFiles(partition))` joined in from that small sizing
    * table (broadcast), and a repartition on (partitionCols, salt) makes
    * each (partition, salt) exactly one write task = one output file. The
    * rewrite lands in `<path>.compacting` and swaps in via rename —
    * atomic on HDFS-like filesystems; on object stores run it from the
    * single maintenance writer, same as every table-maintenance op
    * without a transaction log.
    *
    * Row-level content is preserved exactly (hash salt only routes rows
    * to files); pass `sortWithin` to additionally cluster rows inside
    * each output file (tight row-group stats, composes with [[zValueN]]).
    */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024,
      partitionCols: Seq[String] = Nil,
      sortWithin: Seq[Column] = Nil): CompactStats = {
    require(targetBytes > 0, s"bad targetBytes $targetBytes")
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)

    // driver-side sizing listing: (partition-relative dir -> (files, bytes))
    val rootUri = fs.makeQualified(hPath).toUri.getPath
    val it = fs.listFiles(hPath, true)
    val sizes = scala.collection.mutable.Map[String, (Int, Long)]()
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (f.isFile && !name.startsWith("_") && !name.startsWith(".")) {
        val parent = f.getPath.getParent.toUri.getPath
        require(parent.startsWith(rootUri), s"listing escaped root: $parent")
        val rel = parent.stripPrefix(rootUri).stripPrefix("/")
        val (n, b) = sizes.getOrElse(rel, (0, 0L))
        sizes(rel) = (n + 1, b + f.getLen)
      }
    }
    val filesBefore = sizes.valuesIterator.map(_._1).sum
    val totalBytes = sizes.valuesIterator.map(_._2).sum
    def nFilesFor(bytes: Long): Int =
      math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)

    val df = spark.read.parquet(path)
    val tmp = new org.apache.hadoop.fs.Path(path + ".compacting")
    fs.delete(tmp, true)

    if (partitionCols.isEmpty) {
      val n = nFilesFor(totalBytes)
      val salted = df.withColumn("__salt", pmod(hash(df.columns.map(col): _*), lit(n)))
        .repartition(n, col("__salt"))
      val sorted = if (sortWithin.nonEmpty) salted.sortWithinPartitions(sortWithin: _*)
                   else salted
      sorted.drop("__salt").write.mode("overwrite").parquet(tmp.toString)
    } else {
      // per-partition file counts from the sizing listing (dir is
      // "k1=v1/k2=v2"); values parse as strings — join keys cast to match
      import spark.implicits._
      val counts = sizes.toSeq.map { case (rel, (_, b)) =>
        val vals = rel.split("/").filter(_.nonEmpty).map(_.split("=", 2)(1))
        (vals.toSeq, nFilesFor(b))
      }.toDF("__pvals", "__nf")
      val keyArr = array(partitionCols.map(c => col(c).cast("string")): _*)
      val dataCols = df.columns.filterNot(partitionCols.contains).map(col)
      val salted = df
        .join(broadcast(counts), keyArr === col("__pvals"))
        .withColumn("__salt", pmod(hash(dataCols: _*), col("__nf")))
        .repartition((partitionCols.map(col) :+ col("__salt")): _*)
      val sorted = if (sortWithin.nonEmpty) salted.sortWithinPartitions(sortWithin: _*)
                   else salted
      sorted.drop("__pvals", "__nf", "__salt")
        .write.mode("overwrite").partitionBy(partitionCols: _*)
        .parquet(tmp.toString)
    }

    fs.delete(hPath, true)
    require(fs.rename(tmp, hPath), s"compaction swap failed for $path")
    val after = fs.listFiles(hPath, true)
    var filesAfter = 0
    while (after.hasNext) {
      val f = after.next()
      val nm = f.getPath.getName
      if (f.isFile && !nm.startsWith("_") && !nm.startsWith(".")) filesAfter += 1
    }
    CompactStats(filesBefore, filesAfter, totalBytes, sizes.size)
  }
}
