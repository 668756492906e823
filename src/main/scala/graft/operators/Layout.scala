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
    * Rewrites `path` so every Hive partition holds about
    * ceil(partitionBytes / targetBytes) files.
    *
    * Mechanics: per-partition byte sizes are keyed by the DataFrame's OWN
    * partition column values — each row's file (via `input_file_name()`)
    * joins the driver listing's per-file byte counts, so null partitions
    * (`__HIVE_DEFAULT_PARTITION__`), Hive-escaped special characters and
    * type-inferred values (`part=01` reading back as int 1) can never
    * mis-join the way parsing directory strings would, and the sizing
    * join itself is null-safe (`<=>`). Each partition gets a contiguous
    * block of global file ids (driver-computed offsets, broadcast back),
    * rows get `fid = offset + pmod(hash(dataCols), nFiles(partition))`,
    * and a RANGE repartition on fid makes ~one write task per output file
    * (range, not hash — hashing the fid lets distinct fids collide into
    * one task, merging files past targetBytes; range sampling keeps
    * counts near-exact, not guaranteed-exact).
    *
    * Safety: the rewrite lands in `<path>.compacting`, and the swap
    * refuses to touch the original until the rewritten row count equals
    * the original's. The swap itself renames the original ASIDE
    * (`<path>.compacting.old`), renames the rewrite into place, then
    * deletes the old copy — a crash between the renames leaves the
    * original intact under a documented name instead of a window where
    * the table path is missing. On object stores run it from the single
    * maintenance writer, same as every table-maintenance op without a
    * transaction log.
    *
    * Row-level content is preserved exactly (fid only routes rows to
    * files); pass `sortWithin` to additionally cluster rows inside each
    * output file (tight row-group stats, composes with [[zValueN]]).
    */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024,
      partitionCols: Seq[String] = Nil,
      sortWithin: Seq[Column] = Nil): CompactStats = {
    require(targetBytes > 0, s"bad targetBytes $targetBytes")
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)

    // driver-side listing (control-plane, like LakeController's day
    // listing): per-file bytes for the sizing join + per-dir stats
    val rootUri = fs.makeQualified(hPath).toUri.getPath
    val it = fs.listFiles(hPath, true)
    val fileBytes = scala.collection.mutable.Map[String, Long]()
    val dirs = scala.collection.mutable.Set[String]()
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (f.isFile && !name.startsWith("_") && !name.startsWith(".")) {
        val parent = f.getPath.getParent.toUri.getPath
        require(parent.startsWith(rootUri), s"listing escaped root: $parent")
        dirs += parent.stripPrefix(rootUri).stripPrefix("/")
        fileBytes(f.getPath.toUri.getPath) = f.getLen
      }
    }
    val filesBefore = fileBytes.size
    val totalBytes = fileBytes.valuesIterator.sum
    def nFilesFor(bytes: Long): Int =
      math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)

    val df = spark.read.parquet(path)
    val originalCount = df.count()
    val tmp = new org.apache.hadoop.fs.Path(path + ".compacting")
    fs.delete(tmp, true)

    if (partitionCols.isEmpty) {
      val n = nFilesFor(totalBytes)
      val salted = df.withColumn("__salt", pmod(hash(df.columns.map(col): _*), lit(n)))
        .repartitionByRange(n, col("__salt"))
      val sorted = if (sortWithin.nonEmpty) salted.sortWithinPartitions(sortWithin: _*)
                   else salted
      sorted.drop("__salt").write.mode("overwrite").parquet(tmp.toString)
    } else {
      import spark.implicits._
      // per-partition bytes keyed by the df's own (typed) partition values:
      // distinct (partitionCols, file) is ~one row per file after partial
      // agg, and the partition columns are directory-derived so the scan
      // reads no parquet data columns. The path normalization (URI -> raw
      // fs path, matching the listing) runs on those ~#files rows only.
      val normPath = udf((s: String) =>
        new org.apache.hadoop.fs.Path(new java.net.URI(s)).toUri.getPath)
      val pcols = partitionCols.map(col)
      val bytesDf = fileBytes.toSeq.toDF("__fpath", "__fbytes")
      val perPart = df.select(pcols :+ input_file_name().as("__f"): _*)
        .distinct()
        .withColumn("__fpath", normPath(col("__f")))
        .join(broadcast(bytesDf), Seq("__fpath"))
        .groupBy(pcols: _*).agg(sum(col("__fbytes")).as("__pbytes"))
        .collect()
      // contiguous global file-id blocks per partition, driver-computed
      var off = 0L
      val blocks = perPart.map { r =>
        val nf = nFilesFor(r.getLong(r.length - 1))
        val vals = (0 until r.length - 1).map(r.get)
        val b = (vals, off, nf)
        off += nf
        b
      }
      val totalFiles = math.max(1, off).toInt
      val counts = spark.createDataFrame(
        spark.sparkContext.parallelize(blocks.toSeq.map { case (vals, o, nf) =>
          org.apache.spark.sql.Row.fromSeq(vals :+ o :+ nf)
        }, 1),
        org.apache.spark.sql.types.StructType(
          partitionCols.map(c => df.schema(c)
            .copy(name = s"__p_$c")) ++ Seq(
            org.apache.spark.sql.types.StructField("__off",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("__nf",
              org.apache.spark.sql.types.IntegerType))))
      // null-safe join: every df row matches (keys came from df itself)
      val cond = partitionCols.map(c => col(c) <=> col(s"__p_$c")).reduce(_ && _)
      val dataCols = df.columns.filterNot(partitionCols.contains).map(col)
      val salted = df
        .join(broadcast(counts), cond)
        .withColumn("__fid", col("__off") + pmod(hash(dataCols: _*), col("__nf")))
        .repartitionByRange(totalFiles, col("__fid"))
      val sorted = if (sortWithin.nonEmpty) salted.sortWithinPartitions(sortWithin: _*)
                   else salted
      sorted.drop((partitionCols.map(c => s"__p_$c") ++ Seq("__off", "__nf", "__fid")): _*)
        .write.mode("overwrite").partitionBy(partitionCols: _*)
        .parquet(tmp.toString)
    }

    // refuse the swap unless the rewrite holds every row
    val rewrittenCount = spark.read.parquet(tmp.toString).count()
    require(rewrittenCount == originalCount,
      s"compaction rewrite of $path has $rewrittenCount rows, original has " +
        s"$originalCount — refusing to swap; original untouched, rewrite kept at $tmp")

    // swap: original aside -> rewrite in -> drop aside (never a window
    // with the table path missing; crash recovery = rename .old back)
    val old = new org.apache.hadoop.fs.Path(path + ".compacting.old")
    fs.delete(old, true)
    require(fs.rename(hPath, old), s"compaction swap: could not move $path aside")
    if (!fs.rename(tmp, hPath)) {
      val restored = fs.rename(old, hPath)
      throw new IllegalStateException(
        s"compaction swap failed for $path; original " +
          (if (restored) "restored" else s"preserved at $old") +
          s"; rewrite kept at $tmp")
    }
    fs.delete(old, true)
    val after = fs.listFiles(hPath, true)
    var filesAfter = 0
    while (after.hasNext) {
      val f = after.next()
      val nm = f.getPath.getName
      if (f.isFile && !nm.startsWith("_") && !nm.startsWith(".")) filesAfter += 1
    }
    CompactStats(filesBefore, filesAfter, totalBytes, dirs.size)
  }

  /** Partition-scoped row erasure for bare parquet — the delete half of
    * table maintenance ([[compact]] merges files; this removes rows). Only
    * the Hive partitions that actually CONTAIN matching keys are rewritten;
    * everything else is read no further than its key + partition columns.
    * At 100 TB a takedown/GDPR batch therefore costs O(affected
    * partitions), and `partFilter` (when the caller can derive one — e.g.
    * from the deleted docs' own index keys) prunes even the key-column
    * discovery scan to a static partition set.
    *
    * Protocol: discover affected partition tuples (bounded driver collect —
    * partition count, never row count), anti-join the keys out of exactly
    * those partitions into `<path>.deleting`, refuse the swap unless the
    * rewrite holds original-minus-matched rows, then swap each partition
    * directory atomically. A partition whose rows ALL matched is removed
    * outright. Partition values must be non-null and free of characters
    * Hive would escape (both hold for every index this repo writes).
    *
    * Returns the number of rows deleted.
    */
  def deleteByKey(spark: org.apache.spark.sql.SparkSession, path: String,
      keyCol: String, keys: DataFrame, partitionCols: Seq[String],
      partFilter: Column = lit(true)): Long = {
    require(partitionCols.nonEmpty, "deleteByKey needs partitioned data")
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ids = broadcast(
      keys.select(col(keys.columns.head).as(keyCol)).distinct())
    val data = spark.read.parquet(path).filter(partFilter)
    val affected = data.join(ids, keyCol)
      .select(partitionCols.map(col): _*).distinct().collect()
      .map(r => partitionCols.indices.map(i => r.get(i)))
    if (affected.isEmpty) return 0L
    val partMatch = affected.map { vals =>
      partitionCols.zip(vals).map { case (c, v) =>
        require(v != null, s"null partition value in $c — unsupported")
        col(c) === lit(v)
      }.reduce(_ && _)
    }.reduce(_ || _)
    val affectedRows = data.filter(partMatch)
    val before = affectedRows.count()
    val matched = affectedRows.join(ids, Seq(keyCol), "left_semi").count()
    val tmp = new org.apache.hadoop.fs.Path(path + ".deleting")
    fs.delete(tmp, true)
    if (matched < before) {
      // empty-result writes can't round-trip (no schema); guarded above
      affectedRows.join(ids, Seq(keyCol), "left_anti")
        .repartition(partitionCols.map(col): _*)
        .write.mode("overwrite").partitionBy(partitionCols: _*)
        .parquet(tmp.toString)
      val rewritten = spark.read.parquet(tmp.toString).count()
      require(rewritten == before - matched,
        s"delete rewrite of $path holds $rewritten of expected " +
          s"${before - matched} rows — swap refused, original untouched")
    }
    affected.foreach { vals =>
      val rel = partitionCols.zip(vals).map { case (c, v) => s"$c=$v" }
        .mkString("/")
      val live = new org.apache.hadoop.fs.Path(hPath, rel)
      val moved = new org.apache.hadoop.fs.Path(tmp, rel)
      fs.delete(live, true)
      if (fs.exists(moved)) // absent => the whole partition matched
        require(fs.rename(moved, live), s"could not swap $rel into place")
    }
    fs.delete(tmp, true)
    matched
  }
}
