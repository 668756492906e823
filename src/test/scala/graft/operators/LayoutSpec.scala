package graft.operators

import graft.vpts.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.01"

  test("zValue interleaves bits (known Morton codes)") {
    import spark.implicits._
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 2L), (3L, 5L))
      .toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), bits = 8).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // x odd positions, y even: z(1,0)=2, z(0,1)=1, z(1,1)=3, z(2,2)=12,
    // z(3,5)=(x1y1 x0y0 interleave) 3=011,5=101 -> bits: x:0,1,1 y:1,0,1 ->
    // z = y0 + 2x0 + 4y1 + 8x1 + 16y2 + 32x2 = 1+2+0+8+16+0 = 27
    assert(got == Seq(0L, 2L, 1L, 3L, 12L, 27L))
  }

  test("zValueN interleaves three columns round-robin") {
    import spark.implicits._
    // x=1 (bit0 -> pos 2), y=1 (bit0 -> pos 1), w=1 (bit0 -> pos 0): z=7;
    // x=2,y=0,w=1: x bit1 -> pos 5, w bit0 -> pos 0 -> 33
    val got = Seq((1L, 1L, 1L), (2L, 0L, 1L))
      .toDF("x", "y", "w")
      .select(Layout.zValueN(Seq(col("x"), col("y"), col("w")), bits = 4).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(7L, 33L))
  }

  test("z-ordered layout prunes 2-d box queries better than single-column sort") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    // two genuinely high-cardinality dimensions: part (0-1999) x ship day
    // (~2500 days) — the (entity, time) shape every dashboard box-query has
    val li = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"),
        datediff(to_date(col("l_shipdate")), lit("1995-01-01")).cast("long").as("ship_day"))
    val total = li.count()
    val tmp = java.nio.file.Files.createTempDirectory("layout").toString

    // same data, two layouts, same file count
    Layout.writeZOrdered(li, s"$tmp/zorder", col("l_partkey"), col("ship_day"),
      numFiles = 64, bits = 12)
    li.repartitionByRange(64, col("l_partkey"))
      .sortWithinPartitions(col("l_partkey"))
      .write.mode("overwrite").parquet(s"$tmp/bysort")

    // conjunctive box: 20% of parts x 20% of days = 4% of rows. The
    // single-column layout can only prune on the part factor; z-order
    // prunes on the product.
    def box(path: String) = spark.read.parquet(path)
      .filter(col("l_partkey").between(0, 399) && col("ship_day").between(0, 499))
    def scanRows(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collect { case f: FileSourceScanExec => f }
        .map(_.metrics("numOutputRows").value).sum
    }

    // both layouts return identical results...
    val a = box(s"$tmp/zorder").select("l_orderkey", "l_partkey", "ship_day")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val b = box(s"$tmp/bysort").select("l_orderkey", "l_partkey", "ship_day")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(a == b && a.nonEmpty)

    // ...but the z-ordered scan reads fewer rows: row-group pruning hits on
    // BOTH dimensions (bounding boxes), the single-sort layout only on one
    val zRead = scanRows(box(s"$tmp/zorder"))
    val sRead = scanRows(box(s"$tmp/bysort"))
    assert(zRead < sRead,
      s"z-order read $zRead rows, single-sort $sRead (total $total)")
    assert(zRead < total / 2, s"z-order read $zRead of $total — no real pruning")
  }

  test("compaction merges small files per partition and preserves every row") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("compact").toString + "/t"
    // 3 partitions x 12 tiny files each
    val rows = (0 until 360).map(i => (i.toLong, s"src${i % 3}", s"payload-$i"))
    rows.toDF("id", "src", "v")
      .repartition(36)
      .write.partitionBy("src").parquet(dir)
    def countFiles(): Int = {
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(dir), true)
      var n = 0
      while (it.hasNext) {
        val f = it.next()
        if (f.isFile && !f.getPath.getName.startsWith("_") &&
            !f.getPath.getName.startsWith(".")) n += 1
      }
      n
    }
    val before = countFiles()
    assert(before >= 30, s"fixture not fragmented: $before files")
    val stats = Layout.compact(spark, dir, targetBytes = 1L << 30,
      partitionCols = Seq("src"))
    assert(stats.filesBefore == before)
    assert(stats.partitions == 3)
    assert(stats.filesAfter == 3, s"expected 1 file/partition, got ${stats.filesAfter}")
    assert(countFiles() == 3)
    // content identical, partition column included
    val got = spark.read.parquet(dir)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getString(1))).toSet
    assert(got == rows.toSet)

    // unpartitioned: tiny target -> multiple output files, content preserved
    val dir2 = java.nio.file.Files.createTempDirectory("compact2").toString + "/t"
    rows.toDF("id", "src", "v").repartition(24).write.parquet(dir2)
    val s2 = Layout.compact(spark, dir2, targetBytes = 8L * 1024)
    assert(s2.filesAfter < s2.filesBefore && s2.filesAfter > 1,
      s"got ${s2.filesBefore} -> ${s2.filesAfter}")
    val got2 = spark.read.parquet(dir2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got2 == rows.toSet)
  }

  test("compaction survives null and special-char partition values") {
    import spark.implicits._
    // partition-value shapes that silently vanished under directory-string
    // joins: NULL (__HIVE_DEFAULT_PARTITION__ dir) and Hive-escaped
    // special characters (a space); mixing in "01" keeps the column a
    // string here — the all-numeric re-inference case has its own test
    val dir = java.nio.file.Files.createTempDirectory("compactnull").toString + "/t"
    val rows = (0 until 90).map { i =>
      val p = (i % 3) match {
        case 0 => null
        case 1 => "01"          // re-infers as int 1 under inference
        case 2 => "a b"         // Hive-escaped in the directory name
      }
      (i.toLong, p, s"v-$i")
    }
    rows.toDF("id", "p", "v").repartition(9).write.partitionBy("p").parquet(dir)
    val before = spark.read.parquet(dir).count()
    assert(before == 90)
    val stats = Layout.compact(spark, dir, targetBytes = 1L << 30,
      partitionCols = Seq("p"))
    assert(stats.partitions == 3)
    // EVERY row survives the rewrite — this is the ADVICE data-loss case
    // (read-back column order: data cols first, partition col last)
    val back = spark.read.parquet(dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(back == rows.map(t => (t._1, t._3)).toSet)
    // and the three partition groups kept their values
    val byP = spark.read.parquet(dir).groupBy("p").count()
      .collect().map(r => Option(r.get(0)).map(_.toString) -> r.getLong(1)).toMap
    assert(byP.values.sum == 90 && byP.size == 3)
    assert(byP(None) == 30, s"null partition lost rows: $byP")
  }

  test("compaction survives partition values that re-infer as a different type") {
    import spark.implicits._
    // all-numeric zero-padded dirs (p=01, p=02) re-infer as INT partition
    // values on read — the stringified-dir join matched "1" against "01"
    // and dropped every row; the typed-value sizing join must not
    val dir = java.nio.file.Files.createTempDirectory("compactint").toString + "/t"
    val rows = (0 until 60).map(i => (i.toLong, if (i % 2 == 0) "01" else "02", s"v-$i"))
    rows.toDF("id", "p", "v").repartition(6).write.partitionBy("p").parquet(dir)
    assert(spark.read.parquet(dir).schema("p").dataType ==
      org.apache.spark.sql.types.IntegerType, "fixture no longer re-infers")
    val stats = Layout.compact(spark, dir, targetBytes = 1L << 30,
      partitionCols = Seq("p"))
    assert(stats.partitions == 2)
    val back = spark.read.parquet(dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(back == rows.map(t => (t._1, t._3)).toSet,
      "rows vanished under partition-type inference")
  }
}
