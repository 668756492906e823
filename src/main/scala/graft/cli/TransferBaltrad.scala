package graft.cli

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** CLI equivalent of the reference's `transfer_baltrad` sync
  * (`transfer_baltrad.py:72-165`): source listing -> keep only VP files
  * (F3 `_vp_` filter) -> anti-join against destination (F4 "already
  * transferred" membership test) -> copy, into the
  * `source/hdf5/radar/yyyy/mm/dd/` lake layout.
  *
  * The reference's SFTP side is a driver connector; here both ends are
  * Hadoop FileSystems (file://, s3a://...), which covers the lake semantics
  * the analytics engine owns. The anti-join is a real Spark left-anti on
  * file names, so the diff scales to listings of any size.
  */
object TransferBaltrad {

  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect { case Array(k, v) => k -> v }.toMap
    val src = opts.getOrElse("--source", sys.error("--source required"))
    val dst = opts.getOrElse("--destination", sys.error("--destination required"))
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("transferBaltrad")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val copied = sync(spark, src, dst, opts.getOrElse("--lake-source", "baltrad"))
    println(s"Transferred $copied files.")
    spark.stop()
  }

  def sync(spark: SparkSession, src: String, dst: String, lakeSource: String): Int = {
    import graft.functions.OdimPaths
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration

    def listNames(root: String): Seq[String] = {
      val p = new HPath(root)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) Seq.empty
      else {
        val it = fs.listFiles(p, true)
        val out = Seq.newBuilder[String]
        while (it.hasNext) {
          val st = it.next()
          if (st.isFile) out += st.getPath.getName
        }
        out.result()
      }
    }

    val srcDf = listNames(src).toDF("name")
      .filter(col("name").contains("_vp_")) // F3: ignore PVOL
    val dstDf = listNames(dst).toDF("done")
    // F4: left-anti membership — only not-yet-transferred files
    val todo = srcDf.join(dstDf, col("name") === col("done"), "left_anti")
      .select(col("name"),
        concat_ws("/", lit(lakeSource), lit("hdf5"),
          OdimPaths.radarCode(col("name")), OdimPaths.year(col("name")),
          OdimPaths.month(col("name")), OdimPaths.day(col("name")),
          col("name")).as("target"))
      .collect()

    val srcFs = new HPath(src).getFileSystem(conf)
    val dstFs = new HPath(dst).getFileSystem(conf)
    todo.foreach { row =>
      val name = row.getString(0)
      val target = new HPath(s"$dst/${row.getString(1)}")
      dstFs.mkdirs(target.getParent)
      org.apache.hadoop.fs.FileUtil.copy(
        srcFs, new HPath(s"$src/$name"), dstFs, target, false, conf)
    }
    todo.length
  }
}
