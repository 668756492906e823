package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Dev aid: ODIM->VPTS conversion throughput on a synthetic lake of N file
  * copies (the reference's small-file regime, ~25 KB/file).
  */
object ThroughputTool {
  def main(args: Array[String]): Unit = {
    val nCopies = if (args.nonEmpty) args(0).toInt else 400 // x5 files
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val src = Paths.get("/root/reference/tests/data/inventory/vp")
    val stage = Files.createTempDirectory("odimlake")
    val srcFiles = Files.list(src).sorted.toArray.map(_.asInstanceOf[java.nio.file.Path])
    var n = 0
    (0 until nCopies).foreach { c =>
      val day = Paths.get(s"$stage/baltrad/hdf5/nosta/2023/03/${11 + c % 20}")
      Files.createDirectories(day)
      srcFiles.foreach { f =>
        Files.copy(f, day.resolve(s"c${c}_${f.getFileName}"), StandardCopyOption.REPLACE_EXISTING)
        n += 1
      }
    }
    println(s"staged $n files")

    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$name: $dt%.2f s  (${n / dt}%.0f files/s, ${n * 25L / dt / 1024}%.1f MiB/s)")
    }

    // warmup listing + jvm
    Vpts.vpts(spark, Seq(stage.toString)).limit(1).count()

    time("decode+count (mapPartitions pipeline)") {
      graft.vpts.Vpts.vpts(spark, Seq(stage.toString))
        .write.mode("overwrite").format("noop").save()
    }
    time("decode+count (DSv2 odim format)") {
      spark.read.format("odim").load(stage.toString)
        .write.mode("overwrite").format("noop").save()
    }
    time("decode+sort+single CSV sink") {
      graft.lake.CsvSink.writeSingleCsv(
        graft.vpts.Vpts.vpts(spark, Seq(stage.toString)), s"$stage/out.csv")
    }
    spark.stop()
  }

  private val Vpts = graft.vpts.Vpts
}
