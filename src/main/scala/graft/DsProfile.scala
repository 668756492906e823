package graft
import graft.sources._
object DsProfile {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[16]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stage = args(0)
    val opts = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("path", stage))
    val scan = new OdimScan(opts)
    val t0 = System.nanoTime()
    val parts = scan.planInputPartitions()
    println(s"planning: ${(System.nanoTime()-t0)/1e9}s, ${parts.length} partitions, " +
      s"${parts.map(_.asInstanceOf[OdimInputPartition].files.size).sum} files")
    val fac = scan.createReaderFactory()
    val t1 = System.nanoTime()
    var rows = 0L
    parts.foreach { p =>
      val r = fac.createReader(p)
      while (r.next()) rows += 1
      r.close()
    }
    println(s"single-thread read: ${(System.nanoTime()-t1)/1e9}s, $rows rows")
    spark.stop()
  }
}
