package graft

import org.apache.spark.sql.SparkSession

/** Dev aid: print formatted plans for named queries (plan audit). */
object ExplainTool {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else Seq("q1_pricing_summary")
    names.foreach { n =>
      println(s"===== $n =====")
      Registry.byName(n).fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
